"""Streaming walkthrough: feed a document corpus in as three epochs and
watch every incremental state machine stay consistent with its batch
counterpart — wordcounts, HLL cardinality, the Pareto frontier, and the
positional phrase index, all through the versioned / append-only commit
schemes.

Run:  python examples/streaming_demo.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import functions as F

    from nonconsumptive_spark.functions.text import tokenize
    from nonconsumptive_spark.operators.skyline import skyline
    from nonconsumptive_spark.operators.wordcount import (
        hll_distinct_tokens,
        hll_registers,
    )
    from nonconsumptive_spark.session import get_spark
    from nonconsumptive_spark.streaming import corpus as c
    from nonconsumptive_spark.streaming.hllstream import (
        hll_estimate,
        merge_hll_registers,
    )
    from nonconsumptive_spark.streaming.indexstream import (
        live_phrase_search,
        merge_postings,
    )
    from nonconsumptive_spark.streaming.skylinestream import (
        frontier,
        merge_skyline,
    )

    spark = get_spark("streaming-demo", cpus=8, shuffle_partitions=8)
    epochs = [
        [(0, "the quick brown fox jumps"), (1, "lazy dog sleeps")],
        [(2, "quick quick fox"), (3, "a brand new document arrives")],
        [(4, "the dog jumps over the lazy fox")],
    ]

    with tempfile.TemporaryDirectory() as tmp:
        hll_t, sky_t, idx_t = f"{tmp}/hll", f"{tmp}/sky", f"{tmp}/idx"
        for e, rows in enumerate(epochs):
            batch = spark.createDataFrame(rows, "doc_id long, text string")
            toks = batch.select(F.explode(tokenize("text")).alias("token"))
            merge_hll_registers(hll_registers(toks), hll_t, epoch_id=e)
            pts = batch.select(
                "doc_id", F.length("text").alias("x"),
                F.size(F.array_distinct(tokenize("text"))).alias("y"))
            merge_skyline(pts, sky_t, "x", "y", epoch_id=e)
            merge_postings(batch, idx_t, epoch_id=e)
            est = hll_estimate(spark, hll_t).first()["estimate"]
            nf = frontier(spark, sky_t).count()
            print(f"epoch {e}: ~{est} distinct tokens, frontier size {nf}")

        union = spark.createDataFrame(
            [r for rows in epochs for r in rows], "doc_id long, text string")
        batch_est = hll_distinct_tokens(union).first()["estimate"]
        print(f"stream == batch HLL estimate: "
              f"{hll_estimate(spark, hll_t).first()['estimate']} == {batch_est}")
        batch_front = skyline(
            union.select("doc_id", F.length("text").alias("x"),
                         F.size(F.array_distinct(tokenize("text"))).alias("y")),
            "x", "y")
        print(f"stream == batch frontier: "
              f"{frontier(spark, sky_t).count()} == {batch_front.count()} rows")
        hits = live_phrase_search(spark, idx_t, ["the", "quick"])
        print("live phrase ['the', 'quick'] hits:",
              [(r["doc_id"], r["first_pos"]) for r in hits.collect()])


if __name__ == "__main__":
    main()
