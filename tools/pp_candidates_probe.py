"""Measure PPJoin candidate volume at sf0.1: rows out of the prefix
self-join, distinct pairs under the current per-row positional filter,
and distinct pairs under the aggregated PPJoin bound
(c + min(na - max_pa, nb - max_pb) >= overlap_floor).  Read-only probe —
informs the r9 PPJoin+ candidate-tightening change (guide §3.2/§1.1)."""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from nonconsumptive_spark.session import get_spark
from nonconsumptive_spark.queries import load
from nonconsumptive_spark.operators import dedup as dd
from nonconsumptive_spark.plans.checkpoint import materialize_once


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    docs = load(spark, sf_dir, "documents")
    threshold = 0.5
    tp, tq = dd._threshold_fraction(threshold)
    sh = materialize_once(dd.doc_shingles(docs), "pp_shingles")
    exploded = materialize_once(
        sh.select(F.col("doc_id"), F.explode("shingles").alias("shingle")),
        "pp_exploded")
    sizes = sh.select(F.col("doc_id"), F.size("shingles").cast("long").alias("n"))
    prefix = materialize_once(
        dd._pp_rank_prefix(exploded, None, sizes, "doc_id", tp, tq), "pp_prefix")

    pa = prefix.select(F.col("doc_id").alias("doc_a"), "shingle",
                       F.col("n").alias("na"), F.col("pos").alias("pa"))
    pb = prefix.select(F.col("doc_id").alias("doc_b"), "shingle",
                       F.col("n").alias("nb"), F.col("pos").alias("pb"))
    nanb = F.col("na") + F.col("nb")
    overlap_floor = dd._ceil_div(F.lit(tp) * nanb, tp + tq)
    best_overlap = F.least(F.col("na") - F.col("pa"),
                           F.col("nb") - F.col("pb")) + 1
    joined = (
        pa.join(pb, "shingle")
        .filter((F.col("doc_a") < F.col("doc_b"))
                & (F.col("nb") >= dd._ceil_mul(F.col("na"), tp, tq))
                & (F.col("na") >= dd._ceil_mul(F.col("nb"), tp, tq)))
    )
    n_joined = joined.count()
    cur = joined.filter(best_overlap >= overlap_floor) \
                .select("doc_a", "doc_b", "na", "nb").distinct()
    n_cur = cur.count()
    agg = (
        joined.groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("c"),
             F.max("pa").alias("mpa"), F.max("pb").alias("mpb"))
        .filter(F.col("c") + F.least(F.col("na") - F.col("mpa"),
                                     F.col("nb") - F.col("mpb"))
                >= dd._ceil_div(F.lit(tp) * (F.col("na") + F.col("nb")), tp + tq))
    )
    n_agg = agg.count()
    n_final = dd.ppjoin_pairs(docs, threshold=threshold).count()
    print({"prefix_join_rows": n_joined,
           "candidates_current": n_cur,
           "candidates_aggregated_bound": n_agg,
           "final_pairs": n_final})


if __name__ == "__main__":
    main()
