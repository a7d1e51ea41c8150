"""Stage decomposition of q_ppjoin_pairs (guide §1.1: find where the
time actually goes before changing anything).  Times, warm (min of 2):
  a) pp_shingles materialization (tokenize + shingle corpus)
  b) pp_exploded materialization
  c) pp_prefix materialization (df count-window + per-doc rank window)
  d) candidates (prefix self-join + positional filter + distinct), noop
  e) verify stage alone given materialized candidates (join arrays +
     intersect), noop
  f) full ppjoin_pairs, noop
"""
from __future__ import annotations

import json
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


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pp-stage-probe")
    docs = load(spark, sf_dir, "documents")
    threshold = 0.5
    tp, tq = dd._threshold_fraction(threshold)
    out: dict[str, float] = {}

    def timed(name, fn, passes=2):
        best = None
        for _ in range(passes):
            t0 = time.time()
            r = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        return r

    spark.range(1000).selectExpr("sum(id)").collect()
    # warm the scan/tokenize
    _noop(dd.doc_shingles(docs))

    sh = timed("a_shingles", lambda: materialize_once(
        dd.doc_shingles(docs), "pp_shingles"))
    exploded = timed("b_exploded", lambda: materialize_once(
        sh.select(F.col("doc_id"), F.explode("shingles").alias("shingle")),
        "pp_exploded"))
    sizes = sh.select(F.col("doc_id"),
                      F.size("shingles").cast("long").alias("n"))
    prefix = timed("c_prefix", lambda: materialize_once(
        dd._pp_rank_prefix(exploded, None, sizes, "doc_id", tp, tq),
        "pp_prefix"))

    pa = prefix.select(F.col("doc_id").alias("doc_a"), "shingle",
                       F.col("n").alias("na"), F.col("pos").alias("pa"))
    pb = prefix.select(F.col("doc_id").alias("doc_b"), "shingle",
                       F.col("n").alias("nb"), F.col("pos").alias("pb"))
    nanb = F.col("na") + F.col("nb")
    overlap_floor = dd._ceil_div(F.lit(tp) * nanb, tp + tq)
    best_overlap = F.least(F.col("na") - F.col("pa"),
                           F.col("nb") - F.col("pb")) + 1
    cands_df = (
        pa.join(pb, "shingle")
        .filter((F.col("doc_a") < F.col("doc_b"))
                & (F.col("nb") >= dd._ceil_mul(F.col("na"), tp, tq))
                & (F.col("na") >= dd._ceil_mul(F.col("nb"), tp, tq))
                & (best_overlap >= overlap_floor))
        .select("doc_a", "doc_b", "na", "nb")
        .distinct()
    )
    timed("d_candidates_noop", lambda: _noop(cands_df))
    cands = materialize_once(cands_df, "pp_cands")

    arr_a = sh.select(F.col("doc_id").alias("doc_a"),
                      F.col("shingles").alias("sh_a"))
    arr_b = sh.select(F.col("doc_id").alias("doc_b"),
                      F.col("shingles").alias("sh_b"))
    inter = (
        cands.join(arr_a, "doc_a").join(arr_b, "doc_b")
        .select("doc_a", "doc_b", "na", "nb",
                F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
                .alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    verify = (inter.withColumn("jaccard", F.round(jac, 4))
              .filter(F.col("jaccard") >= threshold)
              .select("doc_a", "doc_b", "jaccard"))
    timed("e_verify_noop", lambda: _noop(verify))
    timed("f_full_query", lambda: _noop(
        dd.ppjoin_pairs(docs, threshold=threshold)))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
