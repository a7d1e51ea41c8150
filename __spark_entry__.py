"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``nonconsumptive_spark/``; this module only
adapts the registry to the driver's interface.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from nonconsumptive_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7 phase 0): full text-pipeline spine on
    sf0.001 — tokenize → per-doc counts → global vocabulary → broadcast
    encode — returning the top-100 vocabulary rows with their encoded
    corpus totals (small, stable schema; driver collects)."""
    from pyspark.sql import functions as F

    from nonconsumptive_spark.operators import wordcount as wc

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = wc.vocabulary(docs)
    encoded = wc.encode_unigrams(docs, vocab)
    totals = encoded.groupBy("wordid").agg(F.sum("count").alias("total_count"))
    return (
        vocab.join(totals, "wordid")
        .select("wordid", "token", "total_count")
        .orderBy("wordid")
        .limit(100)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; approximate /
    non-relational ops are omitted (driver records rows-only checks)."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
