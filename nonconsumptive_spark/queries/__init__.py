"""Named query registry: the driver-facing judged surface.

Each entry pairs a Spark DataFrame builder with an equivalent ANSI-SQL
oracle string for DuckDB (run by the driver at sf0.01 and hash-compared,
see ``/root/repo/__spark_entry__.py``).  Conventions that make the
hash-compare stable:

  * every computed column is aliased identically on both sides;
  * integer aggregates are cast to BIGINT on the DuckDB side (DuckDB sums
    integers into HUGEINT, Spark into LongType);
  * doubles are rounded to a fixed number of decimals on both sides;
  * timestamps are formatted to 'yyyy-MM-dd HH:mm:ss' strings on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None => non-SQL-expressible; driver does rows-only
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn):
        REGISTRY[name] = Query(name=name, spark_fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a test table.  The driver's ``events.parquet`` carries
    nanosecond-precision timestamps, which Spark's parquet reader rejects;
    read them as raw int64 nanos and truncate to microseconds (exactly what
    DuckDB's reader does, so the oracle agrees)."""
    path = f"{sf_dir}/{table}.parquet"
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    df = spark.read.parquet(path)
    if table in ("documents", "embeddings"):
        # These tables feed CPU-heavy per-row operators (tokenize, md5
        # minhash, cosine).  The test files are a single row group, i.e. a
        # single input split — without a fan-out the whole pipeline runs on
        # one core.  At production scale inputs arrive as many splits and
        # this is a no-op (guarded on the actual split count).
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < min(target, 8):
            df = df.repartition(target)
    return df


def all_queries() -> dict[str, Query]:
    # Import side-effect modules exactly once.
    from nonconsumptive_spark.queries import (  # noqa: F401
        dedup,
        events,
        multimodal,
        relational,
        scalar,
        similarity,
        text,
        textstats,
    )

    return REGISTRY
