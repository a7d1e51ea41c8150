"""Structured Streaming variants of the event-time operators (SURVEY §2.9).

The reference is batch-only (its "streams" are generator pipelines with
byte-budget micro-batching, data_storage.py:154-161); these are the
extension surface the repo north-star asks for: the SAME aggregations as
``queries/events.py`` — tumbling and session windows — under
``readStream`` with watermarks for late data.

The batch queries are the oracle: with ``Trigger.AvailableNow`` over a
static directory, complete-mode results must equal the batch plan's
(asserted in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """File-source stream over an events directory (schema must be declared
    for streaming reads)."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .load(path)
    )


def tumbling_stream(events: DataFrame, width: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time aggregation with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionized_stream(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "2 hours") -> DataFrame:
    """Session windows (gap-merged) per user under a watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def dedup_stream(events: DataFrame, keys: list[str] | None = None,
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact deduplication: first occurrence per key wins;
    duplicate arrivals inside the watermark horizon are dropped.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state store by event
    time — the streaming rendering of the reference's seen-set duplicate
    suppression on ingest (inputs.py:86-94, SURVEY §2.3-J7), which kept an
    unbounded in-memory set.  State is partitioned by key across executors;
    no global structure."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_available_now(agg: DataFrame, query_name: str,
                      mode: str = "complete", timeout_sec: int = 120) -> DataFrame:
    """Drain all currently-available input through the streaming plan into
    an in-memory sink; return the result table.  This is the
    batch-equivalence harness: AvailableNow processes the full backlog then
    stops (the streaming analog of one batch run)."""
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    spark = agg.sparkSession
    return spark.table(query_name)
