"""Streaming Holt linear-trend monitor: maintain the daily event-count
series across micro-batches and serve the Holt (level, trend, forecast
error) table — the live form of the batch fold
(``operators/grouped.holt_linear_daily``).

State discipline: the committed table stores the DAY-COUNT spine plus an
append-only (ts, event_id) watermark.  Day counts merge ADDITIVELY per
epoch (a batch only touches the days it carries), and the Holt fold is
re-run over the whole committed spine on read — the spine is
corpus-age-bounded (one row per day), so the refold is O(days) and
chunked == batch equality is trivially bit-exact: both paths fold the
SAME (day, n_events) frame through the SAME kernel.

Event-time discipline: append-only — a batch row at or before the
committed (ts, event_id) watermark is a replayed or late observation and
is dropped (an already-merged day must never double-count).  Duplicate
event_ids within one micro-batch are dropped before counting.
Exactly-once across foreachBatch's at-least-once replays comes from the
shared epoch guard + versioned-commit scheme (streaming/corpus.py).

Scale notes: per-epoch work is one day agg over the batch, one union
with the committed spine, one day agg over the (tiny) union; state is
one row per day plus two watermark scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nonconsumptive_spark.operators.grouped import (
    HOLT_ALPHA,
    HOLT_BETA,
    holt_from_day_counts,
)
from nonconsumptive_spark.streaming.corpus import (
    _commit_epoch,
    _prune_versions,
    _version_dir,
    applied_epoch,
    committed_table,
)

STATE_COLS = ("day", "n_events", "wm_ts", "wm_eid")


def merge_holt_days(batch: DataFrame, table_dir: str,
                    epoch_id: int = 0) -> bool:
    """Fold one micro-batch of (event_id, ts) rows into the committed
    day-count spine.  Returns False (no-op) when ``epoch_id`` was
    already applied."""
    if epoch_id <= applied_epoch(table_dir):
        return False
    batch = batch.dropDuplicates(["event_id"])
    current = committed_table(batch.sparkSession, table_dir)
    if current is not None:
        wm = current.agg(
            F.max("wm_ts").alias("wm_ts"),
            F.max("wm_eid").alias("wm_eid")).collect()[0]
        if wm["wm_ts"] is None:  # committed spine exists but is empty
            fresh = batch
        else:
            fresh = batch.filter(
                (F.col("ts") > F.lit(wm["wm_ts"]))
                | ((F.col("ts") == F.lit(wm["wm_ts"]))
                   & (F.col("event_id") > F.lit(wm["wm_eid"])))
            )
    else:
        fresh = batch
    days = (
        fresh.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    new_wm = fresh.agg(
        F.max(F.struct("ts", "event_id")).alias("m")).select(
        F.col("m.ts").alias("nw_ts"), F.col("m.event_id").alias("nw_eid"))
    if current is not None:
        merged_days = (
            current.select("day", "n_events")
            .unionByName(days.select("day", "n_events"))
            .groupBy("day")
            .agg(F.sum("n_events").cast("long").alias("n_events"))
        )
        prev_wm = current.select(F.col("wm_ts").alias("nw_ts"),
                                 F.col("wm_eid").alias("nw_eid")).limit(1)
        wm_frame = (
            new_wm.unionByName(prev_wm)
            .agg(F.max(F.struct("nw_ts", "nw_eid")).alias("m"))
            .select(F.col("m.nw_ts").alias("wm_ts"),
                    F.col("m.nw_eid").alias("wm_eid"))
        )
    else:
        merged_days = days.select("day", "n_events")
        wm_frame = new_wm.select(F.col("nw_ts").alias("wm_ts"),
                                 F.col("nw_eid").alias("wm_eid"))
    merged = merged_days.crossJoin(F.broadcast(wm_frame))
    prev = applied_epoch(table_dir)
    merged.write.mode("overwrite").parquet(
        str(_version_dir(table_dir, epoch_id)))
    _commit_epoch(table_dir, epoch_id)
    if prev >= 0:
        _prune_versions(table_dir, prev)
    return True


def monitor(spark: SparkSession, table_dir: str,
            alpha: float = HOLT_ALPHA,
            beta: float = HOLT_BETA) -> DataFrame | None:
    """The Holt (day, n_events, level, trend, forecast_err) table over
    the committed day spine (None before the first commit) — the same
    kernel the batch operator runs, so stream-of-chunks == batch
    bit-for-bit."""
    cur = committed_table(spark, table_dir)
    if cur is None:
        return None
    return holt_from_day_counts(cur.select("day", "n_events"),
                                alpha=alpha, beta=beta)


def start_incremental_holt(event_stream: DataFrame, table_dir: str,
                           checkpoint_dir: str):
    """foreachBatch wiring: fold each micro-batch into the committed day
    spine, AvailableNow trigger (the backlog-draining form every
    incremental sink here uses)."""
    def fold(batch, epoch_id):
        merge_holt_days(batch, table_dir, epoch_id=epoch_id)

    return (
        event_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
