"""Streaming = batch equivalence: the AvailableNow streaming plans must
produce exactly the batch aggregation results over the same files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nonconsumptive_spark import streaming as st
from nonconsumptive_spark.queries import load
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # Stage the events table as a multi-file parquet directory (micros
    # timestamps — our own writes, so the nanos quirk of the source file
    # does not apply).
    d = tmp_path_factory.mktemp("events_stream")
    load(spark, SF_SMALL, "events").repartition(4).write.mode("overwrite").parquet(str(d / "data"))
    return str(d / "data")


def test_tumbling_stream_equals_batch(spark, events_dir):
    stream = st.tumbling_stream(st.stream_events(spark, events_dir), width="1 hour")
    got = st.run_available_now(stream, "t_tumbling")
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert g == b and len(g) > 0


def test_session_stream_equals_batch(spark, events_dir):
    stream = st.sessionized_stream(st.stream_events(spark, events_dir), gap="30 minutes")
    got = st.run_available_now(stream, "t_session")
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events", "total_value")
    )
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert g == b and len(g) > 0


def test_watermark_drops_nothing_on_backlog(spark, events_dir):
    # AvailableNow over a static backlog with a generous watermark must not
    # drop rows: total event count through the stream equals the file count.
    stream = (
        st.stream_events(spark, events_dir)
        .withWatermark("ts", "10 days")
        .groupBy()
        .agg(F.count("*").alias("n"))
    )
    got = st.run_available_now(stream, "t_count")
    n_stream = got.collect()[0]["n"]
    n_batch = spark.read.parquet(events_dir).count()
    assert n_stream == n_batch
