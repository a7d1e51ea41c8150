from nonconsumptive_spark.streaming.events import (
    dedup_stream,
    run_available_now,
    sessionized_stream,
    stream_events,
    tumbling_stream,
)
from nonconsumptive_spark.streaming.corpus import (
    start_incremental_wordcounts,
    stream_documents,
)
from nonconsumptive_spark.streaming.joins import click_purchase_attribution
from nonconsumptive_spark.streaming.sinks import start_upsert_sink, upsert_parquet
from nonconsumptive_spark.streaming.stateful import running_user_profile

__all__ = [
    "dedup_stream",
    "stream_events",
    "tumbling_stream",
    "sessionized_stream",
    "run_available_now",
    "running_user_profile",
    "click_purchase_attribution",
    "start_upsert_sink",
    "upsert_parquet",
    "stream_documents",
    "start_incremental_wordcounts",
]
