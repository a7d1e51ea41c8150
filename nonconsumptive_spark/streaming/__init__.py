from nonconsumptive_spark.streaming.events import (
    run_available_now,
    sessionized_stream,
    stream_events,
    tumbling_stream,
)

__all__ = [
    "stream_events",
    "tumbling_stream",
    "sessionized_stream",
    "run_available_now",
]
