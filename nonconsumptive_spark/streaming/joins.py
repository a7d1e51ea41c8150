"""Stream-stream joins with event-time bounds (Structured Streaming).

Absent from the reference entirely (batch-only, SURVEY §2.9); this is the
standard attribution shape for event pipelines: match each ``purchase`` to
the same user's preceding ``click`` within a time window.

State-bound reasoning (the part that matters at scale): without a time
bound, a stream-stream join must buffer BOTH streams forever.  The
watermark on each side plus the join's time-range predicate lets Spark
evict state older than ``watermark + within`` — state is O(events in the
horizon), not O(stream history).  Both sides shuffle on ``user_id``; the
per-key state store is partitioned with the shuffle, no global structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_attribution(events: DataFrame, within: str = "1 hour",
                               watermark: str = "2 hours") -> DataFrame:
    """Inner join: purchases to same-user clicks with
    click.ts <= purchase.ts <= click.ts + within.

    Works identically on a streaming or batch ``events`` frame: watermarks
    are no-ops in batch, so the batch run of this exact function is the
    correctness oracle for the streaming run (asserted in tests).
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("amount"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}"))
    )
    return clicks.join(purchases, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "amount",
    )
