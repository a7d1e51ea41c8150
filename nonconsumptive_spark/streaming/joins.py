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


def click_purchase_attribution_outer(events: DataFrame, within: str = "1 hour",
                                     watermark: str = "2 hours") -> DataFrame:
    """LEFT OUTER stream-stream join: every click, matched to same-user
    purchases in (click_ts, click_ts + within] — and clicks with NO such
    purchase still emit, with NULL purchase columns.

    The hardening over the inner form: an outer stream-stream join can
    only emit the unmatched side once the watermark has passed the
    match horizon (click_ts + within + watermark) — before that, a
    matching purchase could still arrive, so Spark holds the click in
    state.  Consequences tests pin down (tests/test_streaming.py):

      * a click with no purchase emits exactly one NULL row, but only
        after later event-time has advanced the watermark past its
        horizon — an unmatched click near the end of the stream is
        WITHHELD at shutdown, not emitted with NULLs (state outlives
        the run and would resume from the checkpoint);
      * on a batch frame the watermark is a no-op and this function is
        its own oracle: plain left-outer join, every unmatched click
        NULL-emitted immediately.

    State bound is the inner join's plus the held unmatched clicks:
    O(events within watermark + within), keyed and partitioned by
    user_id — no global structure."""
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
    return clicks.join(purchases, cond, "leftOuter").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "amount",
    )
