"""Registration staging: (spark_fn, oracle_sql) pairs for operators not
yet promoted into the judged registry.

NOT imported by ``queries/__init__.all_queries`` — the driver never sees
these until promotion — but continuously verified against DuckDB by
``tests/test_staging.py`` with the exact dtype-strict compare the driver
gate uses (sf0.001 in the suite; ``python tools/check_staged.py`` for
sf0.01), and censused pre-promotion by tools/plan_census.py.  Promotion
= re-home the entry into a topic module (or promote the whole file in
place, like the r5/r6/r7/r8 cohorts: ``queries/promoted.py``,
``queries/promoted_r6.py``, ``queries/promoted_r7.py``,
``queries/promoted_r8.py``) with ``@register`` and append its name to
the PRIORITY queue.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (used by staged entries)

from nonconsumptive_spark.queries import load  # noqa: F401

STAGED: dict[str, tuple] = {}


def _stage(name: str, oracle: str):
    def deco(fn):
        STAGED[name] = (fn, oracle)
        return fn

    return deco


# -- LEFT OUTER watermark stream-stream join, batch/registry form ------------
@_stage(
    "q_click_attribution_outer",
    """
    WITH clicks AS (
      SELECT user_id AS c_user, ts AS click_ts, event_id AS click_id
      FROM events WHERE event_type = 'click'),
    purchases AS (
      SELECT user_id AS p_user, ts AS purchase_ts,
             event_id AS purchase_id, value AS amount
      FROM events WHERE event_type = 'purchase')
    SELECT c.c_user AS user_id,
           c.click_id,
           strftime(c.click_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           p.purchase_id,
           strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           round(p.amount, 2) AS amount
    FROM clicks c
    LEFT JOIN purchases p
      ON c.c_user = p.p_user
     AND c.click_ts <= p.purchase_ts
     AND p.purchase_ts <= c.click_ts + INTERVAL '1 hour'
    """,
)
def q_click_attribution_outer(spark, sf_dir):
    """LEFT OUTER event-time-bounded attribution: EVERY click emits — with
    its same-user purchases in (click_ts, click_ts + 1h] when they exist,
    with NULL purchase columns when none do.  The batch/registry face of
    the watermarked LEFT OUTER stream-stream join
    (streaming/joins.py:click_purchase_attribution_outer, r7-staged,
    pinned by tests/test_streaming.py — unmatched clicks only NULL-emit
    once the global watermark passes their match horizon; in batch the
    watermark is a no-op, so this exact function is its own oracle).
    Plan: both sides shuffle once on user_id, per-key range predicate
    evaluated inside the join — state/memory is O(events in the 1h+
    watermark horizon) streaming, plain SortMergeJoin batch; no global
    structure, safe at 100x."""
    from nonconsumptive_spark.streaming.joins import (
        click_purchase_attribution_outer,
    )

    joined = click_purchase_attribution_outer(
        load(spark, sf_dir, "events"), within="1 hour")
    return joined.select(
        "user_id", "click_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        "purchase_id",
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss")
        .alias("purchase_ts"),
        F.round("amount", 2).alias("amount"),
    )
