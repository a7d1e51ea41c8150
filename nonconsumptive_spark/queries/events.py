"""Event-time queries over `events` (SURVEY §2.9 batch forms + F18 JSON).

The same logic runs under Structured Streaming (see
``nonconsumptive_spark/streaming/``); here it is executed in batch so the
DuckDB oracle can check it.  Timestamps are emitted as formatted strings so
the value-hash is timezone-stable.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nonconsumptive_spark.queries import load, register


# --------------------------------------------------------------------------
@register(
    "q_events_tumbling",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling event-time window aggregation (batch form of the streaming "
        "operator; SURVEY §2.9).",
)
def q_events_tumbling(spark, sf_dir):
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
@register(
    "q_events_sliding",
    oracle="""
    SELECT strftime(win, '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM (
      SELECT unnest([
               time_bucket(INTERVAL '30 minutes', ts),
               time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
             ]) AS win,
             value
      FROM events)
    WHERE win IS NOT NULL
    GROUP BY 1
    """,
    doc="Sliding window (1h width, 30m slide): each event lands in 2 windows. "
        "Oracle enumerates the two member windows per event explicitly.",
)
def q_events_sliding(spark, sf_dir):
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
@register(
    "q_events_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="Session windows with a 30-minute gap (SURVEY §2.9): Spark uses the "
        "built-in session_window; the oracle derives identical sessions via "
        "gaps-and-islands.",
)
def q_events_session(spark, sf_dir):
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
@register(
    "q_events_json",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(CASE WHEN json_valid(props)
                              THEN json_extract_string(props, '$.k') END
                         AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="F18: JSON field extraction from a string column, then aggregate.  "
        "Malformed JSON yields NULL in Spark's get_json_object; the oracle "
        "needs an explicit json_valid guard because DuckDB's extractor "
        "raises on bad input instead.",
)
def q_events_json(spark, sf_dir):
    return (
        load(spark, sf_dir, "events")
        .select("event_type", F.get_json_object("props", "$.k").cast("long").alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
@register(
    "q_events_user_running",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS running_value
    FROM events
    """,
    doc="Analytic frame (running sum per user) — extension window surface "
        "(SURVEY §2.5 note).",
)
def q_events_user_running(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


# --------------------------------------------------------------------------
@register(
    "q_click_attribution",
    oracle="""
    SELECT p.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           round(p.value, 2) AS amount
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.ts <= p.ts
     AND p.ts <= c.ts + INTERVAL '1 hour'
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    doc="Event-time-bounded self-join (attribution: purchase to same-user "
        "click within 1 hour) — the batch oracle for the stream-stream join "
        "in streaming/joins.py, which runs the SAME function under "
        "watermarked readStream (equivalence asserted in tests).",
)
def q_click_attribution(spark, sf_dir):
    from nonconsumptive_spark.streaming.joins import click_purchase_attribution

    joined = click_purchase_attribution(load(spark, sf_dir, "events"), within="1 hour")
    return joined.select(
        "user_id", "click_id", "purchase_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.round("amount", 2).alias("amount"),
    )


# --------------------------------------------------------------------------
@register(
    "q_asof_join",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
    purchases AS (
      SELECT user_id, ts, event_id AS purchase_id
      FROM events WHERE event_type = 'purchase')
    SELECT p.user_id, p.purchase_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           c.click_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
    FROM purchases p ASOF JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="As-of join (operator Spark lacks natively, operators/asof.py): "
        "each purchase matched to the user's most recent click at-or-before "
        "it — tagged-union + one window pass, single shuffle on the key; "
        "oracle is DuckDB's native ASOF JOIN.  Right side deduped per "
        "(user, ts) so the match is deterministic on both engines.",
)
def q_asof_join(spark, sf_dir):
    from nonconsumptive_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("click_ts", F.col("ts"))
        .select("user_id", "ts", "click_id", "click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["click_id", "click_ts"], how="inner",
    )
    return joined.select(
        "user_id", "purchase_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "click_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
    )


# --------------------------------------------------------------------------
@register(
    "q_pivot_event_values",
    oracle="""
    SELECT user_id,
           round(coalesce(sum(value) FILTER (event_type = 'click'), 0), 2) AS click_v,
           round(coalesce(sum(value) FILTER (event_type = 'view'), 0), 2) AS view_v,
           round(coalesce(sum(value) FILTER (event_type = 'purchase'), 0), 2) AS purchase_v,
           round(coalesce(sum(value) FILTER (event_type = 'signup'), 0), 2) AS signup_v,
           round(coalesce(sum(value) FILTER (event_type = 'error'), 0), 2) AS error_v
    FROM events
    GROUP BY user_id
    """,
    doc="Pivot (extension; long→wide): per-user value totals, one column "
        "per event type — Spark .pivot() with an explicit value list (no "
        "distinct-discovery job); oracle uses filtered aggregates.",
)
def q_pivot_event_values(spark, sf_dir):
    types = ["click", "view", "purchase", "signup", "error"]
    wide = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .sum("value")
    )
    return wide.select(
        "user_id",
        *[F.round(F.coalesce(F.col(t), F.lit(0.0)), 2).alias(f"{t}_v") for t in types],
    )


# --------------------------------------------------------------------------
@register(
    "q_user_value_trend",
    oracle="""
    WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events),
    pts AS (SELECT user_id, count(*) AS n FROM e GROUP BY user_id),
    slopes AS (
      SELECT a.user_id,
             (b.value - a.value) / (b.t - a.t) * 3600000000.0 AS s
      FROM e a JOIN e b ON a.user_id = b.user_id AND a.t < b.t)
    SELECT p.user_id, CAST(p.n AS BIGINT) AS n_points,
           round(median(s.s), 4) AS slope_per_hour
    FROM pts p JOIN slopes s USING (user_id)
    WHERE p.n >= 3
    GROUP BY p.user_id, p.n
    """,
    doc="Grouped-map applyInPandas surface (SURVEY §2.10 per-document "
        "generator): Theil–Sen robust trend per user — the median of all "
        "pairwise slopes, an order-statistic over O(n²) derived values "
        "that no built-in aggregate expresses.  DuckDB recomputes it via "
        "self-join + median; both engines do float64 per-pair arithmetic "
        "then a continuous median, so values hash-match.",
)
def q_user_value_trend(spark, sf_dir):
    from nonconsumptive_spark.operators.grouped import user_value_trend

    return user_value_trend(load(spark, sf_dir, "events"), min_points=3)


# --------------------------------------------------------------------------
@register(
    "q_funnel_stages",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS tv FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS tc
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.tv
      WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.tc
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_view_click_purchase
    """,
    doc="Funnel analysis (event-sequence extension): users entering each "
        "stage of view → click → purchase, each stage strictly after the "
        "user's first entry into the previous one.  Three stage aggs "
        "chained by user-keyed joins; each stage frame is one row per "
        "surviving user, so the joins shrink monotonically.",
)
def q_funnel_stages(spark, sf_dir):
    ev = load(spark, sf_dir, "events")

    def stage(prev, etype, tcol):
        e = ev.filter(F.col("event_type") == etype)
        if prev is None:
            return e.groupBy("user_id").agg(F.min("ts").alias(tcol))
        prev_t = prev.columns[-1]
        return (
            e.join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(tcol))
        )

    v = stage(None, "view", "tv")
    c = stage(v, "click", "tc")
    p = stage(c, "purchase", "tp")
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_view_click_purchase")))
    )


# --------------------------------------------------------------------------
@register(
    "q_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
           CAST((epoch(a.wk) - epoch(f.cohort)) // 604800 AS BIGINT) AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
    doc="Retention cohorts (event extension): users grouped by first-seen "
        "week, counted per activity-week offset.  Both engines truncate "
        "weeks to Monday and the offset is exact epoch arithmetic, so the "
        "matrix hash-matches.  Two aggs + one user-keyed join.",
)
def q_retention_cohorts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    # datediff instead of unix_timestamp: works for both TIMESTAMP and
    # TIMESTAMP_NTZ ts columns (the test parquet carries no tz annotation,
    # so Spark reads it as NTZ, which unix_timestamp rejects).  Both sides
    # are week-truncated midnights, so the day difference is an exact
    # multiple of 7.
    offset = (
        F.datediff(F.col("wk").cast("date"), F.col("cohort").cast("date")) / 7
    ).cast("long")
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            offset.alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


# --------------------------------------------------------------------------
@register(
    "q_sessionize_lag",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    sessions AS (
      SELECT user_id, ts, event_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM gaps)
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           CAST(count(*) AS BIGINT) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM sessions
    GROUP BY user_id, session_no
    """,
    doc="Sessionization, lag+cumsum formulation (the batch-classic dual of "
        "session_window used by q_events_session): a gap >30min opens a new "
        "session; running sum of gap flags numbers the sessions.  Ordering "
        "key (ts, event_id) is total, so both engines agree exactly.  Gaps "
        "compare at MICROSECOND precision (timestamp-difference interval) "
        "to match the oracle's exact comparison — a second-truncated cast would "
        "flip session numbering for same-user gaps within ~1s of the "
        "threshold.",
)
def q_sessionize_lag(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestamp subtraction yields a day-time interval at microsecond
    # precision and works for both TIMESTAMP and TIMESTAMP_NTZ (the test
    # parquet carries no tz annotation, so Spark reads NTZ, which
    # unix_micros rejects) — same exact comparison the oracle makes
    gap = F.col("ts") - F.lag("ts").over(w)
    is_new = F.when(
        gap.isNull() | (gap > F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.select(
        "user_id", "ts", "event_id",
        F.sum(is_new).over(wr).cast("long").alias("session_no"),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


# --------------------------------------------------------------------------
_US_EXPR = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
_RJ_LO = -1_800_000_000  # 30 minutes before, in microseconds
_RJ_HI = 0               # ...up to (exclusive) the purchase instant


@register(
    "q_range_join_events",
    oracle=f"""
    WITH p AS (
      SELECT event_id, user_id, epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS lus
      FROM events WHERE event_type = 'purchase'),
    c AS (
      SELECT user_id, epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS rus
      FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           CAST(count(c.rus) AS BIGINT) AS n_prior_clicks
    FROM p LEFT JOIN c
      ON c.user_id = p.user_id
     AND c.rus - p.lus >= {_RJ_LO} AND c.rus - p.lus < {_RJ_HI}
    GROUP BY p.event_id, p.user_id
    """,
    doc="Range (interval) join — operator Spark lacks natively "
        "(operators/asof.py:bucketed_range_join): clicks within the 30 "
        "minutes before each purchase, counted per purchase.  Spark side "
        "is a bucketed EQUI-join on (user, time-bucket) with 2x bounded "
        "left amplification — never a per-key cross product; oracle is the "
        "naive inequality join (fine at oracle SF).",
)
def q_range_join_events(spark, sf_dir):
    from nonconsumptive_spark.operators.asof import bucketed_range_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.expr(_US_EXPR).alias("lus"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.expr(_US_EXPR).alias("rus"))
    pairs = bucketed_range_join(
        purchases, clicks, on="user_id", left_us="lus", right_us="rus",
        lo_us=_RJ_LO, hi_us=_RJ_HI,
    )
    counts = pairs.groupBy("event_id").agg(
        F.count("*").cast("long").alias("n_prior_clicks"))
    return (
        purchases.join(counts, "event_id", "left")
        .select(
            "event_id", "user_id",
            F.coalesce("n_prior_clicks", F.lit(0)).cast("long")
             .alias("n_prior_clicks"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "q_zscore_outliers",
    oracle="""
    WITH q AS (
      SELECT event_id, event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vq
      FROM events),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(vq) AS BIGINT) AS sv,
             CAST(sum(vq * vq) AS BIGINT) AS svv
      FROM q GROUP BY event_type)
    SELECT q.event_id, q.event_type, q.vq,
           round(CASE WHEN s.n * s.svv - s.sv * s.sv > 0
                 THEN CAST(s.n * q.vq - s.sv AS DOUBLE)
                      / sqrt(CAST(s.n * s.svv - s.sv * s.sv AS DOUBLE))
                 ELSE 0.0 END, 4) + 0.0 AS zscore,
           (s.n * q.vq - s.sv) * (s.n * q.vq - s.sv)
             > 3 * (s.n * s.svv - s.sv * s.sv) AS is_outlier
    FROM q JOIN s USING (event_type)
    """,
    doc="Per-group z-score outlier flagging (population std over per-type "
        "value distributions).  Hash-parity design: values quantized to "
        "integer cents, group moments are exact BIGINT sums, and both the "
        "z-score (one identical div+sqrt over exact ints) and the outlier "
        "flag (pure integer inequality, z^2 > 3) never accumulate floats "
        "in engine order.  Plan: tiny per-type moment agg BROADCAST back "
        "onto the events scan — one map-side-combined agg, no window, no "
        "second shuffle.  Integer headroom: (n*vq-S)^2 stays under 2^63 "
        "through ~sf0.3; larger SFs would move the flag compare to double.",
)
def q_zscore_outliers(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    q = ev.select(
        "event_id", "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
         .alias("vq"),
    )
    s = q.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("vq").cast("long").alias("sv"),
        F.sum(F.col("vq") * F.col("vq")).cast("long").alias("svv"),
    )
    num = F.col("n") * F.col("vq") - F.col("sv")
    den = F.col("n") * F.col("svv") - F.col("sv") * F.col("sv")
    return (
        q.join(F.broadcast(s), "event_type")
        .select(
            "event_id", "event_type", "vq",
            (F.round(
                F.when(den > 0,
                       num.cast("double") / F.sqrt(den.cast("double")))
                 .otherwise(F.lit(0.0)), 4) + F.lit(0.0)).alias("zscore"),
            (num * num > F.lit(3) * den).alias("is_outlier"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "q_winsorize",
    oracle="""
    WITH q AS (
      SELECT event_id, event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vq
      FROM events),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
          FROM q GROUP BY event_type),
    dist AS (SELECT event_type, vq, CAST(count(*) AS BIGINT) AS c
             FROM q GROUP BY event_type, vq),
    cum AS (
      SELECT event_type, vq,
             sum(c) OVER (PARTITION BY event_type ORDER BY vq) AS cum
      FROM dist),
    bounds AS (
      SELECT c.event_type,
             min(CASE WHEN c.cum >= ceil(0.05 * n.n) THEN c.vq END) AS lo,
             min(CASE WHEN c.cum >= ceil(0.95 * n.n) THEN c.vq END) AS hi
      FROM cum c JOIN n ON n.event_type = c.event_type
      GROUP BY c.event_type)
    SELECT q.event_id, q.event_type, q.vq,
           greatest(b.lo, least(b.hi, q.vq)) AS vq_clipped,
           (q.vq < b.lo OR q.vq > b.hi) AS is_clipped
    FROM q JOIN bounds b ON b.event_type = q.event_type
    """,
    doc="Per-group winsorization (clip at discrete P05/P95).  Exact "
        "percentiles WITHOUT sorting the data: boundaries come from a "
        "cumulative sum over the per-group distribution of DISTINCT "
        "quantized values (the DSIR score-histogram trick), so the only "
        "window runs over distinct-value rows, and the tiny (type, lo, hi) "
        "table broadcasts back onto the scan.  All compared columns are "
        "exact BIGINTs/booleans.",
)
def q_winsorize(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    q = ev.select(
        "event_id", "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
         .alias("vq"),
    )
    n = q.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    dist = q.groupBy("event_type", "vq").agg(
        F.count("*").cast("long").alias("c"))
    wcum = (Window.partitionBy("event_type").orderBy("vq")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = dist.select("event_type", "vq", F.sum("c").over(wcum).alias("cum"))
    bounds = (
        cum.join(F.broadcast(n), "event_type")
        .groupBy("event_type")
        .agg(
            F.min(F.when(F.col("cum") >= F.ceil(F.lit(0.05) * F.col("n")),
                         F.col("vq"))).alias("lo"),
            F.min(F.when(F.col("cum") >= F.ceil(F.lit(0.95) * F.col("n")),
                         F.col("vq"))).alias("hi"),
        )
    )
    return (
        q.join(F.broadcast(bounds), "event_type")
        .select(
            "event_id", "event_type", "vq",
            F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("vq")))
             .alias("vq_clipped"),
            ((F.col("vq") < F.col("lo")) | (F.col("vq") > F.col("hi")))
             .alias("is_clipped"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "q_value_histogram",
    oracle="""
    SELECT event_type,
           CAST(floor(value * 100.0 + 0.5) AS BIGINT) // 5000 AS bin,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    """,
    doc="Fixed-width value histogram per event type (50.00-unit bins over "
        "integer-cent quantized values) — one map-side-combined agg; bin "
        "arithmetic is pure integer, so cross-engine exact.",
)
def q_value_histogram(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    vq = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    return (
        ev.select("event_type", (vq - (vq % 5000)) .alias("scaled"))
        .select("event_type", (F.col("scaled") / 5000).cast("long").alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count("*").cast("long").alias("n"))
    )


# --------------------------------------------------------------------------
@register(
    "q_cumulative_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    new_per_day AS (
      SELECT d0 AS day, CAST(count(*) AS BIGINT) AS new_users
      FROM first_seen GROUP BY d0)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(coalesce(n.new_users, 0)) OVER (ORDER BY d.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_users
    FROM days d LEFT JOIN new_per_day n ON n.day = d.day
    """,
    doc="Cumulative distinct users per day — the growth-curve metric.  "
        "Exact WITHOUT expanding-window count-distinct state: each user "
        "collapses to a first-seen day (one agg), daily new-user counts "
        "running-sum over the bounded day spine.  The only window runs "
        "over distinct days.",
)
def q_cumulative_users(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"))
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    new_per_day = first_seen.groupBy(F.col("d0").alias("day")).agg(
        F.count("*").cast("long").alias("new_users"))
    w = (Window.orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        days.join(new_per_day, "day", "left")
        .select("day", F.coalesce("new_users", F.lit(0)).cast("long")
                .alias("new_users"))
        .withColumn("cum_users", F.sum("new_users").over(w).cast("long"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                "new_users", "cum_users")
    )


# --------------------------------------------------------------------------
@register(
    "q_event_type_lift",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n_users AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events),
    tc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM ut GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS c_ab
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT p.type_a, p.type_b, p.c_ab,
           ca.c AS c_a, cb.c AS c_b,
           round(p.c_ab * 1.0 * n.n / (ca.c * cb.c), 4) + 0.0 AS lift
    FROM pairs p
    JOIN tc ca ON ca.event_type = p.type_a
    JOIN tc cb ON cb.event_type = p.type_b
    CROSS JOIN n_users n
    """,
    doc="Association lift between event types across users (market-basket "
        "form: a user is a basket of distinct event types; lift = "
        "P(a,b)/(P(a)P(b))).  All counts exact BIGINTs from a distinct-"
        "pairs self-join on the user key; one mirrored double expression.",
)
def q_event_type_lift(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n_users = ev.agg(F.countDistinct("user_id").cast("long").alias("n"))
    tc = ut.groupBy("event_type").agg(F.count("*").cast("long").alias("c"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("c_ab"))
    )
    ca = tc.select(F.col("event_type").alias("type_a"), F.col("c").alias("c_a"))
    cb = tc.select(F.col("event_type").alias("type_b"), F.col("c").alias("c_b"))
    return (
        pairs.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a", "type_b", "c_ab", "c_a", "c_b",
            (F.round(F.col("c_ab").cast("double") * F.col("n")
                     / (F.col("c_a") * F.col("c_b")), 4)
             + F.lit(0.0)).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "q_event_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events)
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(count(*) AS BIGINT) AS n
    FROM ordered WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="Per-user event-type transition counts (behavioral sequence "
        "mining — the event analog of the token Markov table).  Total "
        "order (ts, event_id) makes the lead deterministic; one "
        "user-partitioned window + one short-key agg.",
)
def q_event_transitions(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "event_type",
                  F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"),
                 F.col("next_type").alias("to_type"))
        .agg(F.count("*").cast("long").alias("n"))
    )


# --------------------------------------------------------------------------
@register(
    "q_mad_outliers",
    oracle="""
    WITH q AS (
      SELECT event_id, event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vq
      FROM events),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
          FROM q GROUP BY event_type),
    dist AS (SELECT event_type, vq, CAST(count(*) AS BIGINT) AS c
             FROM q GROUP BY event_type, vq),
    cum AS (SELECT event_type, vq,
                   sum(c) OVER (PARTITION BY event_type ORDER BY vq) AS cum
            FROM dist),
    med AS (SELECT c.event_type,
                   min(CASE WHEN c.cum >= ceil(0.5 * n.n) THEN c.vq END) AS med
            FROM cum c JOIN n USING (event_type) GROUP BY c.event_type),
    dv (event_id, event_type, vq, med, dev) AS (
      SELECT q.event_id, q.event_type, q.vq, m.med, abs(q.vq - m.med)
      FROM q JOIN med m USING (event_type)),
    ddist AS (SELECT event_type, dev, CAST(count(*) AS BIGINT) AS c
              FROM dv GROUP BY event_type, dev),
    dcum AS (SELECT event_type, dev,
                    sum(c) OVER (PARTITION BY event_type ORDER BY dev) AS cum
             FROM ddist),
    mad AS (SELECT c.event_type,
                   min(CASE WHEN c.cum >= ceil(0.5 * n.n) THEN c.dev END) AS mad
            FROM dcum c JOIN n USING (event_type) GROUP BY c.event_type)
    SELECT d.event_id, d.event_type, d.vq,
           CASE WHEN m.mad > 0
                THEN (CASE WHEN d.vq >= d.med THEN 1 ELSE -1 END
                      * ((2 * 6745 * d.dev + m.mad) // (2 * m.mad)))
                     / 10000.0
                ELSE 0.0 END AS mad_z,
           CASE WHEN m.mad > 0 THEN 6745 * d.dev > 35000 * m.mad
                ELSE d.dev > 0 END AS is_outlier
    FROM dv d JOIN mad m USING (event_type)
    """,
    doc="Robust per-group outlier flagging via median absolute deviation "
        "(modified z-score, Iglewicz-Hoaglin 3.5 cut) — unlike "
        "q_zscore_outliers the cut itself is outlier-resistant.  Scale "
        "design: medians come from the distribution-cumsum trick (lower "
        "median over integer-cent values), so the only windows run over "
        "distinct (type, value) rows, never events; the outlier flag is "
        "the pure integer inequality 6745*dev > 35000*mad, and the only "
        "float is the identical final mad_z expression over exact ints.",
)
def q_mad_outliers(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    q = ev.select(
        "event_id", "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
         .alias("vq"),
    )
    n = q.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))

    def lower_median(frame, val_col, out_name):
        dist = frame.groupBy("event_type", val_col).agg(
            F.count("*").cast("long").alias("c"))
        w = (Window.partitionBy("event_type").orderBy(val_col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        cum = dist.select("event_type", val_col, F.sum("c").over(w).alias("cum"))
        return (
            cum.join(F.broadcast(n), "event_type")
            .groupBy("event_type")
            .agg(F.min(F.when(
                F.col("cum") >= F.ceil(F.lit(0.5) * F.col("n")),
                F.col(val_col))).alias(out_name))
        )

    med = lower_median(q, "vq", "med")
    dv = q.join(F.broadcast(med), "event_type").select(
        "event_id", "event_type", "vq", "med",
        F.abs(F.col("vq") - F.col("med")).alias("dev"))
    mad = lower_median(dv, "dev", "mad")
    return (
        dv.join(F.broadcast(mad), "event_type")
        .select(
            "event_id", "event_type", "vq",
            # 4-decimal modified z by PURE integer arithmetic: round-half-
            # away(6745*dev/mad) = (2*6745*dev + mad) div (2*mad) on the
            # non-negative magnitude (trunc == floor there, and both
            # engines' integer division agree) — float division near a
            # 5th-decimal tie is exactly what diverged at sf0.1
            F.expr(
                "CASE WHEN mad > 0 THEN"
                " (CASE WHEN vq >= med THEN 1 ELSE -1 END"
                "  * ((2 * 6745 * dev + mad) div (2 * mad)))"
                "  / CAST(10000 AS DOUBLE)"
                " ELSE CAST(0 AS DOUBLE) END"
            ).alias("mad_z"),
            F.when(F.col("mad") > 0,
                   F.lit(6745) * F.col("dev") > F.lit(35000) * F.col("mad"))
             .otherwise(F.col("dev") > 0).alias("is_outlier"),
        )
    )


# --------------------------------------------------------------------------
# Time-decayed engagement: exponential half-life weighting of each user's
# events, anchored at the corpus's last event.  The standard recency-aware
# activity score (newsfeed ranking, user-value models, churn features) —
# distinct from the window aggregates above, which weight all history
# equally.  Hash-parity design: the decay weight is ONE mirrored
# expression string over exact BIGINT microsecond ages, quantized to
# integer 1e-9 units per event BEFORE the per-user sum, so engine
# summation order cannot move the score (the logreg-sigmoid playbook).
_DECAY_HALF_LIFE_DAYS = 7.0
_DECAY_SCALE = 10**9
# columns in scope: us (BIGINT event micros), ref_us (BIGINT max micros)
_DECAY_WQ = (
    "CAST(floor(exp(-(CAST(ref_us - us AS DOUBLE) / 86400000000.0)"
    f" * ln(2.0) / {_DECAY_HALF_LIFE_DAYS}) * {float(_DECAY_SCALE)})"
    " AS BIGINT)"
)


@register(
    "q_decayed_engagement",
    oracle=f"""
    WITH e AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS us
      FROM events),
    r AS (SELECT max(us) AS ref_us FROM e),
    s AS (SELECT user_id, {_DECAY_WQ} AS wq FROM e CROSS JOIN r)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(wq) AS BIGINT) AS decay_q,
           round(CAST(sum(wq) AS DOUBLE) / {float(_DECAY_SCALE)}, 4) + 0.0
             AS decayed_score
    FROM s GROUP BY user_id
    """,
    doc=f"Per-user exponentially time-decayed event count (half-life "
        f"{_DECAY_HALF_LIFE_DAYS} days, anchored at the last event).  The "
        "per-event weight exp(-age·ln2/hl) is one expression string shared "
        "verbatim by both engines and floored to integer 1e-9 units before "
        "the user sum — decay_q is an exact BIGINT.  Plan: one 1-row "
        "max-age attach broadcast onto the scan, one map-side-combinable "
        "per-user agg; no window, no corpus-sized shuffle beyond user_id.",
)
def q_decayed_engagement(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr(_US_EXPR).alias("us"))
    ref = ev.agg(F.max("us").alias("ref_us"))
    scored = ev.crossJoin(F.broadcast(ref)).selectExpr(
        "user_id", f"{_DECAY_WQ} AS wq")
    return scored.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("wq").cast("long").alias("decay_q"),
    ).select(
        "user_id", "n_events", "decay_q",
        (F.round(F.col("decay_q").cast("double") / _DECAY_SCALE, 4)
         + F.lit(0.0)).alias("decayed_score"),
    )


# --------------------------------------------------------------------------
# Behavioral-sequence similarity (the event-stream analog of document
# near-dup, in the spirit of the distributed trajectory/top-k similarity
# joins in PAPERS.md — REPOSE ICDE'21, EDBT'20): which users behave
# alike, as cosine over their event-type TRIGRAM COUNT vectors.  With a
# small type alphabet the trigram space is dense (5^3 = 125), so a
# rare-gram stop cut has nothing to cut — candidate generation instead
# BLOCKS on each user's modal trigram (count desc, gram asc tie-break):
# only users sharing a most-frequent behavior pattern are compared, the
# canopy-blocking idea with a deterministic key.
_BSIM_COS_NUM = 2   # similarity cut: cosine >= 2/5 = 0.4, applied as the
_BSIM_COS_DEN = 5   # EXACT integer inequality den^2*d^2 >= num^2*nn_a*nn_b


@register(
    "q_user_behavior_pairs",
    oracle=f"""
    WITH seqs AS (
      SELECT user_id, list(event_type ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id),
    grams AS (
      SELECT user_id,
             unnest(list_transform(
               range(1, len(s) - 1),
               i -> s[i] || '>' || s[i+1] || '>' || s[i+2])) AS g
      FROM seqs WHERE len(s) >= 3),
    cnt AS (
      SELECT user_id, g, CAST(count(*) AS BIGINT) AS c
      FROM grams GROUP BY user_id, g),
    rk AS (
      SELECT user_id, g, c, row_number() OVER (
        PARTITION BY user_id ORDER BY c DESC, g ASC) AS r
      FROM cnt),
    top AS (SELECT user_id, g AS topg FROM rk WHERE r = 1),
    norms AS (
      SELECT user_id, CAST(sum(c * c) AS BIGINT) AS nn
      FROM cnt GROUP BY user_id),
    cand AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b, a.topg
      FROM top a JOIN top b
        ON a.topg = b.topg AND a.user_id < b.user_id),
    dots AS (
      SELECT c1.user_id AS user_a, c2.user_id AS user_b,
             CAST(sum(c1.c * c2.c) AS BIGINT) AS dot
      FROM cnt c1 JOIN cnt c2
        ON c1.g = c2.g AND c1.user_id < c2.user_id
      GROUP BY 1, 2)
    SELECT cd.user_a, cd.user_b, cd.topg, d.dot,
           round(d.dot / (sqrt(na.nn) * sqrt(nb.nn)), 4) + 0.0 AS cosine
    FROM cand cd
    JOIN dots d ON d.user_a = cd.user_a AND d.user_b = cd.user_b
    JOIN norms na ON na.user_id = cd.user_a
    JOIN norms nb ON nb.user_id = cd.user_b
    WHERE {_BSIM_COS_DEN * _BSIM_COS_DEN} * d.dot * d.dot
          >= {_BSIM_COS_NUM * _BSIM_COS_NUM} * na.nn * nb.nn
    """,
    doc=f"User behavior similarity: cosine >= "
        f"{_BSIM_COS_NUM}/{_BSIM_COS_DEN} over event-type trigram count "
        "vectors, candidates blocked on each user's modal trigram "
        "(canopy blocking with a deterministic key — right for dense "
        "small-alphabet gram spaces where rare-gram cuts have nothing to "
        "cut).  Dots/norms are exact BIGINTs and the threshold is a pure "
        "integer inequality; the reported cosine is the one mirrored "
        "float.  Scale: per-user vectors bounded by |alphabet|^3; the "
        "dot join fans out per gram by block population, and the modal-"
        "key equi-join never forms an all-pairs product.",
)
def q_user_behavior_pairs(spark, sf_dir):
    from pyspark.sql import Window, functions as F

    from nonconsumptive_spark.plans.checkpoint import materialize_once

    ev = load(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ).alias("s")
    )
    grams = (
        seqs.filter(F.size("s") >= 3)
        .select(
            "user_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("s") - 2),
                    lambda i: F.concat_ws(
                        ">", F.element_at("s", i),
                        F.element_at("s", i + 1), F.element_at("s", i + 2)),
                )
            ).alias("g"),
        )
    )
    cnt = materialize_once(
        grams.groupBy("user_id", "g").agg(F.count("*").cast("long").alias("c")),
        "bsim_cnt",
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("c"), F.asc("g"))
    top = (
        cnt.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("user_id", F.col("g").alias("topg"))
    )
    norms = cnt.groupBy("user_id").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("nn"))
    ta = top.select(F.col("user_id").alias("user_a"), "topg")
    tb = top.select(F.col("user_id").alias("user_b"), "topg")
    cand = ta.join(tb, "topg").filter(F.col("user_a") < F.col("user_b"))
    cand = materialize_once(cand, "bsim_cand")
    c1 = cnt.select(F.col("user_id").alias("user_a"), "g", F.col("c").alias("ca"))
    c2 = cnt.select(F.col("user_id").alias("user_b"), "g", F.col("c").alias("cb"))
    # dot products ONLY for blocked candidate pairs: joining cnt to itself
    # on the gram first computes the DENSE all-pairs product (every user
    # pair shares most grams in a small alphabet — |cnt|^2/|grams| rows)
    # and then throws most of it away at the cand join.  A/B warm at
    # sf0.1: 6.8s dense -> 1.5s candidate-first.
    dots = (
        cand.join(c1, "user_a")
        .join(c2, ["user_b", "g"])
        .groupBy("user_a", "user_b", "topg")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("dot"))
    )
    na = norms.select(F.col("user_id").alias("user_a"), F.col("nn").alias("nna"))
    nb = norms.select(F.col("user_id").alias("user_b"), F.col("nn").alias("nnb"))
    den2 = _BSIM_COS_DEN * _BSIM_COS_DEN
    num2 = _BSIM_COS_NUM * _BSIM_COS_NUM
    return (
        dots
        .join(na, "user_a").join(nb, "user_b")
        .filter(
            F.lit(den2) * F.col("dot") * F.col("dot")
            >= F.lit(num2) * F.col("nna") * F.col("nnb")
        )
        .select(
            "user_a", "user_b", "topg", "dot",
            (F.round(F.col("dot")
                     / (F.sqrt(F.col("nna")) * F.sqrt(F.col("nnb"))), 4)
             + F.lit(0.0)).alias("cosine"),
        )
    )


# --------------------------------------------------------------------------
# Sample autocorrelation of the daily event-count series — the seasonality
# probe of the time-series family (PAPERS.md EDBT'19).  With integer daily
# counts and the rational global mean m = S/n multiplied through by n, the
# lag products (n·c_t − S)(n·c_{t+k} − S) and the variance term are pure
# BIGINTs; r_k is one guarded mirrored division.
_ACF_MAX_LAG = 7
_ACF_R = (
    "CASE WHEN den > 0"
    " THEN round(CAST(num AS DOUBLE) / den, 6) + 0.0"
    " ELSE CAST(0.0 AS DOUBLE) END"
)


@register(
    "q_daily_autocorr",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s
      FROM daily),
    dev AS (
      SELECT d, t.n * c - t.s AS e, t.n AS n FROM daily CROSS JOIN tot t),
    den AS (SELECT CAST(sum(e * e) AS BIGINT) AS den FROM dev),
    lags AS (SELECT unnest(range(1, {_ACF_MAX_LAG} + 1)) AS lag),
    nums AS (
      SELECT l.lag,
             CAST(COALESCE(sum(a.e * b.e), 0) AS BIGINT) AS num,
             CAST(count(b.e) AS BIGINT) AS n_pairs
      FROM lags l
      LEFT JOIN dev a ON TRUE
      LEFT JOIN dev b ON b.d = a.d + CAST(l.lag AS BIGINT) * INTERVAL 1 DAY
      GROUP BY l.lag)
    SELECT CAST(lag AS BIGINT) AS lag, n_pairs, num,
           {_ACF_R} AS acf
    FROM nums CROSS JOIN den
    """,
    doc=f"Lag-1..{_ACF_MAX_LAG} sample autocorrelation of daily event "
        "counts (ACF with the global-mean normalization).  Deviations are "
        "scaled by n so every numerator/denominator term is an exact "
        "BIGINT; r_k is one guarded mirrored division.  Plan: the series "
        "frame is #days rows — every join after the daily agg is "
        "spine-sized, corpus-size independent.",
)
def q_daily_autocorr(spark, sf_dir):
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    daily = materialize_once(daily, "acf_daily")
    tot = daily.agg(F.count("*").cast("long").alias("n"),
                    F.sum("c").cast("long").alias("s"))
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "d", (F.col("n") * F.col("c") - F.col("s")).cast("long").alias("e"))
    dev = materialize_once(dev, "acf_dev")
    den = dev.agg(F.sum(F.col("e") * F.col("e")).cast("long").alias("den"))
    lags = daily.sparkSession.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").cast("long").alias("lag"))
    a = dev.select("d", F.col("e").alias("ea"))
    b = dev.select(F.col("d").alias("db"), F.col("e").alias("eb"))
    pairs = (
        lags.crossJoin(a)
        .join(b, F.col("db") == F.expr("date_add(d, CAST(lag AS INT))"),
              "left")
    )
    nums = pairs.groupBy("lag").agg(
        F.coalesce(F.sum(F.col("ea") * F.col("eb")), F.lit(0))
        .cast("long").alias("num"),
        F.count("eb").cast("long").alias("n_pairs"),
    )
    return (
        nums.crossJoin(F.broadcast(den))
        .selectExpr("lag", "n_pairs", "num", f"{_ACF_R} AS acf")
    )


# Seasonal-naive anomaly detection on the daily series: residual vs the
# same weekday one week earlier (calendar join, robust to missing days),
# then a population z-score of the residuals from exact integer moments —
# numerator n*resid - s and denominator n*ss - s*s are BIGINTs, so the
# only float ops are one sqrt and one division, mirrored bit-for-bit.
_SEAS_LAG_DAYS = 7
_SEAS_Z = (
    "CASE WHEN den > 0"
    " THEN round(CAST(n * resid - s AS DOUBLE)"
    "      / sqrt(CAST(den AS DOUBLE)), 4) + 0.0"
    " ELSE CAST(0.0 AS DOUBLE) END"
)


@register(
    "q_seasonal_residuals",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    resid AS (
      SELECT a.event_type, a.d, a.cnt,
             CAST(a.cnt - b.cnt AS BIGINT) AS resid
      FROM daily a
      JOIN daily b ON b.event_type = a.event_type
                  AND b.d = a.d - INTERVAL {_SEAS_LAG_DAYS} DAY),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(resid) AS BIGINT) AS s,
             CAST(sum(resid * resid) AS BIGINT) AS ss
      FROM resid),
    z AS (
      SELECT event_type, d, cnt, resid,
             n * ss - s * s AS den, n, s
      FROM resid CROSS JOIN mom)
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day, cnt, resid,
           {_SEAS_Z} AS zscore
    FROM z
    """,
    doc=f"Seasonal-naive residuals: per (event_type, day) count minus the "
        f"count {_SEAS_LAG_DAYS} days earlier (calendar equi-join — "
        "missing days drop out instead of silently comparing wrong "
        "weekdays), z-scored against the full residual population via "
        "exact BIGINT moments.  Plan: one (type, day) agg shuffle; "
        "everything after is spine-sized (days x types) with a broadcast "
        "1-row moment attach.",
)
def q_seasonal_residuals(spark, sf_dir):
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    daily = materialize_once(daily, "seasonal_daily")
    prev = daily.select(
        F.col("event_type").alias("pt"),
        F.expr(f"date_add(d, {_SEAS_LAG_DAYS})").alias("pd"),
        F.col("cnt").alias("prev_cnt"),
    )
    resid = (
        daily.join(prev, (F.col("event_type") == F.col("pt"))
                   & (F.col("d") == F.col("pd")))
        .select("event_type", "d", "cnt",
                (F.col("cnt") - F.col("prev_cnt")).cast("long").alias("resid"))
    )
    resid = materialize_once(resid, "seasonal_resid")
    mom = resid.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("resid").cast("long").alias("s"),
        F.sum(F.col("resid") * F.col("resid")).cast("long").alias("ss"),
    )
    return (
        resid.crossJoin(F.broadcast(mom))
        .withColumn("den", F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
        .selectExpr("event_type", "date_format(d, 'yyyy-MM-dd') AS day",
                    "cnt", "resid", f"{_SEAS_Z} AS zscore")
    )
