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


# -- Wilcoxon signed-rank test (paired halves of the observation span) -------
# The missing classic of the rank lattice (MWU / KW / Friedman / Page /
# Jonckheere / Ansari-Bradley / Mood are registered): a PAIRED location
# test.  Pairing: each user's event count in the first vs second half of
# the global observation span (split at the exact integer-microsecond
# midpoint).  Doubled-midrank discipline over the |d| value histogram
# keeps 2*W+ a pure BIGINT; the only float steps are the shared-text z
# expression (one sqrt — the documented libm-equality class) and the
# rounded emit.  BIGINT headroom: v12 ~ 2n^3 for n nonzero-difference
# users — exact to ~1.6e6 users (~100x sf0.1); beyond that the variance
# term needs the same 1e-9 quantization logrank uses.
_WSR_Z = (
    "CASE WHEN v12 > 0 THEN"
    " round(CAST(num2 AS DOUBLE) / sqrt(CAST(v12 AS DOUBLE) / 12.0), 4)"
    " + 0.0 ELSE NULL END"
)


@_stage(
    "q_wilcoxon_signed_rank",
    f"""
    WITH span AS (
      SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS lo,
             CAST(max(epoch_us(ts)) AS BIGINT) AS hi
      FROM events),
    per_user AS (
      SELECT user_id,
             CAST(sum(CASE WHEN epoch_us(ts) - s.lo <= (s.hi - s.lo) // 2
                           THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN epoch_us(ts) - s.lo > (s.hi - s.lo) // 2
                           THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM events CROSS JOIN span s GROUP BY user_id),
    diffs AS (
      SELECT abs(c2 - c1) AS ad,
             CASE WHEN c2 > c1 THEN 1 ELSE 0 END AS pos
      FROM per_user WHERE c2 <> c1),
    hist AS (
      SELECT ad, CAST(count(*) AS BIGINT) AS t,
             CAST(sum(pos) AS BIGINT) AS cpos
      FROM diffs GROUP BY ad),
    spine AS (
      SELECT ad, t, cpos,
             CAST(coalesce(sum(t) OVER (
               ORDER BY ad ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS cum
      FROM hist),
    agg AS (
      SELECT CAST(sum(t) AS BIGINT) AS n,
             CAST(sum(cpos * (2 * cum + t + 1)) AS BIGINT) AS w2_plus,
             CAST(sum(t * t * t - t) AS BIGINT) AS tsum
      FROM spine),
    stat AS (
      SELECT n, w2_plus, n * (n + 1) - w2_plus AS w2_minus, tsum,
             w2_plus - n * (n + 1) // 2 AS num2,
             2 * n * (n + 1) * (2 * n + 1) - tsum AS v12
      FROM agg)
    SELECT n AS n_pairs, w2_plus, w2_minus, tsum AS tie_q,
           {_WSR_Z} AS z
    FROM stat
    """,
)
def q_wilcoxon_signed_rank(spark, sf_dir):
    """Wilcoxon signed-rank test: did per-user activity SHIFT between
    the first and second half of the observation window?  Pairs are
    (user's first-half count, second-half count), zero differences drop
    (standard), |d| ranks use the doubled-midrank value-histogram form
    (2*midrank = 2*cum + t + 1), so 2*W+ and the 12-scaled variance
    2n(n+1)(2n+1) - sum(t^3 - t) are exact BIGINTs; one shared-text z
    expression at emit.  Plan: one user agg with a broadcast 1-row span
    attach, a |d|-histogram agg, a histogram-bounded window, two 1-row
    aggs — corpus-size independent after the user agg."""
    from pyspark.sql import Window

    # timestampdiff works on TIMESTAMP_NTZ (which unix_micros rejects)
    # and is zone-free: offsets from the global min compare against
    # floor(span/2) — the identical exact-integer split the oracle's
    # epoch_us differences make
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    span = ev.agg(F.min("ts").alias("t_lo"), F.max("ts").alias("t_hi"))
    per_user = (
        ev.crossJoin(F.broadcast(span))
        .select(
            "user_id",
            F.expr("timestampdiff(MICROSECOND, t_lo, ts)"
                   " <= timestampdiff(MICROSECOND, t_lo, t_hi) div 2")
            .alias("first_half"),
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("first_half"), 1).otherwise(0))
            .cast("long").alias("c1"),
            F.sum(F.when(~F.col("first_half"), 1).otherwise(0))
            .cast("long").alias("c2"),
        )
    )
    diffs = per_user.filter(F.col("c2") != F.col("c1")).select(
        F.abs(F.col("c2") - F.col("c1")).alias("ad"),
        F.when(F.col("c2") > F.col("c1"), 1).otherwise(0).alias("pos"),
    )
    hist = diffs.groupBy("ad").agg(
        F.count("*").cast("long").alias("t"),
        F.sum("pos").cast("long").alias("cpos"),
    )
    w = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    spine = hist.select(
        "ad", "t", "cpos",
        F.coalesce(F.sum("t").over(w), F.lit(0)).cast("long").alias("cum"))
    agg = spine.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.col("cpos") * (2 * F.col("cum") + F.col("t") + 1))
        .cast("long").alias("w2_plus"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long").alias("tsum"),
    )
    stat = agg.selectExpr(
        "n", "w2_plus", "n * (n + 1) - w2_plus AS w2_minus", "tsum",
        "w2_plus - n * (n + 1) div 2 AS num2",
        "2 * n * (n + 1) * (2 * n + 1) - tsum AS v12",
    )
    return stat.selectExpr(
        "n AS n_pairs", "w2_plus", "w2_minus", "tsum AS tie_q",
        f"{_WSR_Z} AS z",
    )


# -- Dunn's post-hoc pairwise test after Kruskal-Wallis ----------------------
# Which SPECIFIC source pairs differ once q_kruskal_wallis rejects?
# Dunn's z on the shared mean ranks, tie-corrected; the doubled-rank
# sums r2 = 2*R_g from the KW spine stay exact BIGINTs and the z chain
# is one shared-text double expression per pair.
_DUNN_Z = (
    "CASE WHEN n > 1 AND CAST(n AS DOUBLE) * (n + 1)"
    "               - CAST(tsum AS DOUBLE) / (n - 1) > 0 THEN"
    " round((CAST(r2a AS DOUBLE) / na - CAST(r2b AS DOUBLE) / nb)"
    "       / (2.0 * sqrt((CAST(n AS DOUBLE) * (n + 1)"
    "                      - CAST(tsum AS DOUBLE) / (n - 1)) / 12.0"
    "                     * (1.0 / na + 1.0 / nb))), 4) + 0.0"
    " ELSE NULL END"
)


@_stage(
    "q_dunn_posthoc",
    f"""
    WITH counts AS (
      SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY source, n_chars),
    spine AS (
      SELECT v, t,
             CAST(coalesce(sum(t) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS cum
      FROM (SELECT v, CAST(sum(c) AS BIGINT) AS t
            FROM counts GROUP BY v)),
    grp AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n_g,
             CAST(sum(c * (2 * s.cum + s.t + 1)) AS BIGINT) AS r2
      FROM counts JOIN spine s USING (v)
      GROUP BY source),
    tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n FROM grp),
    ties AS (
      SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tsum FROM spine)
    SELECT a.source AS source_a, b.source AS source_b,
           a.n_g AS na, b.n_g AS nb,
           a.r2 AS r2a, b.r2 AS r2b,
           {_DUNN_Z} AS z
    FROM grp a
    JOIN grp b ON a.source < b.source
    CROSS JOIN tot CROSS JOIN ties
    """,
)
def q_dunn_posthoc(spark, sf_dir):
    """Dunn's post-hoc: pairwise tie-corrected z between every source
    pair on the SAME doubled-midrank design as q_kruskal_wallis (which
    only says "some source differs"; this says which).  r2 = 2*R_g per
    group is a pure BIGINT off the value spine; each pair's z is one
    shared-text double chain (sqrt = the documented libm-equality
    class).  Plan: the KW aggs plus a k x k broadcast self-join of the
    k-row group frame — pair count is source-cardinality bounded, never
    row-bounded."""
    from pyspark.sql import Window

    counts = (
        load(spark, sf_dir, "documents")
        .groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    spine = (
        counts.groupBy("v").agg(F.sum("c").cast("long").alias("t"))
        .select("v", "t",
                F.coalesce(F.sum("t").over(w), F.lit(0))
                .cast("long").alias("cum"))
    )
    grp = (
        counts.join(F.broadcast(spine), "v")
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_g"),
            F.sum(F.col("c") * (2 * F.col("cum") + F.col("t") + 1))
            .cast("long").alias("r2"),
        )
    )
    tot = grp.agg(F.sum("n_g").cast("long").alias("n"))
    ties = spine.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long").alias("tsum"))
    a = grp.select(F.col("source").alias("source_a"),
                   F.col("n_g").alias("na"), F.col("r2").alias("r2a"))
    b = grp.select(F.col("source").alias("source_b"),
                   F.col("n_g").alias("nb"), F.col("r2").alias("r2b"))
    return (
        a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
        .crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(ties))
        .selectExpr("source_a", "source_b", "na", "nb", "r2a", "r2b",
                    f"{_DUNN_Z} AS z")
    )


# -- Cliff's delta (ordinal effect size, odd vs even doc ids) ----------------
_CLIFF_D = (
    "CASE WHEN na > 0 AND nb > 0 THEN"
    " round((CAST(gt AS DOUBLE) - lt)"
    "       / (CAST(na AS DOUBLE) * nb), 6) + 0.0 ELSE NULL END"
)


@_stage(
    "q_cliffs_delta",
    f"""
    WITH lens AS (
      SELECT doc_id % 2 AS g, CAST(n_chars AS BIGINT) AS v
      FROM documents),
    hist AS (
      SELECT v,
             CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM lens GROUP BY v),
    spine AS (
      SELECT v, ca, cb,
             CAST(coalesce(sum(cb) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS cumb
      FROM hist),
    agg AS (
      SELECT CAST(sum(ca) AS BIGINT) AS na,
             CAST(sum(cb) AS BIGINT) AS nb,
             CAST(sum(ca * cumb) AS BIGINT) AS gt,
             CAST(sum(ca * cb) AS BIGINT) AS ties
      FROM spine),
    stat AS (
      SELECT na, nb, gt, na * nb - gt - ties AS lt, ties FROM agg)
    SELECT na, nb, gt, lt, ties, {_CLIFF_D} AS delta
    FROM stat
    """,
)
def q_cliffs_delta(spark, sf_dir):
    """Cliff's delta between even-id and odd-id documents on n_chars:
    the ordinal effect size (P[X>Y] - P[X<Y]) the parametric
    q_cohens_d_sources and the test-only q_mann_whitney can't report.
    Every cross-pair count comes from the value histogram (gt = sum_v
    ca(v) * cumB(<v); lt by complement) — exact BIGINTs, one mirrored
    division at emit.  a*b products stay exact to ~3e9 docs per group.
    Plan: one histogram agg, a histogram-bounded window, one 1-row agg
    — never a pair join."""
    from pyspark.sql import Window

    lens = load(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 2).alias("g"),
        F.col("n_chars").cast("long").alias("v"))
    hist = lens.groupBy("v").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
        .cast("long").alias("ca"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("long").alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    spine = hist.select(
        "v", "ca", "cb",
        F.coalesce(F.sum("cb").over(w), F.lit(0)).cast("long").alias("cumb"))
    agg = spine.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.sum(F.col("ca") * F.col("cumb")).cast("long").alias("gt"),
        F.sum(F.col("ca") * F.col("cb")).cast("long").alias("ties"),
    )
    stat = agg.selectExpr("na", "nb", "gt",
                          "na * nb - gt - ties AS lt", "ties")
    return stat.selectExpr("na", "nb", "gt", "lt", "ties",
                           f"{_CLIFF_D} AS delta")
