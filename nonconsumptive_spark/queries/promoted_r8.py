"""The round-8 promotion cohort: 4 (spark_fn, oracle_sql) pairs built
and oracle-verified during round 7 (then ``queries/staging.py``), now
REGISTERED — imported by ``queries/__init__.all_queries`` so the driver
gate sees every entry.

Promoted in place exactly like the r5/r6/r7 cohorts
(``queries/promoted.py``, ``queries/promoted_r6.py``,
``queries/promoted_r7.py``): each entry lives next to its oracle builder
and shared constants.  Every entry was verified with the driver-grade
dtype-strict compare at sf0.001 (suite) AND sf0.01
(tools/check_staged.py) before promotion — and re-verified by the r7
judge via the staging harness — censused by tools/plan_census.py,
benched as extras, and 10x scale-stressed.  Each docstring keeps its
BIGINT-headroom / window-size note (Ljung-Box's ``n*max_daily_count``
ceiling, Mood's ``a*d`` bound).  New work stages in the fresh
``queries/staging.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (used by staged entries)

from nonconsumptive_spark.queries import load, register  # noqa: F401

_DUCK_TOKS = "list_filter(regexp_split_to_array(text, '[^\\pL]+'), x -> x <> '')"

# Kept so pre-promotion tooling and examples that resolve these entries
# by name keep working; registration happens in the decorator below.
STAGED: dict[str, tuple] = {}


def _stage(name: str, oracle: str):
    def deco(fn):
        STAGED[name] = (fn, oracle)
        register(name, oracle, doc=fn.__doc__ or "")(fn)
        return fn

    return deco


# -- bucketed-layout join elimination ----------------------------------------
@_stage(
    "q_bucketed_join_revenue",
    """
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_bucketed_join_revenue(spark, sf_dir):
    """Fact-to-fact orders⋈lineitem revenue over the BUCKETED warehouse
    layout (sources/bucketing.py): both tables are written once,
    bucketed AND sorted by orderkey with the same bucket count, so the
    join is a SortMergeJoin with ZERO shuffle exchange and zero
    per-query sort on the bucketed sides — the layout pays the shuffle
    once, every subsequent join on the key reads co-located buckets
    (plan asserted by tests/test_bucketed_join.py).  At 100 TB this is
    the difference between re-shuffling two fact tables per query and
    never shuffling them at all; the dims-broadcast star join
    (q_star_join_revenue) covers the small-side case, this covers the
    big⋈big case.  Results are layout-independent (the oracle runs on
    the flat parquet); only the final priority agg exchanges."""
    from nonconsumptive_spark.sources.bucketing import bucketed_fact_tables

    o_name, l_name = bucketed_fact_tables(spark, sf_dir)
    o = spark.table(o_name)
    li = spark.table(l_name)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice")
                          * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


# -- Ljung-Box portmanteau test on the daily event-count series --------------
_LB_MAX_LAG = 7
_LB_Q = 10**12  # r_k^2/n_pairs quantization; cumulative sum <= 7e12 << 2^63
# identical SQL text runs on BOTH engines (Spark SQL and DuckDB agree on
# floor/CAST semantics), so the per-lag contribution is bit-mirrored:
_LB_CQ = (
    "CASE WHEN den > 0 AND n_pairs > 0"
    f" THEN CAST(floor({_LB_Q}.0 * (CAST(num AS DOUBLE) / den)"
    "           * (CAST(num AS DOUBLE) / den) / n_pairs) AS BIGINT)"
    " ELSE CAST(0 AS BIGINT) END"
)
_LB_QSTAT = (
    f"round(CAST(n AS DOUBLE) * (n + 2) * cum / {_LB_Q}.0, 4) + 0.0"
)


@_stage(
    "q_ljung_box",
    f"""
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
    lags AS (SELECT unnest(range(1, {_LB_MAX_LAG} + 1)) AS lag),
    nums AS (
      SELECT l.lag,
             CAST(COALESCE(sum(a.e * b.e), 0) AS BIGINT) AS num,
             CAST(count(b.e) AS BIGINT) AS n_pairs
      FROM lags l
      LEFT JOIN dev a ON TRUE
      LEFT JOIN dev b ON b.d = a.d + CAST(l.lag AS BIGINT) * INTERVAL 1 DAY
      GROUP BY l.lag),
    contrib AS (
      SELECT lag, n_pairs, {_LB_CQ} AS cq, t.n
      FROM nums CROSS JOIN den CROSS JOIN tot t)
    SELECT CAST(lag AS BIGINT) AS lag, n_pairs, cq,
           CAST(sum(cq) OVER (ORDER BY lag) AS BIGINT) AS cum_q,
           {_LB_QSTAT.replace('cum', 'sum(cq) OVER (ORDER BY lag)')} AS q_stat
    FROM contrib
    """,
)
def q_ljung_box(spark, sf_dir):
    """Ljung-Box portmanteau test (gap-robust variant) on the daily
    event-count series: Q_m = n(n+2) * sum_{{k<=m}} r_k^2 / n_pairs_k,
    one row per lag with the cumulative statistic — the is-this-series-
    white-noise readout that decides whether the ACF family's lags
    (q_daily_autocorr, same exact-integer r_k) mean anything.  The
    classical divisor n-k assumes a gapless calendar; we use the
    observed pair count (equal when no days are missing) and say so.

    Exactness: deviations scale by n so num/den are exact BIGINTs
    (reused q_daily_autocorr discipline; n*max_daily_count beyond ~3e9
    — roughly 2000x sf0.1 — would overflow the e*e sum, documented
    headroom); each lag's r_k^2/n_pairs floor-quantizes to 1e12 BIGINTs
    so the cumulative sum is order-free; the only engine-float steps
    are the shared-text quantized expression (floor of an identical
    double chain, the documented libm-equality class) and one rounded
    emit.  Plan: everything after the daily agg is day-spine-sized
    (#days x 7 lag rows); the lag window orders 7 rows."""
    from nonconsumptive_spark.plans.checkpoint import materialize_once
    from pyspark.sql import Window

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    daily = materialize_once(daily, "lb_daily")
    tot = daily.agg(F.count("*").cast("long").alias("n"),
                    F.sum("c").cast("long").alias("s"))
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "d", (F.col("n") * F.col("c") - F.col("s")).cast("long").alias("e"),
        "n")
    dev = materialize_once(dev, "lb_dev")
    den = dev.agg(F.sum(F.col("e") * F.col("e")).cast("long").alias("den"))
    lags = spark.range(1, _LB_MAX_LAG + 1).select(
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
    contrib = (
        nums.crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(tot.select("n")))
        .selectExpr("lag", "n_pairs", f"{_LB_CQ} AS cq", "n")
    )
    w = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    return contrib.select(
        "lag", "n_pairs", "cq",
        F.sum("cq").over(w).cast("long").alias("cum_q"),
        F.expr(_LB_QSTAT.replace(
            "cum", f"sum(cq) OVER (ORDER BY lag ROWS BETWEEN UNBOUNDED "
                   f"PRECEDING AND CURRENT ROW)")).alias("q_stat"),
    )


# -- Mood's median test (two-sample location on doc length) ------------------
_MOOD_CHI2 = (
    "CASE WHEN (a + b) > 0 AND (c + d) > 0 AND (a + c) > 0 AND (b + d) > 0"
    " THEN round(CAST(a + b + c + d AS DOUBLE)"
    "      * (CAST(a * d - b * c AS DOUBLE) * CAST(a * d - b * c AS DOUBLE))"
    "      / (CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)), 4) + 0.0"
    " ELSE NULL END"
)


@_stage(
    "q_mood_median",
    f"""
    WITH lens AS (
      SELECT doc_id % 2 AS g,
             CAST(len({_DUCK_TOKS}) AS BIGINT) AS v
      FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents) documents),
    hist AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM lens GROUP BY v),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM hist),
    med AS (
      SELECT min(v) AS med FROM (
        SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, t.n
        FROM hist CROSS JOIN tot t)
      WHERE cum >= (n + 1) // 2),
    cells AS (
      SELECT CAST(sum(CASE WHEN g = 0 AND v > m.med THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN g = 0 AND v <= m.med THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN g = 1 AND v > m.med THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN g = 1 AND v <= m.med THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(max(m.med) AS BIGINT) AS med
      FROM lens CROSS JOIN med m)
    SELECT med, a, b, c, d, {_MOOD_CHI2} AS chi2
    FROM cells
    """,
)
def q_mood_median(spark, sf_dir):
    """Mood's median test: are even-id and odd-id documents drawn from
    length distributions with the same median?  Grand median located on
    the VALUE HISTOGRAM (min length with cumulative count >= (n+1) div 2
    — the bounded-window discipline, window rows = distinct lengths,
    never docs), then the 2x2 above/at-or-below table and the
    chi-square in its closed 2x2 form N(ad-bc)^2/(r1 r2 c1 c2) — one
    mirrored double expression, no float sums.  a*d stays BIGINT-exact
    to ~3e9 docs per group (~50,000x sf0.1); zero marginals emit a
    mirrored NULL.  Plan: one tokenize scan, a histogram agg, a
    histogram-sized window, one 1-row broadcast back over the lengths."""
    from pyspark.sql import Window

    from nonconsumptive_spark.functions.text import tokenize

    lens = load(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 2).alias("g"),
        F.size(tokenize(F.coalesce(F.col("text"), F.lit(""))))
        .cast("long").alias("v"),
    )
    hist = lens.groupBy("v").agg(F.count("*").cast("long").alias("cnt"))
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
                                         Window.currentRow)
    tot = hist.agg(F.sum("cnt").cast("long").alias("n"))
    spine = hist.crossJoin(F.broadcast(tot)).select(
        "v", F.sum("cnt").over(wv).alias("cum"), "n")
    med = (spine.filter(F.col("cum") >= F.expr("(n + 1) div 2"))
           .agg(F.min("v").alias("med")))
    cells = lens.crossJoin(F.broadcast(med)).agg(
        F.sum(F.when((F.col("g") == 0) & (F.col("v") > F.col("med")), 1)
              .otherwise(0)).cast("long").alias("a"),
        F.sum(F.when((F.col("g") == 0) & (F.col("v") <= F.col("med")), 1)
              .otherwise(0)).cast("long").alias("b"),
        F.sum(F.when((F.col("g") == 1) & (F.col("v") > F.col("med")), 1)
              .otherwise(0)).cast("long").alias("c"),
        F.sum(F.when((F.col("g") == 1) & (F.col("v") <= F.col("med")), 1)
              .otherwise(0)).cast("long").alias("d"),
        F.max("med").cast("long").alias("med"),
    )
    return cells.selectExpr("med", "a", "b", "c", "d",
                            f"{_MOOD_CHI2} AS chi2")


# -- Cochran's Q over the daily type-presence design --------------------------
_CQ_STAT = (
    "CASE WHEN k * n_present - sum_r2 > 0"
    " THEN round(CAST((k - 1) * (k * sum_c2 - n_present * n_present)"
    "            AS DOUBLE) / (k * n_present - sum_r2), 4) + 0.0"
    " ELSE NULL END"
)


@_stage(
    "q_cochran_q",
    f"""
    WITH present AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, event_type AS t
      FROM events),
    kk AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS k FROM present),
    rows_ AS (
      SELECT d, CAST(count(*) AS BIGINT) AS r FROM present GROUP BY d),
    cols_ AS (
      SELECT t, CAST(count(*) AS BIGINT) AS c FROM present GROUP BY t),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(r) AS BIGINT) AS n_present,
             CAST(sum(r * r) AS BIGINT) AS sum_r2
      FROM rows_),
    cagg AS (SELECT CAST(sum(c * c) AS BIGINT) AS sum_c2 FROM cols_)
    SELECT k, n_days, n_present, sum_r2, sum_c2, {_CQ_STAT} AS q
    FROM agg CROSS JOIN cagg CROSS JOIN kk
    """,
)
def q_cochran_q(spark, sf_dir):
    """Cochran's Q over the (day x event_type) presence design: do the k
    event types fire on the same set of days, or do some types have
    systematically patchier daily coverage?  The blocked binary
    companion to q_friedman_daily (which ranks counts; this tests bare
    presence).  Identity form Q = (k-1)(k*sum C_j^2 - N^2)/(kN - sum
    R_i^2): every term is an exact BIGINT over day/type marginals
    (grid is #days x #types — bounded), one guarded float division at
    emit; the all-types-every-day design has zero denominator and
    emits a mirrored NULL.  Plan: one distinct over (day, type), two
    marginal aggs, 1-row cross joins — corpus-size independent after
    the distinct."""
    present = (
        load(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"), F.col("event_type").alias("t"))
        .distinct()
    )
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    present = materialize_once(present, "cq_present")
    kk = present.agg(F.countDistinct("t").cast("long").alias("k"))
    rows_ = present.groupBy("d").agg(F.count("*").cast("long").alias("r"))
    cols_ = present.groupBy("t").agg(F.count("*").cast("long").alias("c"))
    agg = rows_.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("r").cast("long").alias("n_present"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("sum_r2"),
    )
    cagg = cols_.agg(F.sum(F.col("c") * F.col("c")).cast("long")
                     .alias("sum_c2"))
    return (
        agg.crossJoin(F.broadcast(cagg)).crossJoin(F.broadcast(kk))
        .selectExpr("k", "n_days", "n_present", "sum_r2", "sum_c2",
                    f"{_CQ_STAT} AS q")
    )
