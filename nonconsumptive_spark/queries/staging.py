"""Registration staging: (spark_fn, oracle_sql) pairs for operators not
yet promoted into the judged registry.

NOT imported by ``queries/__init__.all_queries`` — the driver never sees
these until promotion — but continuously verified against DuckDB by
``tests/test_staging.py`` with the exact dtype-strict compare the driver
gate uses (sf0.001 in the suite; ``python tools/check_staged.py`` for
sf0.01), and censused pre-promotion by tools/plan_census.py.  Promotion
= re-home the entry into a topic module (or promote the whole file in
place, like the r5 and r6 cohorts: ``queries/promoted.py``,
``queries/promoted_r6.py``) with ``@register`` and append its name to
the PRIORITY queue.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (used by staged entries)

from nonconsumptive_spark.queries import load  # noqa: F401

_DUCK_TOKS = "list_filter(regexp_split_to_array(text, '[^\\pL]+'), x -> x <> '')"

STAGED: dict[str, tuple] = {}


def _stage(name: str, oracle: str):
    def deco(fn):
        STAGED[name] = (fn, oracle)
        return fn

    return deco


# -- Cox proportional hazards (binary covariate, Newton in theta) -----------
_COX_Q = 10**9
_COX_ROUNDS = 6
_COX_US_PER_HOUR = 3_600_000_000


def _cox_oracle() -> str:
    """Unrolled Newton-in-theta: r{k} = quantized (score, info) sums at
    t{k-1}'s theta, t{k} = the update.  The spine CTEs mirror
    q_logrank_test's (same lifetimes, cohorts, risk sets); MATERIALIZED
    everywhere a CTE is referenced twice (the bradley_terry lesson)."""
    parts = [f"""
    pu AS (
      SELECT user_id, min(ts) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
             max(ts) AS tl
      FROM events GROUP BY user_id),
    durs AS (
      SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS g,
             CAST((epoch_us(coalesce(tp, tl)) - epoch_us(t0))
                  // {_COX_US_PER_HOUR} AS BIGINT) AS dur,
             CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM pu),
    gt AS MATERIALIZED (
      SELECT g, CAST(count(*) AS BIGINT) AS n_users FROM durs GROUP BY g),
    tbl AS MATERIALIZED (
      SELECT g, dur, CAST(count(*) AS BIGINT) AS n_all,
             CAST(sum(ev) AS BIGINT) AS d
      FROM durs GROUP BY g, dur),
    grid AS (
      SELECT gg.g, dd.dur,
             CAST(coalesce(t.n_all, 0) AS BIGINT) AS n_all,
             CAST(coalesce(t.d, 0) AS BIGINT) AS d
      FROM (SELECT DISTINCT dur FROM tbl) dd
      CROSS JOIN (SELECT DISTINCT g FROM gt) gg
      LEFT JOIN tbl t ON t.g = gg.g AND t.dur = dd.dur),
    risk AS (
      SELECT g, dur, d,
             CAST((SELECT n_users FROM gt WHERE gt.g = grid.g)
                  - COALESCE(sum(n_all) OVER (
                      PARTITION BY g ORDER BY dur
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM grid),
    wide AS MATERIALIZED (
      SELECT dur,
             CAST(sum(CASE WHEN g = 1 THEN d ELSE 0 END) AS BIGINT) AS d_a,
             CAST(sum(CASE WHEN g = 0 THEN d ELSE 0 END) AS BIGINT) AS d_b,
             CAST(sum(CASE WHEN g = 1 THEN n_risk ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN g = 0 THEN n_risk ELSE 0 END) AS BIGINT)
               AS n_b
      FROM risk GROUP BY dur),
    evt AS MATERIALIZED (SELECT * FROM wide WHERE d_a + d_b > 0)"""]
    prev_th = "1.0"
    for k in range(1, _COX_ROUNDS + 1):
        parts.append(f"""
    r{k} AS MATERIALIZED (
      SELECT CAST(coalesce(sum(CAST(floor({_COX_Q}.0
               * (d_a - (d_a + d_b)
                  * (n_a * {prev_th} / (n_b + n_a * {prev_th}))))
               AS BIGINT)), 0) AS BIGINT) AS us,
             CAST(coalesce(sum(CAST(floor({_COX_Q}.0
               * ((d_a + d_b) * n_a * CAST(n_b AS DOUBLE)
                  / ((n_b + n_a * {prev_th})
                     * (n_b + n_a * {prev_th})))) AS BIGINT)), 0)
               AS BIGINT) AS js
      FROM evt),
    t{k} AS MATERIALIZED (
      SELECT CASE WHEN js > 0
                  THEN greatest({prev_th} + CAST(us AS DOUBLE) / js, 1e-6)
                  ELSE {prev_th} END AS th
      FROM r{k})""")
        prev_th = f"(SELECT th FROM t{k})"
    last = _COX_ROUNDS
    return (
        "WITH" + ",".join(parts)
        + f"""
    SELECT (SELECT max(n_a) FROM wide) AS n_treat,
           (SELECT max(n_b) FROM wide) AS n_control,
           (SELECT CAST(sum(d_a) AS BIGINT) FROM wide) AS d_treat,
           (SELECT CAST(sum(d_a) + sum(d_b) AS BIGINT) FROM wide)
             AS d_total,
           us, js,
           round((SELECT th FROM t{last}), 6) + 0.0 AS theta,
           round(ln((SELECT th FROM t{last})), 6) + 0.0 AS beta,
           CASE WHEN js > 0 THEN
             round(1.0 / sqrt((SELECT th FROM t{last}) * js
                              / {_COX_Q}.0), 6) + 0.0
           END AS se_beta
    FROM r{last}"""
    )


@_stage("q_cox_ph", _cox_oracle())
def q_cox_ph(spark, sf_dir):
    """Cox proportional hazards on time-to-first-purchase between the
    odd/even user cohorts (operators/survival.cox_ph_binary): the
    effect-size estimate the q_logrank_test / Kaplan-Meier battery was
    missing — beta = log conversion-hazard ratio after 6 Newton rounds
    (the q_time_to_convert duration framing, non-degenerate on the test
    events table where the last-activity convention censors everyone).
    The iteration runs on
    theta = exp(beta) directly, so every in-loop term is RATIONAL in
    exact risk-set integers (no engine exp/ln until emit); per-time
    score/information terms floor-quantize to 1e-9 BIGINTs, and each
    round is one scan of the materialized duration spine + a bounded
    1-row collect.  Spine is #distinct-durations-sized; the only
    corpus-scale work is the per-user min/max agg."""
    from nonconsumptive_spark.operators.survival import cox_ph_binary

    return cox_ph_binary(load(spark, sf_dir, "events"), rounds=_COX_ROUNDS)


# -- pinball (quantile) loss readout -----------------------------------------
_PB_TAU_NUM, _PB_TAU_DEN = 3, 4  # tau = 0.75


@_stage(
    "q_pinball_quantile",
    f"""
    WITH base AS (
      SELECT l_returnflag AS flag,
             CAST(floor(100.0 * l_extendedprice + 0.5) AS BIGINT) AS v
      FROM lineitem),
    ranked AS (
      SELECT flag, v,
             row_number() OVER (PARTITION BY flag ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY flag) AS n
      FROM base),
    qh AS (
      SELECT flag, CAST(max(n) AS BIGINT) AS n, CAST(max(v) AS BIGINT) AS q
      FROM ranked
      WHERE rn = ({_PB_TAU_NUM} * n + {_PB_TAU_DEN} - 1) // {_PB_TAU_DEN}
      GROUP BY flag),
    loss AS (
      SELECT b.flag,
             CAST(sum(CASE WHEN b.v >= q.q
                           THEN {_PB_TAU_NUM} * (b.v - q.q)
                           ELSE ({_PB_TAU_DEN} - {_PB_TAU_NUM})
                                * (q.q - b.v) END) AS BIGINT) AS loss_q
      FROM base b JOIN qh q ON q.flag = b.flag
      GROUP BY b.flag)
    SELECT q.flag, q.n, q.q AS q_hat_cents, l.loss_q,
           round(CAST(l.loss_q AS DOUBLE) / ({_PB_TAU_DEN}.0 * q.n), 6)
             + 0.0 AS mean_pinball_cents
    FROM qh q JOIN loss l ON l.flag = q.flag
    """,
)
def q_pinball_quantile(spark, sf_dir):
    """Per-return-flag exact tau=0.75 quantile (the ceil(tau*n) order
    statistic) and the mean pinball (quantile-regression check) loss at
    that quantile — the constant-predictor baseline any learned quantile
    regressor must beat, and the readout that verifies the empirical
    quantile MINIMIZES pinball loss (see the staging property test).
    Everything is exact: prices quantize to cents, the loss numerator is
    a BIGINT sum of tau-weighted integer gaps (x4 to stay integral), one
    float division at emit.  Plan: one flag-partitioned rank window +
    two flag-keyed aggs — no global sort, no collect."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.lit(100.0) * F.col("l_extendedprice") + F.lit(0.5))
        .cast("long").alias("v"),
    )
    w = Window.partitionBy("flag").orderBy("v")
    wn = Window.partitionBy("flag")
    ranked = li.select(
        "flag", "v",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    k = ((F.lit(_PB_TAU_NUM) * F.col("n") + F.lit(_PB_TAU_DEN - 1))
         / F.lit(_PB_TAU_DEN)).cast("long")
    qh = (ranked.filter(F.col("rn") == k)
          .groupBy("flag")
          .agg(F.max("n").cast("long").alias("n"),
               F.max("v").cast("long").alias("q")))
    loss = (
        li.join(F.broadcast(qh.select("flag", "q")), "flag")
        .groupBy("flag")
        .agg(F.sum(
            F.when(F.col("v") >= F.col("q"),
                   F.lit(_PB_TAU_NUM) * (F.col("v") - F.col("q")))
            .otherwise(F.lit(_PB_TAU_DEN - _PB_TAU_NUM)
                       * (F.col("q") - F.col("v")))
        ).cast("long").alias("loss_q"))
    )
    return qh.join(loss, "flag").select(
        "flag", "n",
        F.col("q").alias("q_hat_cents"),
        "loss_q",
        (F.round(F.col("loss_q").cast("double")
                 / (F.lit(float(_PB_TAU_DEN)) * F.col("n")), 6)
         + F.lit(0.0)).alias("mean_pinball_cents"),
    )


# -- temperature-mixture materialization (hash-remainder selection) ----------
_MM_SQ = 10**6  # sqrt-weight quantization (exact-BIGINT normalizer)


@_stage(
    "q_mixture_materialize",
    f"""
    WITH dt AS (
      SELECT source, doc_id,
             CAST(len(coalesce({_DUCK_TOKS}, [])) AS BIGINT) AS nt,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents),
    per AS MATERIALIZED (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens,
             CAST(floor({_MM_SQ}.0 * sqrt(CAST(sum(nt) AS DOUBLE)))
               AS BIGINT) AS sq
      FROM dt GROUP BY source),
    tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS budget,
             CAST(sum(sq) AS BIGINT) AS zq
      FROM per),
    tgt AS MATERIALIZED (
      SELECT p.source, p.n_docs, p.n_tokens,
             CAST(floor(t.budget * (CAST(p.sq AS DOUBLE) / t.zq))
               AS BIGINT) AS target
      FROM per p CROSS JOIN tot t),
    plan AS MATERIALIZED (
      SELECT source, n_docs, n_tokens, target,
             target // greatest(n_tokens, 1) AS full_epochs,
             target % greatest(n_tokens, 1) AS rem_budget
      FROM tgt),
    cum AS (
      SELECT d.source, d.doc_id, d.nt,
             sum(d.nt) OVER (PARTITION BY d.source
                             ORDER BY d.h, d.doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS ct
      FROM dt d),
    sel AS (
      SELECT c.source,
             CAST(count(*) AS BIGINT) AS rem_docs,
             CAST(coalesce(sum(c.nt), 0) AS BIGINT) AS rem_tokens,
             CAST(coalesce(sum(c.doc_id), 0) AS BIGINT) AS sel_id_sum
      FROM cum c JOIN plan p ON p.source = c.source
      WHERE c.ct <= p.rem_budget
      GROUP BY c.source)
    SELECT p.source, p.n_docs, p.n_tokens, p.target,
           CAST(p.full_epochs AS BIGINT) AS full_epochs,
           CAST(p.rem_budget AS BIGINT) AS rem_budget,
           CAST(coalesce(s.rem_docs, 0) AS BIGINT) AS rem_docs,
           CAST(coalesce(s.rem_tokens, 0) AS BIGINT) AS rem_tokens,
           CAST(coalesce(s.sel_id_sum, 0) AS BIGINT) AS sel_id_sum
    FROM plan p LEFT JOIN sel s ON s.source = p.source
    """,
)
def q_mixture_materialize(spark, sf_dir):
    """The missing last mile after q_temperature_mix / q_mixture_budget:
    actually MATERIALIZE the sqrt-temperature mixture against a budget of
    one total-corpus epoch — per source, the whole-corpus repeat count
    (full_epochs, >0 = the standard small-source upsampling) plus a
    deterministic md5-ordered remainder selection that fills the leftover
    token budget, reported as exact counts AND an id-sum checksum of the
    selected docs (so the oracle verifies WHICH docs were picked, not
    just how many).  Exactness: sqrt weights floor-quantize to 1e6
    BIGINTs before the normalizer sum (no cross-row double sums); the
    target chain is one mirrored double product; everything downstream is
    integer.  Plan: one doc scan, one source agg, broadcast plan attach,
    one source-partitioned cumulative window (per-source sort — the
    remainder cut needs an order; at 100 TB each source sorts in
    parallel), one source agg."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    from nonconsumptive_spark.functions.text import tokenize

    dt = docs.select(
        "source", "doc_id",
        F.size(tokenize(F.coalesce(F.col("text"), F.lit(""))))
        .cast("long").alias("nt"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    dt = materialize_once(dt, "mm_dt")  # per-source agg AND the cum window
    per = dt.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
        F.floor(F.lit(float(_MM_SQ))
                * F.sqrt(F.sum("nt").cast("double")))
        .cast("long").alias("sq"),
    )
    tot = per.agg(F.sum("n_tokens").cast("long").alias("budget"),
                  F.sum("sq").cast("long").alias("zq"))
    plan = (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source", "n_docs", "n_tokens",
            F.floor(F.col("budget")
                    * (F.col("sq").cast("double") / F.col("zq")))
            .cast("long").alias("target"),
        )
        .select(
            "source", "n_docs", "n_tokens", "target",
            F.expr("target div greatest(n_tokens, 1L)").cast("long")
            .alias("full_epochs"),
            (F.col("target") % F.greatest("n_tokens", F.lit(1).cast("long")))
            .cast("long").alias("rem_budget"),
        )
    )
    w = (Window.partitionBy("source").orderBy("h", "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = dt.select("source", "doc_id", "nt",
                    F.sum("nt").over(w).alias("ct"))
    sel = (
        cum.join(F.broadcast(plan.select("source", "rem_budget")), "source")
        .filter(F.col("ct") <= F.col("rem_budget"))
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("rem_docs"),
             F.coalesce(F.sum("nt"), F.lit(0)).cast("long")
             .alias("rem_tokens"),
             F.coalesce(F.sum("doc_id"), F.lit(0)).cast("long")
             .alias("sel_id_sum"))
    )
    return (
        plan.join(sel, "source", "left")
        .select(
            "source", "n_docs", "n_tokens", "target", "full_epochs",
            "rem_budget",
            F.coalesce("rem_docs", F.lit(0)).cast("long").alias("rem_docs"),
            F.coalesce("rem_tokens", F.lit(0)).cast("long")
            .alias("rem_tokens"),
            F.coalesce("sel_id_sum", F.lit(0)).cast("long")
            .alias("sel_id_sum"),
        )
    )
