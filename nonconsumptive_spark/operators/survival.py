"""Survival regression: Cox proportional hazards for a binary covariate.

Completes the survival battery (q_kaplan_meier / q_nelson_aalen /
q_weibull_fit describe curves, q_logrank_test tests equality): Cox PH
ESTIMATES the effect size — the log hazard ratio beta between the two
cohorts — which the log-rank test only rejects or not.

Exactness discipline (the kcenter/Lloyd/logrank pattern): Newton runs on
theta = exp(beta) directly, so every in-loop quantity is a RATIONAL
function of exact risk-set integers and theta — no exp/ln inside the
iteration (engine libm exp is not guaranteed bit-identical; ln appears
only at emit under round(,6)).  Per-event-time score and information
terms floor-quantize to 1e-9 BIGINTs before summing, so the sums are
order-free and the theta update (one float divide + add from two BIGINTs)
replays bit-for-bit in the unrolled-CTE DuckDB oracle.

Scale shape: one user agg over the events table, then everything is
#distinct-durations-sized (the KM spine): cohort-partitioned cumulative
windows build the risk sets, each Newton round is one scan of the
materialized spine + a bounded 1-row collect (the established
1-row-per-round convention).  At 100 TB the spine is centuries-of-days
small; the only corpus-sized work is the per-user min/max agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nonconsumptive_spark.plans.checkpoint import materialize_once

COX_Q = 10**9         # per-term quantization (the logrank discipline)
COX_ROUNDS = 6        # unrolled Newton rounds from theta = 1.0
COX_THETA_FLOOR = 1e-6  # overshoot guard, mirrored as greatest()
_US_PER_HOUR = 3_600_000_000


def cohort_event_spine(events: DataFrame) -> DataFrame:
    """(dur, d_a, d_b, n_a, n_b): per distinct duration the cohort event
    counts and risk-set sizes — the sufficient statistic of a
    binary-covariate Cox PH.  Cohorts are the deterministic odd/even user
    split.  Duration is hours from a user's FIRST event to their FIRST
    'purchase' (event = converted) or to their last observed event
    (censored) — the q_time_to_convert framing, which unlike the
    q_kaplan_meier last-activity convention is non-degenerate on the test
    events table (its 30-day span leaves every user active at the end).

    Hour durations via integer epoch-microsecond division — NOT
    date_diff('hour'): DuckDB counts hour-BOUNDARY crossings where Spark's
    timestampdiff counts full elapsed hours, so only the epoch-div form
    mirrors exactly."""
    pu = events.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .alias("tp"),
        F.max("ts").alias("tl"),
    )
    durs = pu.select(
        F.when(F.col("user_id") % 2 == 1, F.lit(1)).otherwise(F.lit(0))
        .alias("g"),
        F.expr(f"timestampdiff(MICROSECOND, t0, coalesce(tp, tl))"
               f" div {_US_PER_HOUR}").cast("long").alias("dur"),
        F.when(F.col("tp").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        .alias("ev"),
    )
    durs = materialize_once(durs, "cox_durs")
    gt = durs.groupBy("g").agg(F.count("*").cast("long").alias("n_users"))
    tbl = durs.groupBy("g", "dur").agg(
        F.count("*").cast("long").alias("n_all"),
        F.sum("ev").cast("long").alias("d"))
    tbl = materialize_once(tbl, "cox_tbl")
    grid = (
        tbl.select("dur").distinct()
        .crossJoin(F.broadcast(gt.select("g")))
        .join(tbl, ["g", "dur"], "left")
        .select("g", "dur",
                F.coalesce("n_all", F.lit(0)).cast("long").alias("n_all"),
                F.coalesce("d", F.lit(0)).cast("long").alias("d"))
    )
    w_prev = (Window.partitionBy("g").orderBy("dur")
              .rowsBetween(Window.unboundedPreceding, -1))
    risk = (
        grid.join(F.broadcast(gt), "g")
        .select("g", "dur", "d",
                (F.col("n_users")
                 - F.coalesce(F.sum("n_all").over(w_prev), F.lit(0)))
                .cast("long").alias("n_risk"))
    )
    return risk.groupBy("dur").agg(
        F.sum(F.when(F.col("g") == 1, F.col("d")).otherwise(0))
        .cast("long").alias("d_a"),
        F.sum(F.when(F.col("g") == 0, F.col("d")).otherwise(0))
        .cast("long").alias("d_b"),
        F.sum(F.when(F.col("g") == 1, F.col("n_risk")).otherwise(0))
        .cast("long").alias("n_a"),
        F.sum(F.when(F.col("g") == 0, F.col("n_risk")).otherwise(0))
        .cast("long").alias("n_b"),
    )


def _round_sums(spine: DataFrame, theta: float) -> tuple[int, int]:
    """(us, js): quantized Breslow score and information sums at theta.

    Per event time with d = d_a + d_b events, S0(theta) = n_b + n_a*theta:
      score term  d_a - d * (n_a*theta / S0)
      info  term  d * n_a * n_b / S0^2          (d/dtheta of -score)
    Both are single float chains over exact integers and theta, written
    with IDENTICAL operation order in the DuckDB oracle, floor-quantized
    to COX_Q BIGINTs so the cross-row sums are order-free."""
    th = F.lit(float(theta))
    s0 = F.col("n_b") + F.col("n_a") * th
    d = F.col("d_a") + F.col("d_b")
    row = spine.filter(d > 0).select(
        F.floor(F.lit(float(COX_Q))
                * (F.col("d_a") - d * (F.col("n_a") * th / s0)))
        .cast("long").alias("uq"),
        F.floor(F.lit(float(COX_Q))
                * (d * F.col("n_a") * F.col("n_b").cast("double")
                   / (s0 * s0)))
        .cast("long").alias("jq"),
    ).agg(
        F.coalesce(F.sum("uq"), F.lit(0)).cast("long").alias("us"),
        F.coalesce(F.sum("jq"), F.lit(0)).cast("long").alias("js"),
    )
    r = row.collect()[0]  # bounded: 1 row per Newton round
    return int(r["us"]), int(r["js"])


def cox_ph_binary(events: DataFrame, rounds: int = COX_ROUNDS) -> DataFrame:
    """One-row Cox PH fit over the odd/even user cohorts:
    (n_treat, n_control, d_treat, d_total, us, js, theta, beta, se_beta).

    theta is the hazard ratio after ``rounds`` Newton steps from 1.0
    (theta' = theta + us/js, floored at COX_THETA_FLOOR; us/js = 0 rounds
    are no-ops so fully-censored frames emit theta = 1, beta = 0); us/js
    are the FINAL round's quantized sums (us ~ 0 at convergence — the
    readout's own convergence witness).  beta = ln(theta) and
    se_beta = 1/sqrt(theta*js/Q) appear only at emit under round(,6).

    Reference framing: the reference engine has no survival surface at
    all; this extends the training-data analytics battery
    (/root/reference/nonconsumptive/corpus.py has only count aggregates)."""
    spine = materialize_once(cohort_event_spine(events), "cox_spine")
    theta = 1.0
    us = js = 0
    for _ in range(rounds):
        us, js = _round_sums(spine, theta)
        if js > 0:
            # float(us) first: round the exact-int numerator to double
            # BEFORE dividing, mirroring the oracle's
            # CAST(us AS DOUBLE)/js operand order — Python's exact-int
            # true division differs by 1 ulp once |us| > 2^53.
            theta = max(theta + float(us) / float(js), COX_THETA_FLOOR)
    gt = (spine.sparkSession.createDataFrame([(theta, us, js)],
                                             "theta double, us long, js long"))
    counts = spine.agg(
        F.max(F.col("n_a")).cast("long").alias("n_treat"),
        F.max(F.col("n_b")).cast("long").alias("n_control"),
        F.sum("d_a").cast("long").alias("d_treat"),
        (F.sum("d_a") + F.sum("d_b")).cast("long").alias("d_total"),
    )
    return counts.crossJoin(F.broadcast(gt)).select(
        "n_treat", "n_control", "d_treat", "d_total", "us", "js",
        (F.round(F.col("theta"), 6) + F.lit(0.0)).alias("theta"),
        (F.round(F.log(F.col("theta")), 6) + F.lit(0.0)).alias("beta"),
        F.when(F.col("js") > 0, F.round(
            F.lit(1.0) / F.sqrt(F.col("theta") * F.col("js")
                                / F.lit(float(COX_Q))), 6) + F.lit(0.0))
        .alias("se_beta"),
    )
