"""Grouped-map (``applyInPandas``) operators — SURVEY §2.10's remaining
UDF surface: the reference's per-document generator (``upstream_documents``
yields one batch per doc, ``data_storage.py:360-367``) maps to
``groupBy(key).applyInPandas`` — one pandas frame per group, arbitrary
imperative logic inside.

Use this surface ONLY for per-group computations no built-in aggregate
expresses; everything else in the repo stays in JVM expressions.  The
exemplar here is the Theil–Sen estimator: a robust per-user trend that is
the MEDIAN OF ALL PAIRWISE SLOPES — order statistics over O(n²) derived
values, a genuinely imperative kernel.

Scale shape: one shuffle on the group key, then embarrassingly parallel
numpy per group; cost is bounded by the largest single group (pairwise
slopes are O(n²) per group — cap or sample groups beyond ~10⁴ points).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def user_value_trend(events: DataFrame, min_points: int = 3,
                     key_col: str = "user_id", ts_col: str = "ts",
                     value_col: str = "value") -> DataFrame:
    """(user, n_points, slope_per_hour): Theil–Sen robust slope of
    ``value`` over event time per user — median of all pairwise slopes
    (value units per hour), for users with ≥ ``min_points`` events and at
    least one pair of distinct timestamps.  Robust to outlier events
    where a least-squares fit is not.

    Grouped by a 128-way SALT BUCKET of the user key, not the user key
    itself: the per-user numpy kernel is unchanged (users never split
    across buckets), but ~10k single-user pandas groups paid ~2.5s of
    constant Arrow/pandas per-group overhead at sf0.1 — bucketing
    amortizes it (measured 2.8s -> ~1s warm)."""
    from pyspark.sql import functions as F

    schema = f"{key_col} long, n_points long, slope_per_hour double"

    def trend(pdf: pd.DataFrame) -> pd.DataFrame:
        users, ns, slopes_out = [], [], []
        for uid, g in pdf.groupby(key_col, sort=False):
            n = len(g)
            if n < min_points:
                continue
            t = g[ts_col].astype("int64").to_numpy() // 1000  # micros
            v = g[value_col].astype("float64").to_numpy()
            dt = t[None, :] - t[:, None]  # pairwise, micros
            dv = v[None, :] - v[:, None]
            mask = dt > 0  # strictly later; excludes equal timestamps
            if not mask.any():
                continue
            slopes = dv[mask] / dt[mask] * 3_600_000_000.0  # per hour
            users.append(uid)
            ns.append(n)
            slopes_out.append(round(float(np.median(slopes)), 4))
        return pd.DataFrame({
            key_col: pd.array(users, dtype="int64"),
            "n_points": pd.array(ns, dtype="int64"),
            "slope_per_hour": pd.array(slopes_out, dtype="float64"),
        })

    return (
        events.select(key_col, ts_col, value_col)
        .withColumn("_bkt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(128)))
        .groupBy("_bkt")
        .applyInPandas(trend, schema=schema)
    )


EWMA_ALPHA = 0.25
EWMA_SPIKE = 50.0


def ewma_anomalies(events: DataFrame, alpha: float = EWMA_ALPHA,
                   spike: float = EWMA_SPIKE, key_col: str = "user_id",
                   ts_col: str = "ts", id_col: str = "event_id",
                   value_col: str = "value") -> DataFrame:
    """(event_id, user_id, value, ewma, is_spike) — per-user exponentially
    weighted moving average of ``value`` over the (ts, id) total order,
    plus a spike flag where |value - previous ewma| > ``spike`` (the
    streaming-monitor recurrence, run as a batch backfill).

    Why grouped-map: the recurrence e_i = a*v_i + (1-a)*e_{i-1} is
    inherently sequential per key — no built-in window expresses it
    without an O(n)-term power expansion that under/overflows and whose
    cross-row float SUM is aggregation-order dependent.  The sequential
    form is deterministic: with a = 0.25 (exact binary), each step is two
    correctly-rounded multiplies and one add over the SAME operand
    sequence in any engine, so results are bit-identical to the oracle's
    recursive-CTE replay before the output rounding (applied Spark-side,
    not in pandas, so both engines share one rounding rule).

    Scale shape: ONE shuffle — on a SALT BUCKET of the user key (128
    buckets x shuffle parallelism would be user-keyed; bucketing many
    users per pandas group amortizes the per-group Arrow/pandas overhead
    that dominated the user-keyed form: 10k single-user groups cost ~4s
    of constant overhead at sf0.1; 128 bucket groups cost none) — then
    one vectorized groupby-ewm pass per bucket (pandas Cython kernel,
    verified bit-identical to the per-user loop).  Users never split
    across buckets, so the recurrence is intact; state is one double per
    user.

    NaN values take the per-row NaN-PROPAGATING loop (pandas ewm SKIPS
    NaN; the monitor's contract poisons the tail instead), per bucket.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    schema = (f"{id_col} long, {key_col} long, {value_col} double, "
              "raw_ewma double, prev double")
    one_minus = 1.0 - alpha
    # pandas' ewm(adjust=False) normalizes each step by fl((1-a)+a); the
    # bit-identity argument vs the explicit loop below holds only when
    # that divisor is exactly 1.0 (true for a=0.25 and any a whose
    # complement is exact in binary).  Other alphas drift 1 ulp per step,
    # so they must take the loop even on NaN-free buckets.
    fast_path_exact = (one_minus + alpha) == 1.0

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([key_col, ts_col, id_col], kind="mergesort")
        v = pdf[value_col].astype("float64").to_numpy()
        keys = pdf[key_col].to_numpy()
        if fast_path_exact and not np.isnan(v).any():
            # vectorized fast path: groupby-ewm(adjust=False) runs the
            # SAME recurrence (two correctly-rounded multiplies + one add
            # per step; IEEE mul/add are commutative, so operand-order
            # differences cannot change a bit) in C — verified
            # bit-identical to the loop on randomized multi-user frames
            # and against the DuckDB recursive-CTE oracle at two SFs.
            e = (pdf.groupby(key_col, sort=True)[value_col]
                 .ewm(alpha=alpha, adjust=False).mean().to_numpy())
            prev = np.empty_like(e)
            prev[0] = float("nan")
            prev[1:] = e[:-1]
            if len(keys) > 1:
                prev[np.r_[True, keys[1:] != keys[:-1]]] = float("nan")
        else:
            e = np.empty_like(v)
            prev = np.empty_like(v)
            acc = float("nan")
            last_key = None
            for i, (k, x) in enumerate(zip(keys, v)):
                first = k != last_key
                if first:
                    acc, last_key = float("nan"), k
                prev[i] = acc
                # seed on the user's FIRST row only; a mid-stream NaN
                # poisons the tail (acc stays NaN through the recurrence)
                acc = x if first else alpha * x + one_minus * acc
                e[i] = acc
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy(),
            key_col: keys,
            value_col: v,
            "raw_ewma": e,
            "prev": prev,
        })

    out = (
        events.select(key_col, id_col, ts_col, value_col)
        .withColumn("_bkt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(128)))
        .groupBy("_bkt")
        .applyInPandas(run, schema=schema)
    )
    # NOT F.round: with cent-precision inputs and a power-of-two alpha the
    # recurrence lands EXACTLY on half-way decimals (e.g. 77.2034375), where
    # Spark's decimal HALF_UP and DuckDB's float round disagree.  The
    # explicit floor(x*1e6 + 0.5)/1e6 quantization is three correctly-
    # rounded IEEE ops — bit-identical on both engines, half-way cases
    # included (values are positive; floor is the right half-up there).
    return out.select(
        id_col, key_col, value_col,
        (F.floor(F.col("raw_ewma") * 1_000_000 + F.lit(0.5))
         / F.lit(1_000_000.0)).alias("ewma"),
        F.when(F.col("prev").isNull() | F.isnan("prev"), F.lit(False))
        .otherwise(F.abs(F.col(value_col) - F.col("prev")) > spike)
        .alias("is_spike"),
    )


HOLT_ALPHA = 0.5   # exact binary: each step is correctly-rounded IEEE ops
HOLT_BETA = 0.25
HOLT_SCALE = 1_000_000


def holt_linear_daily(events: DataFrame, alpha: float = HOLT_ALPHA,
                      beta: float = HOLT_BETA,
                      ts_col: str = "ts") -> DataFrame:
    """(day, n_events, level, trend, forecast_err) — Holt's linear
    (double-exponential) smoothing over the daily event-count series:
    l_t = α·x_t + (1−α)·(l_{t−1}+b_{t−1}),
    b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}, seeded l_1 = x_1, b_1 = 0;
    forecast_err is the one-step-ahead error x_t − (l_{t−1}+b_{t−1})
    (0 at t=1) — the trend-aware sibling of the EWMA monitor.

    Why grouped-map: the coupled (level, trend) recurrence is inherently
    sequential and not window-expressible; the fold runs over the DAY
    SPINE (one row per day — corpus-size independent after the daily
    agg), the same bounded-spine discipline as CUSUM and Kaplan-Meier.
    With exact-binary α, β every step is correctly-rounded IEEE mul/add
    over the same operand order as the oracle's recursive CTE, so raw
    doubles agree bit-for-bit before the shared floor-quantization
    (plain floor, NOT +0.5: trend and error go negative, and floor is
    the one rule both engines share on negatives)."""
    from pyspark.sql import functions as F

    from pyspark.sql import functions as F

    days = (
        events.groupBy(F.date_format(ts_col, "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    return holt_from_day_counts(days, alpha=alpha, beta=beta)


def holt_from_day_counts(days: DataFrame, alpha: float = HOLT_ALPHA,
                         beta: float = HOLT_BETA) -> DataFrame:
    """The Holt fold over a prepared (day, n_events) spine — shared by
    the batch operator above and the streaming monitor
    (streaming/holt.py), which re-folds the committed day table each
    epoch (the spine is corpus-age-bounded, so a full refold is O(days)
    and keeps chunked == batch equality trivial and bit-exact)."""
    from pyspark.sql import functions as F

    one_minus_a = 1.0 - alpha
    one_minus_b = 1.0 - beta
    schema = "day string, n_events long, l double, b double, fe double"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day", kind="mergesort")
        x = pdf["n_events"].astype("float64").to_numpy()
        l = np.empty_like(x)
        b = np.empty_like(x)
        fe = np.empty_like(x)
        for i, xi in enumerate(x):
            if i == 0:
                l[i], b[i], fe[i] = xi, 0.0, 0.0
                continue
            f = l[i - 1] + b[i - 1]
            fe[i] = xi - f
            l[i] = alpha * xi + one_minus_a * f
            b[i] = beta * (l[i] - l[i - 1]) + one_minus_b * b[i - 1]
        return pd.DataFrame({
            "day": pdf["day"].to_numpy(),
            "n_events": pdf["n_events"].to_numpy(),
            "l": l, "b": b, "fe": fe,
        })

    out = (
        days.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(lambda pdf: fold(pdf.drop(columns="__g")),
                       schema=schema)
    )
    quant = [
        (F.floor(F.col(c) * HOLT_SCALE).cast("long")
         / F.lit(float(HOLT_SCALE)) + F.lit(0.0)).alias(name)
        for c, name in (("l", "level"), ("b", "trend"),
                        ("fe", "forecast_err"))
    ]
    return out.select("day", "n_events", *quant)
