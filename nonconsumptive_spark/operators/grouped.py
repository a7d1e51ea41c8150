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
    where a least-squares fit is not."""
    schema = f"{key_col} long, n_points long, slope_per_hour double"

    def trend(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < min_points:
            return pd.DataFrame(columns=[key_col, "n_points", "slope_per_hour"])
        t = pdf[ts_col].astype("int64").to_numpy() // 1000  # micros
        v = pdf[value_col].astype("float64").to_numpy()
        dt = t[None, :] - t[:, None]  # pairwise, micros
        dv = v[None, :] - v[:, None]
        mask = dt > 0  # strictly later; excludes equal timestamps
        if not mask.any():
            return pd.DataFrame(columns=[key_col, "n_points", "slope_per_hour"])
        slopes = dv[mask] / dt[mask] * 3_600_000_000.0  # per hour
        return pd.DataFrame({
            key_col: [pdf[key_col].iloc[0]],
            "n_points": [n],
            "slope_per_hour": [round(float(np.median(slopes)), 4)],
        })

    return (
        events.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandas(trend, schema=schema)
    )
