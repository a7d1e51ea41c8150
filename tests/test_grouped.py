"""Grouped-map (applyInPandas) operator semantics."""

from __future__ import annotations

import datetime as dt

from nonconsumptive_spark.operators.grouped import user_value_trend


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_theil_sen_golden(spark):
    """Hand-computed: user 1 has values 0,60,120 at minutes 0,1,2 plus an
    outlier 0 at minute 3 — pairwise slopes per hour are [3600, 3600,
    3600, 0, -1800, -3600]; their median is (3600+0)/2 = 1800.  A
    least-squares fit would be dragged far below that by the outlier."""
    events = spark.createDataFrame(
        [(1, _ts(0), 0.0), (1, _ts(1), 60.0), (1, _ts(2), 120.0),
         (1, _ts(3), 0.0),
         (2, _ts(0), 1.0), (2, _ts(1), 2.0)],  # only 2 points → dropped
        ["user_id", "ts", "value"],
    )
    rows = {r["user_id"]: r for r in user_value_trend(events, min_points=3).collect()}
    assert set(rows) == {1}
    assert rows[1]["n_points"] == 4
    assert rows[1]["slope_per_hour"] == 1800.0


def test_theil_sen_equal_timestamps_dropped(spark):
    events = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, _ts(0), 2.0), (1, _ts(0), 3.0)],
        ["user_id", "ts", "value"],
    )
    assert user_value_trend(events, min_points=3).count() == 0
