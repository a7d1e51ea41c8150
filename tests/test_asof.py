"""As-of join unit semantics (the oracle query covers the bulk path)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nonconsumptive_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_inner_and_left(spark):
    trades = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:05"), "t1"),
         (1, _ts("2024-01-01 10:00:00"), "t0"),
         (2, _ts("2024-01-01 09:00:00"), "t2")],
        ["k", "ts", "trade_id"],
    )
    quotes = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 100.0),
         (1, _ts("2024-01-01 10:00:03"), 101.0),
         (2, _ts("2024-01-01 09:30:00"), 50.0)],  # after the only k=2 trade
        ["k", "qts", "price"],
    )
    inner = {
        (r["trade_id"], r["price"])
        for r in asof_join(trades, quotes, on="k", left_ts="ts", right_ts="qts",
                           right_cols=["price"], how="inner").collect()
    }
    # t0 matches the equal-timestamp quote (inclusive); t1 takes the later
    # 10:00:03 quote; t2 has no preceding quote and is dropped.
    assert inner == {("t0", 100.0), ("t1", 101.0)}

    left = {
        (r["trade_id"], r["price"])
        for r in asof_join(trades, quotes, on="k", left_ts="ts", right_ts="qts",
                           right_cols=["price"], how="left").collect()
    }
    assert left == {("t0", 100.0), ("t1", 101.0), ("t2", None)}
