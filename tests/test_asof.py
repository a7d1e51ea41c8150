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


def test_asof_null_right_attributes_stay_coherent(spark):
    """Right rows with NULL attributes: all matched attributes must come
    from the SAME right row (no per-column stitching), and an inner join
    must keep a match whose attributes are NULL."""
    trades = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:05"), "t1")], ["k", "ts", "trade_id"]
    )
    quotes = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 100.0, "mkt-A"),
         # the as-of match: later quote with a NULL price and a new venue
         (1, _ts("2024-01-01 10:00:03"), None, None)],
        "k long, qts timestamp, price double, venue string",
    )
    rows = asof_join(
        trades, quotes, on="k", left_ts="ts", right_ts="qts",
        right_cols=["price", "venue"], how="inner",
    ).collect()
    # inner keeps the match even though its attributes are NULL, and the
    # earlier row's (100.0, "mkt-A") must NOT leak through per-column.
    assert [(r["trade_id"], r["price"], r["venue"]) for r in rows] == [
        ("t1", None, None)
    ]


def test_asof_matches_pandas_merge_asof(spark):
    # randomized cross-check against the pandas reference implementation
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "k": rng.integers(0, 5, 60),
        "ts": pd.to_datetime(rng.integers(0, 10_000, 60), unit="s"),
        "lid": np.arange(60),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 5, 40),
        "rts": pd.to_datetime(rng.integers(0, 10_000, 40), unit="s"),
        "val": rng.normal(size=40).round(6),
    }).drop_duplicates(["k", "rts"])  # unique per (key, ts) => deterministic

    expect = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("rts"),
        left_on="ts", right_on="rts", by="k", direction="backward",
    )
    exp = {
        (int(r.lid), None if pd.isna(r.val) else round(float(r.val), 6))
        for r in expect.itertuples()
    }
    got_df = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="k", left_ts="ts", right_ts="rts", right_cols=["val"], how="left",
    )
    got = {
        (r["lid"], None if r["val"] is None else round(r["val"], 6))
        for r in got_df.collect()
    }
    assert got == exp
