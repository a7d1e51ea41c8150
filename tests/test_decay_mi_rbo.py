"""Unit semantics for the r4e statistics ops: time-decayed engagement,
categorical mutual information, and rank-biased overlap.

The oracle queries cover the bulk paths at sf0.01/sf0.1; these pin
hand-computable cases on tiny frames.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nonconsumptive_spark.operators.hybrid import (
    RBO_P,
    RBO_SCALE,
    rbo_rankers,
)
from nonconsumptive_spark.queries.events import _DECAY_SCALE, _DECAY_WQ
from nonconsumptive_spark.queries.textstats import _MI_SCALE, _MI_TERM


# ------------------------------------------------------------- decay ----
def test_decay_weight_expression(spark):
    # age 0 -> weight exactly 1.0 -> wq == SCALE; 7-day age (one half
    # life) -> wq within 1 integer unit of SCALE/2 (libm ulp tolerance —
    # the ORACLE equality is what pins cross-engine parity).
    week_us = 7 * 86400 * 1_000_000
    df = spark.createDataFrame(
        [(100, 100), (0, week_us)], ["us", "ref_us"]
    )
    out = sorted(
        r["wq"] for r in df.selectExpr(f"{_DECAY_WQ} AS wq").collect()
    )
    assert out[1] == _DECAY_SCALE
    expect_half = math.floor(
        math.exp(-(week_us / 86400e6) * math.log(2.0) / 7.0) * _DECAY_SCALE
    )
    assert abs(out[0] - expect_half) <= 1
    assert abs(out[0] - _DECAY_SCALE // 2) <= 2


def test_decay_weight_monotone_in_age(spark):
    ref = 10**12
    rows = [(ref - i * 10**10, ref) for i in range(10)]
    df = spark.createDataFrame(rows, ["us", "ref_us"])
    ws = [r["wq"] for r in
          df.selectExpr("us", f"{_DECAY_WQ} AS wq").orderBy(F.desc("us")).collect()]
    assert ws == sorted(ws, reverse=True)
    assert all(0 < w <= _DECAY_SCALE for w in ws)


# ---------------------------------------------------------------- MI ----
def test_mi_zero_for_independent_columns(spark):
    # perfectly independent 2x2 -> every cell term ln(1) = 0 exactly
    cells = spark.createDataFrame(
        [("a", "x", 10, 20, 20, 40), ("a", "y", 10, 20, 20, 40),
         ("b", "x", 10, 20, 20, 40), ("b", "y", 10, 20, 20, 40)],
        ["lang", "source", "n_ls", "n_l", "n_s", "n"],
    )
    tq = [r["tq"] for r in cells.selectExpr(f"{_MI_TERM} AS tq").collect()]
    assert tq == [0, 0, 0, 0]


def test_mi_ln2_for_determined_columns(spark):
    # lang == source diagonal -> MI = ln 2 nats
    cells = spark.createDataFrame(
        [("a", "a", 20, 20, 20, 40), ("b", "b", 20, 20, 20, 40)],
        ["lang", "source", "n_ls", "n_l", "n_s", "n"],
    )
    tq = sum(r["tq"] for r in cells.selectExpr(f"{_MI_TERM} AS tq").collect())
    mi = tq / (40 * _MI_SCALE)
    assert abs(mi - math.log(2.0)) < 1e-6


# --------------------------------------------------------------- RBO ----
def test_rbo_single_shared_top_doc(spark):
    # Query doc 0: lexical list = [doc 1] only (no other doc shares a
    # bigram); semantic list has doc 1 at rank 1.  Prefix overlap X_d = 1
    # at every depth -> rbo_q = sum(floor(p^(d-1)/d * SCALE)).
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta gamma")]
        + [(i, f"pad{i} fill{i}") for i in range(2, 25)],
        ["doc_id", "text"],
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.05])]
        + [(i, [1.0, float(i)]) for i in range(2, 25)],
        ["vec_id", "embedding"],
    )
    out = rbo_rankers(docs, emb, n_queries=1, depth=20).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_shared"] == 1
    expect_q = sum(
        math.floor(1.0 * (RBO_P ** (d - 1)) / d * RBO_SCALE)
        for d in range(1, 21)
    )
    # per-depth libm pow ulp tolerance: <= 1 unit per term
    assert abs(r["rbo_q"] - expect_q) <= 20
    assert 0.0 < r["rbo"] < 1.0


def test_rbo_identical_vs_disjoint_ordering(spark):
    # query shares one UNIQUE bigram (df=2, under the stop cut at 22
    # docs) with each candidate; all overlaps tie at 1 so lexical rank =
    # id order, matching the semantic (cosine-decreasing-in-id) order.
    # rbo must be far above the nothing-shared case (exactly 0).
    # NB tokenizer is letters-only: digit-bearing "words" would collapse
    name = [f"w{chr(ord('a') + i)}x" for i in range(22)]
    docs = spark.createDataFrame(
        [(0, " ".join(f"{name[i]} {name[i]}" for i in range(1, 22)))]
        + [(i, f"{name[i]} {name[i]}") for i in range(1, 22)],
        ["doc_id", "text"])
    emb = spark.createDataFrame(
        [(i, [1.0, float(i) * 0.01]) for i in range(22)],
        ["vec_id", "embedding"])
    shared = rbo_rankers(docs, emb, n_queries=1, depth=20).collect()[0]
    assert shared["n_shared"] == 20
    assert shared["rbo"] > 0.5

    docs2 = spark.createDataFrame(
        [(0, "unique query words")]
        + [(i, f"pad{i} fill{i}") for i in range(1, 22)],
        ["doc_id", "text"])
    none = rbo_rankers(docs2, emb, n_queries=1, depth=20).collect()[0]
    assert none["n_shared"] == 0 and none["rbo_q"] == 0
    assert none["rbo"] == 0.0


# ------------------------------------------------- behavior similarity ----
def test_behavior_pairs_blocking_and_cosine(spark, tmp_path):
    """Users 1 and 2 repeat the same a>b>a pattern (same modal trigram,
    cosine 1.0); user 3's modal trigram differs, so it is never compared
    even though it shares some grams."""
    import datetime as dt

    from nonconsumptive_spark.queries import all_queries

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def add(u, types):
        nonlocal eid
        for i, t in enumerate(types):
            rows.append((eid, base + dt.timedelta(minutes=eid), u, t, 1.0,
                         "{}"))
            eid += 1

    add(1, ["a", "b", "a", "b", "a"])        # grams: aba, bab, aba
    add(2, ["a", "b", "a", "b", "a"])        # identical pattern
    add(3, ["c", "c", "c", "c", "c", "a", "b", "a"])  # modal c>c>c (x3)
    d = str(tmp_path)
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).coalesce(1).write.mode("overwrite").parquet(d + "/events.parquet")
    out = all_queries()["q_user_behavior_pairs"].spark_fn(spark, d).collect()
    assert [(r["user_a"], r["user_b"]) for r in out] == [(1, 2)]
    assert out[0]["cosine"] == 1.0
    assert out[0]["topg"] == "a>b>a"
