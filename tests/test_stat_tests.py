"""Hand-computed cases for the statistical-test queries (Welch t,
chi-squared independence, two-sample KS) via their mirrored expression
strings and a tiny parquet corpus run through the registered queries."""

from __future__ import annotations

import math

import pytest

from nonconsumptive_spark.queries import all_queries


@pytest.fixture(scope="module")
def tiny_dir(spark, tmp_path_factory):
    """A documents.parquet with two sources of known lengths and a
    lang column correlated with source."""
    root = tmp_path_factory.mktemp("stats")
    rows = []
    # source sa: lengths 10,12,14,16 (lang en); source sb: 20,24,28,32 (de)
    for i, n in enumerate([10, 12, 14, 16]):
        rows.append((i, "x " * 5, "en", "sa", n))
    for i, n in enumerate([20, 24, 28, 32]):
        rows.append((10 + i, "y " * 5, "de", "sb", n))
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(
        str(root / "documents.parquet"))
    return str(root)


def test_welch_t_hand_computed(spark, tiny_dir):
    out = all_queries()["q_welch_ttest_sources"].spark_fn(
        spark, tiny_dir).collect()
    assert len(out) == 1
    r = out[0]
    a, b = [10, 12, 14, 16], [20, 24, 28, 32]
    ma, mb = sum(a) / 4, sum(b) / 4
    va = sum((x - ma) ** 2 for x in a) / 3
    vb = sum((x - mb) ** 2 for x in b) / 3
    t = (ma - mb) / math.sqrt(va / 4 + vb / 4)
    df = (va / 4 + vb / 4) ** 2 / ((va / 4) ** 2 / 3 + (vb / 4) ** 2 / 3)
    assert r["n_a"] == 4 and r["n_b"] == 4
    assert abs(r["t_stat"] - round(t, 4)) < 1e-9
    assert abs(r["welch_df"] - round(df, 2)) < 1e-9


def test_chi2_perfectly_dependent(spark, tiny_dir):
    # lang is fully determined by source: 2x2 with diagonal 4s ->
    # chi2 = N = 8, dof = 1
    r = all_queries()["q_lang_source_chi2"].spark_fn(
        spark, tiny_dir).collect()[0]
    assert r["n_cells"] == 4 and r["dof"] == 1
    assert abs(r["chi2"] - 8.0) < 1e-6


def test_ks_disjoint_supports(spark, tiny_dir):
    # sa's lengths all below sb's -> CDFs separate completely -> KS = 1
    r = all_queries()["q_ks_length_sources"].spark_fn(
        spark, tiny_dir).collect()[0]
    assert (r["source_a"], r["source_b"]) == ("sa", "sb")
    assert r["ks_q"] == 16  # max|cum_a*4 - cum_b*4| = 4*4
    assert r["ks_stat"] == 1.0


def test_ks_identical_distributions(spark, tmp_path):
    rows = [(i, "t", "en", "sa", 10 + (i % 3)) for i in range(9)]
    rows += [(100 + i, "t", "en", "sb", 10 + (i % 3)) for i in range(9)]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    r = all_queries()["q_ks_length_sources"].spark_fn(spark, d).collect()[0]
    assert r["ks_q"] == 0 and r["ks_stat"] == 0.0


def test_mwu_hand_computed_with_ties(spark, tmp_path):
    # a = [1,2,2], b = [2,3]: the three 2s share midrank 3 ->
    # R_a = 1 + 3 + 3 = 7, U_a = R_a - n_a(n_a+1)/2 = 1 -> 2U = 2
    rows = [(0, "t", "en", "sa", 1), (1, "t", "en", "sa", 2),
            (2, "t", "en", "sa", 2), (10, "t", "en", "sb", 2),
            (11, "t", "en", "sb", 3)]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    r = all_queries()["q_mann_whitney_sources"].spark_fn(spark, d).collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 2)
    assert r["u2_q"] == 2
    assert r["u_stat"] == 1.0


def test_mwu_disjoint_and_identical(spark, tmp_path):
    # disjoint supports (all a < all b): U_a = 0; swap roles -> U_a = n1*n2
    rows = [(i, "t", "en", "sa", i + 1) for i in range(3)]
    rows += [(10 + i, "t", "en", "sb", 100 + i) for i in range(3)]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    r = all_queries()["q_mann_whitney_sources"].spark_fn(spark, d).collect()[0]
    assert r["u2_q"] == 0
    assert r["z_stat"] < -1.9  # strongly separated


def test_spearman_perfect_monotone(spark, tmp_path):
    # y strictly increasing in x -> rho = 1 exactly
    rows = [(i, "t " * (i + 1), "en", "sa", (i + 1) * 3) for i in range(10)]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    r = all_queries()["q_spearman_len_tokens"].spark_fn(spark, d).collect()[0]
    assert r["n"] == 10
    assert r["spearman_rho"] == 1.0


def test_spearman_perfect_inverse(spark, tmp_path):
    rows = [(i, "t " * (10 - i), "en", "sa", (i + 1) * 3) for i in range(10)]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    r = all_queries()["q_spearman_len_tokens"].spark_fn(spark, d).collect()[0]
    assert r["spearman_rho"] == -1.0


def test_daily_autocorr_alternating_series(spark, tmp_path):
    """Counts alternating 1,3,1,3,... over 8 days: lag-1 ACF strongly
    negative, lag-2 strongly positive (with the n_pairs/n taper of the
    global-mean ACF)."""
    import datetime as dt

    rows, eid = [], 0
    for day in range(8):
        for _ in range(1 if day % 2 == 0 else 3):
            rows.append((eid, dt.datetime(2024, 1, 1 + day, 12), eid % 5,
                         "click", 1.0, "{}"))
            eid += 1
    d = str(tmp_path)
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).coalesce(1).write.mode("overwrite").parquet(d + "/events.parquet")
    out = {r["lag"]: r for r in
           all_queries()["q_daily_autocorr"].spark_fn(spark, d).collect()}
    assert out[1]["n_pairs"] == 7 and out[2]["n_pairs"] == 6
    assert out[1]["acf"] < -0.7
    assert out[2]["acf"] > 0.7
    # exact ACF hand-check at lag 1: e_t = n*c_t - S with n=8, S=16
    e = [8 * (1 if i % 2 == 0 else 3) - 16 for i in range(8)]
    num = sum(e[i] * e[i + 1] for i in range(7))
    den = sum(x * x for x in e)
    assert out[1]["num"] == num
    assert out[1]["acf"] == round(num / den, 6)
