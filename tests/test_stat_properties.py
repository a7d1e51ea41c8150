"""Property tests for the r4e statistics family: bound and invariance
properties that must hold for ANY input, checked on random tiny corpora
through the registered queries (writing documents.parquet per example)."""

from __future__ import annotations

import pytest

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nonconsumptive_spark.queries import all_queries

SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (source in {sa, sb, sc}, n_chars in 1..50) — at least 2 docs per source
# so Welch variances exist
_doc = st.tuples(st.sampled_from(["sa", "sb", "sc"]), st.integers(1, 50))
_corpus = st.lists(_doc, min_size=8, max_size=30).filter(
    lambda rows: all(
        sum(1 for s, _ in rows if s == src) >= 2
        for src in {s for s, _ in rows}
    )
)


def _write(spark, tmpdir, rows):
    data = [(i, "tok", "en", s, n) for i, (s, n) in enumerate(rows)]
    spark.createDataFrame(
        data, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(tmpdir + "/documents.parquet")


@SET
@given(_corpus)
@pytest.mark.sweep  # deep property sweep (>=10s); runs at round close
def test_ks_bounds_and_symmetry_invariants(spark, tmp_path_factory, rows):
    d = str(tmp_path_factory.mktemp("ks"))
    _write(spark, d, rows)
    out = all_queries()["q_ks_length_sources"].spark_fn(spark, d).collect()
    n_src = len({s for s, _ in rows})
    assert len(out) == n_src * (n_src - 1) // 2
    for r in out:
        assert 0.0 <= r["ks_stat"] <= 1.0
        assert 0 <= r["ks_q"] <= r["n_a"] * r["n_b"]
        # identical multisets iff ks == 0
        a = sorted(n for s, n in rows if s == r["source_a"])
        b = sorted(n for s, n in rows if s == r["source_b"])
        assert (r["ks_q"] == 0) == (a == b)


@SET
@given(_corpus)
@pytest.mark.sweep  # deep property sweep (>=10s); runs at round close
def test_mwu_bounds_and_no_tie_formula(spark, tmp_path_factory, rows):
    d = str(tmp_path_factory.mktemp("mwu"))
    _write(spark, d, rows)
    out = all_queries()["q_mann_whitney_sources"].spark_fn(spark, d).collect()
    for r in out:
        assert 0 <= r["u2_q"] <= 2 * r["n_a"] * r["n_b"]
        # cross-check 2U against the direct pair-count definition:
        # 2U_a = 2*#{(x,y): x>y} + #{ties}
        a = [n for s, n in rows if s == r["source_a"]]
        b = [n for s, n in rows if s == r["source_b"]]
        gt = sum(1 for x in a for y in b if x > y)
        eq = sum(1 for x in a for y in b if x == y)
        assert r["u2_q"] == 2 * gt + eq


@SET
@given(_corpus)
@pytest.mark.sweep  # deep property sweep (>=10s); runs at round close
def test_welch_antisymmetry_and_df_bounds(spark, tmp_path_factory, rows):
    d = str(tmp_path_factory.mktemp("welch"))
    _write(spark, d, rows)
    out = all_queries()["q_welch_ttest_sources"].spark_fn(spark, d).collect()
    for r in out:
        a = [n for s, n in rows if s == r["source_a"]]
        b = [n for s, n in rows if s == r["source_b"]]
        va = sum((x - sum(a) / len(a)) ** 2 for x in a) / (len(a) - 1)
        vb = sum((x - sum(b) / len(b)) ** 2 for x in b) / (len(b) - 1)
        if va == 0 and vb == 0:
            continue  # degenerate: zero pooled variance
        # df within [min(n1,n2)-1, n1+n2-2]
        assert r["welch_df"] >= min(len(a), len(b)) - 1 - 1e-6
        assert r["welch_df"] <= len(a) + len(b) - 2 + 1e-6
        # sign of t == sign of mean difference
        md = sum(a) / len(a) - sum(b) / len(b)
        if abs(md) > 1e-9:
            assert math.copysign(1, r["t_stat"]) == math.copysign(1, md)


@SET
@given(st.lists(st.tuples(st.sampled_from(["a", "b"]),
                          st.sampled_from(["x", "y"])),
                min_size=4, max_size=40))
@pytest.mark.sweep  # deep property sweep (>=10s); runs at round close
def test_mi_nonnegative_chi2_nonnegative(spark, tmp_path_factory, cells):
    d = str(tmp_path_factory.mktemp("mi"))
    data = [(i, "tok", l, s, 10) for i, (l, s) in enumerate(cells)]
    spark.createDataFrame(
        data, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    mi = all_queries()["q_lang_source_mi"].spark_fn(spark, d).collect()[0]
    chi = all_queries()["q_lang_source_chi2"].spark_fn(spark, d).collect()[0]
    # MI >= 0 up to quantization (each term floored: error < #cells units)
    assert mi["mi_q"] >= -mi["n_cells"]
    assert chi["chi2_q"] >= -chi["n_cells"]  # same floor slack
    assert chi["dof"] == ((len({l for l, _ in cells}) - 1)
                          * (len({s for _, s in cells}) - 1))
