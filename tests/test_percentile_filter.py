"""percentile_filter_by_group: exact per-group top-fraction retention."""

from __future__ import annotations

import math

import pytest

from nonconsumptive_spark.operators.textstats import percentile_filter_by_group


@pytest.fixture(scope="module")
def scored(spark):
    rows = []
    # group g0: 10 rows scores 0..9; g1: 7 rows with TIES; g2: 1 row
    rows += [(i, "g0", float(i)) for i in range(10)]
    rows += [(100 + i, "g1", float(i // 2)) for i in range(7)]
    rows += [(200, "g2", 5.0)]
    return spark.createDataFrame(rows, "doc_id long, source string, score double")


def _kept(df):
    return sorted((r.source, r.doc_id) for r in df.collect())


def test_exact_quota_per_group(scored):
    got = percentile_filter_by_group(scored, "source", "score", 0.3)
    by_g = {}
    for g, d in _kept(got):
        by_g.setdefault(g, []).append(d)
    # ceil(0.3*10)=3 ceil(0.3*7)=3 ceil(0.3*1)=1
    assert {g: len(v) for g, v in by_g.items()} == {"g0": 3, "g1": 3, "g2": 1}
    assert by_g["g0"] == [7, 8, 9]                     # top scores
    # g1 scores: ids 100,101 ->0; 102,103->1; 104,105->2; 106->3
    # top-3 by (score desc, id asc): 106 (3.0), 104, 105 (2.0)
    assert by_g["g1"] == [104, 105, 106]


def test_keep_all(scored):
    assert percentile_filter_by_group(scored, "source", "score", 1.0).count() \
        == scored.count()


def test_frac_bounds(scored):
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            percentile_filter_by_group(scored, "source", "score", bad)


def test_quota_matches_python_ceil(scored):
    for frac in (0.1, 0.25, 1 / 3, 0.5, 0.9):
        got = percentile_filter_by_group(scored, "source", "score", frac)
        sizes = {"g0": 10, "g1": 7, "g2": 1}
        by_g = {}
        for g, _ in _kept(got):
            by_g[g] = by_g.get(g, 0) + 1
        want = {g: math.ceil(frac * n) for g, n in sizes.items()}
        assert by_g == want, frac


def test_no_global_sort_in_plan(scored):
    plan = percentile_filter_by_group(scored, "source", "score", 0.5) \
        ._jdf.queryExecution().executedPlan().toString()
    # window partitions by group: a rangepartitioning(...) with no
    # partition keys would mean a global sort
    assert "rangepartitioning" not in plan.lower()
