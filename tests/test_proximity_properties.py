"""Property tests: the min-span fold and the k-d skyline vs plain-Python
brute force on randomized inputs."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nonconsumptive_spark.operators.retrieval import min_span_proximity
from nonconsumptive_spark.operators.skyline import skyline_kd

SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small closed vocabulary so term hits are dense enough to be interesting
_VOCAB = ["a", "b", "c", "d"]
_doc = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=30)
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _brute_min_span(tokens: list[str], terms: list[str]):
    """O(n^2) reference: minimal window [i, j] containing every term."""
    best = None
    n = len(tokens)
    for i in range(n):
        need = set(terms)
        for j in range(i, n):
            need.discard(tokens[j])
            if not need:
                w = j - i + 1
                best = w if best is None else min(best, w)
                break
    return best


@SET
@given(_corpus, st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=3))
def test_min_span_matches_bruteforce(spark, docs, terms):
    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.span, r.n_matches)
           for r in min_span_proximity(df, terms).collect()}
    uniq = list(dict.fromkeys(terms))
    for i, toks in enumerate(docs):
        want = _brute_min_span(toks, uniq)
        if want is None:
            assert i not in got, (toks, terms)
        else:
            n_matches = sum(t in uniq for t in toks)
            assert got[i] == (want, n_matches), (toks, terms)


def _brute_skyline(pts):
    out = []
    for p in pts:
        dominated = any(
            all(qv >= pv for qv, pv in zip(q, p))
            and any(qv > pv for qv, pv in zip(q, p))
            for q in pts
        )
        if not dominated:
            out.append(p)
    return out


_pt = st.tuples(st.integers(0, 6), st.integers(0, 6), st.integers(0, 6))


@SET
@given(st.lists(_pt, min_size=1, max_size=40))
def test_skyline_kd_matches_bruteforce(spark, pts):
    rows = [(i, *p) for i, p in enumerate(pts)]
    df = spark.createDataFrame(rows, "doc_id long, x long, y long, z long")
    got = sorted((r.x, r.y, r.z) for r in skyline_kd(df, ["x", "y", "z"]).collect())
    want = sorted(_brute_skyline(pts))
    assert got == want
