"""Phrase search (both physical forms), skyline, and Burrows' Delta."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nonconsumptive_spark.operators.retrieval import (
    build_positional_index,
    phrase_search,
    phrase_search_indexed,
)
from nonconsumptive_spark.operators.skyline import skyline
from tests.conftest import SF_SMALL


# -- phrase search ---------------------------------------------------------
@pytest.fixture(scope="module")
def phrase_docs(spark):
    rows = [
        (1, "a table table b"),
        (2, "table table table"),          # overlapping occurrences
        (3, "no match here"),
        (4, ""),                            # empty text
        (5, "x"),                           # shorter than the phrase
        (6, "table x table table y"),
        (7, None),                          # NULL text must not blow up
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_phrase_overlapping_and_short_docs(phrase_docs):
    got = _rows(phrase_search(phrase_docs, ["table", "table"]))
    assert got == [(1, 1, 2), (2, 2, 1), (6, 1, 3)]


def test_phrase_single_token(phrase_docs):
    got = _rows(phrase_search(phrase_docs, ["table"]))
    assert got == [(1, 2, 2), (2, 3, 1), (6, 3, 1)]


def test_phrase_longer_than_any_doc(phrase_docs):
    assert phrase_search(phrase_docs, ["q"] * 50).count() == 0


def test_phrase_empty_raises(phrase_docs):
    with pytest.raises(ValueError):
        phrase_search(phrase_docs, [])
    with pytest.raises(ValueError):
        phrase_search_indexed(phrase_docs, [])


@pytest.mark.parametrize(
    "phrase",
    [["table", "table"], ["table"], ["a", "table", "table"], ["zzz"]],
)
def test_indexed_form_agrees_with_inrow(spark, phrase_docs, phrase):
    idx = build_positional_index(phrase_docs)
    assert _rows(phrase_search_indexed(idx, phrase)) == _rows(
        phrase_search(phrase_docs, phrase)
    )


def test_indexed_form_agrees_on_corpus(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    idx = build_positional_index(docs)
    for phrase in (["table", "table"], ["fast", "sort"]):
        assert _rows(phrase_search_indexed(idx, phrase)) == _rows(
            phrase_search(docs, phrase)
        )


# -- skyline ---------------------------------------------------------------
def _brute_skyline(rows):
    out = []
    for p in rows:
        dominated = any(
            q[1] >= p[1] and q[2] >= p[2] and (q[1] > p[1] or q[2] > p[2])
            for q in rows
        )
        if not dominated:
            out.append(p)
    return sorted(out)


@pytest.mark.parametrize("seed,n,xmax,ymax", [
    (1, 200, 30, 30),      # many ties
    (2, 500, 10_000, 5),   # extreme y ties
    (3, 500, 5, 10_000),   # extreme x ties
    (4, 1000, 1000, 1000),
])
def test_skyline_matches_bruteforce(spark, seed, n, xmax, ymax):
    rng = random.Random(seed)
    rows = [(i, rng.randint(0, xmax), rng.randint(0, ymax)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = sorted(map(tuple, skyline(df, "x", "y").select("id", "x", "y").collect()))
    assert got == _brute_skyline(rows)


def test_skyline_keeps_duplicate_frontier_points(spark):
    rows = [(1, 5, 5), (2, 5, 5), (3, 1, 9), (4, 9, 1), (5, 4, 4)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = sorted(r["id"] for r in skyline(df, "x", "y").collect())
    assert got == [1, 2, 3, 4]


# -- Burrows' Delta --------------------------------------------------------
def test_burrows_delta_properties(spark):
    from nonconsumptive_spark.operators.textstats import burrows_delta

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = burrows_delta(docs).collect()
    srcs = {r["source"] for r in docs.select("source").distinct().collect()}
    n = len(srcs)
    # exactly one row per unordered pair, delta >= 0, a < b everywhere
    assert len(out) == n * (n - 1) // 2
    assert all(r["delta"] >= 0 for r in out)
    assert all(r["source_a"] < r["source_b"] for r in out)


def test_burrows_delta_identical_groups_are_zero(spark):
    from nonconsumptive_spark.operators.textstats import burrows_delta

    docs = spark.createDataFrame(
        [("a", "x y z x"), ("b", "x y z x"), ("c", "x x x x q q")],
        "source string, text string",
    )
    rows = {(r["source_a"], r["source_b"]): r["delta"]
            for r in burrows_delta(docs, top_m=4).collect()}
    assert rows[("a", "b")] == 0.0
    assert rows[("a", "c")] > 0 and rows[("b", "c")] > 0
    assert rows[("a", "c")] == rows[("b", "c")]


# -- property tests (hypothesis) -------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

PROP = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_tok = st.sampled_from(["a", "b", "c"])
_docs = st.lists(st.lists(_tok, max_size=12), min_size=1, max_size=12)
_phrase = st.lists(_tok, min_size=1, max_size=3)


def _phrase_ref(toks, phrase):
    """Python reference: all 1-based anchor positions of phrase in toks."""
    k = len(phrase)
    return [
        p + 1
        for p in range(len(toks) - k + 1)
        if toks[p:p + k] == phrase
    ]


@PROP
@given(docs=_docs, phrase=_phrase)
def test_phrase_search_matches_reference(spark, docs, phrase):
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_hits"], r["first_pos"])
           for r in phrase_search(df, phrase).collect()}
    exp = {}
    for i, toks in enumerate(docs):
        anchors = _phrase_ref(toks, phrase)
        if anchors:
            exp[i] = (len(anchors), anchors[0])
    assert got == exp
    # the indexed form must agree bit-for-bit
    idx = build_positional_index(df)
    got_idx = {r["doc_id"]: (r["n_hits"], r["first_pos"])
               for r in phrase_search_indexed(idx, phrase).collect()}
    assert got_idx == exp


_pts = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=60
)


@PROP
@given(pts=_pts)
def test_skyline_matches_reference(spark, pts):
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = sorted(
        map(tuple, skyline(df, "x", "y").select("id", "x", "y").collect())
    )
    assert got == _brute_skyline(rows)


# -- priority sampling -----------------------------------------------------
def test_weighted_sample_invariants(spark):
    from nonconsumptive_spark.queries import all_queries

    q = all_queries()["q_weighted_sample"]
    out = q.spark_fn(spark, SF_SMALL).collect()
    assert len(out) == 20
    # estimator weight is max(w, tau) >= w, and deterministic across runs
    assert all(r["est_weight"] >= r["n_chars"] for r in out)
    again = q.spark_fn(spark, SF_SMALL).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # weight-proportionality sanity: the sampled docs skew long — their
    # mean length beats the corpus mean
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = sum(r["n_chars"] for r in out) / len(out)
    assert sample_mean > corpus_mean


def test_burrows_delta_invariant_under_corpus_duplication(spark):
    # relative frequencies are unchanged when every doc appears twice, so
    # Delta must be bit-identical — the scale-free property of the metric
    from nonconsumptive_spark.operators.textstats import burrows_delta

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "source", "text")
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 100000))
    one = sorted(map(tuple, burrows_delta(docs).collect()))
    two = sorted(map(tuple, burrows_delta(doubled).collect()))
    assert one == two


# -- min-span proximity ----------------------------------------------------
def _minspan_ref(toks, terms):
    """Brute force: smallest window [i, j] containing every term."""
    best = None
    for i in range(len(toks)):
        need = set(terms)
        for j in range(i, len(toks)):
            need.discard(toks[j])
            if not need:
                w = j - i + 1
                best = w if best is None else min(best, w)
                break
    return best


def test_min_span_proximity_brute_force_cases(spark):
    from nonconsumptive_spark.operators.retrieval import min_span_proximity

    rows = [
        (1, "a b c x x x table y scan"),
        (2, "scan q table"),
        (3, "table scan"),
        (4, "table only here"),
        (5, "scan z z z z table z scan"),
        (6, ""),
        (7, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["table", "scan"]
    got = {r["doc_id"]: r["span"]
           for r in min_span_proximity(docs, terms).collect()}
    exp = {}
    for i, t in rows:
        span = _minspan_ref((t or "").split(), terms)
        if span is not None:
            exp[i] = span
    assert got == exp


@PROP
@given(docs=_docs, terms=st.lists(_tok, min_size=1, max_size=3, unique=True))
def test_min_span_matches_reference(spark, docs, terms):
    from nonconsumptive_spark.operators.retrieval import min_span_proximity

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["span"]
           for r in min_span_proximity(df, terms).collect()}
    exp = {}
    for i, toks in enumerate(docs):
        span = _minspan_ref(toks, terms)
        if span is not None:
            exp[i] = span
    assert got == exp


# -- k-dimensional skyline -------------------------------------------------
def _brute_kd(rows, dims):
    out = []
    for p in rows:
        dominated = any(
            all(q[d] >= p[d] for d in dims) and any(q[d] > p[d] for d in dims)
            for q in rows
        )
        if not dominated:
            out.append(p)
    return sorted(out)


@pytest.mark.parametrize("seed,n,hi", [(11, 500, 20), (12, 300, 4), (13, 800, 1000)])
def test_skyline_kd_3d_matches_bruteforce(spark, seed, n, hi):
    from nonconsumptive_spark.operators.skyline import skyline_kd

    rng = random.Random(seed)
    rows = [(i, rng.randint(0, hi), rng.randint(0, hi), rng.randint(0, hi))
            for i in range(n)]
    df = spark.createDataFrame(rows, "id long, x long, y long, z long")
    got = sorted(map(tuple, skyline_kd(df, ["x", "y", "z"]).collect()))
    assert got == _brute_kd(rows, [1, 2, 3])


def test_skyline_kd_agrees_with_2d_operator(spark):
    from nonconsumptive_spark.operators.skyline import skyline_kd

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 30), rng.randint(0, 30)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    a = sorted(map(tuple, skyline_kd(df, ["x", "y"]).collect()))
    b = sorted(map(tuple, skyline(df, "x", "y").collect()))
    assert a == b


def test_skyline_kd_rejects_single_criterion(spark):
    from nonconsumptive_spark.operators.skyline import skyline_kd

    df = spark.createDataFrame([(1, 2)], "id long, x long")
    with pytest.raises(ValueError):
        skyline_kd(df, ["x"])


def test_priority_sample_by_group_invariants(spark):
    from pyspark.sql import functions as F

    from nonconsumptive_spark.operators.textstats import priority_sample_by_group

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = priority_sample_by_group(docs, "source", "n_chars", k=3)
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    sizes = {r["source"]: r["n"] for r in
             docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # every stratum contributes min(k, stratum size) rows
    assert per == {s: min(3, n) for s, n in sizes.items()}
    # deterministic
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in
               priority_sample_by_group(docs, "source", "n_chars", k=3).collect())
    assert a == b
    # weight bias: sampled docs are longer than their stratum average
    smean = docs.groupBy("source").agg(F.avg("n_chars").alias("mu"))
    joined = out.join(smean, "source")
    frac_above = joined.filter(F.col("n_chars") > F.col("mu")).count() / out.count()
    assert frac_above > 0.6


def test_k_anonymity_report_and_summary(spark):
    from nonconsumptive_spark.operators.textstats import (
        k_anonymity_report,
        k_anonymity_summary,
    )

    rows = (
        [("en", "web")] * 10 + [("en", "book")] * 3 + [("fr", "web")] * 1
    )
    df = spark.createDataFrame(rows, "lang string, source string")
    rep = {(r["lang"], r["source"]): (r["class_size"], r["is_risky"])
           for r in k_anonymity_report(df, ["lang", "source"], k=5).collect()}
    assert rep == {("en", "web"): (10, False),
                   ("en", "book"): (3, True),
                   ("fr", "web"): (1, True)}
    s = k_anonymity_summary(df, ["lang", "source"], k=5).first()
    assert (s["n_classes"], s["risky_classes"]) == (3, 2)
    assert (s["rows_to_suppress"], s["n_rows"]) == (4, 14)
    assert s["suppress_frac"] == round(4 / 14, 4)
