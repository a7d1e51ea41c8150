"""blocklist_match (multi-phrase anchor-vote join) and postings_size_stats
(delta-varint index accounting)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nonconsumptive_spark.operators.retrieval import (
    blocklist_match,
    build_positional_index,
    phrase_search_indexed,
    postings_size_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a table table b bad word a"),
        (2, "table table table bad"),
        (3, "no match here"),
        (4, ""),
        (5, "bad word bad word"),
        (6, "word bad"),                   # reversed: must NOT match
        (7, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def postings(docs):
    return build_positional_index(docs)


BLOCKLIST = [["table", "table"], ["bad", "word"], ["bad"]]


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_blocklist_matches_expected(postings):
    got = _rows(blocklist_match(postings, BLOCKLIST))
    assert got == [
        (1, 0, 1, 2),   # "table table" once at pos 2
        (1, 1, 1, 5),   # "bad word" at pos 5
        (1, 2, 1, 5),
        (2, 0, 2, 1),   # overlapping occurrences both count
        (2, 2, 1, 4),
        (5, 1, 2, 1),   # two non-overlapping "bad word"
        (5, 2, 2, 1),
        (6, 2, 1, 2),   # single-term phrase; reversed bigram absent
    ]


def test_blocklist_agrees_with_single_phrase_form(postings):
    """One-pass multi-phrase result == per-phrase phrase_search_indexed."""
    all_hits = blocklist_match(postings, BLOCKLIST)
    for pid, phrase in enumerate(BLOCKLIST):
        got = _rows(all_hits.filter(F.col("phrase_id") == pid)
                    .drop("phrase_id"))
        want = _rows(phrase_search_indexed(postings, phrase))
        assert got == want, phrase


def test_blocklist_rejects_empty():
    with pytest.raises(ValueError):
        blocklist_match(None, [])
    with pytest.raises(ValueError):
        blocklist_match(None, [["ok"], []])


def _varint_bytes(v: int) -> int:
    return (v.bit_length() - 1) // 7 + 1


def test_postings_size_stats_exact(spark, postings):
    """Spark accounting == plain-Python delta-varint accounting."""
    triples = [(r.term, r.doc_id, r.pos) for r in postings.collect()]
    per: dict[str, dict[int, list[int]]] = {}
    for t, d, p in triples:
        per.setdefault(t, {}).setdefault(d, []).append(p)
    want = []
    for t, by_doc in per.items():
        vb = 0
        n = 0
        for ps in by_doc.values():
            prev = 0
            for p in sorted(ps):
                vb += _varint_bytes(p - prev)
                prev = p
            n += len(ps)
        want.append((t, len(by_doc), n, vb, n * 4, round(vb / (n * 4.0), 4)))
    got = _rows(postings_size_stats(postings))
    assert got == sorted(want)


def test_postings_size_stats_large_positions(spark):
    """Multi-byte varints: positions far apart need 2+ bytes per delta."""
    rows = [("t", 1, 1), ("t", 1, 200), ("t", 1, 20000)]
    postings = spark.createDataFrame(rows, "term string, doc_id long, pos int")
    [r] = postings_size_stats(postings).collect()
    # deltas 1, 199, 19800 -> 1 + 2 + 3 varint bytes
    assert (r.n_docs, r.n_postings, r.varint_bytes, r.fixed_bytes) == (1, 1 * 3, 6, 12)
    assert r.ratio == 0.5


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_blocklist_plan_shape(postings):
    """Slot table joins as a broadcast hash join; nothing quadratic."""
    plan = _plan(blocklist_match(postings, BLOCKLIST))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_postings_stats_plan_shape(postings):
    """Exactly the two documented exchanges: a skew-safe (term, doc)
    shuffle for the position fold, then the tiny combined (term) agg —
    never a bare-term first shuffle (hot terms would hotspot one
    partition at scale)."""
    plan = _plan(postings_size_stats(postings))
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 2, plan


# -- indexed min-span ------------------------------------------------------
def test_min_span_indexed_equals_inrow(spark, docs, postings):
    from nonconsumptive_spark.operators.retrieval import (
        min_span_proximity,
        min_span_proximity_indexed,
    )

    for terms in (["bad", "word"], ["table"], ["table", "bad", "word"],
                  ["bad", "bad"]):          # dup terms collapse
        inrow = _rows(min_span_proximity(docs, terms))
        idx = _rows(min_span_proximity_indexed(postings, terms))
        assert inrow == idx, terms
    # adjacency: span == k where the terms are adjacent
    got = {r[0]: r[1] for r in
           _rows(min_span_proximity_indexed(postings, ["bad", "word"]))}
    assert got[5] == 2                      # "bad word bad word"


def test_min_span_indexed_is_order_free(spark, postings):
    """Min-span is order-free (unlike phrase match): 'word bad' spans 2
    for terms [bad, word] even though the phrase never occurs."""
    from nonconsumptive_spark.operators.retrieval import (
        min_span_proximity_indexed,
    )

    got = {r[0]: r[1] for r in
           _rows(min_span_proximity_indexed(postings, ["bad", "word"]))}
    assert got[6] == 2
