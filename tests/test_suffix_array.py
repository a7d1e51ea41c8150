"""Generalized suffix array (prefix doubling), LCP walks, repeated
regions — all against plain-Python brute force."""

from __future__ import annotations

import pytest

from nonconsumptive_spark.operators.suffix import (
    longest_repeated_prefix,
    repeated_regions,
    suffix_array,
)


def _tok(t):
    import re

    return [w for w in re.split(r"[^\w]+", t) if w]


def _brute_sa(docs):
    """[(rank_dense, doc_id, pos)] sorted; rank dense over content."""
    sufs = []
    for did, text in docs:
        toks = _tok(text or "")
        for p in range(1, len(toks) + 1):
            sufs.append((tuple(toks[p - 1:]), did, p))
    sufs.sort()
    ranks, r = {}, -1
    prev = None
    for content, did, p in sufs:
        if content != prev:
            r += 1
            prev = content
        ranks[(did, p)] = r
    return sufs, ranks


def _brute_lrp(docs):
    sufs, _ = _brute_sa(docs)
    out = {}
    for i, (content, did, p) in enumerate(sufs):
        best = 0
        for j in (i - 1, i + 1):
            if 0 <= j < len(sufs):
                other = sufs[j][0]
                k = 0
                while (k < len(content) and k < len(other)
                       and content[k] == other[k]):
                    k += 1
                best = max(best, k)
        out[(did, p)] = best
    return out


DOCS = [
    (1, "a b c a b c a b"),          # long internal repeat
    (2, "x y z"),                    # unique content
    (3, "a b c d"),                  # shares a prefix with doc 1 windows
    (4, "x y z"),                    # exact duplicate of doc 2
    (5, ""),                         # empty
    (6, None),                       # NULL text
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_suffix_array_order_and_ranks(docs_df):
    got = {(r.doc_id, r.pos): (r.rank, r.sa)
           for r in suffix_array(docs_df).collect()}
    sufs, ranks = _brute_sa(DOCS)
    assert len(got) == len(sufs)
    # dense content ranks agree
    for key, r in ranks.items():
        assert got[key][0] == r, key
    # sa is the (rank, doc, pos) total order 0..n-1
    order = sorted(got, key=lambda k: (got[k][0], k[0], k[1]))
    for i, key in enumerate(order):
        assert got[key][1] == i, key


def test_longest_repeated_prefix_matches_bruteforce(docs_df):
    got = {(r.doc_id, r.pos): r.lrp
           for r in longest_repeated_prefix(docs_df).collect()}
    assert got == _brute_lrp(DOCS)


def test_duplicate_docs_have_full_length_lrp(docs_df):
    got = {(r.doc_id, r.pos): r.lrp
           for r in longest_repeated_prefix(docs_df).collect()}
    # docs 2 and 4 are identical: every suffix repeats entirely
    assert got[(2, 1)] == 3 and got[(4, 1)] == 3
    assert got[(2, 3)] == 1 and got[(4, 3)] == 1


def test_repeated_regions_merge(docs_df):
    got = sorted((r.doc_id, r.span_start, r.span_end, r.span_len)
                 for r in repeated_regions(docs_df, min_len=2).collect())
    lrp = _brute_lrp(DOCS)
    # python-side merge of [p, p+lrp) with lrp >= 2
    by_doc = {}
    for (did, p), l in sorted(lrp.items()):
        if l >= 2:
            by_doc.setdefault(did, []).append((p, p + l))
    want = []
    for did, ivs in by_doc.items():
        ivs.sort()
        cur_s, cur_e = ivs[0]
        for s, e in ivs[1:]:
            if s <= cur_e:
                cur_e = max(cur_e, e)
            else:
                want.append((did, cur_s, cur_e, cur_e - cur_s))
                cur_s, cur_e = s, e
        want.append((did, cur_s, cur_e, cur_e - cur_s))
    assert got == sorted(want)


def test_min_len_validation(docs_df):
    with pytest.raises(ValueError):
        repeated_regions(docs_df, 0)


# -- property: random corpora vs brute force -------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_doc = st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_doc, min_size=1, max_size=6))
@pytest.mark.sweep  # deep property sweep (>=10s); runs at round close
def test_lrp_property(spark, corpora):
    docs = [(i, " ".join(t)) for i, t in enumerate(corpora)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_id, r.pos): r.lrp
           for r in longest_repeated_prefix(df).collect()}
    assert got == _brute_lrp(docs)


def test_lrp_long_docs_doubling_path(spark):
    """Documents longer than SEED_FULL_CAP must take the prefix-doubling
    rounds (the adaptive full-suffix seed only covers short corpora);
    the result still matches brute force exactly.  Two-letter alphabet
    maximizes repeated structure; a planted shared tail exercises long
    cross-document matches above the seed length."""
    import random

    from nonconsumptive_spark.operators.suffix import (
        SEED_FULL_CAP,
        suffix_rank_tables,
    )

    rng = random.Random(7)
    shared = " ".join("qwertyuiop"[i % 10] for i in range(40))
    docs = [(i, " ".join(rng.choice("ab") for _ in range(140 + 30 * i))
             + " " + shared)
            for i in range(3)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    _final, tables, _total, _arr = suffix_rank_tables(df)
    assert len(tables) > 1, "expected the doubling path"
    assert all(len(_tok(t)) > SEED_FULL_CAP for _, t in docs)
    got = {(r.doc_id, r.pos): r.lrp
           for r in longest_repeated_prefix(df).collect()}
    assert got == _brute_lrp(docs)


def test_assign_dense_ids_empty_input(spark):
    """Regression: an EMPTY frame used to fail analysis (create_map()
    with no entries types as map<void,void>)."""
    from nonconsumptive_spark.sources.readers import assign_dense_ids

    df = spark.createDataFrame([], "k string")
    out = assign_dense_ids(df, ["k"], id_name="i")
    assert out.count() == 0
    assert dict(out.dtypes)["i"] == "bigint"
