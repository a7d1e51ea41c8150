"""Property-based invariants (hypothesis) — beyond the reference's test
strategy (SURVEY §5: golden values only, no property testing).

Each property batches all generated documents into ONE DataFrame so a
whole example costs one Spark job, and caps examples to keep the suite
fast.  The invariants are the engine's load-bearing algebra:

  * tokenization: no empty tokens; rejoining tokens loses only
    non-letter characters (F1 regex semantics)
  * n-grams: per-doc gram count == max(0, nwords - n + 1) (W1/P3)
  * chunked wordcounts: chunk counts re-sum to document lengths (A10/A8)
  * encode join: count sums preserved through vocabulary encoding —
    the reference's strongest invariant (J1/A3/A4)
  * minhash: signatures land in [0, P) and equal docs get equal
    signatures (dedup determinism)
"""

from __future__ import annotations

import pytest

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nonconsumptive_spark.operators import dedup as dd
from nonconsumptive_spark.operators import wordcount as wc

SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Text with letters (several scripts), digits, punctuation, whitespace.
# Python 3.11 carries a newer Unicode table than Java 17 (Unicode 13), so
# characters assigned after Unicode 13 — astral (U+12F90 Cypro-Minoan) AND
# BMP (U+0870 Arabic letter, new in 14) — flip \p{L} membership between the
# engines: a JVM/CPython version skew, not an operator bug.  Restricting to
# codepoints already assigned in Unicode 3.2 (via unicodedata.ucd_3_2_0)
# guarantees both tables agree while keeping a ~95k-char alphabet.
import unicodedata

_OLD_UCD = unicodedata.ucd_3_2_0


def _stable_codepoint(c: str) -> bool:
    return _OLD_UCD.category(c) != "Cn"


doc_text = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("Lu", "Ll", "Lo", "Nd", "Po", "Zs"),
        include_characters=" \t\n",
        max_codepoint=0xFFFF,
    ).filter(_stable_codepoint),
    max_size=200,
)
corpus = st.lists(doc_text, min_size=1, max_size=20)

TOKEN_RE = re.compile(r"[^\W\d_]+", re.UNICODE)  # python mirror of [^\p{L}]+ split


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def _py_tokens(t):
    return TOKEN_RE.findall(t)


@SET
@given(corpus)
def test_tokenize_matches_python_reference(spark, texts):
    from nonconsumptive_spark.functions.text import tokenize

    got = {
        r["doc_id"]: list(r["toks"])
        for r in _df(spark, texts).select("doc_id", tokenize("text").alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_tokens(t), (t, got[i])
        assert all(tok for tok in got[i])  # never an empty token


@SET
@given(corpus)
def test_ngram_count_arithmetic(spark, texts):
    n = 2
    counts = (
        wc.ngram_counts(_df(spark, texts), n)
        .groupBy("doc_id").agg(F.sum("count").alias("total"))
        .collect()
    )
    got = {r["doc_id"]: r["total"] for r in counts}
    for i, t in enumerate(texts):
        expect = max(0, len(_py_tokens(t)) - n + 1)
        assert got.get(i, 0) == expect


@SET
@given(corpus)
def test_chunked_counts_resum_to_lengths(spark, texts):
    df = _df(spark, texts)
    resummed = {
        r["doc_id"]: r["total"]
        for r in wc.chunked_wordcounts(df, chunk_size=7)
        .groupBy("doc_id").agg(F.sum("count").alias("total")).collect()
    }
    lengths = {r["doc_id"]: r["nwords"] for r in wc.document_lengths(df).collect()}
    for i in range(len(texts)):
        assert resummed.get(i, 0) == lengths[i]


@SET
@given(corpus)
def test_encoding_preserves_count_sums(spark, texts):
    df = _df(spark, texts)
    total_tokens = sum(len(_py_tokens(t)) for t in texts)
    encoded_sum = (
        wc.encode_unigrams(df).agg(F.sum("count").alias("s")).collect()[0]["s"] or 0
    )
    assert encoded_sum == total_tokens


_word = st.text(
    alphabet=st.characters(codec="utf-8", categories=("Lu", "Ll", "Lo")),
    min_size=1,
    max_size=8,
)
# built from whole words, so >=3 tokens holds by construction (no filtering)
_doc3 = st.lists(_word, min_size=3, max_size=30).map(" ".join)


@SET
@given(st.lists(_doc3, min_size=1, max_size=10))
def test_minhash_range_and_determinism(spark, texts):
    # duplicate every doc: equal text must yield equal signatures
    doubled = texts + texts
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(doubled)], ["doc_id", "text"]
    )
    rows = dd.minhash_signatures(df).collect()
    sig = {}
    for r in rows:
        assert 0 <= r["minhash"] < dd.MINHASH_P
        sig.setdefault(r["doc_id"], {})[r["hash_idx"]] = r["minhash"]
    for i, t in enumerate(texts):
        if sig.get(i):
            assert sig[i] == sig[i + len(texts)]


@SET
@given(corpus, st.integers(0, 1000))
def test_winnowing_guarantee_planted_run(spark, texts, seed):
    """Plant a shared (k+w-1)-token run into two docs built from random
    text; the overlap detector MUST surface that pair (the winnowing
    guarantee), and per-doc selected counts never exceed window counts."""
    from nonconsumptive_spark.operators.textstats import (
        WINNOW_K, WINNOW_W, winnow_fingerprints, winnow_overlap_pairs)

    run = " ".join(f"tok{seed}x{i}" for i in range(WINNOW_K + WINNOW_W - 1))
    pre = texts[0] if texts else ""
    post = texts[-1] if texts else ""
    docs = spark.createDataFrame(
        [(0, f"{pre} {run}"), (1, f"{run} {post}")], ["doc_id", "text"])
    pairs = {(r["doc_a"], r["doc_b"])
             for r in winnow_overlap_pairs(docs, min_shared=1).collect()}
    assert (0, 1) in pairs
    for r in winnow_fingerprints(docs).collect():
        assert 0 <= r["n_fingerprints"] <= max(r["n_windows"], 0)


@SET
@given(corpus)
def test_bm25_output_invariants(spark, texts):
    """Scores strictly positive, matched-term counts bounded by the query
    size, and no document without a query term ever appears."""
    from nonconsumptive_spark.operators.retrieval import bm25_topk

    terms = ["zzzneverthere"] + ([_py_tokens(texts[0].lower())[0]]
                                 if texts and _py_tokens(texts[0].lower())
                                 else [])
    df = _df(spark, texts)
    out = bm25_topk(df, terms, k=50).collect()
    toksets = {i: set(_py_tokens(t.lower())) for i, t in enumerate(texts)}
    for r in out:
        assert r["score"] > 0
        assert 1 <= r["n_terms_matched"] <= len(set(t.lower() for t in terms))
        assert toksets[r["doc_id"]] & set(t.lower() for t in terms)


@SET
@given(st.integers(1, 60), st.integers(0, 99))
def test_training_order_is_shardwise_permutation(spark, n_docs, seed):
    from collections import defaultdict

    from nonconsumptive_spark.operators.textstats import training_order

    docs = spark.range(n_docs).selectExpr("id as doc_id", "'x' as text")
    rows = training_order(docs, seed=seed, n_shards=4).collect()
    assert len(rows) == n_docs and len({r["doc_id"] for r in rows}) == n_docs
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r["shard"]].append(r["pos"])
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))


@SET
@given(corpus)
def test_sentence_stats_mean_consistency(spark, texts):
    """n_sentences * mean_sentence_tokens re-sums to the total (within
    the 4-decimal rounding), and max never exceeds the total."""
    from nonconsumptive_spark.operators.textstats import sentence_stats

    out = sentence_stats(_df(spark, texts)).collect()
    for r in out:
        total = r["mean_sentence_tokens"] * r["n_sentences"]
        assert r["max_sentence_tokens"] <= total + 1e-4 * max(r["n_sentences"], 1)
        if r["n_sentences"] == 0:
            assert r["max_sentence_tokens"] == 0


@given(
    strata=st.lists(st.integers(min_value=1, max_value=40),
                    min_size=1, max_size=6),
    k_frac=st.floats(min_value=0.05, max_value=1.0),
)
@SET
def test_stratified_apportionment_properties(spark, strata, k_frac):
    """Largest-remainder apportionment invariants on arbitrary stratum
    shapes: output size exactly k, every stratum within 1 of its real
    quota (the Hamilton guarantee), never more rows than a stratum has."""
    from nonconsumptive_spark.operators.textstats import (
        stratified_sample_proportional)

    total = sum(strata)
    k = max(1, int(total * k_frac))
    rows = [(i * 1000 + j, f"s{i}")
            for i, n in enumerate(strata) for j in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = stratified_sample_proportional(df, k=k).collect()
    assert len(out) == k
    got: dict[str, int] = {}
    for r in out:
        got[r["source"]] = got.get(r["source"], 0) + 1
    for i, n in enumerate(strata):
        g = got.get(f"s{i}", 0)
        assert g <= n
        assert abs(g - k * n / total) < 1.0 + 1e-9


@given(texts=corpus)
@SET
def test_novelty_bounds_and_duplicate_zero(spark, texts):
    """Novelty lies in [0, 1]; appending an exact duplicate of every doc
    forces novelty 0 corpus-wide (every gram now shared)."""
    from nonconsumptive_spark.operators.textstats import ngram_novelty

    rows = [(i, t) for i, t in enumerate(texts)]
    doubled = rows + [(1000 + i, t) for i, t in rows]
    df = spark.createDataFrame(doubled, ["doc_id", "text"])
    out = ngram_novelty(df).collect()
    for r in out:
        assert 0.0 <= r["novelty"] <= 1.0
        assert r["novelty"] == 0.0  # every doc has an exact twin
        assert r["n_shared"] == r["n_grams"]


@given(texts=st.lists(doc_text, min_size=2, max_size=10))
@SET
def test_containment_dominates_jaccard(spark, texts):
    """For every reported pair, containment(A→B) ≥ Jaccard(A,B): the
    denominator |A| is never larger than |A∪B|.  Checked by running both
    operators at threshold 0 and comparing the shared pairs."""
    from nonconsumptive_spark.operators.dedup import (
        containment_pairs, jaccard_pairs)

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    cont = {(r["doc_a"], r["doc_b"]): r["containment"]
            for r in containment_pairs(df, threshold=0.0).collect()}
    jac = {}
    for r in jaccard_pairs(df, threshold=0.0).collect():
        jac[(r["doc_a"], r["doc_b"])] = r["jaccard"]
        jac[(r["doc_b"], r["doc_a"])] = r["jaccard"]
    for pair, c in cont.items():
        if pair in jac:
            assert c >= jac[pair] - 1e-9, (pair, c, jac[pair])


@given(
    lefts=st.lists(st.integers(min_value=0, max_value=10_000_000),
                   min_size=1, max_size=15),
    rights=st.lists(st.integers(min_value=0, max_value=10_000_000),
                    min_size=1, max_size=30),
    lo=st.integers(min_value=-2_000_000, max_value=1_000_000),
    span=st.integers(min_value=1, max_value=3_000_000),
)
@SET
def test_bucketed_range_join_equals_bruteforce(spark, lefts, rights, lo, span):
    """The bucketed equi-join form is pair-for-pair identical to the
    naive O(n*m) range predicate for arbitrary window placement."""
    from nonconsumptive_spark.operators.asof import bucketed_range_join

    hi = lo + span
    ldf = spark.createDataFrame(
        [(i, 1, v) for i, v in enumerate(lefts)], ["lid", "k", "lus"])
    rdf = spark.createDataFrame(
        [(1, v) for v in rights], ["k", "rus"])
    got = sorted((r["lid"], r["rus"]) for r in bucketed_range_join(
        ldf, rdf, on="k", left_us="lus", right_us="rus",
        lo_us=lo, hi_us=hi).collect())
    expect = sorted((i, rv) for i, lv in enumerate(lefts) for rv in rights
                    if lo <= rv - lv < hi)
    assert got == expect


@given(texts=corpus)
@SET
def test_char_diversity_bounds(spark, texts):
    """Entropy lies in [0, log2(distinct)]; Simpson in [0, 1); distinct
    <= total; sum of squared counts bounded by total^2."""
    import math

    from nonconsumptive_spark.operators.textstats import char_diversity

    out = char_diversity(_df(spark, texts)).collect()
    for r in out:
        n, d, ss = r["n_chars_tok"], r["n_distinct_chars"], r["sum_sq"]
        assert 0 <= d <= n
        assert ss <= n * n
        if n == 0:
            assert r["entropy"] == 0.0 and r["simpson"] == 0.0
        else:
            assert -1e-4 <= r["entropy"] <= math.log2(max(d, 1)) + 1e-4
            assert 0.0 <= r["simpson"] < 1.0


@given(values=st.lists(
    st.floats(min_value=0.01, max_value=400.0,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=40))
@SET
def test_winsorize_is_order_statistic_clip(spark, values, tmp_path_factory):
    """Winsorize bounds equal the discrete P05/P95 order statistics of
    the quantized values, and clipping preserves row count."""
    import math

    import pandas as pd

    from nonconsumptive_spark.queries import all_queries

    sf = tmp_path_factory.mktemp("wz")
    pd.DataFrame({
        "event_id": range(len(values)),
        "ts": pd.to_datetime(["2024-01-01"] * len(values)),
        "user_id": [1] * len(values),
        "event_type": ["t"] * len(values),
        "value": values,
        "props": ["{}"] * len(values),
    }).to_parquet(sf / "events.parquet")
    rows = all_queries()["q_winsorize"].spark_fn(spark, str(sf)).collect()
    assert len(rows) == len(values)
    vq = sorted(math.floor(v * 100.0 + 0.5) for v in values)
    n = len(vq)
    lo = vq[max(0, math.ceil(0.05 * n) - 1)]
    hi = vq[max(0, math.ceil(0.95 * n) - 1)]
    for r in rows:
        assert r["vq_clipped"] == max(lo, min(hi, r["vq"]))
        assert r["is_clipped"] == (r["vq"] < lo or r["vq"] > hi)


@given(texts=st.lists(doc_text, min_size=2, max_size=10))
@SET
@pytest.mark.sweep  # deep property sweep (>=10s); runs at round close
def test_ppjoin_equals_naive_on_random_text(spark, texts):
    """PPJoin's prefix+positional filtering loses no pairs on arbitrary
    unicode corpora (exactness property, threshold swept)."""
    from nonconsumptive_spark.operators.dedup import jaccard_pairs, ppjoin_pairs

    df = _df(spark, texts)
    for t in (0.2, 0.3, 0.7):
        naive = {(r["doc_a"], r["doc_b"], r["jaccard"])
                 for r in jaccard_pairs(df, threshold=t).collect()}
        pp = {(r["doc_a"], r["doc_b"], r["jaccard"])
              for r in ppjoin_pairs(df, threshold=t).collect()}
        assert pp == naive


# ----------------------------------------------------------------- r4d ops
@given(corpus)
@SET
def test_cdc_partition_and_shift_invariance(spark, texts):
    """CDC chunks of every doc reassemble to exactly its token stream, and
    equal texts produce equal chunk arrays (boundaries are pure content
    functions — no positional state)."""
    from nonconsumptive_spark.functions.text import tokenize
    from nonconsumptive_spark.operators.lines import cdc_chunks

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)] + [(len(texts), texts[0])],
        "doc_id long, text string",
    )
    rows = df.select(
        "doc_id", cdc_chunks("text").alias("chunks"),
        tokenize("text").alias("toks")).collect()
    by_id = {r.doc_id: r for r in rows}
    for r in rows:
        rebuilt = [w for c in r.chunks for w in c.split(" ") if w]
        assert rebuilt == (r.toks or [])
    # doc 0 and the appended twin must chunk identically
    assert by_id[0].chunks == by_id[len(texts)].chunks


@given(corpus)
@SET
def test_bloom_one_sided_error(spark, texts):
    """Bloom novelty on arbitrary corpora: no false negatives, counts
    consistent, and every count bounded by the shingle count."""
    from nonconsumptive_spark.operators.dedup import bloom_shingle_novelty

    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    for r in bloom_shingle_novelty(df).collect():
        assert 0 <= r.n_true_hits <= r.n_bloom_hits <= r.n_shingles
        assert r.n_false_pos == r.n_bloom_hits - r.n_true_hits


@given(corpus)
@SET
def test_rake_phrases_are_stopword_free_partitions(spark, texts):
    """RAKE candidate phrases contain no stopwords, and concatenating
    phrases + stopwords in order restores the lowercased token stream."""
    from nonconsumptive_spark.functions.text import tokenize
    from nonconsumptive_spark.operators.textstats import (
        LANG_STOPWORDS, _rake_phrases)
    from pyspark.sql import functions as F

    stops = set(LANG_STOPWORDS["en"])
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = df.select(
        _rake_phrases("text", LANG_STOPWORDS["en"]).alias("phrases"),
        F.transform(tokenize("text"), lambda w: F.lower(w)).alias("toks"),
    ).collect()
    for r in rows:
        phrase_words = [w for p in r.phrases for w in p.split(" ") if w]
        assert not (set(phrase_words) & stops)
        # phrases exactly cover the non-stopword tokens, in order
        assert phrase_words == [w for w in (r.toks or []) if w not in stops]
