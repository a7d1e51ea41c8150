"""Semantic tests for the round-4d operators: in-engine Naive Bayes
classification and Bloom-filter shingle novelty."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


# ------------------------------------------------------------------- NB
def test_nb_confusion_separable_corpus(spark):
    """On a cleanly separable corpus the classifier must be perfect: the
    confusion matrix is diagonal and counts match the label counts."""
    from nonconsumptive_spark.operators.textstats import nb_lang_confusion

    rows = [
        (1, "alpha beta gamma alpha", "aa"),
        (2, "beta alpha alpha gamma", "aa"),
        (3, "delta epsilon zeta zeta", "bb"),
        (4, "zeta delta delta epsilon", "bb"),
        (5, "alpha gamma beta", "aa"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {(r.actual, r.predicted): r.n_docs
           for r in nb_lang_confusion(df).collect()}
    assert out == {("aa", "aa"): 3, ("bb", "bb"): 2}


def test_nb_confusion_totals_and_ties(spark):
    """Row sums equal per-label doc counts (every doc predicted exactly
    once), including empty/NULL-text docs, which fall back to the prior
    argmax with a deterministic label tie-break."""
    from nonconsumptive_spark.operators.textstats import nb_lang_confusion

    rows = [
        (1, "x y z", "p"),
        (2, "x y q", "p"),
        (3, "m n o", "q"),
        (4, "", "q"),
        (5, None, "q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = nb_lang_confusion(df).collect()
    per_actual: dict[str, int] = {}
    for r in out:
        per_actual[r.actual] = per_actual.get(r.actual, 0) + r.n_docs
    assert per_actual == {"p": 2, "q": 3}
    # empty-text docs score prior only: q has the larger prior (3 vs 2
    # docs), so docs 4 and 5 predict q.
    assert out and all(r.n_docs > 0 for r in out)
    cells = {(r.actual, r.predicted): r.n_docs for r in out}
    assert cells.get(("q", "q"), 0) >= 2


def test_nb_on_fixture_beats_chance(spark):
    """On the sf0.001 fixture the trained classifier must beat the
    majority-class rate (the labels correlate with real token
    distributions, so train-on-self accuracy should be high)."""
    from nonconsumptive_spark.operators.textstats import nb_lang_confusion

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    cells = nb_lang_confusion(docs).collect()
    total = sum(r.n_docs for r in cells)
    correct = sum(r.n_docs for r in cells if r.actual == r.predicted)
    majority = docs.groupBy("lang").count().agg(
        {"count": "max"}).collect()[0][0]
    assert total == docs.count()
    assert correct / total > majority / total


# ---------------------------------------------------------------- bloom
def test_bloom_no_false_negatives(spark):
    """The Bloom filter's one-sided guarantee: every true corpus shingle
    must hit, so n_bloom_hits >= n_true_hits row by row."""
    from nonconsumptive_spark.operators.dedup import bloom_shingle_novelty

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    rows = bloom_shingle_novelty(docs).collect()
    assert rows
    for r in rows:
        assert r.n_bloom_hits >= r.n_true_hits
        assert r.n_false_pos == r.n_bloom_hits - r.n_true_hits
        assert r.n_shingles >= r.n_bloom_hits


def test_bloom_exact_on_planted_overlap(spark):
    """A batch doc that copies a corpus doc's text must have every shingle
    hit both the filter and the exact audit; a disjoint-vocabulary doc must
    have zero TRUE hits (bloom hits may occur — that's the FP column)."""
    from nonconsumptive_spark.operators.dedup import bloom_shingle_novelty

    corpus_text = "one two three four five six seven eight"
    rows = [
        (2, corpus_text, "en", "s", 1),          # corpus (even)
        (4, "unrelated corpus words here too", "en", "s", 1),
        (3, corpus_text, "en", "s", 1),          # batch copy (odd)
        (5, "qqq www eee rrr ttt yyy uuu", "en", "s", 1),  # disjoint
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = {r.doc_id: r for r in bloom_shingle_novelty(df).collect()}
    copy = out[3]
    assert copy.n_shingles > 0
    assert copy.n_true_hits == copy.n_shingles
    assert copy.n_bloom_hits == copy.n_shingles
    disjoint = out[5]
    assert disjoint.n_true_hits == 0


def test_bloom_filter_is_bounded(spark):
    """The filter representation must stay <= m rows (the broadcastable
    bitset invariant) regardless of corpus size."""
    from nonconsumptive_spark.operators import dedup as dd
    from nonconsumptive_spark.operators.dedup import (
        _bloom_pos, doc_shingles)
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    sh = doc_shingles(docs).select(F.explode("shingles").alias("shingle"))
    probes = F.array(*[_bloom_pos(F.col("shingle"), i, dd.BLOOM_M)
                       for i in range(dd.BLOOM_K)])
    n_bits = sh.select(F.explode(probes).alias("pos")).distinct().count()
    assert n_bits <= dd.BLOOM_M


# ------------------------------------------------------------------ CDC
def test_cdc_shift_resistance(spark):
    """The CDC property fixed windows lack: prepending one token to a doc
    must leave most chunks identical (chunking re-syncs at the next
    content boundary), while fixed-length chunking shifts every window."""
    from nonconsumptive_spark.operators.lines import cdc_chunks, chunk_texts
    from pyspark.sql import functions as F

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu "
            "one two three four five six seven eight nine ten")
    df = spark.createDataFrame(
        [(1, base), (2, "inserted " + base)], "doc_id long, text string")
    out = df.select(
        "doc_id",
        cdc_chunks("text").alias("cdc"),
        chunk_texts("text").alias("fixed"),
    ).collect()
    rows = {r.doc_id: r for r in out}
    cdc_shared = set(rows[1].cdc) & set(rows[2].cdc)
    fixed_shared = set(rows[1].fixed) & set(rows[2].fixed)
    # CDC re-syncs: a majority of the original chunks survive the shift.
    assert len(cdc_shared) >= len(rows[1].cdc) // 2
    assert len(cdc_shared) > len(fixed_shared)


def test_cdc_chunks_partition_tokens(spark):
    """Chunks must reassemble to the exact token stream, including
    single-token and empty/NULL docs."""
    from nonconsumptive_spark.operators.lines import cdc_chunks
    from nonconsumptive_spark.functions.text import tokenize
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, None),
         (4, "a b c d e f g h i j k l m n o p q r s t u v w x y z")],
        "doc_id long, text string")
    rows = df.select(
        "doc_id", cdc_chunks("text").alias("chunks"),
        tokenize("text").alias("toks")).collect()
    for r in rows:
        rebuilt = [t for c in r.chunks for t in c.split(" ") if t]
        assert rebuilt == (r.toks or [])


# ----------------------------------------------------------------- RAKE
def test_rake_hand_example(spark):
    """Hand-checked RAKE on a two-doc corpus with the 'en' stoplist
    ('the', 'and', 'of', 'to', 'a', 'in', 'is', 'it')."""
    from nonconsumptive_spark.operators.textstats import (
        RAKE_SCALE, rake_keywords)

    rows = [
        (1, "deep learning is the deep future", "en"),
        (2, "future of deep learning", "en"),
        (3, "ignorado por completo", "es"),   # non-en doc must not count
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.phrase: r for r in rake_keywords(df).collect()}
    # phrase occurrences: "deep learning" x2, "deep future" x1, "future" x1
    # deg: deep=2+2+2=6 freq=3; learning=2+2=4 freq=2; future=2+1=3 freq=2
    # scores (x1e6): deep=2000000, learning=2000000, future=1500000
    assert set(out) == {"deep learning", "deep future", "future"}
    assert out["deep learning"].n_occ == 2
    assert out["deep learning"].score == pytest.approx(4.0)
    assert out["deep future"].score == pytest.approx(3.5)
    assert out["future"].score == pytest.approx(1.5)


def test_rake_phrases_edges(spark):
    """Stopword-only, empty, and NULL docs produce no phrases; runs at
    both array edges are captured."""
    from nonconsumptive_spark.operators.textstats import (
        LANG_STOPWORDS, _rake_phrases)

    df = spark.createDataFrame(
        [(1, "the and of"), (2, ""), (3, None),
         (4, "alpha the beta gamma"), (5, "The quick")],
        "doc_id long, text string")
    rows = {r.doc_id: list(r.p) for r in df.select(
        "doc_id", _rake_phrases("text", LANG_STOPWORDS["en"]).alias("p")
    ).collect()}
    assert rows[1] == [] and rows[2] == [] and rows[3] == []
    assert rows[4] == ["alpha", "beta gamma"]
    assert rows[5] == ["quick"]  # lowercased 'the' dropped at the edge


# ------------------------------------------------------------------ PSI
def test_psi_identical_and_shifted(spark):
    """PSI of two identically-distributed groups must be ~0; a group with
    a shifted distribution must score strictly higher against either."""
    from nonconsumptive_spark.operators.textstats import psi_drift

    rows = []
    for i in range(200):
        rows.append((i * 3 + 0, "t", "same_a", (i % 50) + 10))
        rows.append((i * 3 + 1, "t", "same_b", (i % 50) + 10))
        rows.append((i * 3 + 2, "t", "shifted", (i % 50) + 500))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long")
    out = {(r.source_a, r.source_b): r.psi for r in psi_drift(df).collect()}
    assert set(out) == {("same_a", "same_b"), ("same_a", "shifted"),
                        ("same_b", "shifted")}
    assert abs(out[("same_a", "same_b")]) < 1e-6
    assert out[("same_a", "shifted")] > 0.5
    assert out[("same_b", "shifted")] > 0.5
    # PSI is a sum of (p_a - p_b) ln(p_a/p_b) terms, each >= 0
    assert all(v >= 0 for v in out.values())


# --------------------------------------------------------- edit distance
def test_edit_distance_pairs_planted(spark):
    """A near-identical pair (one substituted word) must surface as a dup;
    the distance must equal the hand-computed character edit distance on
    normalized text."""
    from nonconsumptive_spark.operators.dedup import edit_distance_pairs

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu "
            "uno dos tres cuatro cinco seis siete ocho nueve romeo")
    # mutate only the FINAL token: exactly one shingle differs, so the
    # near-identical pair survives the 4x4 LSH banding
    mutated = base[:-5] + "rxmeo"
    rows = [(1, base, "en", "s", 1), (2, mutated, "en", "s", 1),
            (3, "totally different content about other things entirely "
                "covering separate topics and unrelated words", "en", "s", 1)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = {(r.doc_a, r.doc_b): r for r in edit_distance_pairs(df).collect()}
    assert (1, 2) in out
    pair = out[(1, 2)]
    assert pair.lev == 1  # one substituted character survives normalization
    assert pair.is_dup
    assert (1, 3) not in out and (2, 3) not in out  # LSH never pairs them


# --------------------------------------------------------------- logreg
def test_logreg_learns_and_is_consistent(spark):
    """Full-batch GD must actually learn the n_chars label: training
    accuracy well above the majority baseline, predictions consistent
    with the integer logit sign."""
    from nonconsumptive_spark.operators.logreg import (
        LOGREG_LABEL_CHARS, logreg_train_scores)

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    rows = logreg_train_scores(docs).collect()
    n = len(rows)
    assert n == docs.count()
    correct = sum(1 for r in rows if r.pred == (r.y == 1))
    pos = sum(r.y for r in rows)
    majority = max(pos, n - pos) / n
    assert correct / n > majority + 0.1, (correct / n, majority)
    for r in rows:
        assert r.pred == (r.score_q >= 0)


def test_logreg_feature_values(spark):
    """doc_features hand-check: stopword hits per language list and the
    centered length, zero-valued features dropped."""
    from nonconsumptive_spark.operators.logreg import (
        LOGREG_LEN_CENTER, doc_features)

    df = spark.createDataFrame(
        [(1, "the cat and the dog la la"), (2, None)],
        "doc_id long, text string")
    got = {(r.doc_id, r.f): r.cnt for r in doc_features(df).collect()}
    # langs sorted: de=0, en=1, es=2, fr=3, len=4
    assert got[(1, 1)] == 3           # the, and, the
    assert got[(1, 2)] == 2           # la, la (es)
    assert got[(1, 3)] == 2           # la, la (fr)
    assert (1, 0) not in got          # no de stopwords -> dropped
    assert got[(1, 4)] == 7 - LOGREG_LEN_CENTER
    assert got.get((2, 4), None) in (None, -LOGREG_LEN_CENTER)


# ------------------------------------------------------------------ HLL
def test_hll_estimate_accuracy(spark):
    """HLL with 256 registers must land within the theoretical error band
    (~1.04/sqrt(m) = 6.5%, allow 3 sigma) of the exact distinct count on
    both a tiny and a wide vocabulary."""
    from nonconsumptive_spark.operators.wordcount import hll_distinct_tokens

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    row = hll_distinct_tokens(docs).collect()[0]
    assert row.m == 256 and row.n_exact > 0
    assert row.rel_err <= 0.20
    assert abs(row.estimate - row.n_exact) / row.n_exact == pytest.approx(
        row.rel_err, abs=1e-3)

    # wide vocabulary: 5000 distinct letter-only tokens in one doc (the
    # tokenizer splits on non-letters, so no digits in the token body)
    def word(i):
        s = ""
        while True:
            s += chr(ord("a") + i % 26)
            i //= 26
            if i == 0:
                return "tok" + s

    wide = spark.createDataFrame(
        [(1, " ".join(word(i) for i in range(5000)))],
        "doc_id long, text string")
    r2 = hll_distinct_tokens(wide).collect()[0]
    assert r2.n_exact == 5000
    assert r2.rel_err <= 0.20


def test_logreg_feature_layout_parity(spark):
    """The wide feature_array (trainer layout) must agree entry-for-entry
    with the long doc_features surface (zeros included in the wide form,
    filtered in the long one), plus the constant-1 bias slot."""
    from pyspark.sql import functions as F

    from nonconsumptive_spark.operators.logreg import (
        LOGREG_D, doc_features, feature_array)

    df = spark.createDataFrame(
        [(0, "the la der and le und"), (1, "x"), (2, None)],
        ["doc_id", "text"])
    wide = {r["doc_id"]: r["cnts"] for r in
            df.select("doc_id", feature_array("text").alias("cnts")).collect()}
    long = {(r["doc_id"], r["f"]): r["cnt"]
            for r in doc_features(df).collect()}
    for doc, cnts in wide.items():
        assert len(cnts) == LOGREG_D + 1
        assert cnts[-1] == 1  # bias slot
        for f in range(LOGREG_D):
            assert cnts[f] == long.get((doc, f), 0)
