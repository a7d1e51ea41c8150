"""Unit semantics for the round-3 curation operators: BM25 ranking,
winnowing fingerprints, DSIR importance weights, BPE encoding.

The oracle queries cover the bulk paths at sf0.01; these tests pin the
hand-checkable edge semantics on tiny frames.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nonconsumptive_spark.operators.bpe import encode_bpe
from nonconsumptive_spark.operators.retrieval import bm25_topk
from nonconsumptive_spark.operators.textstats import dsir_weights, winnow_fingerprints


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ---------------------------------------------------------------- BM25 ----
def test_bm25_ranks_rare_term_doc_first(spark):
    docs = _docs(spark, [
        (1, "apple banana banana banana"),
        (2, "apple apple apple apple"),
        (3, "cherry cherry cherry cherry"),
        (4, "banana apple cherry durian"),
    ])
    out = bm25_topk(docs, ["durian", "apple"], k=3).collect()
    # durian appears only in doc 4 -> highest idf; doc 4 must rank first
    assert out[0]["doc_id"] == 4
    assert out[0]["n_terms_matched"] == 2
    ids = [r["doc_id"] for r in out]
    assert 3 not in ids  # doc 3 matches no query term


def test_bm25_score_formula_single_doc(spark):
    # One doc, one term, hand-computed BM25 (Lucene +1 idf).
    docs = _docs(spark, [(1, "x x y"), (2, "y y y")])
    out = bm25_topk(docs, ["x"], k=2).collect()
    assert len(out) == 1  # only doc 1 matches
    n, df, tf, dl, avgdl = 2, 1, 2, 3, 3.0
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    expect = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert abs(out[0]["score"] - round(expect, 4)) < 1e-9


def test_bm25_case_insensitive(spark):
    docs = _docs(spark, [(1, "Apple APPLE"), (2, "pear")])
    out = bm25_topk(docs, ["apple"], k=5).collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["n_terms_matched"] == 1


# ----------------------------------------------------------- winnowing ----
def test_winnow_counts_and_guarantee(spark):
    # 10 tokens -> 7 4-grams -> 4 windows of 4 hashes
    text = "a b c d e f g h i j"
    out = winnow_fingerprints(_docs(spark, [(1, text)])).collect()[0]
    assert out["n_windows"] == 4
    assert 1 <= out["n_fingerprints"] <= 4

    # winnowing guarantee: two docs sharing a run of >= k+w-1 = 7 tokens
    # share at least one fingerprint; XOR checksums alone can't prove set
    # overlap, so check via the operator on a doc pair with a shared run
    shared = "p q r s t u v"  # 7 tokens
    docs = _docs(spark, [(1, "a b " + shared), (2, shared + " y z")])
    rows = {r["doc_id"]: r for r in winnow_fingerprints(docs).collect()}
    assert rows[1]["n_fingerprints"] >= 1 and rows[2]["n_fingerprints"] >= 1


def test_winnow_short_doc_zeroes(spark):
    out = winnow_fingerprints(_docs(spark, [(1, "a b c")])).collect()[0]
    assert (out["n_windows"], out["n_fingerprints"], out["fp_checksum"]) == (0, 0, 0)


def test_winnow_identical_docs_equal_checksums(spark):
    docs = _docs(spark, [(1, "one two three four five six seven eight"),
                         (2, "one two three four five six seven eight")])
    rows = {r["doc_id"]: r["fp_checksum"] for r in winnow_fingerprints(docs).collect()}
    assert rows[1] == rows[2] != 0


# ----------------------------------------------------------------- DSIR ----
def test_dsir_prefers_target_distribution(spark):
    rows = [
        (1, "alpha alpha alpha", "tgt"),
        (2, "alpha alpha beta", "tgt"),
        (3, "gamma gamma gamma", "raw"),
        (4, "gamma beta gamma", "raw"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "grp"])
    out = {
        r["doc_id"]: r
        for r in dsir_weights(df, F.col("grp") == "tgt", keep_frac=0.5).collect()
    }
    # target-typical docs must outscore raw-typical docs
    assert out[1]["avg_logratio"] > out[3]["avg_logratio"]
    kept = {i for i, r in out.items() if r["keep"]}
    assert kept == {1, 2}  # top half by score
    assert sum(1 for r in out.values() if r["keep"]) == 2


def test_dsir_keep_cut_deterministic_on_ties(spark):
    # identical docs -> identical scores -> id breaks the tie
    rows = [(i, "same text here", "t") for i in range(1, 5)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "grp"])
    out = {r["doc_id"]: r["keep"]
           for r in dsir_weights(df, F.col("grp") == "t", keep_frac=0.5).collect()}
    assert out == {1: True, 2: True, 3: False, 4: False}


# ------------------------------------------------------------------ BPE ----
def test_bpe_encode_segments_with_learned_merges(spark):
    # 'aaab' x3 and 'ab' x2: merge 1 is (a,a) [cnt 6]; merge 2 (a,b) [cnt 5]
    docs = _docs(spark, [(1, "aaab aaab aaab ab ab")])
    out = {r["word"]: r for r in encode_bpe(docs, n_merges=2).collect()}
    assert out["ab"]["segmented"] == "ab"
    assert out["ab"]["n_syms"] == 1
    assert out["aaab"]["segmented"] == "aa ab"
    assert out["aaab"]["n_syms"] == 2
    assert out["aaab"]["freq"] == 3


def test_winnow_overlap_detects_shared_run(spark):
    from nonconsumptive_spark.operators.textstats import winnow_overlap_pairs

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens > k+w-1
    docs = spark.createDataFrame(
        [(1, "intro words " + shared),
         (2, shared + " closing words"),
         (3, "completely unrelated text about other things entirely")],
        ["doc_id", "text"],
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared"]
             for r in winnow_overlap_pairs(docs, min_shared=1).collect()}
    assert (1, 2) in pairs  # the winnowing guarantee
    assert all(3 not in p for p in pairs)


def test_training_order_deterministic_and_balanced(spark):
    from nonconsumptive_spark.operators.textstats import training_order

    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"),
                                      F.lit("x").alias("text"))
    a = {(r["doc_id"], r["shard"], r["pos"])
         for r in training_order(docs, seed=7, n_shards=4).collect()}
    b = {(r["doc_id"], r["shard"], r["pos"])
         for r in training_order(docs, seed=7, n_shards=4).collect()}
    assert a == b  # pure function of the rows
    c = {(r["doc_id"], r["shard"], r["pos"])
         for r in training_order(docs, seed=8, n_shards=4).collect()}
    assert a != c  # a new seed is a new epoch order
    # positions are 1..n contiguous within each shard
    from collections import defaultdict
    by_shard = defaultdict(list)
    for _, s, p in a:
        by_shard[s].append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_corpus_profile_top_lang_tiebreak(spark):
    from nonconsumptive_spark.operators.textstats import corpus_profile

    rows = [(1, "a b c", "en", "s1"), (2, "d e", "de", "s1"),
            (3, "f", "de", "s2"), (4, "g h i j", "de", "s2")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    out = {r["source"]: r for r in corpus_profile(df).collect()}
    assert out["s1"]["top_lang"] == "de"  # tie 1-1 -> alphabetical
    assert out["s2"]["top_lang"] == "de"
    assert out["s1"]["n_docs"] == 2 and out["s1"]["total_tokens"] == 5


def test_strip_markup_tags_entities_whitespace(spark):
    from nonconsumptive_spark.operators.textstats import strip_markup

    docs = spark.createDataFrame(
        [(1, '<div class="x">hello <b>world</b> &amp;lt; &lt;ok&gt;</div>'),
         (2, "plain text, no markup")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in strip_markup(docs).collect()}
    # one decode pass: &amp;lt; -> &lt;  (NOT '<'), &lt;ok&gt; -> <ok>
    assert rows[1]["clean_text"] == "hello world &lt; <ok>"
    assert rows[1]["n_tags_removed"] == 4
    assert rows[2]["clean_text"] == "plain text, no markup"
    assert rows[2]["n_tags_removed"] == 0


def test_sentence_stats_counts(spark):
    from nonconsumptive_spark.operators.textstats import sentence_stats

    docs = spark.createDataFrame(
        [(1, "One two three. Four five! Six?"),
         (2, "no terminator at all"),
         (3, "...")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in sentence_stats(docs).collect()}
    assert rows[1]["n_sentences"] == 3
    assert rows[1]["max_sentence_tokens"] == 3
    assert abs(rows[1]["mean_sentence_tokens"] - 2.0) < 1e-9
    assert rows[2]["n_sentences"] == 1
    assert rows[3]["n_sentences"] == 0
    assert rows[3]["max_sentence_tokens"] == 0


def test_curation_pipeline_stage_interactions(spark):
    from nonconsumptive_spark.operators.pipeline import curate

    good = ("the quick brown fox jumps over the lazy dog and runs far away "
            "to a place where it is safe and sound every day") # passes filters
    rows = [
        (1, good),                       # keeper of the (1, 2) dup group
        (2, good),                       # exact dup -> not keeper
        (3, "spam spam spam"),           # fails quality (short, repetitive)
        (4, good + " with a tiny twist at the end of it all right now"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    evals = spark.createDataFrame([(99, "nothing shared here at all")],
                                  ["doc_id", "text"])
    out = {r["doc_id"]: r for r in curate(docs, evals, overlap_threshold=5).collect()}
    assert out[1]["selected"] and out[1]["split"] is not None
    assert not out[2]["selected"] and not out[2]["dedup_keeper"]
    assert not out[3]["quality_keep"] and out[3]["split"] is None
    assert out[4]["selected"]
    # a quality-dropped doc must not have participated in keeper election:
    # doc 3 being spam doesn't affect doc 1/4 keepership
    assert out[1]["dedup_keeper"] and out[4]["dedup_keeper"]


def test_curation_pipeline_contamination_drops(spark):
    from nonconsumptive_spark.operators.pipeline import curate

    text = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "the and of to a in is it lambda mu nu xi omicron pi rho sigma")
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    evals = spark.createDataFrame([(99, text)], ["doc_id", "text"])
    r = curate(docs, evals, overlap_threshold=5).collect()[0]
    assert r["contaminated"] and not r["selected"] and r["split"] is None


def test_scan_throughput_operators_plan_zero_shuffle(spark):
    """The operators documented as zero-shuffle scans must PLAN that way:
    no Exchange anywhere (guards against a refactor quietly introducing a
    window or aggregation shuffle into a scan-throughput pass)."""
    from nonconsumptive_spark.operators import textstats as ts

    docs = spark.createDataFrame(
        [(1, "some text. here!"), (2, "more words follow now")],
        ["doc_id", "text"],
    )
    zero_shuffle = [
        ts.winnow_fingerprints(docs),
        ts.sentence_stats(docs),
        ts.strip_markup(docs),
        ts.quality_score(docs),
        ts.repetition_scores(docs),
        ts.fingerprint(docs),
        ts.token_count_ws(docs),
        ts.lang_id(docs),
    ]
    for df in zero_shuffle:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan.splitlines()[:5]


def test_hygiene_operators_null_text(spark):
    """NULL text must yield empty/zero outputs, not size(NULL) = -1
    artifacts (n_tags_removed = -2 / n_sentences = -1)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from nonconsumptive_spark.operators.textstats import (
        sentence_stats, strip_markup, winnow_fingerprints)

    schema = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])
    docs = spark.createDataFrame([(1, None), (2, "<b>hi</b>. ok!")], schema)
    sm = {r["doc_id"]: r for r in strip_markup(docs).collect()}
    assert (sm[1]["clean_text"], sm[1]["n_tags_removed"]) == ("", 0)
    ss = {r["doc_id"]: r for r in sentence_stats(docs).collect()}
    assert (ss[1]["n_sentences"], ss[1]["max_sentence_tokens"]) == (0, 0)
    wf = {r["doc_id"]: r for r in winnow_fingerprints(docs).collect()}
    assert (wf[1]["n_windows"], wf[1]["n_fingerprints"]) == (0, 0)


def test_perplexity_buckets_terciles_and_ordering(spark):
    """Bucket sizes follow the exact (n+2) DIV 3 boundaries and the score
    ordering is respected: every head doc's avg_logprob >= every tail
    doc's (head = most predictable under the corpus LM)."""
    from nonconsumptive_spark.operators.textstats import perplexity_buckets
    from nonconsumptive_spark.queries import load
    from tests.conftest import SF_SMALL

    out = perplexity_buckets(load(spark, SF_SMALL, "documents")).collect()
    n = len(out)
    sizes = {b: 0 for b in ("head", "middle", "tail")}
    for r in out:
        sizes[r["bucket"]] += 1
    h1 = (n + 2) // 3
    h2 = (2 * n + 2) // 3
    assert sizes["head"] == h1
    assert sizes["middle"] == h2 - h1
    assert sizes["tail"] == n - h2
    worst_head = min(r["avg_logprob"] for r in out if r["bucket"] == "head")
    best_tail = max(r["avg_logprob"] for r in out if r["bucket"] == "tail")
    assert worst_head >= best_tail


def test_stratified_sample_exact_k_and_proportional(spark):
    """Largest-remainder apportionment: exactly k rows total, every
    stratum within 1 of its exact proportional quota, and the selection
    is deterministic across invocations."""
    from nonconsumptive_spark.operators.textstats import (
        stratified_sample_proportional)
    from nonconsumptive_spark.queries import load
    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents")
    strata = {r["source"]: r["n"] for r in
              docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    total = sum(strata.values())
    k = 97  # deliberately not a multiple of anything
    out = stratified_sample_proportional(docs, k=k).collect()
    assert len(out) == k
    got = {}
    for r in out:
        got[r["source"]] = got.get(r["source"], 0) + 1
    for s, n_i in strata.items():
        quota = k * n_i / total
        assert abs(got.get(s, 0) - quota) < 1.0 + 1e-9, (s, got.get(s), quota)
    again = {tuple(r) for r in
             stratified_sample_proportional(docs, k=k).collect()}
    assert {tuple(r) for r in out} == again


def test_ngram_novelty_duplicate_and_unique(spark):
    """A doc duplicated verbatim scores novelty 0 (every gram shared);
    a doc sharing nothing scores 1."""
    from nonconsumptive_spark.operators.textstats import ngram_novelty

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "alpha beta gamma delta epsilon"),
         (3, "totally different words entirely unrelated")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
    assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0
    assert out[1]["n_shared"] == out[1]["n_grams"] == 3
    assert out[3]["novelty"] == 1.0 and out[3]["n_shared"] == 0


def test_containment_asymmetric_small_in_big(spark):
    """A short doc fully contained in a long one: containment(small->big)
    = 1.0 while the Jaccard of the pair is far below any useful
    threshold — the case this operator exists for."""
    from nonconsumptive_spark.operators.dedup import (
        containment_pairs, jaccard_pairs)

    small = "one two three four five"
    # letter-only fillers: the tokenizer splits on non-letters, so digit
    # suffixes would collapse every filler into one token
    big = small + " " + " ".join(
        f"filler{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(40))
    docs = spark.createDataFrame([(1, small), (2, big)], ["doc_id", "text"])
    pairs = {(r["doc_a"], r["doc_b"]): r["containment"]
             for r in containment_pairs(docs, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0       # small fully inside big
    assert (2, 1) not in pairs        # big not contained in small
    jac = jaccard_pairs(docs, threshold=0.3).collect()
    assert jac == []                  # Jaccard misses the relation entirely


def test_r4_operators_plan_shapes(spark):
    """Pin the r4 operators' shuffle budgets so refactors can't quietly
    regress them: novelty moves only (id, gram) pairs through gram-keyed
    exchanges; stratified sampling's corpus-sized movement is ONE
    stratum-keyed exchange (allocation plan is #strata-bounded
    broadcasts); perplexity's only windows are the bounded score-key
    histogram and the in-bucket rank (both partitioned or
    histogram-sized, never a corpus row_number)."""
    import re

    from nonconsumptive_spark.operators.textstats import (
        ngram_novelty, perplexity_buckets, stratified_sample_proportional)

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta tok{chr(97 + i)} epsilon", f"s{i % 3}")
         for i in range(9)],
        ["doc_id", "text", "source"])

    nov = ngram_novelty(docs)
    plan = nov._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # gram DF agg + join-back + doc rollup: at most 3 exchanges, none
    # carrying the text column
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 3
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line

    strat = stratified_sample_proportional(docs, k=5)
    plan = strat._jdf.queryExecution().executedPlan().toString()
    # corpus-sized shuffle: exactly the stratum-keyed rank exchange; the
    # allocation side is broadcasts over #strata rows
    corpus_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "source" in ln
    ]
    assert corpus_exchanges, plan.splitlines()[:5]
    assert "BroadcastExchange" in plan

    ppl = perplexity_buckets(docs)
    plan = ppl._jdf.queryExecution().executedPlan().toString()
    # every Window node is either partitioned (in-bucket rank) or runs
    # over the score-key histogram — never an unpartitioned corpus window
    for ln in plan.splitlines():
        if re.search(r"\bWindow\b", ln) and "partitionBy" not in ln:
            # unpartitioned windows must specify the histogram frame
            # (ordered by sk) — a corpus-frame window orders by doc_id
            assert "sk" in ln, ln
