"""Edge-case tests for the round-4 operators: bucketed range join,
char diversity, z-score outliers, stupid-backoff LM scoring."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_bucketed_range_join_boundaries(spark):
    from nonconsumptive_spark.operators.asof import bucketed_range_join

    # window: [-10s, 0) relative to the left row → right at exactly
    # -10s is IN, right at exactly 0 (same instant) is OUT.
    left = spark.createDataFrame(
        [(1, 100, 1_000_000_000)], ["event_id", "user_id", "lus"])
    right = spark.createDataFrame(
        [
            (100, 1_000_000_000 - 10_000_000),   # exactly lo → in
            (100, 1_000_000_000),                # exactly hi → out
            (100, 1_000_000_000 - 1),            # just inside → in
            (100, 1_000_000_000 - 10_000_001),   # just outside → out
            (999, 1_000_000_000 - 5_000_000),    # wrong key → out
        ],
        ["user_id", "rus"],
    )
    got = bucketed_range_join(
        left, right, on="user_id", left_us="lus", right_us="rus",
        lo_us=-10_000_000, hi_us=0,
    )
    rows = sorted(r["rus"] for r in got.collect())
    assert rows == [1_000_000_000 - 10_000_000, 1_000_000_000 - 1]


def test_bucketed_range_join_no_duplicate_pairs(spark):
    from nonconsumptive_spark.operators.asof import bucketed_range_join

    # right rows land in different buckets than the left row's home
    # bucket; every qualifying pair must appear exactly once despite the
    # 2x left bucket expansion.
    left = spark.createDataFrame(
        [(i, 7, i * 3_000_000) for i in range(50)],
        ["event_id", "user_id", "lus"])
    right = spark.createDataFrame(
        [(7, i * 1_000_000) for i in range(200)], ["user_id", "rus"])
    got = bucketed_range_join(
        left, right, on="user_id", left_us="lus", right_us="rus",
        lo_us=-5_000_000, hi_us=5_000_000,
    ).select("event_id", "rus")
    counted = got.groupBy("event_id", "rus").count().filter("count > 1")
    assert counted.count() == 0
    # brute-force cross check
    lrows = [(r["event_id"], r["lus"]) for r in left.collect()]
    rrows = [r["rus"] for r in right.collect()]
    expect = sorted(
        (e, ru) for e, lu in lrows for ru in rrows
        if -5_000_000 <= ru - lu < 5_000_000
    )
    assert sorted((r["event_id"], r["rus"]) for r in got.collect()) == expect


def test_char_diversity_empty_and_null_text(spark):
    from nonconsumptive_spark.operators.textstats import char_diversity

    df = spark.createDataFrame(
        [(1, "aab"), (2, ""), (3, None), (4, "zzzz")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in char_diversity(df).collect()}
    assert got[1]["n_chars_tok"] == 3
    assert got[1]["n_distinct_chars"] == 2
    assert got[1]["sum_sq"] == 5  # 2^2 + 1^2
    assert abs(got[1]["simpson"] - round(1 - 5 / 9, 4)) < 1e-9
    h = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(got[1]["entropy"] - round(h, 4)) < 1e-3
    for did in (2, 3):
        r = got[did]
        assert (r["n_chars_tok"], r["n_distinct_chars"], r["sum_sq"]) == (0, 0, 0)
        assert r["simpson"] == 0.0 and r["entropy"] == 0.0
    # single repeated char: entropy 0, simpson 1 - 16/16 = 0
    assert got[4]["entropy"] == 0.0
    assert got[4]["simpson"] == 0.0


def test_zscore_outliers_constant_group(spark, tmp_path):
    # a group where every value is identical → den = 0 → zscore 0.0,
    # no outliers, no NaN/Inf leaking out.
    import pandas as pd

    from nonconsumptive_spark.queries import all_queries

    sf = tmp_path / "sf"
    sf.mkdir()
    pd.DataFrame({
        "event_id": range(9),
        "ts": pd.to_datetime(["2024-01-01"] * 9),
        "user_id": [1] * 9,
        "event_type": ["flat"] * 3 + ["vary"] * 6,
        # an n-point group caps |z| at sqrt(n-1), so the vary group needs
        # enough mass around the mean for the 30.0 to clear sqrt(3)
        "value": [5.0, 5.0, 5.0, 1.0, 1.0, 1.0, 1.0, 1.0, 30.0],
        "props": ["{}"] * 9,
    }).to_parquet(sf / "events.parquet")
    q = all_queries()["q_zscore_outliers"]
    rows = {r["event_id"]: r for r in q.spark_fn(spark, str(sf)).collect()}
    for eid in (0, 1, 2):
        assert rows[eid]["zscore"] == 0.0
        assert rows[eid]["is_outlier"] is False
    assert rows[8]["is_outlier"] is True
    assert all(rows[eid]["is_outlier"] is False for eid in (3, 4, 5, 6, 7))


def test_stupid_backoff_semantics(spark):
    from nonconsumptive_spark.operators.textstats import (
        SB_ALPHA, SB_SCALE, stupid_backoff_scores)

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a z"), (3, "solo")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in stupid_backoff_scores(df).collect()}
    # doc 3 has a single token → no pairs → dropped
    assert 3 not in got
    assert got[1]["n_pairs"] == 3
    # corpus: tokens a:3 b:2 z:1 solo:1, N=7; bigrams: (a,b):2 (b,a):1 (a,z):1
    # doc1 pairs: (a,b) ln(2/3), (b,a) ln(1/2), (a,b) ln(2/3)
    expect1 = (round(math.log(2 / 3) * SB_SCALE) * 2 +
               round(math.log(1 / 2) * SB_SCALE))
    assert got[1]["sum_q"] == expect1
    # doc2: (a,z) seen once: ln(1/3) — bigram path, not backoff
    assert got[2]["sum_q"] == round(math.log(1 / 3) * SB_SCALE)


def test_stupid_backoff_backoff_path(spark):
    # construct a pair that is NOT a corpus bigram to exercise backoff:
    # impossible within one corpus (every adjacent pair IS a bigram), so
    # backoff only fires for docs scored against a *different* corpus —
    # verify the LUT covers it by scoring with coalesce semantics: a
    # bigram that appears once in one doc still uses the bigram path, and
    # the backoff column exists for every pair.
    from nonconsumptive_spark.operators.textstats import stupid_backoff_scores

    df = spark.createDataFrame(
        [(1, "x y"), (2, "y x")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in stupid_backoff_scores(df).collect()}
    # both bigrams seen once, unigrams x:2 y:2 → ln(1/2) each
    assert got[1]["sum_q"] == got[2]["sum_q"]


def test_backoff_cross_corpus_exercises_backoff_and_oov(spark):
    from nonconsumptive_spark.operators.textstats import (
        SB_ALPHA, SB_SCALE, stupid_backoff_scores)

    lm = spark.createDataFrame([(10, "a b a b")], ["doc_id", "text"])
    # doc 1: pair (b, a) seen in LM? LM bigrams: (a,b)x2... wait "a b a b"
    # gives (a,b),(b,a),(a,b) — so (b,a) IS seen. Use (b,b): unseen bigram
    # with in-vocab w1 → backoff path; and (b,zz): OOV w1 → floor path.
    scored = spark.createDataFrame(
        [(1, "b b"), (2, "b zz")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           stupid_backoff_scores(scored, lm_df=lm).collect()}
    # LM: unigrams a:2 b:2 (N=4, V=2); bigrams (a,b):2 (b,a):1
    # doc 1 pair (b,b): unseen bigram, w1=b in vocab →
    #   ln(alpha * (2+1)/(4+2))
    exp_bo = round(math.log(SB_ALPHA * (2 + 1) / (4 + 2)) * SB_SCALE)
    assert got[1]["sum_q"] == exp_bo
    # doc 2 pair (b,zz): w1 OOV → ln(alpha * 1/(4+2))
    exp_oov = round(math.log(SB_ALPHA * 1 / (4 + 2)) * SB_SCALE)
    assert got[2]["sum_q"] == exp_oov


def test_js_divergence_properties(spark):
    from nonconsumptive_spark.operators.textstats import unigram_js_divergence

    df = spark.createDataFrame(
        [
            (1, "x y z", "p"), (2, "x y z", "q"),     # identical dists
            (3, "aa bb cc", "r"),                     # disjoint from s
            (4, "dd ee ff", "s"),
        ],
        ["doc_id", "text", "lang"])
    got = {(r["label_a"], r["label_b"]): r
           for r in unigram_js_divergence(df).collect()}
    # identical distributions → JSD exactly 0
    assert got[("p", "q")]["jsd"] == 0.0
    # all pairs: 0 <= jsd <= ln 2
    for r in got.values():
        assert 0.0 <= r["jsd"] <= math.log(2) + 1e-9
    # disjoint vocabularies → strictly larger than the identical pair
    # (add-1 smoothing dominates 3-token corpora, so the value is small
    # but must still be strictly positive)
    assert got[("r", "s")]["jsd"] > 0.0
    # union-vocab bookkeeping: r/s pair has 6 tokens in its vocabulary
    assert got[("r", "s")]["v"] == 6
    assert got[("r", "s")]["n_a"] == 3 and got[("r", "s")]["n_b"] == 3


def test_cooccurrence_window_semantics(spark):
    from nonconsumptive_spark.operators.wordcount import cooccurrence_counts

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a")], ["doc_id", "text"])
    got = {(r["w0"], r["w1"]): r["count"]
           for r in cooccurrence_counts(df, window=2).collect()}
    # doc1 pairs: d1 (a,b),(b,c); d2 (a,c); doc2: none
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("a", "c"): 1}
    # window=1 degenerates to bigram counts
    got1 = {(r["w0"], r["w1"]): r["count"]
            for r in cooccurrence_counts(df, window=1).collect()}
    assert got1 == {("a", "b"): 1, ("b", "c"): 1}


def test_winsorize_bounds(spark, tmp_path):
    import pandas as pd

    from nonconsumptive_spark.queries import all_queries

    sf = tmp_path / "sf"
    sf.mkdir()
    vals = list(range(1, 21))  # 1..20 → P05 disc = 1, P95 disc = 19
    pd.DataFrame({
        "event_id": range(20),
        "ts": pd.to_datetime(["2024-01-01"] * 20),
        "user_id": [1] * 20,
        "event_type": ["t"] * 20,
        "value": [float(v) for v in vals],
        "props": ["{}"] * 20,
    }).to_parquet(sf / "events.parquet")
    q = all_queries()["q_winsorize"]
    rows = {r["event_id"]: r for r in q.spark_fn(spark, str(sf)).collect()}
    # vq = value*100; ceil(0.05*20)=1 → lo=100; ceil(0.95*20)=19 → hi=1900
    assert rows[0]["vq_clipped"] == 100 and rows[0]["is_clipped"] is False
    assert rows[19]["vq"] == 2000
    assert rows[19]["vq_clipped"] == 1900 and rows[19]["is_clipped"] is True
    assert rows[18]["vq_clipped"] == 1900 and rows[18]["is_clipped"] is False


def test_new_text_ops_null_text_consistency(spark):
    """NULL-text docs: char_diversity keeps the doc with zero stats (it is
    a per-doc hygiene stat); stupid_backoff drops it (no pairs exist) —
    both mirroring their oracles' CTE semantics exactly."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from nonconsumptive_spark.operators.textstats import (
        char_diversity, stupid_backoff_scores, unigram_js_divergence)

    schema = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType()),
                         StructField("lang", StringType())])
    docs = spark.createDataFrame(
        [(1, None, "a"), (2, "x y x", "a"), (3, "x y z", "b")], schema)
    cd = {r["doc_id"]: r for r in char_diversity(docs).collect()}
    assert set(cd) == {1, 2, 3} and cd[1]["n_chars_tok"] == 0
    sb = {r["doc_id"]: r for r in stupid_backoff_scores(docs).collect()}
    assert set(sb) == {2, 3}
    jd = unigram_js_divergence(docs).collect()
    assert len(jd) == 1  # NULL doc contributes no tokens, pair (a,b) exists


def test_label_centroid_distances_geometry(spark):
    from nonconsumptive_spark.operators.similarity import (
        label_centroid_distances)

    rows = [
        (1, [1.0, 0.0, 0.0], 0), (2, [1.0, 0.0, 0.0], 0),   # centroid +x
        (3, [0.0, 2.0, 0.0], 1),                            # centroid +y
        (4, [-1.0, 0.0, 0.0], 2), (5, [-3.0, 0.0, 0.0], 2), # centroid -x
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {(r["label_a"], r["label_b"]): r
           for r in label_centroid_distances(emb).collect()}
    assert got[(0, 1)]["cos_centroid"] == 0.0      # orthogonal
    assert got[(0, 2)]["cos_centroid"] == -1.0     # opposite
    assert got[(1, 2)]["cos_centroid"] == 0.0
    assert got[(0, 2)]["n_a"] == 2 and got[(0, 2)]["n_b"] == 2


def test_counts_jsd_matches_pairwise_operator(spark):
    """The streaming kernel (counts_jsd) and the batch pairwise operator
    must agree on the same pair of distributions."""
    from nonconsumptive_spark.operators.textstats import (
        counts_jsd, unigram_js_divergence)
    from nonconsumptive_spark.operators.wordcount import global_wordcount
    from nonconsumptive_spark.queries import load
    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents")
    pairwise = {(r["label_a"], r["label_b"]): r["jsd"]
                for r in unigram_js_divergence(docs).collect()}
    a = global_wordcount(docs.filter(F.col("lang") == "en"))
    b = global_wordcount(docs.filter(F.col("lang") == "fr"))
    one = counts_jsd(a, b).collect()[0]
    assert one["jsd"] == pairwise[("en", "fr")]


def test_new_ops_plan_shapes(spark):
    """Scale-property regressions for the round-4b operators: the range
    join must be an equi-join (never BroadcastNestedLoopJoin/Cartesian
    on the data path), ppjoin must stay equi-join only, and zscore's
    moments must come back as a broadcast."""
    from nonconsumptive_spark.operators import dedup as dd
    from nonconsumptive_spark.queries import all_queries, load
    from tests.conftest import SF_SMALL

    qs = all_queries()

    plan = (qs["q_range_join_events"].spark_fn(spark, SF_SMALL)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

    plan = (dd.ppjoin_pairs(load(spark, SF_SMALL, "documents"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    plan = (qs["q_zscore_outliers"].spark_fn(spark, SF_SMALL)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

    plan = (qs["q_winsorize"].spark_fn(spark, SF_SMALL)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan

    # co-occurrence: the only shuffle is the final count agg — no join at all
    plan = (qs["q_cooccurrence_window"].spark_fn(spark, SF_SMALL)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan


def test_distinctive_terms_separates_planted_vocab(spark):
    """A token that appears only in one label must rank at the top of
    that label's distinctive list with positive z; shared background
    tokens must score near zero."""
    from nonconsumptive_spark.operators.textstats import distinctive_terms

    rows = [(i, "common words here plus apple apple apple", "a")
            for i in range(5)]
    rows += [(10 + i, "common words here plus banana banana banana", "b")
             for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = distinctive_terms(df, k=3).collect()
    top = {r["label"]: [x["token"] for x in sorted(
        [g for g in got if g["label"] == r["label"]],
        key=lambda g: g["rank"])] for r in got}
    assert top["a"][0] == "apple"
    assert top["b"][0] == "banana"
    za = {r["token"]: r["z_logodds"] for r in got if r["label"] == "a"}
    assert za["apple"] > 0
    # planted token dominates any background token's score
    assert all(za["apple"] > v for t, v in za.items() if t != "apple")


def test_negative_sampling_ranges_tile_and_weight(spark):
    """Ranges are disjoint, ordered, gap-free, and each width equals the
    quantized count^0.75 weight."""
    from nonconsumptive_spark.operators.wordcount import (
        NEG_POW, NEG_SCALE, negative_sampling_table)

    df = spark.createDataFrame(
        [(1, "a a a a b b c"), (2, "a c")], ["doc_id", "text"])
    rows = sorted(negative_sampling_table(df).collect(),
                  key=lambda r: r["cum_lo"])
    prev_hi = 0
    for r in rows:
        assert r["cum_lo"] == prev_hi            # gap-free tiling
        assert r["cum_hi"] - r["cum_lo"] == r["weight_q"]
        import math
        c = float(r["count"])
        assert r["weight_q"] == round(math.sqrt(math.sqrt(c * c * c))
                                      * NEG_SCALE)
        prev_hi = r["cum_hi"]
    counts = {r["token"]: r["count"] for r in rows}
    assert counts == {"a": 5, "b": 2, "c": 2}


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from nonconsumptive_spark.operators.textstats import bootstrap_mean_ci
    from nonconsumptive_spark.queries import load
    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents")
    r1 = bootstrap_mean_ci(docs).collect()[0]
    r2 = bootstrap_mean_ci(docs).collect()[0]
    assert r1 == r2                       # fully deterministic
    assert r1["n_reps"] == 50
    assert r1["ci_lo"] <= r1["mean"] <= r1["ci_hi"]
    # interval should be tight for 500 docs but not degenerate
    assert r1["ci_lo"] < r1["ci_hi"]


def test_tfidf_cosine_pairs_identical_docs(spark):
    from nonconsumptive_spark.operators.textstats import tfidf_cosine_pairs

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
         (3, "delta epsilon zeta")],
        ["doc_id", "text"])
    got = {(r["doc_a"], r["doc_b"]): r["cosine"]
           for r in tfidf_cosine_pairs(df, threshold=0.5).collect()}
    assert got.get((1, 2)) == 1.0     # identical docs → cosine exactly 1
    assert (1, 3) not in got and (2, 3) not in got  # disjoint vocab
