"""Unit semantics for the hybrid-retrieval operators: stop-cut shingle
lexical ranking, RRF fusion, and hard-negative mining.

The oracle queries cover the bulk paths at sf0.01; these pin the
hand-checkable edge semantics on tiny frames.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nonconsumptive_spark.operators.hybrid import (
    RRF_K,
    RRF_SCALE,
    hard_negatives,
    lexical_topn,
    rrf_fuse,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _emb(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


# ------------------------------------------------------- lexical ranking ----
def test_lexical_overlap_counts_shared_bigrams(spark):
    # query doc 0 shares "red fox" + "fox jumps" with doc 1, only
    # "red fox" with doc 2; doc 3 shares nothing.
    docs = _docs(spark, [
        (0, "red fox jumps high"),
        (1, "the red fox jumps"),
        (2, "a red fox sleeps"),
        (3, "green turtle swims"),
        # pad the corpus so no shingle hits the 10% stop cut unfairly:
        # every bigram above appears in <= 3 of 30 docs (df*10 <= 30).
        *[(i, f"filler{i} pad{i}") for i in range(4, 30)],
    ])
    out = {r["cand_id"]: r for r in
           lexical_topn(docs, n_queries=1).collect()}
    assert out[1]["overlap"] == 2
    assert out[2]["overlap"] == 1
    assert 3 not in out
    assert out[1]["lex_rank"] == 1 and out[2]["lex_rank"] == 2


def test_lexical_stop_cut_drops_universal_bigram(spark):
    # "common pair" appears in ALL docs -> df * 10 > n_docs -> dropped;
    # only the query-specific overlap with doc 1 survives.
    docs = _docs(spark, [
        (0, "common pair unique zebra"),
        (1, "common pair unique zebra"),
        *[(i, f"common pair word{i}") for i in range(2, 20)],
    ])
    out = lexical_topn(docs, n_queries=1).collect()
    assert [r["cand_id"] for r in out] == [1]
    # doc 1 shares "unique zebra" (and "pair unique"); "common pair" is cut
    assert out[0]["overlap"] == 2


# ------------------------------------------------------------ RRF fusion ----
def test_rrf_score_is_exact_integer_sum(spark):
    docs = _docs(spark, [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma delta"),
        (2, "zeta eta theta iota"),
        *[(i, f"pad{i} fill{i}") for i in range(3, 20)],
    ])
    emb = _emb(spark, [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.1]),
        (2, [0.0, 1.0]),
        *[(i, [0.5, 0.5]) for i in range(3, 20)],
    ])
    out = {r["cand_id"]: r for r in
           rrf_fuse(docs, emb, n_queries=1, fuse_top=20).collect()}
    r1 = out[1]
    # doc 1: lexical rank 1 (3 shared bigrams) and semantic rank 1
    assert r1["lex_rank"] == 1 and r1["sem_rank"] == 1
    assert r1["rrf_score"] == 2 * (RRF_SCALE // (RRF_K + 1))
    assert r1["fused_rank"] == 1
    # doc 2: no shared bigram -> lexical-side NULL, semantic term only
    r2 = out[2]
    assert r2["lex_rank"] is None
    assert r2["rrf_score"] == RRF_SCALE // (RRF_K + r2["sem_rank"])


def test_rrf_excludes_self_match(spark):
    docs = _docs(spark, [(i, f"tok{i} same pair") for i in range(8)])
    emb = _emb(spark, [(i, [1.0, float(i)]) for i in range(8)])
    out = rrf_fuse(docs, emb, n_queries=2).collect()
    assert all(r["cand_id"] != r["query_id"] for r in out)


# -------------------------------------------------------- hard negatives ----
def test_hard_negatives_lexical_hit_semantic_miss(spark):
    docs = _docs(spark, [
        (0, "apple banana cherry date"),
        (1, "apple banana cherry date"),   # lexical twin, orthogonal vector
        (2, "apple banana cherry date"),   # lexical twin, parallel vector
        *[(i, f"pad{i} fill{i}") for i in range(3, 30)],
    ])
    emb = _emb(spark, [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),                   # cosine 0.0 -> hard negative
        (2, [2.0, 0.0]),                   # cosine 1.0 -> not a negative
        *[(i, [1.0, 1.0]) for i in range(3, 30)],
    ])
    out = hard_negatives(docs, emb, n_queries=1).collect()
    assert [r["cand_id"] for r in out] == [1]
    assert out[0]["cosine_sim"] == 0.0
    assert out[0]["lex_rank"] in (1, 2)  # twins tie on overlap, id breaks
