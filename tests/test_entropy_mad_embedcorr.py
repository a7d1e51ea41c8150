"""Semantic + plan-shape tests for the round-4c operators: per-doc token
entropy, MAD outliers, embedding decontamination, dimension correlation."""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_SMALL


# -------------------------------------------------------------------- entropy
def test_token_entropy_hand_values(spark):
    from nonconsumptive_spark.operators.textstats import token_entropy

    df = spark.createDataFrame(
        [(1, "a a b b"), (2, "x x x x"), (3, "p q r s"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in token_entropy(df).collect()}
    # uniform over 2 types of 2 -> ln 2; constant -> 0; all-distinct -> ln 4
    assert rows[1].entropy_nats == pytest.approx(math.log(2), abs=1e-3)
    assert rows[2].entropy_nats == 0.0
    assert rows[3].entropy_nats == pytest.approx(math.log(4), abs=1e-3)
    assert rows[1].n_tokens == 4 and rows[1].n_types == 2
    # empty / NULL text degrade to zeros, not NULLs (oracle parity)
    for d in (4, 5):
        assert rows[d].n_tokens == 0 and rows[d].n_types == 0
        assert rows[d].entropy_nats == 0.0


def test_token_entropy_zero_shuffle_plan(spark):
    """The entropy scan must stay a pure projection: no Exchange anywhere."""
    from nonconsumptive_spark.operators.textstats import token_entropy

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = token_entropy(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------- MAD
def test_mad_outliers_flags_extremes(spark):
    from nonconsumptive_spark.queries import all_queries

    out = all_queries()["q_mad_outliers"].spark_fn(spark, SF_SMALL)
    rows = out.collect()
    assert len(rows) > 0
    # flag must agree with the integer inequality on the emitted columns
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    flagged = [r for r in rows if r.is_outlier]
    unflagged = [r for r in rows if not r.is_outlier]
    assert unflagged, "MAD cut flagged everything"
    if flagged:
        # every flagged row's |mad_z| exceeds every unflagged row's within
        # its own group floor of 3.5 (sanity on the cut direction)
        assert min(abs(r.mad_z) for r in flagged) >= 3.5 - 1e-9


# ------------------------------------------------------------- decontaminate
def test_embedding_decontaminate_self_is_contaminated(spark):
    """A corpus vector identical to a held-out vector scores cosine 1."""
    from pyspark.sql import functions as F

    from nonconsumptive_spark.operators.similarity import (
        embedding_decontaminate,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    heldout = emb.filter(F.col("label") == 0).limit(3)
    # plant a held-out vector inside the corpus under a fresh id
    planted = heldout.limit(1).select(
        (F.lit(10_000_000) + F.col("vec_id")).alias("vec_id"), "embedding")
    corpus = emb.filter(F.col("label") != 0).select("vec_id", "embedding") \
        .unionByName(planted)
    out = embedding_decontaminate(corpus, heldout, threshold=0.999)
    planted_row = [r for r in out.collect() if r.vec_id >= 10_000_000]
    assert len(planted_row) == 1
    assert planted_row[0].is_contaminated
    assert planted_row[0].max_heldout_cosine == pytest.approx(1.0, abs=1e-3)


# ------------------------------------------------------------------ dim corr
def test_embedding_dim_corr_matches_numpy(spark):
    import numpy as np

    from nonconsumptive_spark.operators.similarity import (
        DIMCORR_SCALE,
        embedding_dim_corr,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    out = {(r.dim_i, r.dim_j): r.pearson_r
           for r in embedding_dim_corr(emb, dim=64).collect()}
    assert len(out) == 64 * 63 // 2

    mat = np.array([r.embedding for r in emb.select("embedding").collect()],
                   dtype=np.float64)
    q = np.floor(mat * DIMCORR_SCALE + 0.5)  # the quantization both engines use
    ref = np.corrcoef(q, rowvar=False)
    for (i, j), r in list(out.items())[:200]:
        assert r == pytest.approx(ref[i, j], abs=2e-4), (i, j)


def test_embedding_dim_corr_shuffle_is_bounded(spark):
    """Cross-sum agg must partial-aggregate map-side: the plan carries a
    partial HashAggregate before its Exchange (shuffle ships d^2-keyed
    partials, not corpus rows)."""
    from nonconsumptive_spark.operators.similarity import embedding_dim_corr

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    plan = embedding_dim_corr(emb, dim=64)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan or "partial" in plan.lower()


# ------------------------------------------------------------------ KN bigram
def test_kn_bigram_hand_corpus(spark):
    """KN probabilities on a 2-doc corpus, checked against a hand model."""
    import math

    from nonconsumptive_spark.operators.textstats import (
        KN_DISCOUNT,
        kn_bigram_logprob_scores,
    )

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string")
    out = {r.doc_id: r for r in kn_bigram_logprob_scores(df).collect()}
    # bigrams: (a,b)x2, (b,a)x1, (a,c)x1 -> nbt=3, V={a,b,c}=3
    # ctx: a -> c1=3, n1f=2 ; b -> c1=1, n1f=1
    # back: b -> n1b=1, a -> n1b=1, c -> n1b=1
    D, nbt, v = KN_DISCOUNT, 3, 3
    pc = lambda n1b: (n1b + 1.0) / (nbt + v + 1)
    p_first = pc(1)                                     # p_cont(a)
    p_ab = max(2 - D, 0) / 3 + D * 2 / 3 * pc(1)        # a -> b
    p_ba = max(1 - D, 0) / 1 + D * 1 / 1 * pc(1)        # b -> a
    p_ac = max(1 - D, 0) / 3 + D * 2 / 3 * pc(1)        # a -> c
    exp1 = (math.log(p_first) + math.log(p_ab) + math.log(p_ba)
            + math.log(p_ab)) / 4
    exp2 = (math.log(p_first) + math.log(p_ac)) / 2
    assert out[1].avg_logprob == pytest.approx(exp1, abs=1e-3)
    assert out[2].avg_logprob == pytest.approx(exp2, abs=1e-3)
    assert out[1].n_tokens == 4 and out[2].n_tokens == 2


# --------------------------------------------------------------- src overlap
def test_source_overlap_matrix_complete_and_selfconsistent(spark):
    from nonconsumptive_spark.operators.textstats import source_overlap_matrix

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    n_src = docs.select("source").distinct().count()
    rows = source_overlap_matrix(docs).collect()
    # complete upper-triangle spine, zero-overlap pairs included
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert r.source_a < r.source_b
        assert r.n_shared >= 0 and 0.0 <= r.jaccard <= 1.0
        if r.n_shared == 0:
            assert r.jaccard == 0.0


def test_source_overlap_detects_planted_copy(spark):
    """Duplicating one source's docs under a new source name must produce
    a (near-)1.0 Jaccard pair."""
    from pyspark.sql import functions as F

    from nonconsumptive_spark.operators.textstats import source_overlap_matrix

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    src = docs.select("source").orderBy("source").limit(1).collect()[0][0]
    clone = docs.filter(F.col("source") == src).withColumn(
        "source", F.lit("zz_clone"))
    out = source_overlap_matrix(docs.unionByName(clone)).collect()
    pair = [r for r in out if r.source_b == "zz_clone" and r.source_a == src]
    assert len(pair) == 1 and pair[0].jaccard == 1.0
