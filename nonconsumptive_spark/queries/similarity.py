"""Similarity-search queries over the `embeddings` table.

The brute-force top-k is the oracle-checked exact baseline; the LSH/IVF
variants are the approximate scale paths, oracle-checked on QUALITY: their
recall against the exact baseline must clear a bound (plus exact-side
counts DuckDB recomputes itself); tests additionally measure the raw
recall numbers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nonconsumptive_spark.operators import similarity as sim
from nonconsumptive_spark.queries import load, register

_N_QUERIES = 10  # first N vec_ids serve as the query set
_K = 5

# DuckDB: exact cosine in doubles with identical rank tie-break.
_DUCK_KNN = f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
      FROM embeddings WHERE vec_id < {_N_QUERIES}),
    c AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             round(list_dot_product(q.qvec, c.cvec) /
                   (sqrt(list_dot_product(q.qvec, q.qvec)) *
                    sqrt(list_dot_product(c.cvec, c.cvec))), 4) AS cosine_sim
      FROM q CROSS JOIN c
      WHERE q.query_id <> c.neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cosine_sim,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine_sim DESC, neighbor_id ASC) AS BIGINT) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cosine_sim, rank
    FROM ranked WHERE rank <= {_K}
"""


@register(
    "q_knn_cosine_bruteforce",
    oracle=_DUCK_KNN,
    doc="Exact brute-force cosine top-5 for 10 query vectors; broadcast "
        "query side, deterministic (rounded-sim, id) ranking.",
)
def q_knn_cosine_bruteforce(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return sim.knn_bruteforce(emb, queries, k=_K)


@register(
    "q_embedding_norms",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))), 4) AS l2_norm
    FROM embeddings
    """,
    doc="Per-vector L2 norm in doubles.",
)
def q_embedding_norms(spark, sf_dir):
    return sim.embedding_norms(load(spark, sf_dir, "embeddings"))


@register(
    "q_norms_by_label",
    oracle="""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[])))), 4) AS avg_norm
    FROM embeddings
    GROUP BY label
    """,
    doc="Aggregate over an array-typed column: mean L2 norm per label.",
)
def q_norms_by_label(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(sim._norm(F.col("embedding"))), 4).alias("avg_norm"),
    )


@register(
    "q_cosine_near_pairs",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])) /
                 (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                        CAST(a.embedding AS DOUBLE[]))) *
                  sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])))), 4) AS cosine_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) /
                (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                       CAST(a.embedding AS DOUBLE[]))) *
                 sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])))), 4) >= 0.3
    """,
    doc="J6 theta-join form + embedding-cosine near-dup: all same-label "
        "pairs (id_a < id_b) with cosine ≥ 0.3.  Label-blocked so the "
        "quadratic stage shuffles on the block key, not a full cross join.",
)
def q_cosine_near_pairs(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return sim.cosine_near_dup_pairs(emb, threshold=0.3, block_col="label")


# ANN results are approximate so their ROWS aren't SQL-recomputable, but
# their QUALITY is: recall against the exact brute-force baseline (both
# computed in Spark, deterministic seeded hyperplanes/centroids) must clear
# a bound the oracle asserts as TRUE, alongside exact-side counts DuckDB
# recomputes itself.  Measured at sf0.01: LSH 0.86, IVF 0.78.
_RECALL_BOUND = 0.6

_DUCK_RECALL = f"""
    SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS n_exact,
           TRUE AS recall_ok
    FROM ({_DUCK_KNN})
"""


def _recall_check(spark, sf_dir, approx_fn):
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    # the exact top-k feeds both the hits join and the count agg —
    # materialize so the corpus-wide scoring pass runs once, not twice
    exact = materialize_once(sim.knn_bruteforce(emb, queries, k=_K), "knn_exact")
    approx = approx_fn(emb, queries)
    hits = exact.join(
        approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    )
    agg = exact.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count("*").alias("n_exact"),
    )
    return agg.crossJoin(hits.agg(F.count("*").alias("n_hits"))).select(
        "n_queries", "n_exact",
        (F.col("n_hits") / F.col("n_exact") >= _RECALL_BOUND).alias("recall_ok"),
    )


@register(
    "q_knn_cosine_lsh",
    oracle=_DUCK_RECALL,
    doc="Approximate top-k via random-hyperplane LSH bucketing — the 100 TB "
        f"scale path.  Oracle checks recall ≥ {_RECALL_BOUND} vs the exact "
        "baseline (measured 0.86 at sf0.01; deterministic seeded planes) "
        "plus DuckDB-recomputed exact-side counts.",
)
def q_knn_cosine_lsh(spark, sf_dir):
    return _recall_check(
        spark, sf_dir,
        lambda emb, q: sim.knn_lsh(emb, q, k=_K, n_planes=4, n_tables=12),
    )


@register(
    "q_knn_cosine_ivf",
    oracle=_DUCK_RECALL,
    doc="Approximate top-k via IVF coarse quantization (nearest-centroid "
        "cells, multi-probe) — the partition-pruning ANN path: at scale the "
        "corpus is written partitioned by cell and probes prune whole "
        f"partitions.  Oracle checks recall ≥ {_RECALL_BOUND} (measured "
        "0.78 at sf0.01) plus exact-side counts.",
)
def q_knn_cosine_ivf(spark, sf_dir):
    return _recall_check(
        spark, sf_dir,
        lambda emb, q: sim.knn_ivf(emb, q, k=_K, n_centroids=16, n_probe=8),
    )


# --------------------------------------------------------------------------
@register(
    "q_quantize_int8",
    oracle="""
    WITH qz AS (
      SELECT vec_id,
             CAST(embedding AS DOUBLE[]) AS v,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      FROM embeddings),
    codes AS (
      SELECT vec_id, scale,
             CASE WHEN scale > 0
                  THEN list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
                  ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
      FROM qz)
    SELECT vec_id,
           round(scale, 6) AS scale_r,
           CAST(list_sum(q) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1,
           CAST(list_max(list_transform(q, x -> abs(x))) AS BIGINT) AS q_max_abs
    FROM codes
    """,
    doc="Symmetric int8 quantization of the embedding column (the 4x "
        "storage/bandwidth lever for ANN at scale).  Codes are exact "
        "integers, so the oracle compares integer checksums (sum, L1, "
        "max|q|) plus the rounded scale — no float-sum ordering risk; "
        "reconstruction-error bounds live in pytest.",
)
def q_quantize_int8(spark, sf_dir):
    qv = sim.quantized_vectors(load(spark, sf_dir, "embeddings"))
    absq = F.transform(F.col("q"), lambda x: F.abs(x))
    zero = F.lit(0).cast("long")
    return qv.select(
        "vec_id",
        F.round(F.col("scale"), 6).alias("scale_r"),
        F.aggregate(F.col("q"), zero, lambda a, v: a + v).alias("q_sum"),
        F.aggregate(absq, zero, lambda a, v: a + v).alias("q_l1"),
        F.array_max(absq).cast("long").alias("q_max_abs"),
    )


@register(
    "q_knn_quantized",
    oracle=_DUCK_RECALL,
    doc="Top-k cosine over int8-quantized vectors (integer dot products, "
        f"rescaled).  Oracle checks recall ≥ {_RECALL_BOUND} vs the exact "
        "float baseline (measured ≈1.0 at sf0.01 — int8 cosine error is "
        "~1e-3); same broadcast + per-query window shape as the exact kNN.",
)
def q_knn_quantized(spark, sf_dir):
    return _recall_check(
        spark, sf_dir,
        lambda emb, q: sim.knn_quantized(emb, q, k=_K),
    )


# --------------------------------------------------------------------------
# PQ + ADC: full-replay oracle (hash-exact, not just a recall bound) —
# the same generated-CTE discipline as the k-means/BPE/PageRank oracles.
# All interim values are exact integers (grid quantization, integer Lloyd,
# integer squared distances), so the whole train→encode→score→rank
# pipeline replays bit-for-bit in DuckDB.
_PQ_M = sim.PQ_M
_PQ_KSUB = sim.PQ_KSUB
_PQ_ITERS = sim.PQ_ITERS
_PQ_DIM = 64  # fixture embedding dimensionality


def _pq_subspace_chain(j: int, ksub: int, n_iter: int, dsub: int) -> str:
    """CTE chain training subspace ``j``'s codebook and assigning every
    corpus vector to its final centroid (a{j}_{n_iter+1} carries the
    winning centroid vector cq)."""
    lo, hi = j * dsub + 1, (j + 1) * dsub
    parts = [f"""
    q{j} AS (SELECT vec_id, xq[{lo}:{hi}] AS sx FROM q),
    c{j}_0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, sx AS cq
      FROM (SELECT vec_id, sx FROM q{j} ORDER BY vec_id LIMIT {ksub}))"""]
    for i in range(1, n_iter + 2):
        parts.append(f"""
    a{j}_{i} AS (
      SELECT vec_id, sx, cid, cq, dist
      FROM (SELECT s.vec_id, s.sx, c.cid, c.cq,
                   list_sum(list_transform(list_zip(s.sx, c.cq),
                     p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
            FROM q{j} s CROSS JOIN c{j}_{i - 1} c)
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1)""")
        if i == n_iter + 1:
            break
        parts.append(f"""
    s{j}_{i} AS (
      SELECT cid, pos,
             CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS cv
      FROM (SELECT cid, generate_subscripts(sx, 1) AS pos, unnest(sx) AS v
            FROM a{j}_{i})
      GROUP BY cid, pos),
    c{j}_{i} AS (
      SELECT p.cid, coalesce(n.cq, p.cq) AS cq
      FROM c{j}_{i - 1} p
      LEFT JOIN (SELECT cid, list(cv ORDER BY pos) AS cq
                 FROM s{j}_{i} GROUP BY cid) n USING (cid))""")
    return ",".join(parts)


def _pq_adc_oracle(m: int, ksub: int, n_iter: int, dim: int, grid: int,
                   n_queries: int, k: int) -> str:
    dsub = dim // m
    fin = n_iter + 1
    chains = ",".join(_pq_subspace_chain(j, ksub, n_iter, dsub)
                      for j in range(m))
    enc_joins = " JOIN ".join(
        [f"(SELECT vec_id, cq AS cq0 FROM a0_{fin}) e0"]
        + [f"(SELECT vec_id, cq AS cq{j} FROM a{j}_{fin}) e{j} USING (vec_id)"
           for j in range(1, m)]
    )
    dist_terms = " + ".join(
        f"list_sum(list_transform(list_zip(qs.xq[{j * dsub + 1}:{(j + 1) * dsub}], "
        f"enc.cq{j}), p -> (p[1] - p[2]) * (p[1] - p[2])))"
        for j in range(m)
    )
    return f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {grid}.0 + 0.5) AS BIGINT)) AS xq
      FROM embeddings),
    {chains},
    enc AS (SELECT * FROM {enc_joins}),
    qs AS (SELECT vec_id AS query_id, xq FROM q WHERE vec_id < {n_queries}),
    scored AS (
      SELECT qs.query_id, enc.vec_id AS neighbor_id,
             CAST({dist_terms} AS BIGINT) AS adc_dist
      FROM qs CROSS JOIN enc
      WHERE enc.vec_id <> qs.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, adc_dist,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_dist ASC, neighbor_id ASC)
                  AS BIGINT) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, adc_dist, rank FROM ranked WHERE rank <= {k}
    """


@register(
    "q_knn_pq_adc",
    oracle=_pq_adc_oracle(_PQ_M, _PQ_KSUB, _PQ_ITERS, _PQ_DIM,
                          1 << 20, _N_QUERIES, _K),
    doc=f"Product-quantized kNN with asymmetric-distance scoring (Jégou "
        f"et al.): {_PQ_M} subspace codebooks of {_PQ_KSUB} integer-grid "
        f"centroids ({_PQ_ITERS} Lloyd rounds each), corpus stored as "
        "codes, queries scored against centroids.  Exact integer "
        "arithmetic end-to-end, so the oracle replays training, encoding, "
        "ADC scoring and ranking as generated CTEs — hash-exact, stronger "
        "than the LSH/IVF recall bounds.  Scoring is a broadcast join "
        "with the codebook constant-folded; the only exchange is the "
        "per-query top-k window.",
)
def q_knn_pq_adc(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return sim.knn_pq_adc(emb, queries, k=_K, dim=_PQ_DIM)


# --------------------------------------------------------------------------
@register(
    "q_label_centroid_distances",
    oracle=f"""
    WITH comp AS (
      SELECT label, generate_subscripts(embedding, 1) AS dim,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * {sim.CENT_SCALE})
                  AS BIGINT) AS cq
      FROM embeddings),
    sums AS (SELECT label, dim, CAST(sum(cq) AS BIGINT) AS s
             FROM comp GROUP BY label, dim),
    vecs AS (SELECT label, list(s ORDER BY dim) AS sv FROM sums GROUP BY label),
    cnt AS (SELECT label, CAST(count(*) AS BIGINT) AS n
            FROM embeddings GROUP BY label),
    selfd AS (
      SELECT label, sv,
             CAST(list_sum(list_transform(sv, x -> x * x)) AS BIGINT) AS daa
      FROM vecs)
    SELECT a.label AS label_a, b.label AS label_b,
           ca.n AS n_a, cb.n AS n_b,
           round(CAST(list_sum(list_transform(range(1, len(a.sv) + 1),
                                              i -> a.sv[i] * b.sv[i]))
                      AS BIGINT) * 1.0
                 / (sqrt(CAST(a.daa AS DOUBLE)) * sqrt(CAST(b.daa AS DOUBLE))),
                 6) + 0.0 AS cos_centroid
    FROM selfd a JOIN selfd b ON a.label < b.label
    JOIN cnt ca ON ca.label = a.label
    JOIN cnt cb ON cb.label = b.label
    """,
    doc="Pairwise cosine between per-label embedding centroids — the "
        "embedding-space analog of q_js_divergence's corpus-drift measure. "
        "Components quantize to integer 1e-3 units before any agg, the "
        "count normalization cancels out of cosine, and dots are pure "
        "BIGINT arithmetic (operators/similarity.py:"
        "label_centroid_distances).",
)
def q_label_centroid_distances(spark, sf_dir):
    return sim.label_centroid_distances(load(spark, sf_dir, "embeddings"))


# --------------------------------------------------------------------------
_DECON_THRESH = 0.35  # sf0.01 max-heldout-cosine ranges ~0.15-0.49


@register(
    "q_embedding_decontamination",
    oracle=f"""
    WITH h AS (
      SELECT CAST(embedding AS DOUBLE[]) AS hvec FROM embeddings
      WHERE label = 0),
    c AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cvec FROM embeddings
      WHERE label <> 0),
    m AS (
      SELECT c.vec_id,
             round(max(list_dot_product(c.cvec, h.hvec) /
                       (sqrt(list_dot_product(c.cvec, c.cvec)) *
                        sqrt(list_dot_product(h.hvec, h.hvec)))), 4)
               AS max_heldout_cosine
      FROM c CROSS JOIN h GROUP BY c.vec_id)
    SELECT vec_id, max_heldout_cosine + 0.0 AS max_heldout_cosine,
           max_heldout_cosine >= {_DECON_THRESH} AS is_contaminated
    FROM m
    """,
    doc="Embedding-space decontamination: max cosine of every corpus "
        "vector (label<>0) against the held-out benchmark set (label=0), "
        "flagged at 0.35 — catches paraphrased benchmark leakage that "
        "n-gram decontamination (q_decontamination) cannot.  Plan: the "
        "benchmark side broadcasts, the corpus scans once through a BNLJ "
        "and ships only (id, max) pairs; the flag cuts on the ROUNDED "
        "value so both engines use the same 4-decimal key "
        "(operators/similarity.py:embedding_decontaminate).",
)
def q_embedding_decontamination(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return sim.embedding_decontaminate(
        emb.filter(F.col("label") != 0),
        emb.filter(F.col("label") == 0),
        threshold=_DECON_THRESH,
    )


# --------------------------------------------------------------------------
_DIM = 64


@register(
    "q_embedding_dim_corr",
    oracle=f"""
    WITH e AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) - 1 AS i,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                        * {sim.DIMCORR_SCALE} + 0.5) AS BIGINT) AS q
      FROM embeddings),
    d AS (
      SELECT i, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS s,
             CAST(sum(q * q) AS BIGINT) AS ss
      FROM e GROUP BY i),
    x AS (
      SELECT a.i AS i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS sij
      FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i < b.i
      GROUP BY a.i, b.i)
    SELECT CAST(x.i AS BIGINT) AS dim_i, CAST(x.j AS BIGINT) AS dim_j,
           CASE WHEN da.n * da.ss - da.s * da.s > 0
                 AND db.n * db.ss - db.s * db.s > 0
                THEN round(CAST(da.n * x.sij - da.s * db.s AS DOUBLE)
                           / (sqrt(CAST(da.n * da.ss - da.s * da.s AS DOUBLE))
                              * sqrt(CAST(db.n * db.ss - db.s * db.s AS DOUBLE))),
                           4) + 0.0
                ELSE 0.0 END AS pearson_r
    FROM x JOIN d da ON da.i = x.i JOIN d db ON db.i = x.j
    """,
    doc="Embedding-dimension Pearson correlation (gram-matrix upper "
        "triangle, 2016 pairs at d=64) — the PCA/whitening/redundancy "
        "diagnostic in ONE distributed pass.  Elements quantized to exact "
        "1e-4-unit BIGINTs so all moments are exact integer sums; cross "
        "products generated in-row and partially aggregated map-side, so "
        "shuffle volume is #partitions x d^2, independent of corpus size "
        "(operators/similarity.py:embedding_dim_corr).",
)
def q_embedding_dim_corr(spark, sf_dir):
    return sim.embedding_dim_corr(load(spark, sf_dir, "embeddings"), dim=_DIM)
