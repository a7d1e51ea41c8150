"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k via a join + window — exact, the
correctness oracle.  Scale path: cosine-LSH (random hyperplane signs)
bucketing so only same-bucket pairs are scored, plus an IVF-style variant
(coarse k-means-free centroid assignment by hashing) for 100 TB corpora.

All arithmetic is double-precision inside Catalyst higher-order functions
(``zip_with`` + ``aggregate``) — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    """Cosine similarity between two array<numeric> columns, in doubles."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def embedding_norms(emb: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """L2 norm per vector — the sanity/statistics operator."""
    return emb.select(id_col, F.round(_norm(F.col(vec_col)), 4).alias("l2_norm"))


def cosine_near_dup_pairs(emb: DataFrame, threshold: float = 0.3,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          block_col: str | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ threshold).

    The reference's all-pairs similarity is a notebook i<j loop over SRP
    bit-vectors (examples/Ngrams.ipynb; SURVEY §2.3-J6).  Here the general
    theta-join form: with ``block_col`` set, the quadratic comparison is
    confined to equal-key blocks (an equi-join Catalyst shuffles on the
    block key — the 100 TB pattern: block on a cluster/LSH-bucket column);
    without it, a true cross join (correctness oracle only).

    Norms are precomputed per side *before* the join so each row's norm is
    evaluated n_rows times, not n_pairs times."""
    on = [block_col] if block_col else []
    a = emb.select(*on, F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                   _norm(F.col(vec_col)).alias("norm_a"))
    b = emb.select(*on, F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                   _norm(F.col(vec_col)).alias("norm_b"))
    joined = a.join(b, on) if on else a.crossJoin(b)
    sim_col = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("norm_a") * F.col("norm_b")), 4)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", sim_col)
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def knn_bruteforce(emb: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    queries: a (typically small) DataFrame with the same (id, vec) schema;
    it is broadcast so the corpus side never shuffles.  Ranking key is
    (rounded sim desc, neighbor id asc) — fully deterministic across
    engines.  Self-matches are excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 4).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


# --------------------------------------------------------------------------
# Scale path: random-hyperplane LSH bucketing (approximate).


def _srp_plane(dim: int, plane_idx: int, seed: int = 7) -> list[float]:
    """Deterministic pseudo-random hyperplane (library-free, seeded)."""
    import hashlib
    import struct

    vals = []
    for j in range(dim):
        h = hashlib.md5(f"{seed}:{plane_idx}:{j}".encode()).digest()
        (u,) = struct.unpack("<Q", h[:8])
        vals.append((u / 2**64) * 2.0 - 1.0)
    return vals


def _bits_col(vec_col: str, n_bits: int, dim: int, seed: int = 1000):
    """Column: array<boolean> of n_bits dot-product signs against seeded
    hyperplanes.

    The plane matrix enters the plan as ``from_json`` of ONE string literal
    — a single py4j call that Catalyst constant-folds into a nested-array
    Literal at optimization time (verified via optimizedPlan).  The
    alternatives measured: per-element ``F.array(F.lit(...))`` ~9s of
    driver time for 48×64 planes; ``F.lit(list_of_lists)`` ~1.6s of py4j
    conversion; this form ~15ms.  Narrow, JVM-side, no shuffle."""
    import json

    planes = F.from_json(
        F.lit(json.dumps([_srp_plane(dim, i, seed) for i in range(n_bits)])),
        "array<array<double>>",
    )
    return F.transform(
        planes,
        lambda p: F.aggregate(
            F.zip_with(F.col(vec_col), p, lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda a, v: a + v,
        ) > 0,
    )


def _pack_buckets(bits_col, n_planes: int, n_tables: int):
    """array<boolean> sign bits → array<long>: one packed bucket id per
    table (each table owns n_planes consecutive bits).  ``bits_col`` should
    reference a projected column, not the raw sign expression — otherwise
    the 48 dot products re-evaluate once per table."""
    pow2 = F.lit([float(1 << j) for j in range(n_planes)])
    return F.transform(
        F.sequence(F.lit(1), F.lit(n_tables)),
        lambda t: F.aggregate(
            F.zip_with(
                F.slice(bits_col, (t - 1) * n_planes + 1, n_planes), pow2,
                lambda b, p: F.when(b, p).otherwise(F.lit(0.0)),
            ),
            F.lit(0.0), lambda a, v: a + v,
        ).cast("long"),
    )


def cosine_lsh_bucket(emb: DataFrame, n_planes: int = 8, dim: int = 64,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      seed: int = 7) -> DataFrame:
    """Assign each vector a 2^n_planes sign-bucket: bit i = (v·plane_i > 0).

    Neighbors in cosine space agree on most sign bits, so candidate
    generation joins on bucket (optionally multi-probe on 1-bit flips).
    The planes are a constant-folded literal — no aux table, no shuffle
    for assignment."""
    return (
        emb.withColumn("__bits", _bits_col(vec_col, n_planes, dim, seed))
        .select(id_col, vec_col,
                _pack_buckets(F.col("__bits"), n_planes, 1)[0].alias("bucket"))
    )


def _lsh_table_buckets(df: DataFrame, id_col: str, vec_col: str,
                       n_planes: int, n_tables: int, dim: int) -> DataFrame:
    """(id, vec, table, bucket): one sign-bucket per hash table, exploded.
    Plane literals are folded into the plan — assignment is a narrow map."""
    return (
        df.withColumn("__bits", _bits_col(vec_col, n_tables * n_planes, dim))
        .select(id_col, vec_col,
                F.posexplode(_pack_buckets(F.col("__bits"), n_planes, n_tables))
                .alias("table", "bucket"))
    )


MIN_ANN_CORPUS = 100
"""Below this corpus size the ANN entry points degrade to the exact scan
(FAISS does the same): the probabilistic recall guarantees are statements
about collision statistics and need a population to hold — on a handful of
vectors a single structural miss (an antipode, a zero vector) craters
recall while brute force is trivially cheap.  The size probe is one
parquet-metadata count; at scale the branch always takes the ANN path."""


def _small_corpus(emb: DataFrame) -> bool:
    return emb.limit(MIN_ANN_CORPUS).count() < MIN_ANN_CORPUS


def knn_lsh(emb: DataFrame, queries: DataFrame, k: int = 5, n_planes: int = 4,
            n_tables: int = 12, dim: int = 64,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH: a corpus vector is
    scored for a query iff they share a bucket in ≥1 of ``n_tables``
    independent sign-hash tables.  Recall/candidate-rate trade-off:
    P(candidate) = 1 - (1 - p_agree^n_planes)^n_tables with
    p_agree = 1 - θ/π.

    On uniform-random embeddings (the synthetic test data — LSH's worst
    case) the candidate reduction is modest; on real, clustered embedding
    corpora the same construction prunes aggressively.  At 100 TB the
    bucket join replaces the quadratic cross join: candidates are generated
    by an equi-join on (table, bucket), so work scales with collisions,
    not with |corpus| × |queries|.

    Corpora under MIN_ANN_CORPUS rows fall back to the exact scan."""
    if _small_corpus(emb):
        return knn_bruteforce(emb, queries, k=k, id_col=id_col, vec_col=vec_col)
    cb = _lsh_table_buckets(emb, id_col, vec_col, n_planes, n_tables, dim)
    qb = _lsh_table_buckets(queries, id_col, vec_col, n_planes, n_tables, dim).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "table", "bucket"
    )
    c = cb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"),
                  "table", "bucket")
    # Score inside the broadcast-join projection, THEN dedup multi-table
    # collisions: the shuffle carries only (query_id, neighbor_id, sim) —
    # never the vectors — and the groupBy gets map-side partial agg.
    scored = (
        c.join(F.broadcast(qb), ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 4).alias("cosine_sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("cosine_sim").alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


# --------------------------------------------------------------------------
# IVF-style ANN: coarse quantization by deterministic pseudo-random
# centroids (k-means-free), multi-probe search.


def _centroid_literal(n_centroids: int, dim: int, seed: int = 42):
    """Constant-folded array<array<double>> of L2-normalized pseudo-random
    centroids (same one-literal trick as _bits_col)."""
    import json
    import math

    cents = []
    for i in range(n_centroids):
        v = _srp_plane(dim, i, seed)
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        cents.append([x / n for x in v])
    return F.from_json(F.lit(json.dumps(cents)), "array<array<double>>")


def _centroid_ranks(vec_col: str, n_centroids: int, dim: int, seed: int = 42):
    """array<int> of centroid indices (0-based) ordered by descending dot
    product with the vector — element 0 is the assigned cell, elements
    1..p-1 are the multi-probe order."""
    cents = _centroid_literal(n_centroids, dim, seed)
    scored = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(F.col(vec_col), c, lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda a, v: a + v,
        ),
    )
    idx = F.sequence(F.lit(0), F.lit(n_centroids - 1))
    pairs = F.zip_with(scored, idx, lambda s, i: F.struct(s.alias("s"), i.alias("i")))
    return F.transform(F.reverse(F.array_sort(pairs)), lambda p: p["i"])


def ivf_assign(emb: DataFrame, n_centroids: int = 16, dim: int = 64,
               id_col: str = "vec_id", vec_col: str = "embedding",
               seed: int = 42) -> DataFrame:
    """(id, vec, cell): nearest-centroid assignment — the IVF build side.
    Narrow map with a constant-folded centroid table; at scale the output
    is written partitioned by cell so probes prune whole partitions."""
    return emb.select(
        id_col, vec_col,
        F.element_at(_centroid_ranks(vec_col, n_centroids, dim, seed), 1).alias("cell"),
    )


def ivf_probe_scored(emb: DataFrame, queries: DataFrame,
                     n_centroids: int = 16, max_probe: int = 8,
                     dim: int = 64, id_col: str = "vec_id",
                     vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """(query_id, neighbor_id, probe_rank, cosine_sim): every IVF candidate
    at probe depth ``max_probe``, tagged with the 0-based rank of the
    candidate's cell in the query's probe order.

    Probe sets are NESTED in the probe depth (the depth-p probe cells are
    the first p of the depth-max order), so ``knn_ivf(n_probe=p)`` equals
    the rows here with ``probe_rank < p`` re-ranked by the same top-k
    window.  A probe-sweep (q_ann_recall_curve) therefore assigns cells
    and scores candidates ONCE and slices per depth, instead of paying
    ivf_assign + the (1+2+...+max) candidate scoring once per depth
    (guide §1.2: don't recompute shared work; r8 A/B below)."""
    c = ivf_assign(emb, n_centroids, dim, id_col, vec_col, seed).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"),
        "cell",
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.posexplode(
            F.slice(_centroid_ranks(vec_col, n_centroids, dim, seed),
                    1, max_probe)
        ).alias("probe_rank", "cell"),
    )
    return (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", "probe_rank",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 4)
            .alias("cosine_sim"),
        )
    )


def ivf_write(emb: DataFrame, index_dir: str, n_centroids: int = 16,
              dim: int = 64, id_col: str = "vec_id", vec_col: str = "embedding",
              seed: int = 42, compression: str = "zstd") -> None:
    """Persist the IVF index: corpus vectors written PARTITIONED BY cell —
    one directory per centroid cell, so a probe of p cells physically
    reads p/n_centroids of the data and partition pruning skips the rest
    at the file-listing level (this is the 'at scale the corpus is
    written partitioned by cell' story as code, not a comment)."""
    (
        ivf_assign(emb, n_centroids, dim, id_col, vec_col, seed)
        .write.mode("overwrite")
        .option("compression", compression)
        .partitionBy("cell")
        .parquet(index_dir)
    )


def knn_ivf_index(spark, index_dir: str, queries: DataFrame, k: int = 5,
                  n_centroids: int = 16, n_probe: int = 4, dim: int = 64,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  seed: int = 42) -> DataFrame:
    """Approximate top-k against a PERSISTED IVF index (see ``ivf_write``).

    The union of all queries' probe cells (≤ n_queries·n_probe ints —
    driver-side collect of a bounded list) becomes a static
    ``cell IN (...)`` predicate on the partitioned read, so non-probed
    cell directories are pruned before any file is opened (visible as
    ``PartitionFilters`` in the scan; asserted via inputFiles in tests).
    Per-query cell membership is then enforced by the same equi-join as
    the in-memory ``knn_ivf``, producing identical results."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(
            F.slice(_centroid_ranks(vec_col, n_centroids, dim, seed), 1, n_probe)
        ).alias("cell"),
    )
    probe_cells = [r["cell"] for r in q.select("cell").distinct().collect()]
    idx = (
        spark.read.parquet(index_dir)
        .filter(F.col("cell").isin(probe_cells))
        .select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"), "cell"
        )
    )
    scored = (
        idx.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 4).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def knn_ivf(emb: DataFrame, queries: DataFrame, k: int = 5,
            n_centroids: int = 16, n_probe: int = 4, dim: int = 64,
            id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 42) -> DataFrame:
    """Approximate top-k, IVF flavor: corpus vectors live in their nearest
    centroid's cell; each query probes its ``n_probe`` closest cells and
    scores only those vectors.  Candidate volume ≈ |corpus| · n_probe /
    n_centroids per query vs |corpus| for brute force.

    Unlike the LSH tables (independent random cuts), the probe order
    adapts to the query's actual position relative to the centroids, so
    recall degrades gracefully as n_probe shrinks.  Centroids here are
    pseudo-random unit vectors — a k-means refinement would only change
    the literal, not the plan shape.

    Corpora under MIN_ANN_CORPUS rows fall back to the exact scan."""
    if _small_corpus(emb):
        return knn_bruteforce(emb, queries, k=k, id_col=id_col, vec_col=vec_col)
    # thin wrapper over ivf_probe_scored (max_probe = n_probe): ONE
    # candidate generator for the single-depth and the sweep paths, so a
    # rounding or tie-break change cannot drift between the two (ADVICE
    # r8).  posexplode vs explode of the same slice yields the same rows;
    # the probe_rank tag is dropped here.
    scored = ivf_probe_scored(
        emb, queries, n_centroids=n_centroids, max_probe=n_probe, dim=dim,
        id_col=id_col, vec_col=vec_col, seed=seed,
    ).select("query_id", "neighbor_id", "cosine_sim")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


# --------------------------------------------------------------------------
# Int8-quantized kNN: the memory/bandwidth scale path.  Vectors are
# symmetric-int8 quantized once (4x smaller; functions.embeddings.
# quantize_int8), similarity is the rescaled integer dot product, and
# ranking mirrors knn_bruteforce exactly so recall against the float
# baseline is directly measurable.
# --------------------------------------------------------------------------
def quantized_vectors(emb: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """(id, scale double, q array<int>) — the stored form of a quantized
    corpus.  At scale this frame is what you persist: int8 codes shrink
    the shuffle/scan footprint 4x and the scales column is negligible."""
    from nonconsumptive_spark.functions.embeddings import quantize_int8

    qz = quantize_int8(F.col(vec_col))
    return emb.withColumn("__qz", qz).select(
        id_col,
        F.col("__qz.scale").alias("scale"),
        F.col("__qz.q").alias("q"),
    )


def knn_quantized(emb: DataFrame, queries: DataFrame, k: int = 5,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Top-k neighbors by QUANTIZED cosine: integer dot product over int8
    codes, normalized by the quantized vectors' own norms.  Same broadcast
    + window shape as knn_bruteforce; returns (query_id, neighbor_id,
    qcosine_sim, rank)."""
    from nonconsumptive_spark.functions.embeddings import int8_dot

    qv = quantized_vectors(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("scale").alias("sa"),
        F.col("q").alias("qa"),
    )
    cv = quantized_vectors(emb, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("scale").alias("sb"),
        F.col("q").alias("qb"),
    )
    dot = int8_dot(F.col("qa"), F.col("sa"), F.col("qb"), F.col("sb"))
    norm_a = F.sqrt(int8_dot(F.col("qa"), F.col("sa"), F.col("qa"), F.col("sa")))
    norm_b = F.sqrt(int8_dot(F.col("qb"), F.col("sb"), F.col("qb"), F.col("sb")))
    scored = (
        cv.join(F.broadcast(qv))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(dot / (norm_a * norm_b), 4).alias("qcosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "qcosine_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric-distance (ADC) kNN — the
# memory-scale ANN path (Jégou et al., "Product Quantization for Nearest
# Neighbor Search"): vectors stored as m small codebook indices instead of
# d floats, queries scored against codebook centroids.
# ---------------------------------------------------------------------------
PQ_M = 2        # subspaces
PQ_KSUB = 8     # centroids per subspace codebook
PQ_ITERS = 2    # integer-grid Lloyd rounds per codebook


def pq_train(emb: DataFrame, m: int = PQ_M, ksub: int = PQ_KSUB,
             n_iter: int = PQ_ITERS, dim: int = 64, grid: int | None = None,
             id_col: str = "vec_id", vec_col: str = "embedding") -> list:
    """Train ``m`` per-subspace codebooks (ksub × d/m integer-grid
    centroids each) by running the SAME integer Lloyd recurrence as
    operators/clustering.kmeans over each vector slice.  Deterministic:
    seeds are the first ksub rows by id, updates floor(sum/n + 0.5) —
    both engines replay it exactly.

    Scale: each round is one k-group agg of per-dimension sums (ksub·d/m
    longs of shuffle) + a bounded ksub-row collect; m and n_iter are
    small constants, so training cost is m·n_iter short aggs over the
    corpus regardless of row count."""
    from nonconsumptive_spark.operators.clustering import GRID, _kmeans_core

    grid = grid or GRID
    dsub = dim // m
    books = []
    for j in range(m):
        sub = emb.select(
            id_col, F.slice(F.col(vec_col), j * dsub + 1, dsub).alias(vec_col)
        )
        _, cents = _kmeans_core(sub, ksub, n_iter, grid, id_col, vec_col)
        books.append(cents)
    return books


def pq_encode(emb: DataFrame, codebooks: list, grid: int | None = None,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, codes array<long>): each vector compressed to its nearest
    codebook entry per subspace — the stored form of a PQ index (m bytes
    per vector at ksub ≤ 256 vs 4·d float bytes; 128× smaller at
    d=64, m=2).

    One zero-shuffle projection: the codebook matrix rides as a single
    constant-folded JSON literal (the operators/clustering._assign trick)
    and the argmin runs inside let-bound array HOFs — no join, no Python,
    scan throughput at any corpus size.  Ties break to the lowest code
    (array_position finds the first minimum), matching the oracle's
    ORDER BY dist, cid."""
    import json

    from nonconsumptive_spark.functions.text import let
    from nonconsumptive_spark.operators.clustering import (
        GRID, _sq_dist, quantize_grid)

    grid = grid or GRID
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    cb = F.from_json(F.lit(json.dumps(codebooks)), "array<array<array<long>>>")

    def codes(x):
        return F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: let(
                F.transform(
                    F.element_at(cb, (j + 1).cast("int")),
                    lambda cq: _sq_dist(
                        F.slice(x, (j * dsub + 1).cast("int"), F.lit(dsub)), cq
                    ),
                ),
                lambda d: (F.array_position(d, F.array_min(d)) - 1)
                .cast("long"),
            ),
        )

    return emb.select(
        id_col, let(quantize_grid(vec_col, grid), codes).alias("codes")
    )


def knn_pq_adc(emb: DataFrame, queries: DataFrame, k: int = 5,
               m: int = PQ_M, ksub: int = PQ_KSUB, n_iter: int = PQ_ITERS,
               dim: int = 64, grid: int | None = None,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Top-k by asymmetric distance: the query stays at grid resolution,
    every corpus vector is represented by its codebook centroids, and
    dist(q, v) ≈ Σ_j ||q_slice_j − codebook_j[code_j(v)]||².  Exact
    integer arithmetic end-to-end, so the full pipeline (training,
    encoding, scoring, ranking) replays bit-for-bit in the oracle —
    a hash-exact check, stronger than the recall bound the LSH/IVF
    variants get.

    Returns (query_id, neighbor_id, adc_dist, rank); ties rank by
    neighbor id.

    Plan shape: scoring is one broadcast join (≤N-row query side) over
    the encoded corpus, with the codebook constant-folded into the
    distance expression — the corpus never shuffles for the join, and
    the only exchange is the per-query top-k window.  The production
    refinement (per-query LUT of the m·ksub partial distances,
    precomputed once instead of re-derived per row) changes constants,
    not shape; at ksub=8 the in-expression form stays in codegen."""
    import json

    from nonconsumptive_spark.operators.clustering import (
        GRID, _sq_dist, quantize_grid)

    grid = grid or GRID
    dsub = dim // m
    books = pq_train(emb, m, ksub, n_iter, dim, grid, id_col, vec_col)
    cb = F.from_json(F.lit(json.dumps(books)), "array<array<array<long>>>")

    codes_df = pq_encode(emb, books, grid, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    qx = queries.select(
        F.col(id_col).alias("query_id"),
        quantize_grid(vec_col, grid).alias("qxq"),
    )
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: acc + _sq_dist(
            F.slice(F.col("qxq"), (j * dsub + 1).cast("int"), F.lit(dsub)),
            F.element_at(
                F.element_at(cb, (j + 1).cast("int")),
                (F.element_at(F.col("codes"), (j + 1).cast("int")) + 1)
                .cast("int"),
            ),
        ),
    )
    scored = (
        codes_df.join(F.broadcast(qx))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", dist.alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


# --------------------------------------------------------------------------
CENT_SCALE = 1000  # per-component quantization for centroid arithmetic


def label_centroid_distances(emb: DataFrame, label_col: str = "label",
                             vec_col: str = "embedding") -> DataFrame:
    """(label_a, label_b, n_a, n_b, cos_centroid): pairwise cosine between
    per-label mean embeddings — the embedding-space analog of
    q_js_divergence's distributional drift measure (are two sources /
    languages / snapshots embedded in the same region?).

    Exactness: components quantize to integer 1e-3 units BEFORE any agg,
    so per-label per-dimension sums are exact BIGINTs, and the count
    normalization cancels out of cosine entirely (cos(Sa/na, Sb/nb) =
    cos(Sa, Sb)) — dots are pure BIGINT arithmetic and the single double
    expression at the end is mirrored verbatim in the oracle.

    Integer headroom: the 64-dim dot needs 64·max(S_i)² < 2^63, i.e.
    |S_i| < ~3.8e8 — at this data's component range (|x| <= 0.53, so
    |cq| <= 530) that is ~700k rows per label.  Beyond that, or with a
    strongly biased (non-mean-centered) dimension, pre-center the
    per-dimension sums or compute the final dot in double: the quantized
    SUMS never overflow at any realistic n, only their product can.

    Plan: one (label, dim) agg over the exploded components (64 rows per
    label survive), then everything is #labels-sized: the pair join is a
    broadcast over a tiny frame."""
    comp = emb.select(
        F.col(label_col).alias("lbl"),
        F.posexplode(vec_col).alias("dim", "x"),
    )
    sums = (
        comp.groupBy("lbl", "dim")
        .agg(F.sum(F.round(F.col("x").cast("double") * F.lit(CENT_SCALE))
                   .cast("long")).cast("long").alias("s"))
    )
    vecs = (
        sums.groupBy("lbl")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "s"))),
            lambda p: p["s"]).alias("sv"))
        .withColumn(
            "dself",
            F.aggregate(F.col("sv"), F.lit(0).cast("bigint"),
                        lambda a, x: a + x * x))
    )
    cnt = emb.groupBy(F.col(label_col).alias("lbl")).agg(
        F.count("*").cast("bigint").alias("n"))
    vecs = vecs.join(F.broadcast(cnt), "lbl")
    a = vecs.select(F.col("lbl").alias("label_a"), F.col("sv").alias("sa"),
                    F.col("dself").alias("daa"), F.col("n").alias("n_a"))
    b = vecs.select(F.col("lbl").alias("label_b"), F.col("sv").alias("sb"),
                    F.col("dself").alias("dbb"), F.col("n").alias("n_b"))
    pairs = a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
    dot = F.aggregate(
        F.zip_with("sa", "sb", lambda x, y: x * y),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    return pairs.select(
        "label_a", "label_b", "n_a", "n_b",
        (F.round(dot.cast("double")
                 / (F.sqrt(F.col("daa").cast("double"))
                    * F.sqrt(F.col("dbb").cast("double"))), 6)
         + F.lit(0.0)).alias("cos_centroid"),
    )


def ivf_append(new_emb: DataFrame, index_dir: str, n_centroids: int = 16,
               dim: int = 64, id_col: str = "vec_id",
               vec_col: str = "embedding", seed: int = 42,
               compression: str = "zstd") -> None:
    """Append a fresh batch of vectors to a PERSISTED IVF index (see
    ``ivf_write``) — index maintenance without a rebuild.  The centroid
    grid is deterministic from (n_centroids, dim, seed), so new vectors
    assign to exactly the cells the original build used, and appended
    files land inside the matching ``cell=`` partition directories;
    ``knn_ivf_index`` probes then see old + new vectors identically to a
    full rebuild (test-asserted).  Cost: one zero-shuffle assignment scan
    of the BATCH only — the existing index is never read or rewritten."""
    (
        ivf_assign(new_emb, n_centroids, dim, id_col, vec_col, seed)
        .write.mode("append")
        .option("compression", compression)
        .partitionBy("cell")
        .parquet(index_dir)
    )


# ---------------------------------------------------------------------------
# Embedding-space decontamination: flag corpus vectors whose cosine to ANY
# held-out/benchmark vector clears a threshold.  The semantic complement of
# the n-gram decontamination operator (operators/textstats.py:decontaminate)
# — paraphrased benchmark leakage that shares no 8-gram still lands near
# the benchmark in embedding space.
# ---------------------------------------------------------------------------
def embedding_decontaminate(corpus: DataFrame, heldout: DataFrame,
                            threshold: float = 0.8,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """(id, max_heldout_cosine, is_contaminated): max cosine of each corpus
    vector against the held-out set, flagged at ``threshold``.

    Plan: the held-out side (a benchmark — thousands of rows against a
    100 TB corpus) is broadcast; the corpus scans ONCE through a
    BroadcastNestedLoopJoin and aggregates max-per-id with map-side
    combine, so the corpus never shuffles its vectors — only (id, max)
    pairs move.  The max over identical IEEE doubles is order-independent,
    and the flag compares the ROUNDED value so both engines cut on the
    same 4-decimal key.  For held-out sets too big to broadcast, pre-block
    both sides with cosine_lsh_bucket and swap the BNLJ for the bucket
    equi-join (same output contract).
    """
    h = heldout.select(F.col(vec_col).alias("hvec"),
                       _norm(F.col(vec_col)).alias("hnorm"))
    c = corpus.select(id_col, F.col(vec_col).alias("cvec"),
                      _norm(F.col(vec_col)).alias("cnorm"))
    scored = c.join(F.broadcast(h), F.lit(True))
    return (
        scored.groupBy(id_col)
        .agg(F.round(
            F.max(_dot(F.col("cvec"), F.col("hvec"))
                  / (F.col("cnorm") * F.col("hnorm"))), 4)
             .alias("max_heldout_cosine"))
        .select(
            id_col,
            (F.col("max_heldout_cosine") + F.lit(0.0))
             .alias("max_heldout_cosine"),
            (F.col("max_heldout_cosine") >= F.lit(threshold))
             .alias("is_contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding-dimension correlation — the gram-matrix building block (PCA /
# whitening / redundant-dimension diagnostics) as ONE distributed pass.
# ---------------------------------------------------------------------------
DIMCORR_SCALE = 10_000  # element values quantized to 1e-4 units


def embedding_dim_corr(emb: DataFrame, dim: int,
                       vec_col: str = "embedding") -> DataFrame:
    """(dim_i, dim_j, pearson_r) for every dimension pair i < j — the
    upper triangle of the embedding correlation (gram) matrix.

    Scale design: elements are quantized to exact 1e-4-unit BIGINTs, so
    every moment (per-dim sum, sum of squares, pairwise cross sum) is an
    exact integer aggregate — summation-order-proof — and Pearson r is
    one identical final double expression per pair.  The cross products
    are generated IN-ROW (d(d-1)/2 structs per row) and aggregated with
    map-side partial combine: shuffle volume is #partitions x d^2 rows of
    (i, j, partial-sum), independent of corpus size.  Integer headroom:
    |q| <= ~5e4 per element keeps n * s_ij < 2^63 through ~1e8 rows;
    beyond that drop DIMCORR_SCALE a decade.
    """
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(DIMCORR_SCALE))
                          + F.lit(0.5)).cast("long"),
    )
    rows = emb.select(q.alias("q"))

    per_dim = (
        rows.select(F.posexplode("q").alias("i", "qi"))
        .groupBy("i")
        .agg(F.count("*").cast("long").alias("n"),
             F.sum("qi").cast("long").alias("s"),
             F.sum(F.col("qi") * F.col("qi")).cast("long").alias("ss"))
    )
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    pairs = F.flatten(F.transform(
        idx,
        lambda i: F.transform(
            F.slice(F.sequence(F.lit(0), F.lit(dim - 1)), i + 2, F.lit(dim)),
            lambda j: F.struct(
                i.alias("i"), j.alias("j"),
                (F.element_at("q", i + 1) * F.element_at("q", j + 1))
                 .alias("p")),
        ),
    ))
    cross = (
        rows.select(F.explode(pairs).alias("e"))
        .groupBy(F.col("e.i").alias("i"), F.col("e.j").alias("j"))
        .agg(F.sum("e.p").cast("long").alias("sij"))
    )
    a = per_dim.select(F.col("i"), F.col("n"),
                       F.col("s").alias("si"), F.col("ss").alias("ssi"))
    b = per_dim.select(F.col("i").alias("j"), F.col("s").alias("sj"),
                       F.col("ss").alias("ssj"))
    num = F.col("n") * F.col("sij") - F.col("si") * F.col("sj")
    va = F.col("n") * F.col("ssi") - F.col("si") * F.col("si")
    vb = F.col("n") * F.col("ssj") - F.col("sj") * F.col("sj")
    r = F.when(
        (va > 0) & (vb > 0),
        F.round(num.cast("double")
                / (F.sqrt(va.cast("double")) * F.sqrt(vb.cast("double"))), 4)
        + F.lit(0.0),
    ).otherwise(F.lit(0.0))
    return (
        cross.join(F.broadcast(a), "i").join(F.broadcast(b), "j")
        .select(F.col("i").cast("long").alias("dim_i"),
                F.col("j").cast("long").alias("dim_j"),
                r.alias("pearson_r"))
    )


PCA_SCALE = 10**6   # per-row contribution quantum (BIGINT accumulation)
PCA_ITERS = 3
PCA_DIM = 64


def _seq_fold(arr):
    """Strict LEFT-TO-RIGHT double fold — the summation-order contract
    the PCA oracle depends on: DuckDB's ``list_reduce`` folds
    ((e1+e2)+e3)..., and ``F.aggregate`` with a 0.0 seed folds
    ((0+e1)+e2)+... — identical bit-for-bit because 0.0 + x == x."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, e: acc + e)


def top_principal_component(emb: DataFrame, n_iter: int = PCA_ITERS,
                            dim: int = PCA_DIM,
                            vec_col: str = "embedding") -> DataFrame:
    """(dim, loading): the top principal component of the embedding
    cloud by ``n_iter`` power-iteration rounds on the CENTERED data —
    the "all-but-the-top" (Mu & Viswanath 2018) post-processing
    direction, and the first diagnostic anyone runs on an embedding
    table (is there a dominant common direction?).

    Exactness discipline (every cross-ROW accumulation is integer):
      * the mean is built from per-row ``floor(SCALE * x_j)`` BIGINTs;
      * each round's matvec sum  s_j = Σ_rows q(d · x̃_j)  is a BIGINT
        sum of per-row floor-quantized contributions;
      * within-row dots fold strictly left-to-right (``_seq_fold``), the
        order DuckDB's ``list_reduce`` uses, so the doubles feeding each
        quantization are bit-identical across engines;
      * normalization touches only the (identical) 64 BIGINTs, in array
        form — never a cross-row float SUM.

    Scale shape: per round ONE narrow map over the rows (dot + quantized
    contribution array), ONE posexplode to (dim, q) with map-side partial
    aggregation collapsing every partition to ≤ dim rows before the
    shuffle (64 keys is fine BECAUSE of the combiners), and a dim-sized
    array rebuild; the vector rides along as a broadcast 1-row frame —
    no driver collect anywhere."""
    centered, v = _power_top_vector(emb, n_iter, dim, vec_col)
    return (
        v.select(F.posexplode("v").alias("j", "loading"))
        .select((F.col("j") + 1).cast("long").alias("dim"),  # 1-based, like
                # generate_subscripts on the oracle side
                (F.round("loading", 6) + F.lit(0.0)).alias("loading"))
    )


def _power_top_vector(emb: DataFrame, n_iter: int, dim: int,
                      vec_col: str, id_col: str = "vec_id"):
    """(centered rows with ids, 1-row v frame) — the shared power
    iteration behind ``top_principal_component`` and
    ``remove_top_component``."""
    spark = emb.sparkSession
    x = F.col(vec_col).cast("array<double>")
    rows = emb.select(F.col(id_col), x.alias("x"))

    def _dim_sums(contrib_df):
        """(1-row) ordered BIGINT sum array of a per-row 'q' array."""
        return (
            contrib_df.select(F.posexplode("q").alias("j", "qv"))
            .groupBy("j").agg(F.sum("qv").cast("long").alias("s"))
            .agg(F.array_sort(F.collect_list(F.struct("j", "s"))).alias("a"))
            .select(F.transform("a", lambda e: e["s"]).alias("s"))
        )

    n = emb.count()  # scalar, bounded: the row count
    if n == 0:  # empty cloud -> empty component, not 0/0
        empty = spark.createDataFrame([], f"{id_col} long, xc array<double>")
        return empty, spark.createDataFrame([], "v array<double>")
    mu = (
        _dim_sums(rows.select(
            F.transform("x", lambda e: F.floor(F.lit(float(PCA_SCALE)) * e)
                        .cast("long")).alias("q")))
        .select(F.transform(
            "s", lambda s: s.cast("double")
            / F.lit(float(n) * PCA_SCALE)).alias("mu"))
    )

    v = spark.range(1).select(
        F.array(*[F.lit(1.0 / dim ** 0.5) for _ in range(dim)]).alias("v"))
    centered = rows.crossJoin(F.broadcast(mu)).select(
        id_col, F.zip_with("x", "mu", lambda a, b: a - b).alias("xc"))
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    centered = materialize_once(centered, "pca_centered")
    for i in range(n_iter):
        # two-stage select: d binds as an attribute BEFORE the transform
        # lambda references it, so the interpreted-HOF re-evaluation trap
        # (PLANS.md; functions/text.let) cannot re-run the dot per element
        contrib = centered.select("xc").crossJoin(F.broadcast(v)).select(
            _seq_fold(F.zip_with("xc", "v", lambda a, b: a * b)).alias("d"),
            "xc",
        ).select(
            F.transform(
                "xc",
                lambda c: F.floor(F.lit(float(PCA_SCALE)) * F.col("d") * c)
                .cast("long"),
            ).alias("q")
        )
        s = _dim_sums(contrib)
        v = s.select(
            "s",
            _seq_fold(F.transform(
                "s", lambda e: e.cast("double") * e.cast("double")))
            .alias("n2"),
        ).select(
            # zero-variance cloud (e.g. one row, or all rows equal):
            # there is no principal direction — emit the zero vector
            # deterministically instead of 0/0 NaN/NULL drift
            F.when(
                F.col("n2") > 0,
                F.transform(
                    "s", lambda e: e.cast("double") / F.sqrt(F.col("n2"))),
            ).otherwise(
                F.transform("s", lambda e: F.lit(0.0))
            ).alias("v")
        )
    return centered, v


def remove_top_component(emb: DataFrame, n_iter: int = PCA_ITERS,
                         dim: int = PCA_DIM, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """(vec_id, proj, resid_norm): the all-but-the-top decomposition
    (Mu & Viswanath 2018) — each centered vector's scalar projection on
    the top component and the L2 norm of what remains after removing it.
    Removing the dominant common direction is the standard embedding
    post-processing step before cosine retrieval; the residual norm is
    the per-vector answer to "how much of this embedding IS that common
    direction".

    Parity: one more zero-shuffle map over the centered rows — the
    projection and residual fold strictly left-to-right (the
    ``list_reduce`` order), so the doubles are bit-identical and the
    4-decimal rounding is safe."""
    centered, v = _power_top_vector(emb, n_iter, dim, vec_col, id_col)
    out = centered.crossJoin(F.broadcast(v)).select(
        id_col,
        _seq_fold(F.zip_with("xc", "v", lambda a, b: a * b)).alias("p"),
        "xc", "v",
    ).select(
        id_col,
        "p",
        _seq_fold(
            F.transform(
                F.zip_with("xc", "v",
                           lambda c, vv: c - F.col("p") * vv),
                lambda r: r * r,
            )
        ).alias("r2"),
    )
    return out.select(
        id_col,
        (F.round("p", 4) + F.lit(0.0)).alias("proj"),
        (F.round(F.sqrt(F.col("r2")), 4) + F.lit(0.0)).alias("resid_norm"),
    )


BITEXT_SCALE = 1_000_000_000
"""Pair cosines are quantized to this grid the instant they are produced
(one deterministic IEEE chain: exact-integer dot and norms cast to double,
two correctly-rounded sqrts, one divide, one multiply, floor-half-up), so
every downstream margin statistic is exact BIGINT arithmetic — the same
float-ordering discipline as clustering.SIL_SCALE."""


def bitext_margin_pairs(src: DataFrame, tgt: DataFrame, k: int = 4,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, the
    LASER/CCMatrix pair miner): for every source vector, the best target
    by MARGIN score — cosine minus the mean cosine to each side's k
    nearest neighbours — rather than raw cosine, which suppresses hub
    vectors that are close to everything.  Returns
    (src_id, tgt_id, cos_scaled, margin_scaled); margin_scaled is the
    exact integer ``2k·cos − Σknn(src) − Σknn(tgt)`` on the BITEXT_SCALE
    grid (the 'distance' margin variant, scaled by 2k·SCALE).

    The src side is a bounded query batch (like ``knn_bruteforce``):
    broadcast src × one scan of tgt builds the pair frame once, and both
    kNN sums plus the candidate top-k read it via two partitioned
    row_number windows.  At 100 TB the cross pair frame is replaced by
    ANN candidates (``knn_ivf``/``knn_lsh`` buckets) feeding the same
    margin algebra; neighbour sums then come from the candidate lists,
    the standard x2y/y2x approximation in the paper.  Zero-norm vectors
    cannot be cosine-scored and are dropped."""
    from nonconsumptive_spark.operators.clustering import (
        GRID, _dot as _idot, quantize_grid,
    )
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    def prep(df, side):
        q = df.select(
            F.col(id_col).alias(f"{side}_id"),
            quantize_grid(vec_col, GRID).alias(f"x_{side}"),
        ).withColumn(f"n_{side}", _idot(F.col(f"x_{side}"), F.col(f"x_{side}")))
        return q.where(F.col(f"n_{side}") > 0)

    s, t = prep(src, "src"), prep(tgt, "tgt")
    qc = F.floor(
        _idot(F.col("x_src"), F.col("x_tgt")).cast("double")
        / (F.sqrt(F.col("n_src").cast("double"))
           * F.sqrt(F.col("n_tgt").cast("double")))
        * F.lit(float(BITEXT_SCALE))
        + F.lit(0.5)
    )
    pairs = materialize_once(
        F.broadcast(s).crossJoin(t).select("src_id", "tgt_id", qc.alias("qc")),
        "bitext_pairs",
    )
    wf = Window.partitionBy("src_id").orderBy(F.desc("qc"), F.asc("tgt_id"))
    wb = Window.partitionBy("tgt_id").orderBy(F.desc("qc"), F.asc("src_id"))
    r = pairs.withColumn("rf", F.row_number().over(wf)).withColumn(
        "rb", F.row_number().over(wb)
    )
    snn_x = r.where(F.col("rf") <= k).groupBy("src_id").agg(
        F.sum("qc").alias("snn_x")
    )
    snn_y = r.where(F.col("rb") <= k).groupBy("tgt_id").agg(
        F.sum("qc").alias("snn_y")
    )
    m = (
        r.where(F.col("rf") <= k)
        .join(F.broadcast(snn_x), "src_id")
        .join(F.broadcast(snn_y), "tgt_id")
        .withColumn(
            "margin_scaled",
            F.lit(2 * k) * F.col("qc") - F.col("snn_x") - F.col("snn_y"),
        )
    )
    best = Window.partitionBy("src_id").orderBy(
        F.desc("margin_scaled"), F.asc("tgt_id")
    )
    return (
        m.withColumn("rn", F.row_number().over(best))
        .where(F.col("rn") == 1)
        .select(
            "src_id", "tgt_id",
            F.col("qc").alias("cos_scaled"),
            "margin_scaled",
        )
    )
