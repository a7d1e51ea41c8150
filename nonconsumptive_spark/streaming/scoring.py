"""Streaming k-means scoring: the serving half of cluster-then-curate.

Centroids are trained OFFLINE (operators/clustering.kmeans — the batch
path); arriving embeddings are assigned ONLINE.  Because the assignment
stage is a pure per-row expression against a constant-folded centroid
literal (zero shuffle, no state), the identical kernel runs unchanged
under Structured Streaming — batch/stream equivalence is asserted in
tests/test_streaming.py, the same discipline as every other streaming
variant in this package.

At scale this is the standard lambda shape: a nightly batch job refits
centroids and rewrites one tiny JSON artifact; the ingest stream picks
them up on restart and routes each new document's embedding to its
cluster (e.g. to a cluster-partitioned sink that keeps the downstream
SemDeDup equi-join pruned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nonconsumptive_spark.operators.clustering import (
    GRID,
    _assign,
    _kmeans_core,
    quantize_grid,
)


def fit_centroids(emb: DataFrame, k: int = 10, n_iter: int = 4,
                  grid: int = GRID, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> list[list[int]]:
    """Batch-fit integer-grid centroids (the artifact the stream consumes)."""
    _, cents = _kmeans_core(emb, k, n_iter, grid, id_col, vec_col)
    return cents


def stream_embeddings(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream over an embeddings parquet directory."""
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def kmeans_score(df: DataFrame, cents: list[list[int]],
                 grid: int = GRID, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """(id, cluster, dist_sq) for a batch OR streaming frame — the same
    zero-shuffle assignment expression either way."""
    q = df.select(id_col, quantize_grid(vec_col, grid).alias("xq"))
    return _assign(q, cents, id_col).select(id_col, "cluster", "dist_sq")


def pq_score(df: DataFrame, codebooks: list, grid: int = GRID,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, codes) for a batch OR streaming frame: PQ-encode arriving
    embeddings against batch-trained codebooks (operators/similarity.
    pq_train — the nightly artifact, same lambda shape as the centroid
    JSON above).  The encode is one zero-shuffle projection against the
    constant-folded codebook literal, so the identical kernel runs
    unchanged under Structured Streaming; the encoded stream feeds a
    code-partitioned sink that keeps downstream ADC lookups pruned."""
    from nonconsumptive_spark.operators.similarity import pq_encode

    return pq_encode(df, codebooks, grid, id_col, vec_col)
