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
        # NO fan-out here: events queries are window/agg-shaped, so their
        # FIRST operator already shuffles to full parallelism — an input
        # repartition only adds an exchange (A/B at sf0.1 warm:
        # events_session 0.57 -> 1.0s, decayed_engagement 0.23 -> 0.66s;
        # behavior_pairs, the one CPU-heavy scan, was a wash).
        return df
    df = spark.read.parquet(path)
    if table in ("documents", "embeddings"):
        df = _fan_out(spark, df)
    return df


def _fan_out(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Guarded split fan-out for tables feeding CPU-heavy per-row
    operators (tokenize, md5 minhash, cosine, per-user sequence sorts).
    The test files are a single row group, i.e. a single input split —
    without a fan-out the whole pipeline runs on one core.  At production
    scale inputs arrive as many splits and this is a no-op (guarded on
    the actual split count)."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(target, 8):
        df = df.repartition(target)
    return df


# The driver verifies the FIRST 50 registry entries per round
# (CORRECTNESS_r{N}.json).  Rotation policy (mechanical via
# ``python tools/stale_report.py`` — run it at round start): (1) queries
# whose implementation or oracle changed since the last driver gate,
# (2) queries never driver-verified, (3) new queries added this round,
# then (4) the longest-unverified tail (oldest last-green round first)
# fills the remaining slots.  Goal: no green row older than two rounds
# for any code-touched file.
#
# ROUND-5 WINDOW (the first 50 below): the 25 registered-but-never-
# driver-checked queries (r1-r4 union = 174/199; these close the gap),
# then the four promoted entries whose code changed this round
# (jaro_winkler SNM rewrite, calibration_bins pos_value, ams_f2 abs
# rel_err, ktruss converged flag), the four sweep-touched r4
# re-verification entries displaced by the r4 backlog governor, the new
# q_encoded_quadgrams, and 16 representatives of the 103-entry promoted
# cohort (queries/promoted.py) spanning its families: suffix-array
# repeated regions, query likelihood, CUSUM, Kaplan-Meier, the IR-eval
# triple, LPA/HITS/components, ABTT, silhouette/k-center, Markov
# stationary, and the positional-index pair.
#
# R6+ QUEUE (positions 51+): the remaining 82 promoted entries in file
# order — every one already green under the driver-grade compare at two
# SFs (test_oracle_parity + tools/check_staged) — then the longest-
# unverified re-check tail.
#
# ROUND-6 STAGING COHORT (queries/staging.py, verified at both SFs by
# tests/test_staging.py + tools/check_staged.py, censused, benched as
# extras, 10x-stressed): g2_collocations, cohens_d_sources,
# permutation_test, holt_linear_daily, seq_pattern_pairs, rm3_expansion,
# gunning_fog, grubbs_outlier, keyness_terms, skew_report, zeta_markers,
# fk_integrity, mcnemar_langid, audio_window_energy, log_odds_dirichlet,
# mantel_haenszel, juilland_dispersion, brier_decomposition, langid_prf,
# gain_chart, ann_recall_curve, isotonic_bins, von_neumann_ratio,
# simpson_flip, odds_ratio_ci, cuped_abtest, time_to_convert,
# sprt_daily, theil_sen_slope, avg_precision, bh_fdr, err_eval,
# bradley_terry, lm_jm_topk, shapley_attribution, nelson_aalen,
# did_readout, link_prediction, readability_panel, gries_dp,
# eb_shrinkage, covariate_balance, qini_curve, harmonic_centrality,
# markov_absorption, nearest_centroid_eval, keyphrase_cvalue,
# conformal_interval, weibull_fit, capture_recapture, abc_parts,
# basket_rules, price_elasticity, logrank_test, friedman_daily.
# Stream-only surface this session: streaming/conformal.py (live
# coverage monitor under a frozen calibration; pytest-only,
# chunked == batch exact).
# Promotion = @register +
# PRIORITY append, exactly like the r5 cohort.  Stream-only surface:
# streaming/holt.py (pytest-only, chunked == batch structural).
PRIORITY: tuple[str, ...] = (
    # -- never driver-checked registered queries (25)
    "q_logdice_collocations",
    "q_hapax_stats",
    "q_token_entropy",
    "q_kn_bigram_logprob",
    "q_mad_outliers",
    "q_embedding_decontamination",
    "q_embedding_dim_corr",
    "q_source_overlap_matrix",
    "q_rrf_fusion",
    "q_hard_negatives",
    "q_rbo_rankers",
    "q_decayed_engagement",
    "q_lang_source_mi",
    "q_welch_ttest_sources",
    "q_lang_source_chi2",
    "q_ks_length_sources",
    "q_mann_whitney_sources",
    "q_user_behavior_pairs",
    "q_sliding_chunks",
    "q_spearman_len_tokens",
    "q_daily_autocorr",
    "q_bpe_fertility",
    "q_hll_by_group",
    "q_priority_sample_group",
    "q_k_anonymity",
    # -- promoted entries whose code changed this round (4)
    "q_jaro_winkler_links",
    "q_calibration_bins",
    "q_ams_f2",
    "q_ktruss",
    # -- sweep-touched r4 re-verifications (4)
    "q_approx_quantiles",
    "q_events_json",
    "q_knn_cosine_lsh",
    "q_knn_cosine_ivf",
    # -- new this round (1)
    "q_encoded_quadgrams",
    # -- promoted-cohort representatives (16)
    "q_repeated_regions",
    "q_query_likelihood",
    "q_cusum_daily",
    "q_kaplan_meier",
    "q_ndcg_eval",
    "q_mrr_map_eval",
    "q_rbp_eval",
    "q_label_propagation",
    "q_hits_scores",
    "q_top_component",
    "q_abtt_residuals",
    "q_silhouette",
    "q_kcenter_select",
    "q_markov_stationary",
    "q_blocklist_match",
    "q_min_span_indexed",
    # ------- end of the 50-slot r5 window -------
    # -- r6+ queue: remaining promoted cohort (82)
    "q_postings_size_stats",
    "q_percentile_filter",
    "q_normalize_unicode",
    "q_code_score",
    "q_cusum_by_type",
    "q_kaplan_meier_cohorts",
    "q_lexical_cohesion",
    "q_bitext_margin",
    "q_fs_link_scores",
    "q_conditional_entropy",
    "q_quality_retention",
    "q_shuffle_quality",
    "q_mixture_budget",
    "q_cluster_capped_sample",
    "q_event_sequences",
    "q_benford_deviation",
    "q_auc_eval",
    "q_adamic_adar",
    "q_kcore",
    "q_ewma_anomalies",
    "q_bleu_pairs",
    "q_leakage_safe_split",
    "q_good_turing",
    "q_token_burstiness",
    "q_l_diversity",
    "q_ppr_tokens",
    "q_clustering_coefficient",
    "q_lm_hit_at_k",
    "q_source_kl",
    "q_mann_kendall",
    "q_neyman_allocation",
    "q_kendall_tau_b",
    "q_cohens_kappa",
    "q_yules_k",
    "q_chao1_richness",
    "q_flesch_reading",
    "q_kruskal_wallis",
    "q_levene_bf",
    "q_t_closeness",
    "q_jackknife_ratio",
    "q_rouge2_pairs",
    "q_modularity",
    "q_wilson_ci",
    "q_theil_index",
    "q_truncation_loss",
    "q_span_corruption",
    "q_binseg_daily",
    "q_runs_test",
    "q_dedup_rate_by_source",
    "q_cooks_distance",
    "q_sax_daily",
    "q_seasonality_strength",
    "q_mattr",
    "q_interarrival_stats",
    "q_embedding_isotropy",
    "q_cohort_value",
    "q_rfm_segments",
    "q_split_balance",
    "q_anova_oneway",
    "q_cramers_v",
    "q_vocab_coverage",
    "q_event_type_overlap",
    "q_higher_moments",
    "q_daily_mix_entropy",
    "q_lorenz_curve",
    "q_event_entropy_rate",
    "q_hhi_concentration",
    "q_jaccard_histogram",
    "q_growth_accounting",
    "q_stickiness",
    "q_return_time_hist",
    "q_char_entropy",
    "q_word_length_profile",
    "q_oov_by_source",
    "q_hill_tail",
    "q_daily_bands",
    "q_nn_label_agreement",
    "q_common_prefix",
    "q_term_position_bias",
    "q_type_user_hhi",
    "q_cluster_representatives",
    "q_kmeans_elbow",
    "q_xcorr_types",
    # -- longest-unverified re-check tail
    "q_heaps_fit",
    "q_zipf_slope",
    "q_simhash",
    "q_simhash_near_pairs",
    "q_salted_join_revenue",
    "q_id_resolution",
    "q1_pricing_summary",
    "q_click_attribution",
    "q_events_sliding",
    "q_events_user_running",
    "q_distinct_cardinality",
)


def all_queries() -> dict[str, Query]:
    # Import side-effect modules exactly once.
    from nonconsumptive_spark.queries import (  # noqa: F401
        clustering,
        dedup,
        events,
        hybrid,
        multimodal,
        promoted,
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


TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> None:
    """Register every test table as a temp view (through ``load``, so the
    events nano-timestamp fix and the split fan-out apply) — the raw
    ``spark.sql`` entry point for ad-hoc queries over the same data the
    registry runs on."""
    from pathlib import Path

    for t in tables:
        if Path(f"{sf_dir}/{t}.parquet").exists():
            load(spark, sf_dir, t).createOrReplaceTempView(t)
