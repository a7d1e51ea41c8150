"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with a noop sink (full pipeline runs, nothing
collected to the driver) — measures engine throughput, not driver IO.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from nonconsumptive_spark.queries import all_queries  # noqa: E402
from nonconsumptive_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q_star_join_revenue",
    "q_window_rank",
    "q_topk_customers",
    "q_encoded_unigrams",
    "q_bigram_counts",
    "q_chunked_wordcounts",
    "q_vocabulary",
    "q_dedup_exact",
    "q_minhash_dedup_pairs",
    "q_simhash",
    "q_lang_id",
    "q_quality_score",
    "q_knn_cosine_bruteforce",
    "q_events_session",
    "q_events_tumbling",
]


def _minhash_pairs_xxhash64(spark, sf_dir):
    """Production-hash variant of q_minhash_dedup_pairs: xxhash64 shingle
    hashing (JVM-native, ~20% faster than the md5 oracle-portable path).
    Timed every round so the fast path can't rot; NOT part of the judged
    headline total (no DuckDB oracle for xxhash64)."""
    from nonconsumptive_spark.operators.dedup import minhash_dedup_pairs
    from nonconsumptive_spark.queries import load

    return minhash_dedup_pairs(load(spark, sf_dir, "documents"),
                               threshold=0.5, hash_fn="xxhash64")


# Extra timed-but-not-judged entries: reported under "extra_queries",
# excluded from the headline total so round-over-round comparisons hold.
def _ppjoin(spark, sf_dir):
    from nonconsumptive_spark.queries import all_queries
    return all_queries()["q_ppjoin_pairs"].spark_fn(spark, sf_dir)


def _cooccurrence(spark, sf_dir):
    from nonconsumptive_spark.queries import all_queries
    return all_queries()["q_cooccurrence_window"].spark_fn(spark, sf_dir)


def _registry(name):
    def run(spark, sf_dir):
        from nonconsumptive_spark.queries import all_queries
        return all_queries()[name].spark_fn(spark, sf_dir)
    return run




def _blocklist_indexed(spark, sf_dir):
    """Index-side multi-phrase decontamination (not yet registry-judged:
    r5 queue) — timed so the anchor-vote join's scale path can't rot."""
    from nonconsumptive_spark.operators.retrieval import (
        blocklist_match, build_positional_index)
    from nonconsumptive_spark.queries import load

    idx = build_positional_index(load(spark, sf_dir, "documents"))
    return blocklist_match(idx, [["table", "table"], ["bad", "word"],
                                 ["spark", "query"], ["data"]])


def _postings_stats(spark, sf_dir):
    from nonconsumptive_spark.operators.retrieval import (
        build_positional_index, postings_size_stats)
    from nonconsumptive_spark.queries import load

    return postings_size_stats(
        build_positional_index(load(spark, sf_dir, "documents")))


def _staged(name):
    """Timed-but-not-judged r5-staged entry (see queries/r5_staging.py)."""
    def run(spark, sf_dir):
        from nonconsumptive_spark.queries.r5_staging import STAGED
        return STAGED[name][0](spark, sf_dir)
    return run


EXTRA = {
    "q_minhash_dedup_pairs[xxhash64]": _minhash_pairs_xxhash64,
    "q_ppjoin_pairs": _ppjoin,
    "q_cooccurrence_window": _cooccurrence,
    # round-4d additions: timed every round so their scale paths can't rot
    "q_nb_lang_confusion": _registry("q_nb_lang_confusion"),
    "q_bloom_novelty": _registry("q_bloom_novelty"),
    "q_cdc_duplicate_chunks": _registry("q_cdc_duplicate_chunks"),
    "q_rake_keywords": _registry("q_rake_keywords"),
    "q_psi_drift": _registry("q_psi_drift"),
    "q_edit_distance_pairs": _registry("q_edit_distance_pairs"),
    "q_logreg_train": _registry("q_logreg_train"),
    # round-4e additions
    "q_rrf_fusion": _registry("q_rrf_fusion"),
    "q_hard_negatives": _registry("q_hard_negatives"),
    "q_rbo_rankers": _registry("q_rbo_rankers"),
    "q_decayed_engagement": _registry("q_decayed_engagement"),
    "q_ks_length_sources": _registry("q_ks_length_sources"),
    "q_user_behavior_pairs": _registry("q_user_behavior_pairs"),
    "q_sliding_chunks": _registry("q_sliding_chunks"),
    # round-4f additions
    "q_phrase_search": _registry("q_phrase_search"),
    "q_phrase_search_indexed": _registry("q_phrase_search_indexed"),
    "q_skyline_docs": _registry("q_skyline_docs"),
    "q_burrows_delta": _registry("q_burrows_delta"),
    "q_zorder_curve": _registry("q_zorder_curve"),
    "q_seasonal_residuals": _registry("q_seasonal_residuals"),
    "q_gini_tokens": _registry("q_gini_tokens"),
    # round-4g additions
    "q_bfs_distances": _registry("q_bfs_distances"),
    "q_degree_assortativity": _registry("q_degree_assortativity"),
    "q_weighted_sample": _registry("q_weighted_sample"),
    # round-4h/4i additions
    "q_min_span_proximity": _registry("q_min_span_proximity"),
    "q_skyline_kd": _registry("q_skyline_kd"),
    "q_hll_by_group": _registry("q_hll_by_group"),
    "q_priority_sample_group": _registry("q_priority_sample_group"),
    "q_blocklist_match[indexed]": _blocklist_indexed,
    "q_postings_size_stats": _postings_stats,
    # round-4j additions (r5-staged: timed now, judged on promotion)
    "q_query_likelihood": _staged("q_query_likelihood"),
    "q_cusum_daily": _staged("q_cusum_daily"),
    "q_kaplan_meier": _staged("q_kaplan_meier"),
    "q_ndcg_eval": _staged("q_ndcg_eval"),
    "q_code_score": _staged("q_code_score"),
    "q_label_propagation": _staged("q_label_propagation"),
    "q_top_component": _staged("q_top_component"),
    "q_abtt_residuals": _staged("q_abtt_residuals"),
    "q_hits_scores": _staged("q_hits_scores"),
    "q_markov_stationary": _staged("q_markov_stationary"),
    "q_cusum_by_type": _staged("q_cusum_by_type"),
    "q_kaplan_meier_cohorts": _staged("q_kaplan_meier_cohorts"),
    "q_lexical_cohesion": _staged("q_lexical_cohesion"),
    # round-4 continuation additions
    "q_silhouette": _staged("q_silhouette"),
    "q_kcenter_select": _staged("q_kcenter_select"),
    "q_bitext_margin": _staged("q_bitext_margin"),
    "q_fs_link_scores": _staged("q_fs_link_scores"),
    # round-4k additions (evaluation / link prediction / anomalies)
    "q_auc_eval": _staged("q_auc_eval"),
    "q_benford_deviation": _staged("q_benford_deviation"),
    "q_bleu_pairs": _staged("q_bleu_pairs"),
    "q_adamic_adar": _staged("q_adamic_adar"),
    "q_kcore": _staged("q_kcore"),
    "q_ewma_anomalies": _staged("q_ewma_anomalies"),
    "q_event_sequences": _staged("q_event_sequences"),
    "q_leakage_safe_split": _staged("q_leakage_safe_split"),
    "q_jaro_winkler_links": _staged("q_jaro_winkler_links"),
    "q_mrr_map_eval": _staged("q_mrr_map_eval"),
    "q_good_turing": _staged("q_good_turing"),
    "q_token_burstiness": _staged("q_token_burstiness"),
    "q_calibration_bins": _staged("q_calibration_bins"),
    "q_l_diversity": _staged("q_l_diversity"),
    "q_ams_f2": _staged("q_ams_f2"),
    "q_ppr_tokens": _staged("q_ppr_tokens"),
    "q_clustering_coefficient": _staged("q_clustering_coefficient"),
    "q_lm_hit_at_k": _staged("q_lm_hit_at_k"),
    "q_rbp_eval": _staged("q_rbp_eval"),
    "q_source_kl": _staged("q_source_kl"),
    "q_mann_kendall": _staged("q_mann_kendall"),
    "q_neyman_allocation": _staged("q_neyman_allocation"),
    "q_kendall_tau_b": _staged("q_kendall_tau_b"),
    "q_cohens_kappa": _staged("q_cohens_kappa"),
    "q_yules_k": _staged("q_yules_k"),
    "q_chao1_richness": _staged("q_chao1_richness"),
    "q_flesch_reading": _staged("q_flesch_reading"),
    "q_kruskal_wallis": _staged("q_kruskal_wallis"),
    "q_levene_bf": _staged("q_levene_bf"),
    "q_t_closeness": _staged("q_t_closeness"),
    "q_jackknife_ratio": _staged("q_jackknife_ratio"),
    "q_rouge2_pairs": _staged("q_rouge2_pairs"),
    "q_modularity": _staged("q_modularity"),
    "q_wilson_ci": _staged("q_wilson_ci"),
    "q_theil_index": _staged("q_theil_index"),
    "q_truncation_loss": _staged("q_truncation_loss"),
    "q_span_corruption": _staged("q_span_corruption"),
    "q_binseg_daily": _staged("q_binseg_daily"),
    "q_runs_test": _staged("q_runs_test"),
    "q_dedup_rate_by_source": _staged("q_dedup_rate_by_source"),
    "q_cooks_distance": _staged("q_cooks_distance"),
    "q_sax_daily": _staged("q_sax_daily"),
    "q_seasonality_strength": _staged("q_seasonality_strength"),
    "q_mattr": _staged("q_mattr"),
    "q_interarrival_stats": _staged("q_interarrival_stats"),
    "q_embedding_isotropy": _staged("q_embedding_isotropy"),
    "q_cohort_value": _staged("q_cohort_value"),
    "q_rfm_segments": _staged("q_rfm_segments"),
    "q_split_balance": _staged("q_split_balance"),
    "q_anova_oneway": _staged("q_anova_oneway"),
    "q_cramers_v": _staged("q_cramers_v"),
    "q_vocab_coverage": _staged("q_vocab_coverage"),
    "q_ktruss": _staged("q_ktruss"),
    "q_event_type_overlap": _staged("q_event_type_overlap"),
    "q_higher_moments": _staged("q_higher_moments"),
    "q_daily_mix_entropy": _staged("q_daily_mix_entropy"),
    "q_lorenz_curve": _staged("q_lorenz_curve"),
    "q_event_entropy_rate": _staged("q_event_entropy_rate"),
    "q_hhi_concentration": _staged("q_hhi_concentration"),
    "q_jaccard_histogram": _staged("q_jaccard_histogram"),
    "q_growth_accounting": _staged("q_growth_accounting"),
    "q_stickiness": _staged("q_stickiness"),
    "q_return_time_hist": _staged("q_return_time_hist"),
    "q_char_entropy": _staged("q_char_entropy"),
    "q_word_length_profile": _staged("q_word_length_profile"),
    "q_oov_by_source": _staged("q_oov_by_source"),
    "q_hill_tail": _staged("q_hill_tail"),
    "q_daily_bands": _staged("q_daily_bands"),
    "q_nn_label_agreement": _staged("q_nn_label_agreement"),
    "q_common_prefix": _staged("q_common_prefix"),
    "q_term_position_bias": _staged("q_term_position_bias"),
    "q_type_user_hhi": _staged("q_type_user_hhi"),
    "q_cluster_representatives": _staged("q_cluster_representatives"),
    "q_kmeans_elbow": _staged("q_kmeans_elbow"),
    "q_xcorr_types": _staged("q_xcorr_types"),
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("nc-spark-bench")
    registry = all_queries()

    # Warm the JVM/session on a trivial job so q1 doesn't pay startup cost.
    spark.range(1000).selectExpr("sum(id)").collect()

    # One untimed warm-up pass: first-touch costs (parquet footer reads, OS
    # page cache, whole-stage codegen compilation) are 2-4x the steady-state
    # query time at this scale and belong to the session, not the query.
    # The timed pass below measures repeatable engine throughput.
    for name in HEADLINE:
        registry[name].spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Two timed passes, per-query MIN: the headline number should measure
    # engine throughput, not whatever else the host happened to be doing
    # during one pass (observed: a loaded machine inflates a pass ~40%).
    timings: dict[str, float] = {}
    for _ in range(2):
        for name in HEADLINE:
            q = registry[name]
            t0 = time.time()
            df = q.spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    # Extras are non-judged trend rows; with 125 of them the old
    # warm+min-of-2 protocol (3 executions each) pushed the whole bench
    # past 10 minutes.  ONE timed pass each keeps the run ~3x cheaper;
    # extras therefore carry first-touch cost and are comparable only to
    # other single-pass extras rows (the headline protocol is unchanged).
    extra: dict[str, float] = {}
    for name, fn in EXTRA.items():
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        extra[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "extra_queries": extra,
        # headline protocol: untimed warm-up pass, then per-query MIN of
        # two timed passes in one warm JVM (adopted in round 3 — earlier
        # rounds were single-pass; see BASELINE.md)
        "methodology": "warm-jvm, warmup pass + min-of-2 timed passes; extras single-pass (changed this session, see BASELINE.md)",
        "registry_size": len(all_queries()),
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
