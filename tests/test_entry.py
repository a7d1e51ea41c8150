"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["wordid", "token", "total_count"]
    # wordid 0 is the most frequent token; totals positive
    assert rows[0]["wordid"] == 0
    assert all(r["total_count"] > 0 for r in rows)


def test_contract_shapes(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)
    # most queries must be oracle-checkable (strong gate)
    assert len(oracles) >= len(qs) - 5


def test_parity_queries_inside_driver_window():
    """The driver verifies only the first 50 registry entries; every SURVEY
    §2 text-pipeline / similarity / textstats parity query must be in that
    window (round-1 verdict: 22 flagship queries sat past position 50)."""
    from nonconsumptive_spark.queries import PRIORITY, all_queries

    names = list(all_queries())
    window = set(names[:50])
    flagship = {
        "q_doc_token_counts",
        "q_document_lengths",
        "q_global_wordcount",
        "q_vocabulary",
        "q_encoded_unigrams",
        "q_bigram_counts",
        "q_trigram_counts",
        "q_chunked_wordcounts",
        "q_count_sum_preservation",
        "q_token_count_ws",
        "q_quality_score",
        "q_lang_id",
        "q_fingerprint",
        "q_arrow_batch_stats",
        "q_knn_cosine_bruteforce",
        "q_embedding_norms",
        "q_cosine_near_pairs",
        "q_srp_stats",
        "q_srp_hamming",
        "q_approx_distinct",
        "q_asof_join",
        "q_sessionize_lag",
        # new-in-round-2 extension queries: never driver-verified, so they
        # take the window slots of the r1-green dedup/multimodal block
        # (q_dedup_exact, q_minhash_dedup_pairs, q_multimodal_features were
        # driver-green in CORRECTNESS_r01 and their only r2 change — the
        # materialization policy routing — is asserted bit-identical by
        # tests/test_corpus_layer.py::test_checkpoint_policy).
        "q_dedup_clusters",
        "q_remove_repeated_spans",
        "q_pack_sequences",
        "q_quantize_int8",
        "q_knn_quantized",
        "q_unigram_logprob",
        "q_corpus_diff",
        "q_bpe_merges",
        "q_token_pagerank",
    }
    missing = flagship - window
    assert not missing, f"flagship queries outside driver window: {missing}"
    # PRIORITY names must all resolve (no typo'd / stale entries), except
    # queries scheduled for later in the round.
    registered = set(names)
    stale = [n for n in PRIORITY if n not in registered]
    assert not stale, f"PRIORITY entries not in registry: {stale}"
