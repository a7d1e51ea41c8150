"""Long-document robustness: the per-row HOF operators must stay
well-behaved on documents orders of magnitude longer than the fixtures
(the 100 TB corpus has a long tail of book-length rows).  Each operator
here is O(doclen) or O(doclen · w) per row BY DESIGN — this locks that
claim on a ~60k-token document (plus a trivial row, so grouping paths
see more than one key)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa"]
N_TOK = 60_000


@pytest.fixture(scope="module")
def long_docs(spark):
    toks = [WORDS[(i * 7 + i // 11) % len(WORDS)] for i in range(N_TOK)]
    # plant one tight proximity window and one exact phrase
    toks[30_000:30_003] = ["needle", "haystack", "needle"]
    return spark.createDataFrame(
        [(0, " ".join(toks)), (1, "needle haystack short row")],
        "doc_id long, text string")


def test_tokenize_and_counts(spark, long_docs):
    from nonconsumptive_spark.operators.wordcount import doc_token_counts

    out = doc_token_counts(long_docs).collect()
    total = sum(r["count"] for r in out if r["doc_id"] == 0)
    assert total == N_TOK  # the 3-token splice replaced exactly 3 tokens


def test_phrase_and_proximity(spark, long_docs):
    from nonconsumptive_spark.operators.retrieval import (
        min_span_proximity,
        phrase_search,
    )

    hits = {r["doc_id"]: r["n_hits"]
            for r in phrase_search(long_docs,
                                   ["needle", "haystack"]).collect()}
    assert hits[0] >= 1 and hits[1] == 1
    spans = {r["doc_id"]: r["span"]
             for r in min_span_proximity(long_docs,
                                         ["needle", "haystack"]).collect()}
    assert spans[0] == 2 and spans[1] == 2


def test_lexical_cohesion_long(spark, long_docs):
    from nonconsumptive_spark.operators.textstats import (
        TILE_W,
        lexical_cohesion_gaps,
    )

    out = lexical_cohesion_gaps(long_docs).collect()
    n_gaps_0 = sum(1 for r in out if r["doc_id"] == 0)
    assert n_gaps_0 == N_TOK // TILE_W - 1
    assert all(0 <= r["cos2_q"] <= 10**6 for r in out)


def test_chunked_wordcounts_long(spark, long_docs):
    from nonconsumptive_spark.operators.wordcount import chunked_wordcounts

    out = chunked_wordcounts(long_docs, chunk_size=1000).collect()
    chunks0 = {r["chunk"] for r in out if r["doc_id"] == 0}
    assert len(chunks0) == N_TOK // 1000
