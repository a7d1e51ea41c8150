"""Streaming blocklist gate: flag/drop documents containing any phrase of
a blocklist, per micro-batch, as the crawl arrives.

Production shape: the blocklist is a PLAN-TIME constant for a deployment
(policy lists and benchmark phrases change by release, not by batch), so
the right streaming form is the in-row anchor scan — one let-bound
tokenize per document, every phrase checked inside the row.  That makes
the gate a pure narrow map: no state, no watermark, no shuffle, and
batch/stream results are identical by construction.  (The indexed
anchor-vote join in ``operators/retrieval.blocklist_match`` is the form
for index-once/query-many BATCH corpora; a stream has no index.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nonconsumptive_spark.functions.text import let, tokenize
from nonconsumptive_spark.operators.retrieval import phrase_anchor_positions


def blocklist_gate(docs: DataFrame, phrases: list[list[str]],
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, phrase_ids, n_phrases_hit, blocked) per document — works
    identically on a batch DataFrame and a streaming one (stateless
    narrow map).  ``phrase_ids`` lists the blocklist indices that match,
    ascending, so downstream can distinguish "drop" phrases from "flag"
    phrases by id range without re-scanning."""
    if not phrases or any(not p for p in phrases):
        raise ValueError("phrases must be non-empty and have no empty entry")

    def build(toks):
        hits = F.array(*[
            F.when(F.size(phrase_anchor_positions(toks, p)) > 0, F.lit(i))
            for i, p in enumerate(phrases)
        ])
        return F.filter(hits, lambda x: x.isNotNull())

    return docs.select(
        id_col,
        let(tokenize(F.col(text_col)), build).alias("phrase_ids"),
    ).select(
        id_col, "phrase_ids",
        F.size("phrase_ids").cast("long").alias("n_phrases_hit"),
        (F.size("phrase_ids") > 0).alias("blocked"),
    )
