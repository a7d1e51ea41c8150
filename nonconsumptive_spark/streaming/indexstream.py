"""Streaming positional-index maintenance: append each micro-batch's
posting triples (term, doc, pos) to a committed index table, so exact
phrase retrieval (operators/retrieval.phrase_search_indexed) stays
answerable while the corpus streams in.

Postings are APPEND-ONLY per document (a document arrives once; its
postings never change), so the merge is a union — but unlike HLL's max
or the skyline's dominance pruning, a replayed epoch would DUPLICATE
postings and corrupt hit counts.  The epoch guard of the
versioned-commit scheme is therefore load-bearing here (the same
contract as merge_wordcounts, and the same kill-point replay tests
apply to the shared machinery).

State grows with the corpus (it IS the index); at scale the committed
version is partitioned by term so queries prune to their own terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nonconsumptive_spark.streaming.corpus import (
    _commit_epoch,
    _prune_versions,
    _version_dir,
    applied_epoch,
    committed_table,
)


def merge_postings(batch_docs: DataFrame, table_dir: str,
                   id_col: str = "doc_id", text_col: str = "text",
                   epoch_id: int = 0) -> bool:
    """Tokenize one micro-batch of documents and append its postings.
    Returns False (no-op) when ``epoch_id`` was already applied."""
    if epoch_id <= applied_epoch(table_dir):
        return False
    from nonconsumptive_spark.operators.retrieval import build_positional_index

    spark = batch_docs.sparkSession
    incoming = build_positional_index(batch_docs, id_col, text_col)
    current = committed_table(spark, table_dir)
    merged = (current.unionByName(incoming)
              if current is not None else incoming)
    prev = applied_epoch(table_dir)
    merged.write.mode("overwrite").parquet(str(_version_dir(table_dir, epoch_id)))
    _commit_epoch(table_dir, epoch_id)
    if prev >= 0:
        _prune_versions(table_dir, prev)
    return True


def start_incremental_index(stream: DataFrame, table_dir: str,
                            checkpoint_dir: str, id_col: str = "doc_id",
                            text_col: str = "text"):
    """Wire a document stream into a running positional index."""
    def body(batch_df: DataFrame, epoch_id: int) -> None:
        merge_postings(batch_df, table_dir, id_col, text_col,
                       epoch_id=epoch_id)

    return (
        stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental_index")
        .trigger(availableNow=True)
        .start()
    )


def live_phrase_search(spark: SparkSession, table_dir: str,
                       phrase: list[str],
                       id_col: str = "doc_id") -> DataFrame | None:
    """Phrase query against the committed index (None before the first
    commit) — identical results to the batch forms over the same docs."""
    from nonconsumptive_spark.operators.retrieval import phrase_search_indexed

    idx = committed_table(spark, table_dir)
    if idx is None:
        return None
    return phrase_search_indexed(idx, phrase, id_col=id_col)
