"""Streaming positional-index maintenance: append each micro-batch's
posting triples (term, doc, pos) as an epoch DELTA, so exact phrase
retrieval (operators/retrieval.phrase_search_indexed) stays answerable
while the corpus streams in.

Unlike the running wordcount/moment/HLL tables (bounded state, rewritten
per epoch), the index grows with the corpus — rewriting it per epoch
would cost O(index) per batch.  This module therefore uses the
append-only half of the commit scheme: each epoch writes its postings to
``{table_dir}/epoch={e}`` and only then advances the shared epoch
marker (streaming/corpus.py), the transaction-log pattern:

  * a crash between delta write and marker leaves a half-written
    directory that readers never see (they union only deltas <= the
    applied epoch); the replay overwrites it and then commits;
  * a replayed epoch is refused by the guard — postings are additive,
    so the guard is load-bearing against hit-count duplication (same
    contract as merge_wordcounts);
  * per-epoch cost is O(batch); nothing is ever rewritten or pruned.

At scale each delta is additionally partitioned by term prefix so phrase
queries prune to their own terms' postings.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from nonconsumptive_spark.streaming.corpus import _commit_epoch, applied_epoch


def _delta_dir(table_dir: str, epoch_id: int) -> Path:
    return Path(table_dir) / f"epoch={epoch_id}"


def merge_postings(batch_docs: DataFrame, table_dir: str,
                   id_col: str = "doc_id", text_col: str = "text",
                   epoch_id: int = 0, partition_by_term: bool = False) -> bool:
    """Tokenize one micro-batch of documents and append its postings as
    this epoch's delta.  Returns False (no-op) when ``epoch_id`` was
    already applied.  ``partition_by_term=True`` writes each delta
    hive-partitioned on the term, so a phrase query's scan partition-
    prunes to its own terms' postings — the right layout once postings
    outgrow a single scan."""
    if epoch_id <= applied_epoch(table_dir):
        return False
    from nonconsumptive_spark.operators.retrieval import build_positional_index

    postings = build_positional_index(batch_docs, id_col, text_col)
    writer = postings.write.mode("overwrite")
    if partition_by_term:
        writer = writer.partitionBy("term")
    writer.parquet(str(_delta_dir(table_dir, epoch_id)))
    _commit_epoch(table_dir, epoch_id)
    return True


def committed_index(spark: SparkSession, table_dir: str) -> DataFrame | None:
    """Union of all committed epoch deltas (None before the first
    commit).  Half-written deltas past the marker are invisible."""
    applied = applied_epoch(table_dir)
    if applied < 0:
        return None
    deltas = [
        str(p) for p in Path(table_dir).glob("epoch=*")
        if p.is_dir() and int(p.name.split("=", 1)[1]) <= applied
    ]
    # basePath keeps partition discovery rooted at the table even when
    # the deltas are themselves term-partitioned; the epoch partition
    # column it surfaces is bookkeeping, not data
    return (
        spark.read.option("basePath", table_dir)
        .parquet(*sorted(deltas))
        .drop("epoch")
    )


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

    idx = committed_index(spark, table_dir)
    if idx is None:
        return None
    return phrase_search_indexed(idx, phrase, id_col=id_col)
