"""The end-to-end curation pipeline: the composition that turns a raw
corpus into a training set, built from the individually-verified stages.

    quality filter  ->  exact dedup (keep one per fingerprint)
    ->  benchmark decontamination  ->  deterministic train/val/test split

Each stage is an already-oracle-proven operator; the composition is
itself oracle-checked end-to-end (q_curation_pipeline chains the same
four SQL replays), which pins the *interaction* semantics: a doc dropped
by quality never reaches the dedup keeper election, a dedup loser never
poisons the contamination overlap, and split assignment is a pure
function of the id so survivors never migrate.

Scale shape: every stage is the operator's own plan (zero-shuffle row
filters, one fingerprint agg, one broadcast eval-shingle join) joined
back on doc_id — the corpus-sized frame flows straight through; no stage
re-tokenizes because each consumes only the columns it needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nonconsumptive_spark.operators import dedup as dd
from nonconsumptive_spark.operators import textstats as ts


def curate(docs: DataFrame, eval_docs: DataFrame,
           overlap_threshold: int = 5,
           split_weights: tuple[tuple[str, int], ...] = (
               ("train", 98), ("val", 1), ("test", 1)),
           id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per INPUT document: the per-stage verdicts and, for
    survivors, the assigned split.

    Columns: (id, quality_keep, dedup_keeper, contaminated, selected,
    split) — split is NULL for dropped docs, so the frame serves both as
    the training-set selector (filter selected) and as the audit trail
    a data-governance review asks for (why was this doc dropped?)."""
    quality = ts.quality_filter(docs, id_col=id_col, text_col=text_col) \
        .select(id_col, F.col("keep").alias("quality_keep"))

    # dedup keeper election runs on quality survivors only: a spam doc
    # must not steal keeper-ship from its clean duplicate
    clean = docs.join(quality.filter("quality_keep"), id_col, "left_semi")
    keepers = dd.exact_dedup(clean, id_col=id_col, text_col=text_col) \
        .select(id_col, F.col("is_keeper").alias("dedup_keeper"))

    contaminated = ts.decontaminate(
        docs, eval_docs, overlap_threshold=overlap_threshold,
        id_col=id_col, text_col=text_col,
    ).select(id_col, F.col("is_contaminated").alias("contaminated"))

    split = ts.dataset_split(docs, split_weights, key_col=id_col) \
        .select(id_col, F.col("split").alias("_split"))

    selected = (
        F.coalesce("quality_keep", F.lit(False))
        & F.coalesce("dedup_keeper", F.lit(False))
        & ~F.col("contaminated")
    )
    return (
        docs.select(id_col)
        .join(quality, id_col, "left")
        .join(keepers, id_col, "left")
        .join(contaminated, id_col, "left")
        .join(split, id_col, "left")
        .select(
            id_col,
            F.coalesce("quality_keep", F.lit(False)).alias("quality_keep"),
            F.coalesce("dedup_keeper", F.lit(False)).alias("dedup_keeper"),
            F.col("contaminated"),
            selected.alias("selected"),
            F.when(selected, F.col("_split")).alias("split"),
        )
    )
