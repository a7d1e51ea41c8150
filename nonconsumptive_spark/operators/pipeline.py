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


def quality_retention_curve(docs: DataFrame, n_buckets: int = 10,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Filter-tuning curve: per alpha-ratio bucket, how many documents and
    tokens survive a "keep bucket ≥ threshold" cut — (bucket, n_docs,
    n_tokens, cum_docs, cum_tokens, retained_frac), cumulative from the
    TOP bucket down.  The quantity-side complement to quality_filter:
    before fixing thresholds, curation pipelines read this curve to see
    what fraction of the token budget each candidate cut price-tags (the
    C4/Gopher papers report exactly this table).

    The bucket key is EXACT integer arithmetic — n_alpha·B DIV n_chars,
    clamped to B−1 — so bucket membership can never drift between
    engines.  One zero-shuffle per-row scan, one B-group agg; the
    cumulative window runs over the B aggregated rows (bounded, not a
    data-sized window); retained_frac divides two exact BIGINTs once."""
    from pyspark.sql import Window

    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t).cast("long")
    n_alpha = F.length(F.regexp_replace(t, r"[^\p{L}]", "")).cast("long")
    n_tokens = F.size(ts.tokenize(t)).cast("long")
    bucket = F.when(
        n_chars > 0,
        F.least(
            F.floor(n_alpha * n_buckets / n_chars).cast("long"),
            F.lit(n_buckets - 1).cast("long"),
        ),
    ).otherwise(F.lit(0).cast("long"))

    per_bucket = (
        docs.select(bucket.alias("bucket"), n_tokens.alias("nt"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"), F.sum("nt").alias("n_tokens"))
    )
    w = (
        Window.orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per_bucket.select(
        F.col("bucket"),
        F.col("n_docs"),
        F.col("n_tokens"),
        F.sum("n_docs").over(w).alias("cum_docs"),
        F.sum("n_tokens").over(w).alias("cum_tokens"),
        (
            F.round(
                F.sum("n_tokens").over(w).cast("double")
                / F.sum("n_tokens").over(tot).cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("retained_frac"),
    )
