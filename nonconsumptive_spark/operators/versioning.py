"""Corpus versioning: diff two snapshots of a document table.

Incremental ingest needs to know, between yesterday's corpus and today's,
which documents were added, deleted, changed, or untouched — that drives
what re-tokenizes, what re-embeds, and what invalidates downstream
checkpoints (the reference rebuilds whole reservoirs on any input change,
data_storage.py:112-130; a diff makes that incremental).

Plan shape: fingerprint each side in-row (md5 of the text — the same
exact-dup key as operators.textstats.fingerprint), then one full outer
join on the document id.  Both sides prune to (id, fingerprint) before the
join, so at 100 TB the shuffle carries two slim columns, never the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(old: DataFrame, new: DataFrame,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per doc id present in either snapshot:
    (id, status ∈ {added, deleted, changed, unchanged})."""
    def fp(df, name):
        return df.select(
            F.col(id_col), F.md5(F.col(text_col)).alias(name)
        )

    joined = fp(old, "fp_old").join(fp(new, "fp_new"), id_col, "full_outer")
    status = (
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("deleted"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(id_col, status.alias("status"))


def diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n) — the four-row report an ingest job logs per run."""
    return diff.groupBy("status").agg(F.count("*").cast("long").alias("n"))
