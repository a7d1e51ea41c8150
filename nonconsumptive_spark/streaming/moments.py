"""Streaming per-group moment accumulation: fold each micro-batch's
(group, n, s, ss) into a committed running table — the state every
two-sample statistic over a live stream needs (Welch t, z-scores, PSI
edges), at #groups-sized memory forever.

Moments are ADDITIVE (like the wordcount fold, unlike HLL's max), so the
epoch guard is load-bearing here: a replayed epoch must be skipped or it
double-counts.  The versioned-commit scheme supplies that (same contract
and tests as merge_wordcounts).

The read side (`welch_from_moments`) reuses the SAME mirrored Welch
expressions the batch query interpolates (`queries/textstats.py`), so a
live between-source t-statistic agrees bit-for-bit with the batch one
over the same rows — stream==batch is test-asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nonconsumptive_spark.streaming.corpus import (
    _commit_epoch,
    _prune_versions,
    _version_dir,
    applied_epoch,
    committed_table,
)


def batch_moments(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, n, s, ss) exact BIGINT moments for one batch."""
    v = F.col(value_col).cast("long")
    return df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(v).cast("long").alias("s"),
        F.sum(v * v).cast("long").alias("ss"),
    )


def merge_moments(batch: DataFrame, table_dir: str, epoch_id: int = 0) -> bool:
    """Fold one micro-batch's moment rows into the running table:
    componentwise sum on group collision.  Returns False (no-op) when
    ``epoch_id`` was already applied — the additive-merge guard."""
    if epoch_id <= applied_epoch(table_dir):
        return False
    spark = batch.sparkSession
    current = committed_table(spark, table_dir)
    if current is not None:
        merged = (
            current.unionByName(batch)
            .groupBy("grp")
            .agg(
                F.sum("n").cast("long").alias("n"),
                F.sum("s").cast("long").alias("s"),
                F.sum("ss").cast("long").alias("ss"),
            )
        )
    else:
        merged = batch
    prev = applied_epoch(table_dir)
    merged.write.mode("overwrite").parquet(str(_version_dir(table_dir, epoch_id)))
    _commit_epoch(table_dir, epoch_id)
    if prev >= 0:
        _prune_versions(table_dir, prev)
    return True


def start_incremental_moments(stream: DataFrame, table_dir: str,
                              checkpoint_dir: str, group_col: str,
                              value_col: str):
    """Wire a stream into a running per-group moment table."""
    def body(batch_df: DataFrame, epoch_id: int) -> None:
        merge_moments(batch_moments(batch_df, group_col, value_col),
                      table_dir, epoch_id=epoch_id)

    return (
        stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental_moments")
        .trigger(availableNow=True)
        .start()
    )


def welch_from_moments(spark: SparkSession,
                       table_dir: str) -> DataFrame | None:
    """Pairwise Welch t over the committed running moments — the live
    form of ``q_welch_ttest_sources``, built from the same mirrored
    expression strings (None before the first commit)."""
    from nonconsumptive_spark.queries.textstats import (
        _WELCH_DF,
        _WELCH_M,
        _WELCH_T,
        _WELCH_VN,
    )

    mom = committed_table(spark, table_dir)
    if mom is None:
        return None
    sided = mom.selectExpr(
        "grp", "n", f"{_WELCH_M} AS m", f"{_WELCH_VN} AS vn")
    a = sided.select(
        F.col("grp").alias("source_a"), F.col("n").alias("n1"),
        F.col("m").alias("m1"), F.col("vn").alias("vn1"))
    b = sided.select(
        F.col("grp").alias("source_b"), F.col("n").alias("n2"),
        F.col("m").alias("m2"), F.col("vn").alias("vn2"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("source_a") < F.col("source_b"))
        .selectExpr(
            "source_a", "source_b",
            "CAST(n1 AS BIGINT) AS n_a", "CAST(n2 AS BIGINT) AS n_b",
            f"{_WELCH_T} AS t_stat", f"{_WELCH_DF} AS welch_df",
        )
    )
