"""foreachBatch sinks: exactly-once-style upsert into parquet.

SURVEY §2.9's remaining streaming surface: ``foreachBatch`` hands each
micro-batch to arbitrary batch code with an epoch id.  The upsert sink
emulates MERGE INTO (no Delta/Iceberg jars in this build): new keys are
appended, existing keys replaced, by rewriting
``current ⟵ (current ANTI-JOIN batch) ∪ batch``.

Idempotence, not transactionality: replaying a micro-batch converges to
the same table (upsert of identical rows is a no-op), which is the
practical exactly-once story for file sinks without a table format.  The
rewrite is O(table) per batch — with a real lakehouse format the same
``foreachBatch`` body becomes a metadata-only MERGE; the streaming-side
wiring is unchanged.  Partition the table and prune on the batch's key
range to bound the rewrite in production.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame


def upsert_parquet(batch_df: DataFrame, table_dir: str, keys: list[str]) -> None:
    """Batch-side upsert body (usable directly or from foreachBatch)."""
    spark = batch_df.sparkSession
    dedup = batch_df.dropDuplicates(keys)  # last-write-wins inside a batch
    p = Path(table_dir)
    if p.exists() and any(p.iterdir()):
        current = spark.read.parquet(table_dir)
        kept = current.join(dedup.select(*keys), keys, "left_anti")
        merged = kept.unionByName(dedup)
    else:
        merged = dedup
    # Stage to a sibling dir first so the merge never reads the table it is
    # rewriting.  The final overwrite is itself delete-then-write, NOT
    # atomic — a crash mid-rewrite leaves a partial table (recoverable from
    # the staged copy, which is removed only after the rewrite completes).
    # A truly atomic swap needs a table format (Delta/Iceberg) or an
    # atomic directory rename; this sink trades that for zero extra deps.
    tmp = str(p.parent / (p.name + "__tmp"))
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(table_dir)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def start_upsert_sink(stream: DataFrame, table_dir: str, keys: list[str],
                      checkpoint_dir: str, query_name: str = "upsert"):
    """Wire a streaming DataFrame into the upsert sink via foreachBatch
    with AvailableNow (drain backlog then stop)."""
    def body(batch_df: DataFrame, epoch_id: int) -> None:
        upsert_parquet(batch_df, table_dir, keys)

    return (
        stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
