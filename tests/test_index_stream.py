"""Streaming positional index: stream==batch phrase results, replay
guard (duplication hazard), and end-to-end wiring."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.sweep  # streaming pipeline + crash sweep: minutes per file

from nonconsumptive_spark.operators.retrieval import phrase_search
from nonconsumptive_spark.streaming.indexstream import (
    live_phrase_search,
    merge_postings,
    start_incremental_index,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


EPOCHS = [
    [(0, "a table table b"), (1, "no match")],
    [(2, "table table table")],
    [(3, "x table y table table z")],
]
PHRASE = ["table", "table"]


def test_stream_equals_batch_phrase_results(spark, tmp_path):
    table = str(tmp_path / "idx")
    for e, rows in enumerate(EPOCHS):
        assert merge_postings(_docs(spark, rows), table, epoch_id=e) is True
    union = _docs(spark, [r for rows in EPOCHS for r in rows])
    assert _rows(live_phrase_search(spark, table, PHRASE)) == _rows(
        phrase_search(union, PHRASE)
    )


def test_replay_guard_prevents_posting_duplication(spark, tmp_path):
    table = str(tmp_path / "idx")
    assert merge_postings(_docs(spark, EPOCHS[0]), table, epoch_id=0) is True
    before = _rows(live_phrase_search(spark, table, PHRASE))
    # a replayed epoch must be refused — union-merge would double n_hits
    assert merge_postings(_docs(spark, EPOCHS[0]), table, epoch_id=0) is False
    assert _rows(live_phrase_search(spark, table, PHRASE)) == before


def test_empty_index_returns_none(spark, tmp_path):
    assert live_phrase_search(spark, str(tmp_path / "nope"), PHRASE) is None


def test_foreachbatch_wiring(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    union = _docs(spark, [r for rows in EPOCHS for r in rows])
    union.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = start_incremental_index(stream, table, ckpt)
    q.awaitTermination(120)
    assert _rows(live_phrase_search(spark, table, PHRASE)) == _rows(
        phrase_search(union, PHRASE)
    )


def test_half_written_delta_is_invisible_until_committed(spark, tmp_path):
    from nonconsumptive_spark.streaming.indexstream import (
        _delta_dir,
        committed_index,
    )
    from nonconsumptive_spark.operators.retrieval import build_positional_index

    table = str(tmp_path / "idx")
    merge_postings(_docs(spark, EPOCHS[0]), table, epoch_id=0)
    n0 = committed_index(spark, table).count()
    # simulate a crash: epoch 1's delta lands on disk but never commits
    build_positional_index(_docs(spark, EPOCHS[1])).write.mode(
        "overwrite").parquet(str(_delta_dir(table, 1)))
    assert committed_index(spark, table).count() == n0
    # the replayed epoch rewrites the delta and commits; now visible
    assert merge_postings(_docs(spark, EPOCHS[1]), table, epoch_id=1) is True
    assert committed_index(spark, table).count() > n0


def test_per_epoch_cost_is_delta_only(spark, tmp_path):
    from nonconsumptive_spark.streaming.indexstream import _delta_dir

    table = str(tmp_path / "idx")
    for e, rows in enumerate(EPOCHS):
        merge_postings(_docs(spark, rows), table, epoch_id=e)
    # every epoch's postings still live in their own untouched delta
    for e in range(len(EPOCHS)):
        assert _delta_dir(table, e).is_dir()


def test_term_partitioned_deltas_prune_and_answer_identically(spark, tmp_path):
    table = str(tmp_path / "idx")
    for e, rows in enumerate(EPOCHS):
        assert merge_postings(_docs(spark, rows), table, epoch_id=e,
                              partition_by_term=True) is True
    union = _docs(spark, [r for rows in EPOCHS for r in rows])
    assert _rows(live_phrase_search(spark, table, PHRASE)) == _rows(
        phrase_search(union, PHRASE)
    )
    # the term filter reaches the scan as a PartitionFilter
    from nonconsumptive_spark.streaming.indexstream import committed_index

    idx = committed_index(spark, table).filter("term = 'table'")
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(term" in plan


def test_optimize_index_compacts_and_preserves_results(spark, tmp_path):
    from nonconsumptive_spark.streaming.indexstream import (
        _base_epoch,
        _delta_dir,
        optimize_index,
    )

    table = str(tmp_path / "idx")
    for e, rows in enumerate(EPOCHS):
        merge_postings(_docs(spark, rows), table, epoch_id=e)
    before = _rows(live_phrase_search(spark, table, PHRASE))
    assert optimize_index(spark, table) is True
    # deltas gone, one base remains, results identical
    assert _base_epoch(table) == len(EPOCHS) - 1
    assert not any(_delta_dir(table, e).is_dir() for e in range(len(EPOCHS)))
    assert _rows(live_phrase_search(spark, table, PHRASE)) == before
    # nothing further to compact
    assert optimize_index(spark, table) is False
    # new epochs after compaction merge on top of the base
    extra = [(9, "table table here")]
    assert merge_postings(_docs(spark, extra), table,
                          epoch_id=len(EPOCHS)) is True
    union = _docs(spark, [r for rows in EPOCHS for r in rows] + extra)
    assert _rows(live_phrase_search(spark, table, PHRASE)) == _rows(
        phrase_search(union, PHRASE))


def test_optimize_crash_between_rename_and_delete_is_safe(spark, tmp_path):
    import shutil

    from nonconsumptive_spark.streaming.indexstream import (
        _delta_dir,
        committed_index,
        optimize_index,
    )

    table = str(tmp_path / "idx")
    for e, rows in enumerate(EPOCHS):
        merge_postings(_docs(spark, rows), table, epoch_id=e)
    n = committed_index(spark, table).count()
    # simulate the crash: base committed but superseded deltas linger
    # (copy deltas aside, optimize, restore the stale dirs)
    aside = []
    for e in range(len(EPOCHS)):
        d = _delta_dir(table, e)
        shutil.copytree(d, str(tmp_path / f"aside{e}"))
        aside.append((str(tmp_path / f"aside{e}"), str(d)))
    assert optimize_index(spark, table) is True
    for src, dst in aside:
        shutil.copytree(src, dst)
    # readers ignore deltas at or below the base — no double counting
    assert committed_index(spark, table).count() == n


def test_optimize_preserves_term_partitioning(spark, tmp_path):
    from nonconsumptive_spark.streaming.indexstream import (
        committed_index,
        optimize_index,
    )

    table = str(tmp_path / "idx")
    for e, rows in enumerate(EPOCHS):
        merge_postings(_docs(spark, rows), table, epoch_id=e,
                       partition_by_term=True)
    before = _rows(live_phrase_search(spark, table, PHRASE))
    assert optimize_index(spark, table, partition_by_term=True) is True
    assert _rows(live_phrase_search(spark, table, PHRASE)) == before
    idx = committed_index(spark, table).filter("term = 'table'")
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(term" in plan
