"""Streaming bottom-k sample: stream == batch set equality under any
chunking, replay idempotence (with AND without the guard), and the
foreachBatch wiring."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.sweep  # streaming pipeline + crash sweep: minutes per file

from pyspark.sql import functions as F

from nonconsumptive_spark.operators.textstats import uniform_sample_k
from nonconsumptive_spark.queries import load
from nonconsumptive_spark.streaming.bottomk import (
    merge_bottom_k,
    sample,
    start_incremental_sample,
)
from tests.conftest import SF_SMALL

K = 17


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_any_chunking_equals_batch(spark, tmp_path):
    docs = load(spark, SF_SMALL, "documents").select("doc_id", "source")
    batch_ids = _ids(uniform_sample_k(docs, K))
    for chunks, name in [
        ([(0, 200), (200, 350), (350, 10_000)], "three"),
        ([(0, 10_000)], "one"),
    ]:
        table = str(tmp_path / f"bk_{name}")
        for e, (lo, hi) in enumerate(chunks):
            part = docs.filter(
                (docs.doc_id >= lo) & (docs.doc_id < hi))
            assert merge_bottom_k(part, table, K, epoch_id=e) is True
        assert _ids(sample(spark, table)) == batch_ids


def test_replay_is_noop_even_without_guard(spark, tmp_path):
    docs = load(spark, SF_SMALL, "documents").select("doc_id", "source")
    table = str(tmp_path / "bk")
    assert merge_bottom_k(docs, table, K, epoch_id=0) is True
    before = _ids(sample(spark, table))
    # the guard refuses the replay outright
    assert merge_bottom_k(docs, table, K, epoch_id=0) is False
    # and even a FORCED re-merge of the same rows is a set no-op
    # (min-union semilattice, the HLL property)
    assert merge_bottom_k(docs, table, K, epoch_id=1) is True
    assert _ids(sample(spark, table)) == before


def test_foreachbatch_wiring(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "bk")
    ckpt = str(tmp_path / "ckpt")
    docs = load(spark, SF_SMALL, "documents").select("doc_id", "source")
    docs.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_incremental_sample(stream, table, ckpt, K)
    q.awaitTermination(120)
    assert _ids(sample(spark, table)) == _ids(
        uniform_sample_k(spark.read.parquet(src), K))


# ---------------------------------------------------------------------------
# Weighted companion: the live priority sample
# ---------------------------------------------------------------------------


def test_priority_sample_any_chunking_equals_batch(spark, tmp_path):
    from nonconsumptive_spark.operators.textstats import (
        priority_sample_by_group,
    )
    from nonconsumptive_spark.streaming.bottomk import (
        merge_top_priority,
        priority_sample,
    )

    docs = load(spark, SF_SMALL, "documents").select(
        "doc_id", "n_chars").withColumn("g", F.lit(0))
    batch_ids = _ids(priority_sample_by_group(docs, "g", "n_chars", K))
    table = str(tmp_path / "pk")
    for e, (lo, hi) in enumerate([(0, 150), (150, 400), (400, 10_000)]):
        part = docs.filter((docs.doc_id >= lo) & (docs.doc_id < hi))
        assert merge_top_priority(part, table, K, epoch_id=e) is True
    got = priority_sample(spark, table, K)
    assert _ids(got) == batch_ids
    # tau present, positive (population > K), identical on every row
    taus = {r["tau"] for r in got.collect()}
    assert len(taus) == 1 and taus.pop() > 0.0
    # replay refused; forced re-merge is a set no-op (semilattice)
    assert merge_top_priority(docs, table, K, epoch_id=2) is False
    assert merge_top_priority(docs, table, K, epoch_id=3) is True
    assert _ids(priority_sample(spark, table, K)) == batch_ids
