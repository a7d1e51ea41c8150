"""Streaming moments: stream==batch Welch equality, additive-merge epoch
guard, crash-window recovery."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.sweep  # streaming pipeline + crash sweep: minutes per file

from pyspark.sql import functions as F

from nonconsumptive_spark.streaming import corpus as c
from nonconsumptive_spark.streaming.moments import (
    batch_moments,
    merge_moments,
    welch_from_moments,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])


def _mom_set(df):
    return {(r["grp"], r["n"], r["s"], r["ss"]) for r in df.collect()}


def test_stream_equals_batch_welch(spark, tmp_path):
    epochs = [
        [(0, "sa", 10), (1, "sa", 12), (2, "sb", 30)],
        [(3, "sa", 14), (4, "sb", 25), (5, "sb", 28)],
        [(6, "sa", 16), (7, "sb", 32)],
    ]
    table = str(tmp_path / "mom")
    for e, rows in enumerate(epochs):
        assert merge_moments(
            batch_moments(_docs(spark, rows), "source", "n_chars"),
            table, epoch_id=e) is True

    union = _docs(spark, [r for rows in epochs for r in rows])
    assert _mom_set(c.committed_table(spark, table)) == _mom_set(
        batch_moments(union, "source", "n_chars"))

    # live Welch equals the batch query's formula on the same rows:
    # replicate the batch computation from the union frame directly
    live = welch_from_moments(spark, table).collect()[0]
    from nonconsumptive_spark.queries.textstats import (
        _WELCH_DF, _WELCH_M, _WELCH_T, _WELCH_VN)
    mom = batch_moments(union, "source", "n_chars")
    sided = mom.selectExpr("grp", "n", f"{_WELCH_M} AS m", f"{_WELCH_VN} AS vn")
    a = sided.filter("grp = 'sa'").selectExpr(
        "n AS n1", "m AS m1", "vn AS vn1")
    b = sided.filter("grp = 'sb'").selectExpr(
        "n AS n2", "m AS m2", "vn AS vn2")
    batch = a.crossJoin(b).selectExpr(
        f"{_WELCH_T} AS t_stat", f"{_WELCH_DF} AS welch_df").collect()[0]
    assert live["t_stat"] == batch["t_stat"]
    assert live["welch_df"] == batch["welch_df"]


def test_additive_guard_blocks_replay(spark, tmp_path):
    table = str(tmp_path / "mom")
    m = batch_moments(_docs(spark, [(0, "sa", 10)]), "source", "n_chars")
    assert merge_moments(m, table, epoch_id=0) is True
    before = _mom_set(c.committed_table(spark, table))
    assert merge_moments(m, table, epoch_id=0) is False  # replay skipped
    assert _mom_set(c.committed_table(spark, table)) == before


def test_crash_window_replay(spark, tmp_path):
    table = str(tmp_path / "mom")
    m0 = batch_moments(_docs(spark, [(0, "sa", 10)]), "source", "n_chars")
    m1 = batch_moments(_docs(spark, [(1, "sa", 20)]), "source", "n_chars")
    assert merge_moments(m0, table, epoch_id=0) is True

    # crash state: epoch 1 written, marker not advanced
    cur = c.committed_table(spark, table)
    merged = (cur.unionByName(m1).groupBy("grp")
              .agg(F.sum("n").cast("long").alias("n"),
                   F.sum("s").cast("long").alias("s"),
                   F.sum("ss").cast("long").alias("ss")))
    merged.write.mode("overwrite").parquet(str(c._version_dir(table, 1)))
    assert c.applied_epoch(table) == 0
    assert _mom_set(c.committed_table(spark, table)) == {("sa", 1, 10, 100)}

    assert merge_moments(m1, table, epoch_id=1) is True
    assert _mom_set(c.committed_table(spark, table)) == {("sa", 2, 30, 500)}
