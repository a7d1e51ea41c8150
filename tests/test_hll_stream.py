"""Streaming HLL: stream==batch register equality, idempotent max-merge
replay, and crash-window recovery through the versioned-commit scheme."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.sweep  # streaming pipeline + crash sweep: minutes per file

from pyspark.sql import functions as F

from nonconsumptive_spark.functions.text import tokenize
from nonconsumptive_spark.operators.wordcount import (
    hll_distinct_tokens,
    hll_registers,
)
from nonconsumptive_spark.streaming import corpus as c
from nonconsumptive_spark.streaming.hllstream import (
    hll_estimate,
    merge_hll_registers,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _regs_of(docs):
    tok = docs.select(F.explode(tokenize("text")).alias("token"))
    return hll_registers(tok)


def _reg_set(df):
    return {(r["j"], r["mr"]) for r in df.collect()}


def test_stream_equals_batch_registers_and_estimate(spark, tmp_path):
    # three "epochs" of documents; merged streaming registers must equal
    # the batch registers over the union corpus, and the streamed
    # estimate must equal the batch operator's estimate exactly.
    epochs = [
        [(0, "alpha beta gamma"), (1, "delta epsilon")],
        [(2, "alpha zeta eta theta"), (3, "iota kappa")],
        [(4, "lambda mu nu xi omicron pi rho")],
    ]
    table = str(tmp_path / "hll")
    for e, rows in enumerate(epochs):
        assert merge_hll_registers(
            _regs_of(_docs(spark, rows)), table, epoch_id=e) is True

    union = _docs(spark, [r for rows in epochs for r in rows])
    assert _reg_set(c.committed_table(spark, table)) == _reg_set(_regs_of(union))

    est = hll_estimate(spark, table).collect()[0]
    batch = hll_distinct_tokens(union).collect()[0]
    assert est["estimate"] == batch["estimate"]


def test_max_merge_replay_is_noop_even_without_guard(spark, tmp_path):
    # the epoch guard skips replays, but max-merge is idempotent anyway:
    # force-merging the same registers twice must not change the state.
    table = str(tmp_path / "hll")
    regs = _regs_of(_docs(spark, [(0, "alpha beta gamma delta")]))
    assert merge_hll_registers(regs, table, epoch_id=0) is True
    before = _reg_set(c.committed_table(spark, table))
    # guarded path: replayed epoch is a no-op
    assert merge_hll_registers(regs, table, epoch_id=0) is False
    # unguarded path: merging the same registers as a NEW epoch is
    # still a semilattice no-op
    assert merge_hll_registers(regs, table, epoch_id=1) is True
    assert _reg_set(c.committed_table(spark, table)) == before


def test_crash_window_replay(spark, tmp_path):
    table = str(tmp_path / "hll")
    r0 = _regs_of(_docs(spark, [(0, "alpha beta")]))
    r1 = _regs_of(_docs(spark, [(1, "gamma delta epsilon")]))
    assert merge_hll_registers(r0, table, epoch_id=0) is True

    # crash state: epoch 1 fully written, marker NOT advanced
    cur = c.committed_table(spark, table)
    merged = (cur.unionByName(r1).groupBy("j").agg(F.max("mr").alias("mr")))
    merged.write.mode("overwrite").parquet(str(c._version_dir(table, 1)))
    assert c.applied_epoch(table) == 0
    assert _reg_set(c.committed_table(spark, table)) == _reg_set(r0)

    # restart replays epoch 1 from the committed version
    assert merge_hll_registers(r1, table, epoch_id=1) is True
    union = _docs(spark, [(0, "alpha beta"), (1, "gamma delta epsilon")])
    assert _reg_set(c.committed_table(spark, table)) == _reg_set(_regs_of(union))


def test_estimate_close_to_truth(spark, tmp_path):
    # 200 distinct tokens through 4 epochs; 256-register HLL should land
    # within ~3 standard errors (1.04/sqrt(256) ~ 6.5% -> use 20%).
    table = str(tmp_path / "hll")
    words = [f"w{chr(ord('a') + i)}{chr(ord('a') + j)}"
             for i in range(20) for j in range(10)]
    for e in range(4):
        chunk = words[e * 50:(e + 1) * 50]
        docs = _docs(spark, [(e, " ".join(chunk))])
        merge_hll_registers(_regs_of(docs), table, epoch_id=e)
    est = hll_estimate(spark, table).collect()[0]["estimate"]
    assert abs(est - 200) / 200 < 0.2


def test_grouped_hll_per_group_accuracy_and_merge(spark):
    from pyspark.sql import functions as F

    from nonconsumptive_spark.operators.wordcount import (
        hll_estimate_by_group,
        hll_registers_grouped,
    )

    rows = [(g, v) for g in ("a", "b") for v in range(200 if g == "a" else 37)]
    df = spark.createDataFrame(rows, "grp string, val long")
    out = {r["grp"]: r for r in hll_estimate_by_group(df, "grp", "val").collect()}
    assert out["a"]["n_exact"] == 200 and out["b"]["n_exact"] == 37
    # 256 registers: well under 10% at these cardinalities
    assert out["a"]["rel_err"] < 0.1 and out["b"]["rel_err"] < 0.1

    # mergeability: shard registers union+max to the full registers
    h1, h2 = df.filter("val % 2 = 0"), df.filter("val % 2 = 1")
    merged = (
        hll_registers_grouped(h1, "grp", "val")
        .unionByName(hll_registers_grouped(h2, "grp", "val"))
        .groupBy("grp", "j").agg(F.max("mr").alias("mr"))
    )
    full = hll_registers_grouped(df, "grp", "val")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_streaming_grouped_hll_equals_batch(spark, tmp_path):
    from nonconsumptive_spark.operators.wordcount import (
        hll_estimate_by_group,
        hll_registers_grouped,
    )
    from nonconsumptive_spark.streaming.hllstream import (
        hll_estimate_grouped,
        merge_hll_registers_grouped,
    )

    epochs = [
        [("a", 1), ("a", 2), ("b", 1)],
        [("a", 2), ("a", 3), ("b", 9), ("b", 10)],
        [("c", 5)],
    ]
    table = str(tmp_path / "ghll")
    for e, rows in enumerate(epochs):
        df = spark.createDataFrame(rows, "grp string, val long")
        assert merge_hll_registers_grouped(
            hll_registers_grouped(df, "grp", "val"), table, epoch_id=e) is True

    union = spark.createDataFrame(
        [r for rows in epochs for r in rows], "grp string, val long")
    live = {r["grp"]: r["estimate"]
            for r in hll_estimate_grouped(spark, table).collect()}
    batch = {r["grp"]: r["estimate"]
             for r in hll_estimate_by_group(union, "grp", "val").collect()}
    assert live == batch
    # replay refused; forced re-merge is a no-op (max semilattice)
    df0 = spark.createDataFrame(epochs[0], "grp string, val long")
    regs0 = hll_registers_grouped(df0, "grp", "val")
    assert merge_hll_registers_grouped(regs0, table, epoch_id=0) is False
    assert merge_hll_registers_grouped(regs0, table, epoch_id=99) is True
    live2 = {r["grp"]: r["estimate"]
             for r in hll_estimate_grouped(spark, table).collect()}
    assert live2 == live
