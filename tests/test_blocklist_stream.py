"""Streaming blocklist gate: stream == batch, and agreement with the
indexed batch form."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.sweep  # streaming pipeline + crash sweep: minutes per file
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from nonconsumptive_spark.operators.retrieval import (
    blocklist_match,
    build_positional_index,
)
from nonconsumptive_spark.streaming.blocklist import blocklist_gate
from nonconsumptive_spark.streaming.events import run_available_now

DOCS = [
    (1, "a table table b bad word a"),
    (2, "table table table bad"),
    (3, "no match here"),
    (4, ""),
    (5, "bad word bad word"),
    (6, "word bad"),
    (7, None),
]
SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
])
BLOCKLIST = [["table", "table"], ["bad", "word"], ["bad"]]


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bl_docs"))
    # several files so the stream runs multiple triggers
    for i, row in enumerate(DOCS):
        spark.createDataFrame([row], SCHEMA).write.parquet(f"{d}/f{i}")
    # readStream wants a flat dir of files
    import glob
    import shutil

    flat = str(tmp_path_factory.mktemp("bl_flat"))
    n = 0
    for f in sorted(glob.glob(f"{d}/f*/*.parquet")):
        shutil.copy(f, f"{flat}/part{n}.parquet")
        n += 1
    return flat


def _rows(df):
    return sorted(
        (r.doc_id, tuple(r.phrase_ids), r.n_phrases_hit, r.blocked)
        for r in df.collect()
    )


def test_stream_equals_batch(spark, docs_dir):
    batch = blocklist_gate(spark.read.parquet(docs_dir), BLOCKLIST)
    src = (
        spark.readStream.format("parquet").schema(SCHEMA)
        .option("maxFilesPerTrigger", 2).load(docs_dir)
    )
    got = run_available_now(blocklist_gate(src, BLOCKLIST),
                            "t_blocklist", mode="append")
    assert _rows(got) == _rows(batch)
    assert got.count() == len(DOCS)


def test_gate_agrees_with_indexed_form(spark, docs_dir):
    docs = spark.read.parquet(docs_dir)
    gate = blocklist_gate(docs, BLOCKLIST)
    flat = sorted(
        (r.doc_id, pid)
        for r in gate.collect() for pid in r.phrase_ids
    )
    idx = blocklist_match(build_positional_index(docs), BLOCKLIST)
    want = sorted((r.doc_id, r.phrase_id) for r in idx.collect())
    assert flat == want


def test_gate_is_stateless_plan(spark, docs_dir):
    plan = blocklist_gate(spark.read.parquet(docs_dir), BLOCKLIST) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan   # pure narrow map


def test_gate_rejects_empty(spark):
    with pytest.raises(ValueError):
        blocklist_gate(None, [])


def test_compression_ratio_streams(spark, docs_dir):
    """compression_ratio is a stateless narrow map, so it runs unchanged
    on a stream; stream == batch."""
    from nonconsumptive_spark.operators.textstats import compression_ratio

    batch = sorted(map(tuple,
                       compression_ratio(spark.read.parquet(docs_dir))
                       .collect()))
    src = (
        spark.readStream.format("parquet").schema(SCHEMA)
        .option("maxFilesPerTrigger", 3).load(docs_dir)
    )
    got = run_available_now(compression_ratio(src), "t_compstream",
                            mode="append")
    assert sorted(map(tuple, got.collect())) == batch
