"""Z-order layout: Morton-code correctness and the pruning win it buys.

The claim under test is the 100-TB one: a Z-ordered parquet layout lets
file-level min/max stats skip files for range predicates on EITHER of the
two clustered dimensions, where a single-key sort only prunes its own key.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nonconsumptive_spark.sources.layout import (
    interleave_bits,
    pruning_stats,
    zorder_write,
)
from tests.conftest import SF_MEDIUM


def _morton_py(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 37, 200, 255) for y in (0, 2, 9, 128, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", interleave_bits("x", "y", 8).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton_py(x, y, 8), (x, y)


def test_zorder_write_roundtrip(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_MEDIUM}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    out = str(tmp_path / "zorder")
    zorder_write(ev, out, "user_id", "value", bits=8, n_files=16)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert set(back.columns) == {"event_id", "user_id", "value"}
    # every row survives with its exact values
    assert (
        back.select(F.sum(F.hash("event_id", "user_id", "value"))).first()[0]
        == ev.select(F.sum(F.hash("event_id", "user_id", "value"))).first()[0]
    )


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_MEDIUM}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    zpath = str(tmp_path / "z")
    xpath = str(tmp_path / "xsorted")
    zorder_write(ev, zpath, "user_id", "value", bits=8, n_files=16)
    # baseline: classic single-key layout, range-partitioned on user_id
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    box = "user_id BETWEEN 10 AND 25 AND value BETWEEN 20 AND 60"
    z_box = pruning_stats(spark, zpath, box)
    x_box = pruning_stats(spark, xpath, box)
    # same data, same predicate
    assert z_box["rows_matching"] == x_box["rows_matching"] > 0

    # the Z-order tradeoff: the single-key layout out-prunes Z on its own
    # key (the box filters user_id hard), but Z still skips a real
    # fraction of files for the 2-D box...
    assert z_box["files_skippable"] >= z_box["n_files"] // 4

    # ...and on a predicate over the SECOND dimension alone the
    # single-key layout can skip (almost) nothing while Z-order still
    # skips a real fraction of files
    ypred = "value >= 150"
    z_y = pruning_stats(spark, zpath, ypred)
    x_y = pruning_stats(spark, xpath, ypred)
    assert z_y["files_skippable"] > x_y["files_skippable"]
    assert z_y["files_skippable"] >= z_y["n_files"] // 4


def test_quantize_degenerate_range(spark):
    from nonconsumptive_spark.sources.layout import quantize

    df = spark.range(3).select(F.lit(7.0).alias("v"))
    out = df.select(
        quantize(F.col("v"), F.lit(7.0), F.lit(7.0), 8).alias("q")
    ).collect()
    assert all(r["q"] == 0 for r in out)


@pytest.mark.parametrize("bits", [4, 8, 16])
def test_interleave_is_monotone_in_each_dim_at_fixed_other(spark, bits):
    # Z-order locality sanity: with y fixed, z is strictly increasing in x
    mask = (1 << bits) - 1
    df = spark.createDataFrame(
        [(x, 3 & mask) for x in range(0, mask + 1, max(1, mask // 16))],
        "x long, y long",
    )
    rows = (
        df.select("x", interleave_bits("x", "y", bits).alias("z"))
        .orderBy("x")
        .collect()
    )
    zs = [r["z"] for r in rows]
    assert zs == sorted(zs) and len(set(zs)) == len(zs)


def test_compact_files_reduces_count_and_preserves_rows(spark, tmp_path):
    from nonconsumptive_spark.sources.layout import compact_files

    ev = spark.read.parquet(f"{SF_MEDIUM}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    frag = str(tmp_path / "fragmented")
    ev.repartition(64).write.mode("overwrite").parquet(frag)  # tiny files
    dst = str(tmp_path / "compact")
    stats = compact_files(spark, frag, dst, target_rows=4000,
                          order_col="user_id")
    assert stats["files_before"] == 64
    assert stats["files_after"] == 3   # ceil(10000 / 4000)
    assert stats["rows"] == ev.count()
    back = spark.read.parquet(dst)
    assert back.count() == ev.count()
    assert (
        back.select(F.sum(F.hash("event_id", "user_id", "value"))).first()[0]
        == ev.select(F.sum(F.hash("event_id", "user_id", "value"))).first()[0]
    )
    # the ordered rewrite keeps user_id rangeable: every file's span is a
    # contiguous slice, so most files are skippable for a narrow filter
    from nonconsumptive_spark.sources.layout import pruning_stats

    st = pruning_stats(spark, dst, "user_id BETWEEN 0 AND 10")
    assert st["files_skippable"] >= st["n_files"] - 1


def test_footer_stats_agree_with_scan_based_pruning(spark, tmp_path):
    """The pyarrow footer min/max (what the engine consults) and the
    scan-based pruning_stats (ground truth) must agree on skippability
    for the Z-ordered layout."""
    from nonconsumptive_spark.sources.layout import files_skipped_for_range

    ev = spark.read.parquet(f"{SF_MEDIUM}/events.parquet").select(
        "event_id", "user_id", "value")
    zpath = str(tmp_path / "z")
    zorder_write(ev, zpath, "user_id", "value", bits=8, n_files=16)

    foot = files_skipped_for_range(zpath, "user_id", 10, 25)
    scan = pruning_stats(spark, zpath, "user_id BETWEEN 10 AND 25")
    assert foot["n_files"] == scan["n_files"] == 16
    # footer-based skipping can never overclaim what a scan shows, and
    # on a freshly sorted write it should match exactly
    assert foot["files_skipped"] == scan["files_skippable"]


def test_footer_stats_recurses_into_partitioned_layouts(spark, tmp_path):
    from nonconsumptive_spark.sources.layout import footer_stats

    ev = spark.read.parquet(f"{SF_MEDIUM}/events.parquet").select(
        "event_id", "user_id", "event_type")
    path = str(tmp_path / "parts")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(path)
    stats = footer_stats(path, "event_id")
    assert len(stats) >= 5                      # one+ file per type
    assert sum(s["rows"] for s in stats) == ev.count()
    assert all(s["min"] is not None for s in stats)


def test_zorder_write_preserves_null_dimension_rows(spark, tmp_path):
    rows = [(1, 5, 2.0), (2, None, 3.0), (3, 7, None), (4, None, None)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    out = str(tmp_path / "znull")
    zorder_write(df, out, "user_id", "value", bits=4, n_files=2)
    back = spark.read.parquet(out)
    assert back.count() == 4
    assert sorted(map(tuple, back.collect())) == sorted(rows)
