"""Multi-dimensional data layout: Z-order (Morton) clustering for
file-level min/max pruning.

The reference organizes data one-dimensionally (sorted bookstacks,
``@id``-ordered batches — data_storage.py's stacked parquet).  At 100 TB a
single sort key only prunes scans filtered on THAT key; queries filtering
on a second dimension read everything.  The standard warehouse answer
(Delta/Iceberg ``OPTIMIZE ZORDER BY``) is to sort by an interleaved-bit
Morton code so that a range predicate on EITHER dimension maps to a
bounded set of Z-ranges — parquet footer min/max stats then skip most
files for 2-D box queries.

Spark-first shape: the Z-value is a pure Catalyst expression (a flat
unrolled shift/mask sum — no UDF, no HOF lambda, stays inside whole-stage
codegen), quantization bounds come from a broadcast 1-row agg, and the
layout itself is ``repartitionByRange(z)`` + per-file sort, i.e. one
range-exchange at write time buys every later scan its pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 8


def interleave_bits(x: Column | str, y: Column | str,
                    bits: int = DEFAULT_BITS) -> Column:
    """Morton code of two non-negative integer columns already quantized
    to ``bits`` bits: bit i of x lands at position 2i, bit i of y at
    2i+1.  ``bits`` is a plan-time constant, so the fold UNROLLS into a
    flat sum of literal-count shift expressions — higher-order-function
    lambdas evaluate interpreted per element, while this stays inside
    whole-stage codegen (and shiftleft/shiftright take literal counts
    anyway)."""
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
             + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z.cast("long")


def quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Linear quantization of ``col`` from [lo, hi] onto [0, 2^bits - 1]
    (degenerate lo == hi maps to 0)."""
    buckets = F.lit((1 << bits) - 1)
    return F.when(hi > lo, F.least(
        F.floor((col - lo) / (hi - lo) * (buckets + 1)).cast("long"),
        buckets.cast("long"),
    )).otherwise(F.lit(0).cast("long"))


def zorder_write(df: DataFrame, path: str, xcol: str, ycol: str,
                 bits: int = DEFAULT_BITS, n_files: int = 16) -> None:
    """Write ``df`` as parquet laid out in Z-order over (xcol, ycol):
    quantize both dims against their observed min/max (broadcast 1-row
    agg), compute the Morton code, ``repartitionByRange`` into
    ``n_files`` Z-contiguous files and sort within each so parquet
    min/max footers are tight on BOTH source columns."""
    bounds = df.agg(
        F.min(xcol).alias("xlo"), F.max(xcol).alias("xhi"),
        F.min(ycol).alias("ylo"), F.max(ycol).alias("yhi"),
    )
    with_z = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_zx", quantize(F.col(xcol).cast("double"),
                                    F.col("xlo").cast("double"),
                                    F.col("xhi").cast("double"), bits))
        .withColumn("_zy", quantize(F.col(ycol).cast("double"),
                                    F.col("ylo").cast("double"),
                                    F.col("yhi").cast("double"), bits))
        .withColumn("_z", interleave_bits("_zx", "_zy", bits))
        .drop("xlo", "xhi", "ylo", "yhi", "_zx", "_zy")
    )
    (
        with_z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite").parquet(path)
    )


def pruning_stats(spark, path: str, predicate: str) -> dict:
    """How selective is the layout for ``predicate``?  Returns per-file
    match counts — a file whose count is 0 would be skipped entirely by
    parquet min/max pruning (the write-side sort is what makes those
    zeros common)."""
    df = spark.read.parquet(path).withColumn(
        "_file", F.element_at(F.split(F.input_file_name(), "/"), -1))
    per_file = (
        df.groupBy("_file")
        .agg(F.count("*").alias("rows"),
             F.count(F.when(F.expr(predicate), 1)).alias("matching"))
        .collect()  # bounded: one row per file
    )
    return {
        "n_files": len(per_file),
        "files_skippable": sum(1 for r in per_file if r["matching"] == 0),
        "rows_total": sum(r["rows"] for r in per_file),
        "rows_matching": sum(r["matching"] for r in per_file),
    }


def compact_files(spark, src: str, dst: str, target_rows: int,
                  order_col: str | None = None) -> dict:
    """Small-files compaction: rewrite a parquet directory into
    ``ceil(n / target_rows)`` files of ~target_rows each — the
    OPTIMIZE-compaction half of layout maintenance (many tiny files
    per-task overhead + footer reads dominate scans at scale).

    With ``order_col`` the rewrite is range-partitioned and sorted on it,
    so compaction PRESERVES (or installs) a clusterable layout instead of
    destroying min/max locality the way a plain coalesce would.  Returns
    {files_before, files_after, rows}."""
    import math

    df = spark.read.parquet(src)
    files_before = df.select(F.input_file_name()).distinct().count()
    rows = df.count()  # one scan; drives the file budget
    n_files = max(1, math.ceil(rows / target_rows))
    if order_col is not None:
        out = (df.repartitionByRange(n_files, order_col)
                 .sortWithinPartitions(order_col))
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst)
    files_after = (
        spark.read.parquet(dst).select(F.input_file_name()).distinct().count()
    )
    return {"files_before": files_before, "files_after": files_after,
            "rows": rows}


def footer_stats(path: str, col: str) -> list[dict]:
    """Per-file parquet footer min/max for ``col`` — read driver-side from
    the metadata via pyarrow, NO data scan.  This is the same statistic
    Spark's reader consults for row-group skipping, so it measures
    skippability the way the engine actually decides it (pruning_stats
    measures it by scanning, which is only an upper bound argument)."""
    from pathlib import Path as _P

    import pyarrow.parquet as pq

    out = []
    for f in sorted(_P(path).rglob("*.parquet")):  # recurse: hive layouts
        md = pq.ParquetFile(str(f)).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                column = md.row_group(rg).column(ci)
                if column.path_in_schema != col or column.statistics is None:
                    continue
                st = column.statistics
                if st.has_min_max:
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
        out.append({"file": str(f.relative_to(path)), "min": lo,
                    "max": hi, "rows": md.num_rows})
    return out


def files_skipped_for_range(path: str, col: str, lo, hi) -> dict:
    """How many files a [lo, hi] range predicate skips on footer stats
    alone (a file is skipped when its [min, max] misses the range)."""
    stats = footer_stats(path, col)
    skipped = sum(
        1 for s in stats
        if s["min"] is not None and (s["max"] < lo or s["min"] > hi)
    )
    return {"n_files": len(stats), "files_skipped": skipped}
