"""Export sinks (SURVEY §2.1 S9-S13).

S10  per-stack parquet export: metadata ⋈ transform columns, one file tree
     partitioned by ``stack`` (reference bookstack.py:71-80, writers.py:5-30)
S11  flat/normalized catalog: 1NF split into `catalog` (strings),
     `fastcat` (ints/dates/dict codes), per-list-column child tables keyed
     by nc:id, and `{name}Lookup` dimension tables
     (reference metadata.py:112-182)
S12  @id → nc:id index export (obsolete as an index; kept as a 2-column
     parquet for interop, reference data_storage.py:20-78)
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STRINGY = ("string",)
_FAST = ("tinyint", "smallint", "int", "bigint", "float", "double", "date",
         "timestamp", "boolean")


def export_stacked(df: DataFrame, out_dir: str | Path,
                   compression: str = "zstd") -> None:
    """S10: write partitioned by ``stack`` (files co-located per bookstack;
    downstream readers prune on the partition column)."""
    (
        df.write.mode("overwrite")
        .option("compression", compression)
        .partitionBy("stack")
        .parquet(str(out_dir))
    )


def flat_catalog(catalog: DataFrame, with_pos: bool = False) -> dict[str, DataFrame]:
    """S11: split one wide catalog into the reference's normalized family.

    Returns {"catalog": strings+ids, "fastcat": numerics/dates/codes,
    "<col>": exploded child table per array column,
    "<col>Lookup": dimension table per dictionary column}.
    All tables key on nc:id; lookups key on code.

    ``with_pos=True`` adds a 0-based ``pos`` column to each child table —
    the saved offsets that make the F14 re-nest (``renest_lists``) an exact
    inverse (reference catalog.py:430-442 keeps offsets the same way)."""
    dtypes = dict(catalog.dtypes)
    id_cols = [c for c in ("nc:id", "@id") if c in dtypes]
    out: dict[str, DataFrame] = {}

    code_cols = [c for c in dtypes if c.endswith("__code")]
    str_cols = [
        c for c in dtypes
        if dtypes[c] in _STRINGY and c not in id_cols and not c.endswith("__code")
    ]
    # dictionary-encoded source columns live in lookups, not in `catalog`
    dict_sources = {c[: -len("__code")] for c in code_cols}
    str_cols = [c for c in str_cols if c not in dict_sources]
    fast_cols = [
        c for c in dtypes
        if (dtypes[c] in _FAST and c not in id_cols) or c in code_cols
    ]
    list_cols = [c for c in dtypes if dtypes[c].startswith("array<")]

    nc_id = [c for c in ("nc:id",) if c in dtypes]
    out["catalog"] = catalog.select(*id_cols, *sorted(set(str_cols) - set(fast_cols)))
    out["fastcat"] = catalog.select(*nc_id, *sorted(set(fast_cols) - set(list_cols)))
    for c in list_cols:
        # strip ONE plural suffix ('keywords' -> 'keyword'); rstrip("s")
        # would remove every trailing 's' ('witness' -> 'witne')
        value = c[:-1] if c.endswith("s") and len(c) > 1 else c
        if with_pos:
            out[c] = catalog.select(
                *nc_id, F.posexplode(c).alias("pos", value)
            )
        else:
            out[c] = catalog.select(*nc_id, F.explode(c).alias(value))
    for src in sorted(dict_sources):
        out[f"{src}Lookup"] = (
            catalog.select(F.col(f"{src}__code").alias("code"), F.col(src).alias(src))
            .distinct()
            .orderBy("code")
        )
    return out


def renest_lists(child: DataFrame, id_col: str, value_col: str,
                 pos_col: str = "pos", out_col: str | None = None) -> DataFrame:
    """F14: reconstruct an array column from an exploded child table — the
    inverse of the ``with_pos`` explode above (reference catalog.py:430-442,
    ``ListArray.from_arrays(offsets, values)``).

    ``collect_list`` order is nondeterministic after a shuffle, so elements
    are collected as (pos, value) structs and ``array_sort``-ed before the
    positions are stripped — deterministic regardless of partitioning.
    Scale note: one hash agg on the parent key; each output row is one
    document's list (bounded by max list length, not table size)."""
    out_col = out_col or value_col + "s"
    pairs = F.collect_list(
        F.struct(F.col(pos_col).alias("p"), F.col(value_col).alias("v"))
    )
    return child.groupBy(id_col).agg(
        F.transform(F.array_sort(pairs), lambda s: s["v"]).alias(out_col)
    )


def export_flat_catalog(catalog: DataFrame, out_dir: str | Path,
                        compression: str = "zstd") -> list[str]:
    """Write the whole normalized family; returns table names written."""
    out = flat_catalog(catalog)
    for name, df in out.items():
        (
            df.write.mode("overwrite")
            .option("compression", compression)
            .parquet(str(Path(out_dir) / name))
        )
    return sorted(out)


def export_id_index(catalog: DataFrame, out_dir: str | Path) -> None:
    """S12: the @id → nc:id mapping as plain parquet."""
    catalog.select("@id", "nc:id").write.mode("overwrite").parquet(str(out_dir))


NC_VERSION = "nonconsumptive-spark/0.2"  # table stamp, reference catalog.py:259-260


def export_catalog(catalog: DataFrame, out_dir: str | Path,
                   field_meta: dict[str, dict] | None = None,
                   compression: str = "zstd") -> None:
    """Catalog export with persisted field statistics (reference
    catalog.py:420-428 stores quantiles/top-values as Arrow field metadata
    plus a `nonconsumptive` table stamp).

    Spark renders this two ways at once: each field's stats go into its
    ``StructField.metadata`` (serialized into the parquet footer's Spark
    schema and restored by any Spark reader), and the whole map goes into
    a ``_nc_fields.json`` sidecar next to the data for non-Spark
    consumers."""
    import json

    df = catalog
    for c, m in (field_meta or {}).items():
        if c in df.columns:
            df = df.withMetadata(c, {"nonconsumptive": m})
    (
        df.write.mode("overwrite")
        .option("compression", compression)
        .parquet(str(out_dir))
    )
    sidecar = Path(out_dir) / "_nc_fields.json"
    sidecar.write_text(
        json.dumps(
            {"nonconsumptive": NC_VERSION, "fields": field_meta or {}},
            indent=2, ensure_ascii=False, default=str,
        )
    )
