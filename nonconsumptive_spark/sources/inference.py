"""Schema inference: the reference's ``Column.best_form`` precedence ladder
(reference ``nonconsumptive/catalog.py:456-493``), as one distributed pass.

Ladder (first match wins):
  1. identifier column → string, renamed ``@id``
  2. smallest integer type that casts cleanly (catalog.py:335-348)
  3. float  (catalog.py:467-470; reference uses float32 — we keep double
     for SQL fidelity and note the narrowing option)
  4. date — native temporal cast, else parse yyyy-MM-dd if >95% of non-null
     values regex-match a date (catalog.py:351-368)
  5. frequency-ordered dictionary if distinct/total < 0.5
     (catalog.py:481-489); code width from cardinality (catalog.py:506-513)
  6. fallback: raw string

Spark-first design: all per-column statistics (cast-success rates, date
votes, cardinalities) are computed in ONE ``agg`` over the raw frame — a
single scan regardless of column count — instead of the reference's
per-column Arrow passes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DATE_RE = r"^\d{4}-\d{2}-\d{2}$"
DATE_VOTE_THRESHOLD = 0.95  # reference catalog.py:363-364
DICT_RATIO = 0.5  # reference catalog.py:481-489

ID_CANDIDATES = ("@id", "id", "filename")  # reference catalog.py:525-535

_INT_LADDER = [
    ("tinyint", -(2 ** 7), 2 ** 7 - 1),
    ("smallint", -(2 ** 15), 2 ** 15 - 1),
    ("int", -(2 ** 31), 2 ** 31 - 1),
    ("bigint", -(2 ** 63), 2 ** 63 - 1),
]


@dataclass
class ColumnPlan:
    name: str
    target: str  # spark sql type name, or 'dict' / 'date-parse'
    is_id: bool = False
    dict_code_type: str | None = None
    stats: dict = field(default_factory=dict)

    def __repr__(self):  # compact for tests/logs
        extra = f" dict[{self.dict_code_type}]" if self.target == "dict" else ""
        return f"<{self.name}:{self.target}{extra}{' @id' if self.is_id else ''}>"


def detect_id_field(columns: list[str], explicit: str | None = None) -> str | None:
    """First of @id/id/filename, first-column preference
    (reference catalog.py:525-535)."""
    if explicit:
        return explicit
    if columns and columns[0] in ID_CANDIDATES:
        return columns[0]
    for cand in ID_CANDIDATES:
        if cand in columns:
            return cand
    return None


def infer_column_plans(raw: DataFrame, id_field: str | None = None,
                       exclude: tuple[str, ...] = ()) -> list[ColumnPlan]:
    """One aggregation pass over string-typed raw data → a ColumnPlan per
    column.  Non-string raw columns (already typed by the source reader)
    keep their type."""
    cols = [c for c in raw.columns if c not in exclude]
    id_col = detect_id_field(cols, id_field)
    dtypes = dict(raw.dtypes)

    # Build the single statistics pass for string columns.
    aggs = [F.count(F.lit(1)).alias("__n")]
    string_cols = [c for c in cols if dtypes[c] == "string" and c != id_col]
    for c in string_cols:
        qc = f"`{c}`"
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nonnull"),
            F.count(F.expr(f"try_cast({qc} AS bigint)")).alias(f"{c}__int_ok"),
            F.min(F.expr(f"try_cast({qc} AS bigint)")).alias(f"{c}__int_min"),
            F.max(F.expr(f"try_cast({qc} AS bigint)")).alias(f"{c}__int_max"),
            F.count(F.expr(f"try_cast({qc} AS double)")).alias(f"{c}__dbl_ok"),
            F.avg(F.col(c).rlike(DATE_RE).cast("int")).alias(f"{c}__date_vote"),
            F.approx_count_distinct(c).alias(f"{c}__approx_nd"),
        ]
    stats = raw.agg(*aggs).first().asDict()
    n = stats["__n"]

    plans: list[ColumnPlan] = []
    for c in cols:
        if c == id_col:
            plans.append(ColumnPlan(c, "string", is_id=True))
            continue
        dt = dtypes[c]
        if dt != "string":
            # Source already delivered a concrete type (parquet/json numeric,
            # arrays, ...) — keep it; reference trusts Arrow types likewise.
            plans.append(ColumnPlan(c, dt))
            continue
        nonnull = stats[f"{c}__nonnull"]
        if nonnull == 0:
            plans.append(ColumnPlan(c, "string"))
            continue
        # 2. integer ladder
        if stats[f"{c}__int_ok"] == nonnull:
            lo, hi = stats[f"{c}__int_min"], stats[f"{c}__int_max"]
            for t, tmin, tmax in _INT_LADDER:
                if lo >= tmin and hi <= tmax:
                    plans.append(ColumnPlan(c, t))
                    break
            continue
        # 3. float
        if stats[f"{c}__dbl_ok"] == nonnull:
            plans.append(ColumnPlan(c, "double"))
            continue
        # 4. date vote
        if (stats[f"{c}__date_vote"] or 0.0) >= DATE_VOTE_THRESHOLD:
            plans.append(ColumnPlan(c, "date-parse"))
            continue
        # 5. frequency dictionary
        nd = stats[f"{c}__approx_nd"]
        if n > 0 and nd / n < DICT_RATIO:
            code_t = "tinyint" if nd < 2 ** 7 else ("smallint" if nd < 2 ** 15 else "int")
            plans.append(ColumnPlan(c, "dict", dict_code_type=code_t,
                                    stats={"approx_distinct": nd}))
            continue
        # 6. fallback
        plans.append(ColumnPlan(c, "string"))
    return plans


def build_dictionary(raw: DataFrame, col: str, code_type: str = "int",
                     cap: int | None = None) -> DataFrame:
    """Frequency-ordered dictionary dim table (value, code) — count desc,
    value asc tie-break (reference catalog.py:375-402 plus our determinism
    fix, SURVEY §7 hard-point 2).

    Small-code dictionaries (tinyint/smallint — ≤32k codes by the width
    rule, reference catalog.py:506-513) rank with the bounded
    ``orderBy().limit(cap)`` + window pattern.  Wide (int) dictionaries can
    legitimately hold 10⁸+ distinct values, where any single-partition
    window is a scale bug — they take the per-partition-offset dense-id
    path (``assign_dense_ids``) instead: range-partition by the sort key,
    local row numbers, driver-side offset add.  Both paths produce the
    identical deterministic assignment."""
    from pyspark.sql.window import Window

    from nonconsumptive_spark.sources.readers import assign_dense_ids

    counts = raw.groupBy(col).agg(F.count(F.lit(1)).alias("__n"))
    if cap is None:
        cap = {"tinyint": 2 ** 7, "smallint": 2 ** 15}.get(code_type)
    if cap is not None:
        top = counts.orderBy(F.desc("__n"), F.asc(col)).limit(cap)
        w = Window.orderBy(F.desc("__n"), F.asc(col))
        return top.select(
            F.col(col).alias("value"),
            (F.row_number().over(w) - 1).cast(code_type).alias("code"),
        )
    coded = assign_dense_ids(
        counts.withColumn("__neg", -F.col("__n")), ["__neg", col], id_name="code"
    )
    return coded.select(
        F.col(col).alias("value"), F.col("code").cast(code_type).alias("code")
    )


def apply_plans(raw: DataFrame, plans: list[ColumnPlan],
                dicts: dict[str, DataFrame] | None = None) -> DataFrame:
    """Materialize the inferred schema.  Dictionary columns become
    ``{name}__code`` int columns via broadcast joins against their dims
    (built here unless supplied); the original string column is kept too
    (the flat-catalog export splits them, reference metadata.py:148-151)."""
    dicts = dict(dicts or {})
    out = raw
    for p in plans:
        if p.is_id:
            out = out.withColumn(p.name, F.col(p.name).cast("string"))
            if p.name != "@id":
                out = out.withColumnRenamed(p.name, "@id")
        elif p.target == "date-parse":
            out = out.withColumn(p.name, F.to_date(p.name, "yyyy-MM-dd"))
        elif p.target == "dict":
            dim = dicts.get(p.name)
            if dim is None:
                dim = build_dictionary(raw, p.name, p.dict_code_type or "int")
                dicts[p.name] = dim
            probe = dim.select(
                F.col("value").alias(p.name), F.col("code").alias(f"{p.name}__code")
            )
            out = out.join(F.broadcast(probe), p.name, "left")
        elif p.target != dict(raw.dtypes)[p.name]:
            out = out.withColumn(p.name, F.col(p.name).cast(p.target))
    return out


# reference catalog.py:408-418
QUANTILE_POINTS = [0.0, 0.005, 0.05, 0.25, 0.5, 0.75, 0.95, 0.995, 1.0]
TOP_VALUES_K = 10  # reference catalog.py:426-427


def field_metadata(df: DataFrame, plans: list[ColumnPlan],
                   top_k: int = TOP_VALUES_K) -> dict[str, dict]:
    """Per-field statistics persisted with the catalog (reference
    catalog.py:420-428): quantiles at the reference's nine points for
    numeric columns, min/max for dates, top-K most frequent values for
    dictionary columns.

    Cost: ONE aggregation scan for every quantile/min-max column, plus one
    tiny top-k job per dictionary column (catalog-sized inputs; each is a
    TakeOrderedAndProject)."""
    numeric = {"tinyint", "smallint", "int", "bigint", "float", "double"}
    aggs, meta = [], {}
    for p in plans:
        if p.target in numeric:
            aggs.append(
                F.percentile_approx(p.name, QUANTILE_POINTS, 10_000)
                .alias(f"{p.name}__q")
            )
        elif p.target in ("date", "date-parse"):
            c = F.to_date(p.name, "yyyy-MM-dd") if p.target == "date-parse" else F.col(p.name)
            aggs += [F.min(c).alias(f"{p.name}__min"), F.max(c).alias(f"{p.name}__max")]
    row = df.agg(*aggs).first().asDict() if aggs else {}
    for p in plans:
        if f"{p.name}__q" in row and row[f"{p.name}__q"] is not None:
            meta[p.name] = {
                "quantiles": [
                    {"q": q, "value": v}
                    for q, v in zip(QUANTILE_POINTS, row[f"{p.name}__q"])
                ]
            }
        elif f"{p.name}__min" in row:
            meta[p.name] = {
                "min": str(row[f"{p.name}__min"]),
                "max": str(row[f"{p.name}__max"]),
            }
        elif p.target == "dict":
            top = (
                df.groupBy(p.name).agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.desc("n"), F.asc(p.name))
                .limit(top_k)
                .collect()
            )
            meta[p.name] = {
                "top_values": [{"value": r[p.name], "count": r["n"]} for r in top]
            }
    return meta


def check_unique_ids(df: DataFrame, id_col: str = "@id") -> None:
    """Duplicate ids are a hard error (reference catalog.py:248-250)."""
    dup = (
        df.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(f"duplicate id value {dup[0][0]!r} in column {id_col}")
