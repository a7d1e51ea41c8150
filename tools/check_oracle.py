"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB over the same
sf directory, then compares: sorted column names, row count, and the
order-insensitive multiset of row values (floats compared exactly — queries
are expected to emit pre-rounded values).

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import struct
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon_duck(t: str) -> str:
    """DuckDB type string -> engine-neutral dtype class.  The driver hashes
    raw Arrow values, so decimal128 vs int64 (the q_kcenter_select r5 bug:
    DuckDB types min() over BIGINT products as HUGEINT) or int32 vs int64
    MUST fail here even though the Python values compare equal."""
    s = t.strip().upper()
    if s.endswith("[]"):
        return f"list<{_canon_duck(s[:-2])}>"
    if s.startswith("DECIMAL") or s == "HUGEINT":
        return "dec"
    if s.startswith("STRUCT"):
        return "struct"
    if s.startswith("MAP"):
        return "map"
    if s.startswith("TIMESTAMP"):
        return "ts"
    return {
        "BIGINT": "i64", "INTEGER": "i32", "INT": "i32", "SMALLINT": "i16",
        "TINYINT": "i8", "UBIGINT": "u64", "UINTEGER": "u32",
        "DOUBLE": "f64", "FLOAT": "f32", "REAL": "f32",
        "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date", "BLOB": "bin",
    }.get(s, s.lower())


def _canon_spark(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        return f"list<{_canon_spark(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        return "struct"
    if isinstance(dt, T.MapType):
        return "map"
    if isinstance(dt, T.DecimalType):
        return "dec"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    return {
        T.LongType: "i64", T.IntegerType: "i32", T.ShortType: "i16",
        T.ByteType: "i8", T.DoubleType: "f64", T.FloatType: "f32",
        T.StringType: "str", T.BooleanType: "bool", T.DateType: "date",
        T.BinaryType: "bin",
    }.get(type(dt), dt.simpleString())


def normalize(rows, colnames):
    """Rows -> sorted list of tuples ordered by sorted column name."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_val(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            # BIT-level compare (VERDICT r3 item 2): the driver hashes raw
            # values, so -0.0 vs +0.0 and last-ulp drift MUST fail here too.
            # Queries are expected to emit pre-rounded, sign-normalized
            # doubles that are bit-identical across engines.
            return struct.pack("<d", v).hex()
        if isinstance(v, (list, tuple)):
            return tuple(norm_val(x) for x in v)
        return v

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_query(spark, con, name, q, sf_dir, verbose=True):
    t0 = time.time()
    sdf = q.spark_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    t_spark = time.time() - t0

    if q.oracle is None:
        return {"name": name, "status": "rows_only", "rows": len(s_rows),
                "spark_sec": round(t_spark, 2)}

    t0 = time.time()
    rel = con.sql(q.oracle)
    o_cols = rel.columns
    o_types = {c: _canon_duck(str(t)) for c, t in zip(o_cols, rel.types)}
    o_rows = rel.fetchall()
    t_duck = time.time() - t0

    problems = []
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns spark={sorted(s_cols)} duck={sorted(o_cols)}")
    else:
        s_types = {f.name: _canon_spark(f.dataType) for f in sdf.schema.fields}
        for c in sorted(s_cols):
            if s_types[c] != o_types[c]:
                problems.append(
                    f"dtype[{c}] spark={s_types[c]} duck={o_types[c]}")
    if len(s_rows) != len(o_rows):
        problems.append(f"rowcount spark={len(s_rows)} duck={len(o_rows)}")
    if not problems:
        ns, no = normalize(s_rows, s_cols), normalize(o_rows, o_cols)
        if ns != no:
            diff = [(a, b) for a, b in zip(ns, no) if a != b][:3]
            problems.append(f"values differ, first diffs: {diff}")
    return {
        "name": name,
        "status": "ok" if not problems else "MISMATCH",
        "rows": len(s_rows),
        "spark_sec": round(t_spark, 2),
        "duck_sec": round(t_duck, 2),
        "problems": problems,
    }


def main():
    from nonconsumptive_spark.queries import all_queries
    from nonconsumptive_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    only = [a for a in args if "/" not in a]

    spark = get_spark("oracle-check")
    con = duck_connection(sf_dir)
    qs = all_queries()
    failed = 0
    for name, q in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            res = compare_query(spark, con, name, q, sf_dir)
        except Exception as e:  # surface per-query failures, keep going
            res = {"name": name, "status": "ERROR", "problems": [str(e)[:500]]}
        line = f"{res['status']:>9}  {name:32s} rows={res.get('rows', '?'):>7} " \
               f"spark={res.get('spark_sec', '?')}s duck={res.get('duck_sec', '')}"
        print(line)
        for p in res.get("problems", []):
            print(f"           ! {p}")
            failed += 1
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
