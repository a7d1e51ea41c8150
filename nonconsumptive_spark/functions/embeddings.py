"""SRP (stable random projection) embeddings — the reference's feature
F15/F16 (``transformations.py:134-189``, ``extensions.py:12-66``),
re-implemented deterministically and library-free.

Semantics: each distinct token hashes to a stable ±1 vector of ``dim``
entries; a document's embedding is the count-weighted sum over its tokens
(log1p-weighted variant available).  The sign bit-pack (F16) crushes the
float vector 64× into ``dim/8`` bytes for Hamming-distance search.

Execution: a Pandas UDF over Arrow batches (the sanctioned slow path —
per-token RNG work cannot be expressed with built-ins).  The per-executor
token→vector cache makes cost proportional to *distinct* tokens per batch,
mirroring the reference's SRP cache.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, FloatType

from nonconsumptive_spark.functions.text import tokenize

SRP_DIM = 1280  # reference transformations.py:147


def _token_signs(token: str, dim: int) -> np.ndarray:
    """Stable ±1 vector for a token: md5-seeded Philox stream — identical
    on every executor, every run, every machine."""
    seed = int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")
    rng = np.random.Generator(np.random.Philox(key=seed))
    return rng.integers(0, 2, size=dim, dtype=np.int8) * 2 - 1


def srp_embed(docs: DataFrame, dim: int = SRP_DIM, log_weight: bool = True,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, srp: array<float>[dim]) per document.

    Empty documents produce the zero vector (the reference emits a
    sqrt(dim) constant vector for empty text, transformations.py:163-165 —
    an artifact of its hash pipeline we do not replicate; documented
    deviation)."""

    @F.pandas_udf(ArrayType(FloatType()))
    def srp_udf(tokens: pd.Series) -> pd.Series:
        cache: dict[str, np.ndarray] = {}
        out = []
        for toks in tokens:
            acc = np.zeros(dim, dtype=np.float64)
            if toks is not None and len(toks):
                vals, counts = np.unique(np.asarray(toks, dtype=object),
                                         return_counts=True)
                w = np.log1p(counts) if log_weight else counts.astype(np.float64)
                for t, c in zip(vals, w):
                    v = cache.get(t)
                    if v is None:
                        v = _token_signs(t, dim)
                        cache[t] = v
                    acc += c * v
            out.append(acc.astype(np.float32))
        return pd.Series(out)

    return docs.select(id_col, srp_udf(tokenize(text_col)).alias("srp"))


def srp_embed_arrow(docs: DataFrame, dim: int = SRP_DIM, log_weight: bool = True,
                    id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """F15 via ``mapInArrow`` — same embedding as :func:`srp_embed`
    bit-for-bit (asserted in tests), but the Python boundary is raw Arrow
    RecordBatches: no pandas Series materialization and no pandas import
    in the worker (the measured multi-second pandas-worker cold spawn),
    and the accumulation is batch-vectorized instead of per-row.

    Per batch: flatten all token lists, one ``np.unique`` over the batch,
    count per (row, distinct-token) pair, then one ``np.add.at`` scatter
    of weight × sign-vector into the (rows × dim) accumulator.  Python
    cost scales with distinct tokens per batch, not total tokens."""
    import pyarrow as pa
    from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

    inp = docs.select(id_col, tokenize(text_col).alias("__toks"))
    out_schema = StructType(
        [inp.schema[0], StructField("srp", ArrayType(FloatType()))]
    )

    def gen(batches):
        import pyarrow.compute as pc

        cache: dict[str, np.ndarray] = {}
        for b in batches:
            ids = b.column(0)
            toks = b.column(1)
            nrows = len(b)
            lengths = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
                zero_copy_only=False
            )
            flat = pc.list_flatten(toks).to_pylist()
            acc = np.zeros((nrows, dim), dtype=np.float64)
            if flat:
                row_idx = np.repeat(np.arange(nrows), lengths)
                uniq, inv = np.unique(np.asarray(flat, dtype=object),
                                      return_inverse=True)
                for t in uniq:
                    if t not in cache:
                        cache[t] = _token_signs(t, dim)
                M = np.stack([cache[t] for t in uniq]).astype(np.float64)
                pair = row_idx.astype(np.int64) * len(uniq) + inv
                pair_ids, counts = np.unique(pair, return_counts=True)
                prow, ptok = pair_ids // len(uniq), pair_ids % len(uniq)
                w = np.log1p(counts) if log_weight else counts.astype(np.float64)
                np.add.at(acc, prow, w[:, None] * M[ptok])
            vals = pa.array(acc.astype(np.float32).ravel(), type=pa.float32())
            offs = pa.array(np.arange(nrows + 1, dtype=np.int32) * dim)
            srp = pa.ListArray.from_arrays(offs, vals)
            yield pa.RecordBatch.from_arrays([ids, srp], names=[id_col, "srp"])

    return inp.mapInArrow(gen, schema=out_schema)


def srp_bits(df: DataFrame, vec_col: str = "srp", id_col: str = "doc_id",
             keep_vec: bool = False) -> DataFrame:
    """F16: sign bit-pack — array<float>[dim] → binary[dim/8]
    (reference transformations.py:176-189: 1280 floats → 160 bytes).
    ``keep_vec=True`` carries the float vector through for invariant
    checks (bit_count(packed) == count of positive floats)."""

    @F.pandas_udf(BinaryType())
    def pack_udf(vecs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                bytes(np.packbits((np.asarray(v, dtype=np.float32) > 0).astype(np.uint8)))
                if v is not None else None
                for v in vecs
            ]
        )

    cols = [id_col, vec_col] if keep_vec else [id_col]
    return df.select(*cols, pack_udf(F.col(vec_col)).alias("srp_bits"))


def popcount_binary(c):
    """Total set bits in a BinaryType column, fully JVM-side (hex-split to
    a byte array, bit_count per byte, fold)."""
    parts = F.filter(F.split(F.hex(c), "(?<=\\G..)"), lambda h: h != F.lit(""))
    return F.aggregate(
        F.transform(parts, lambda h: F.bit_count(F.conv(h, 16, 10).cast("int"))),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def hamming_binary(a, b):
    """F17 over BinaryType columns: XOR + popcount, fully JVM-side — unpack
    bytes to an int array and fold bit_count over the pair."""
    def hex_bytes(c):
        parts = F.filter(F.split(F.hex(c), "(?<=\\G..)"), lambda h: h != F.lit(""))
        return F.transform(parts, lambda h: F.conv(h, 16, 10).cast("int"))

    ai, bi = hex_bytes(a), hex_bytes(b)
    return F.aggregate(
        F.zip_with(ai, bi, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, v: acc + v,
    )


# ---------------------------------------------------------------------------
# Int8 embedding quantization — the storage/bandwidth lever for ANN at
# scale: 4x smaller vectors (float32 -> int8 + one double scale), with
# dot products computed in integer arithmetic and rescaled afterward.
# Pure column expressions (JVM-side, codegen'd): no UDF anywhere.
# ---------------------------------------------------------------------------
def quantize_int8(vec) -> "F.Column":
    """array<float> -> struct(scale double, q array<int>): symmetric
    per-vector quantization, q_i = floor(v_i/scale + 0.5) with
    scale = max|v|/127 (explicit floor(+0.5) rounding so Spark and DuckDB
    agree bit-for-bit; engine `round()` half-way rules differ).  The zero
    vector quantizes to scale 0 with all-zero codes."""
    from nonconsumptive_spark.functions.text import _as_col, let

    v = _as_col(vec)
    # Bind the scale once: referencing the array_max aggregate inside the
    # per-element lambda would re-reduce the whole vector per element
    # (O(d^2) — the interpreted-HOF trap, see functions.text.let).
    def build(s):
        q = F.transform(
            v, lambda x: F.floor(x.cast("double") / s + F.lit(0.5)).cast("int")
        )
        return F.struct(
            s.alias("scale"),
            F.when(s > 0, q)
            .otherwise(F.transform(v, lambda x: F.lit(0))).alias("q"),
        )

    scale = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))) / F.lit(127.0)
    return let(scale, build)


def int8_dot(qa, sa, qb, sb) -> "F.Column":
    """Rescaled integer dot product: sa*sb * sum(qa_i * qb_i).  The inner
    sum stays in BIGINT (exact); only the final rescale touches doubles."""
    acc = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    return sa * sb * acc.cast("double")
