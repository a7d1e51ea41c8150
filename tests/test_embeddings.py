"""SRP embedding tests (F15/F16/F17): determinism, shape, bit-pack,
binary Hamming distance."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nonconsumptive_spark.functions.embeddings import (
    SRP_DIM,
    hamming_binary,
    srp_bits,
    srp_embed,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world hello"), (2, "totally different text"), (3, "")],
        ["doc_id", "text"],
    )


def test_srp_shape_and_determinism(spark):
    a = {r["doc_id"]: r["srp"] for r in srp_embed(_docs(spark), dim=64).collect()}
    b = {r["doc_id"]: r["srp"] for r in srp_embed(_docs(spark), dim=64).collect()}
    assert all(len(v) == 64 for v in a.values())
    for k in a:
        assert np.allclose(a[k], b[k])
    # empty doc -> zero vector (documented deviation from reference)
    assert np.allclose(a[3], np.zeros(64))
    # same token multiset -> same embedding; different text -> different
    assert not np.allclose(a[1], a[2])


def test_srp_arrow_matches_pandas_udf(spark):
    """The mapInArrow fast path must reproduce the pandas_udf reference
    embedding bit-for-bit (same accumulation order: rows ascending, then
    distinct tokens in np.unique's lexicographic order)."""
    from nonconsumptive_spark.functions.embeddings import srp_embed_arrow
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(60)
    ref = {r["doc_id"]: r["srp"] for r in srp_embed(docs, dim=64).collect()}
    fast = {r["doc_id"]: r["srp"] for r in srp_embed_arrow(docs, dim=64).collect()}
    assert set(ref) == set(fast)
    for k in ref:
        assert ref[k] == fast[k], k  # exact float32 equality, not allclose
    # empty/edge docs too
    e_ref = {r["doc_id"]: r["srp"] for r in srp_embed(_docs(spark), dim=32).collect()}
    e_fast = {
        r["doc_id"]: r["srp"]
        for r in srp_embed_arrow(_docs(spark), dim=32).collect()
    }
    assert e_ref == e_fast


def test_srp_default_dim(spark):
    one = srp_embed(_docs(spark).limit(1)).first()
    assert len(one["srp"]) == SRP_DIM  # 1280, reference transformations.py:147


def test_srp_bits_packing(spark):
    emb = srp_embed(_docs(spark), dim=64)
    bits = {r["doc_id"]: r["srp_bits"] for r in srp_bits(emb).collect()}
    assert all(len(v) == 8 for v in bits.values())  # 64 bits -> 8 bytes
    # recompute expected packing for doc 1
    vec = {r["doc_id"]: r["srp"] for r in emb.collect()}[1]
    expected = bytes(np.packbits((np.asarray(vec) > 0).astype(np.uint8)))
    assert bits[1] == expected


def test_hamming_binary(spark):
    df = spark.createDataFrame(
        [(bytearray(b"\x00\xff"), bytearray(b"\x0f\xff")),
         (bytearray(b"\x00\x00"), bytearray(b"\x00\x00"))],
        ["a", "b"],
    )
    got = [r["h"] for r in df.select(hamming_binary("a", "b").alias("h")).collect()]
    assert got == [4, 0]


def test_hamming_on_srp_bits(spark):
    emb = srp_bits(srp_embed(_docs(spark), dim=128))
    a = emb.select(F.col("doc_id").alias("ia"), F.col("srp_bits").alias("ba"))
    b = emb.select(F.col("doc_id").alias("ib"), F.col("srp_bits").alias("bb"))
    pairs = a.crossJoin(b).filter(F.col("ia") < F.col("ib")).select(
        "ia", "ib", hamming_binary("ba", "bb").alias("h")
    )
    rows = {(r["ia"], r["ib"]): r["h"] for r in pairs.collect()}
    assert all(0 <= v <= 128 for v in rows.values())
    # doc1 vs doc2 share no tokens: expect ~half the bits to differ
    assert 20 <= rows[(1, 2)] <= 108


# ---------------------------------------------------------------------------
class TestInt8Quantization:
    def test_reconstruction_error_bounded(self, spark):
        import numpy as np
        from nonconsumptive_spark.operators.similarity import quantized_vectors
        from tests.conftest import SF_SMALL

        emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        joined = quantized_vectors(emb).join(emb, "vec_id").collect()
        for r in joined:
            v = np.asarray(r.embedding, dtype=np.float64)
            rec = np.asarray(r.q, dtype=np.float64) * r.scale
            denom = np.linalg.norm(v)
            if denom == 0:
                assert r.scale == 0 and not rec.any()
                continue
            # worst-case per-element error is scale/2 = max|v|/254
            assert np.linalg.norm(v - rec) / denom < 0.01
            assert max(abs(q) for q in r.q) <= 127

    def test_zero_vector_quantizes_to_zero(self, spark):
        from nonconsumptive_spark.operators.similarity import quantized_vectors

        df = spark.createDataFrame(
            [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
            "vec_id long, embedding array<float>",
        )
        rows = {r.vec_id: r for r in quantized_vectors(df).collect()}
        assert rows[1].scale == 0.0 and rows[1].q == [0, 0, 0]
        assert rows[2].q[1] == -127  # max-magnitude element hits the rail

    def test_quantized_knn_recall_near_exact(self, spark):
        from pyspark.sql import functions as F
        from nonconsumptive_spark.operators import similarity as sim
        from tests.conftest import SF_SMALL

        emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 10)
        exact = {(r.query_id, r.neighbor_id)
                 for r in sim.knn_bruteforce(emb, queries, k=5).collect()}
        quant = {(r.query_id, r.neighbor_id)
                 for r in sim.knn_quantized(emb, queries, k=5).collect()}
        assert len(exact & quant) / len(exact) >= 0.9
