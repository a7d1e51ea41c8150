"""compression_ratio: zlib compressibility as a curation signal."""

from __future__ import annotations

import zlib

import pytest

from nonconsumptive_spark.operators.textstats import compression_ratio

def _rand_text() -> str:
    """Deterministic high-entropy text (sha256 chain, b85-encoded)."""
    import base64
    import hashlib

    h, out = b"", b""
    for i in range(20):
        h = hashlib.sha256(h + bytes([i])).digest()
        out += h
    return base64.b85encode(out).decode()


_WORDS = ["alpha", "bridge", "candle", "delta", "ember", "forest",
          "glacier", "harbor", "island", "jungle", "kernel", "lantern",
          "meadow", "nectar", "orchid", "prairie"]

ROWS = [
    (1, "spam spam spam " * 200),                       # pure boilerplate
    (2, " ".join(_WORDS[(i * 7 + 3) % 16] + ("s" if i % 3 else "")
                 for i in range(300))),                 # word soup: mid
    (3, _rand_text()),                                  # high entropy
    (4, ""),
    (5, None),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def _by_id(df):
    return {r.doc_id: r for r in df.collect()}


def test_exact_python_parity(docs):
    got = _by_id(compression_ratio(docs))
    for doc_id, text in ROWS:
        r = got[doc_id]
        if text is None:
            assert r.n_bytes is None and r.ratio is None
            continue
        raw = text.encode("utf-8")
        assert r.n_bytes == len(raw)
        assert r.comp_bytes == len(zlib.compress(raw, 6))
        if raw:
            assert r.ratio == round(len(zlib.compress(raw, 6)) / len(raw), 4)
        else:
            assert r.ratio is None


def test_signal_orders_as_expected(docs):
    got = _by_id(compression_ratio(docs))
    assert got[1].ratio < got[2].ratio < got[3].ratio


def test_zero_shuffle_plan(docs):
    plan = compression_ratio(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan        # vectorized, not row-at-a-time
