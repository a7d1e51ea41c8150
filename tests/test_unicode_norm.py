"""normalize_unicode / strip_accents — cross-engine parity with DuckDB."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nonconsumptive_spark.functions.text import normalize_unicode, strip_accents

FIXTURE = [
    (1, "école"),              # composed é
    (2, "école"),             # combining-accent é: same NFC as row 1
    (3, "straße ﬁne"),    # ß survives NFC; ﬁ ligature survives NFC
    (4, "ＨＥＬＬＯ"),  # fullwidth HELLO (NFKC folds)
    (5, ""),
    (6, None),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(FIXTURE, "doc_id long, text string")


def _col(df, c):
    return {r.doc_id: r[c] for r in df.collect()}


def test_nfc_merges_combining_forms(docs):
    out = _col(docs.select("doc_id", normalize_unicode("text").alias("t")), "t")
    assert out[1] == out[2] == "école"
    assert out[3] == "straße ﬁne"   # NFC leaves compat chars
    assert out[5] == "" and out[6] is None


def test_nfkc_folds_compatibility_chars(docs):
    out = _col(docs.select(
        "doc_id", normalize_unicode("text", "NFKC").alias("t")), "t")
    assert out[3] == "straße fine"        # ﬁ -> fi; ß is NOT compat
    assert out[4] == "HELLO"


def test_bad_form_raises(docs):
    with pytest.raises(ValueError):
        normalize_unicode("text", "NFX")


def test_strip_accents_matches_duckdb(docs):
    got = _col(docs.select("doc_id", strip_accents("text").alias("t")), "t")
    con = duckdb.connect()
    for doc_id, text in FIXTURE:
        want = None if text is None else con.execute(
            "SELECT strip_accents(nfc_normalize(?))", [text]).fetchone()[0]
        assert got[doc_id] == want, (doc_id, text)


def test_nfc_matches_duckdb(docs):
    got = _col(docs.select("doc_id", normalize_unicode("text").alias("t")), "t")
    con = duckdb.connect()
    for doc_id, text in FIXTURE:
        want = None if text is None else con.execute(
            "SELECT nfc_normalize(?)", [text]).fetchone()[0]
        assert got[doc_id] == want, (doc_id, text)
