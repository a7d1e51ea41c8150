"""Driver-grade oracle parity on ADVERSARIAL text the ASCII fixtures never
exercise: CJK, accented Latin, RTL Arabic, emoji, empty, NULL,
whitespace-only, and case/ligature oddities.  This is the probe that
caught the size(NULL) = -1 vs NULL divergence in four registered
queries (fixed by the NULL-text-counts-as-empty coalesce on both
engines)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nonconsumptive_spark.queries import Query, all_queries
from nonconsumptive_spark.queries.r5_staging import STAGED
from tools.check_oracle import compare_query, duck_connection

ROWS = [
    (0, "你好 世界 你好 世界 这 是 一个 测试 文档", "zh", "cjk", 20),
    (1, "café déjà vu naïve café résumé déjà", "fr", "latin", 35),
    (2, "مرحبا بالعالم هذا اختبار", "ar", "rtl", 24),
    (3, "hello 🙂 world 🚀 emoji only 🎉 here", "en", "emoji", 33),
    (4, "", "en", "empty", 0),
    (5, None, "en", "null", 0),
    (6, "   \t  \n  ", "en", "ws", 9),
    (7, "MiXeD CaSe ÅÄÖ ß ǅ ﬁ ligatures", "de", "mixed", 30),
]

# documents-only queries whose tokenization / counting / hashing paths
# could drift on non-ASCII or NULL text
QUERIES = [
    "q_document_lengths",
    "q_token_count_ws",
    "q_quality_score",
    "q_lang_id",
    "q_fingerprint",
    "q_code_score",
    "q_phrase_search",
    "q_min_span_proximity",
    "q_lexical_cohesion",
    "q_dedup_exact",
    "q_char_diversity",
    "q_strip_markup",
    "q_sentence_stats",
]


@pytest.fixture(scope="module")
def uni_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("uni")
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in ROWS], pa.int64()),
        "text": pa.array([r[1] for r in ROWS], pa.string()),
        "lang": pa.array([r[2] for r in ROWS], pa.string()),
        "source": pa.array([r[3] for r in ROWS], pa.string()),
        "n_chars": pa.array([r[4] for r in ROWS], pa.int64()),
    })
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def uni_duck(uni_dir):
    return duck_connection(uni_dir)


@pytest.mark.parametrize("name", QUERIES)
def test_unicode_oracle_parity(spark, uni_dir, uni_duck, name):
    reg = all_queries()
    q = reg.get(name) or Query(name, STAGED[name][0], STAGED[name][1])
    res = compare_query(spark, uni_duck, name, q, uni_dir)
    assert res["status"] == "ok", res
