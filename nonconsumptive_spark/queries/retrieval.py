"""Retrieval-scoring queries: BM25 lexical ranking over the corpus."""

from __future__ import annotations

from nonconsumptive_spark.operators import retrieval as rt
from nonconsumptive_spark.queries import load, register

_BM25_TERMS = ["spark", "query", "dup"]
_BM25_K = 10

_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in sorted(_BM25_TERMS)) + ")"
_DUCK_TOKS_LOWER = (
    "list_filter(regexp_split_to_array(lower(text), '[^\\pL]+'), x -> x <> '')"
)


# --------------------------------------------------------------------------
@register(
    "q_bm25_topk",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_DUCK_TOKS_LOWER} AS t FROM documents),
    lens AS (SELECT doc_id, len(t) AS dl FROM base),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
    tf AS (
      SELECT doc_id, dl, token, count(*) AS tf
      FROM (SELECT doc_id, len(t) AS dl, unnest(t) AS token FROM base)
      WHERE token IN {_TERMS_SQL}
      GROUP BY doc_id, dl, token),
    dfs AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token),
    scored AS (
      SELECT f.doc_id,
             CAST(count(*) AS BIGINT) AS n_terms_matched,
             sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * f.tf * ({rt.K1} + 1)
                 / (f.tf + {rt.K1} * (1 - {rt.B} + {rt.B} * f.dl / s.avgdl))) AS raw
      FROM tf f JOIN dfs d USING (token) CROSS JOIN stats s
      GROUP BY f.doc_id)
    SELECT doc_id, n_terms_matched, round(raw, 4) + 0.0 AS score
    FROM scored
    ORDER BY round(raw, 6) DESC, doc_id ASC
    LIMIT {_BM25_K}
    """,
    doc=f"BM25 top-{_BM25_K} retrieval for query {_BM25_TERMS} (Lucene +1 "
        "idf variant, k1/b shared constants).  One let-bound tokenize pass "
        "yields dl and the query-term sub-array per row; only matching "
        "tokens explode, df/stats are broadcast 1-row/short aggs, and the "
        "cut is TakeOrderedAndProject on a 6-decimal score key with id "
        "tiebreak.",
)
def q_bm25_topk(spark, sf_dir):
    return rt.bm25_topk(load(spark, sf_dir, "documents"),
                        _BM25_TERMS, k=_BM25_K)


_PHRASE = ["table", "table"]
_DUCK_TOKS = "list_filter(regexp_split_to_array(text, '[^\\pL]+'), x -> x <> '')"
_PHRASE_PRED = " AND ".join(
    f"t[p+{i}] = '{w}'" if i else f"t[p] = '{w}'"
    for i, w in enumerate(_PHRASE)
)


# --------------------------------------------------------------------------
@register(
    "q_phrase_search",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    hits AS (
      SELECT doc_id,
             list_filter(range(1, greatest(len(t) - {len(_PHRASE) - 1}, 0) + 1),
                         p -> {_PHRASE_PRED}) AS a
      FROM base)
    SELECT doc_id, CAST(len(a) AS BIGINT) AS n_hits,
           CAST(a[1] AS INTEGER) AS first_pos
    FROM hits WHERE len(a) > 0
    """,
    doc=f"Exact adjacent-token phrase query {_PHRASE!r}: docs containing "
        "the phrase with occurrence count and first 1-based position.  "
        "In-row anchor scan — the phrase lives inside one document, so "
        "the plan is a ZERO-shuffle narrow map (let-bound single "
        "tokenize, candidate anchors pre-filtered on the first term); "
        "the pos-join inverted-index alternative would shuffle every "
        "matching posting.",
)
def q_phrase_search(spark, sf_dir):
    return rt.phrase_search(load(spark, sf_dir, "documents"), _PHRASE)


@register(
    "q_phrase_search_indexed",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    hits AS (
      SELECT doc_id,
             list_filter(range(1, greatest(len(t) - {len(_PHRASE) - 1}, 0) + 1),
                         p -> {_PHRASE_PRED}) AS a
      FROM base)
    SELECT doc_id, CAST(len(a) AS BIGINT) AS n_hits,
           CAST(a[1] AS INTEGER) AS first_pos
    FROM hits WHERE len(a) > 0
    """,
    doc=f"The same phrase query {_PHRASE!r} answered from the MATERIALIZED "
        "positional inverted index (term, doc, pos) — the scale path for "
        "index-once / query-many corpora: postings of each phrase term "
        "propose anchors (pos - slot) via a k-row broadcast slot join, "
        "and an anchor is a hit when all k slots voted.  Oracle is "
        "identical to q_phrase_search: both physical forms must agree "
        "exactly.",
)
def q_phrase_search_indexed(spark, sf_dir):
    idx = rt.build_positional_index(load(spark, sf_dir, "documents"))
    return rt.phrase_search_indexed(idx, _PHRASE)


_SPAN_TERMS = ["spark", "join", "filter"]
_SPAN_K = len(_SPAN_TERMS)
_SPAN_MS = "flatten([" + ", ".join(
    f"list_transform(list_filter(range(1, len(t) + 1), p -> t[p] = '{w}'),"
    f" p -> {{'pos': p, 'slot': {i}}})"
    for i, w in enumerate(_SPAN_TERMS)
) + "])"


@register(
    "q_min_span_proximity",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    mm AS (SELECT doc_id, unnest({_SPAN_MS}) AS u FROM base),
    m AS (SELECT doc_id, u.pos AS pos, u.slot AS slot FROM mm),
    lasts AS (
      SELECT e.doc_id, e.pos AS epos, x.slot, max(x.pos) AS last
      FROM m e JOIN m x ON x.doc_id = e.doc_id AND x.pos <= e.pos
      GROUP BY 1, 2, 3),
    spans AS (
      SELECT doc_id, epos, CAST(epos - min(last) + 1 AS INTEGER) AS span
      FROM lasts GROUP BY doc_id, epos HAVING count(*) = {_SPAN_K}),
    agg AS (SELECT doc_id, min(span) AS span FROM spans GROUP BY doc_id),
    nm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
           FROM m GROUP BY doc_id)
    SELECT a.doc_id, a.span, nm.n_matches FROM agg a JOIN nm USING (doc_id)
    """,
    doc=f"Minimal window span containing ALL of {_SPAN_TERMS} per document "
        "— the proximity-ranking primitive (span == k means adjacent in "
        "some order).  Spark runs the classic one-pass sweep as an in-row "
        "aggregate fold (zero shuffle, O(len) per doc, k-slot accumulator "
        "unrolled at plan time); the oracle is the quadratic last-"
        "position-per-slot reformulation of the same sweep, exact at "
        "oracle scale.",
)
def q_min_span_proximity(spark, sf_dir):
    return rt.min_span_proximity(load(spark, sf_dir, "documents"),
                                 _SPAN_TERMS)
