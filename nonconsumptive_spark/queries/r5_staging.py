"""Round-5 registration staging: (spark_fn, oracle_sql) pairs for the
operators the backlog governor kept out of the registry this round.

NOT imported by ``queries/__init__`` — the driver never sees these until
they are promoted — but continuously verified against DuckDB by
``tests/test_r5_staging.py`` with the exact compare the driver gate
uses, so promotion in round 5 is a mechanical move:

  1. re-home each entry into its topic module with ``@register``,
  2. add the names to PRIORITY (head: freshest first),
  3. delete this module + its test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nonconsumptive_spark.queries import load

_DUCK_TOKS = "list_filter(regexp_split_to_array(text, '[^\\pL]+'), x -> x <> '')"

STAGED: dict[str, tuple] = {}


def _stage(name: str, oracle: str):
    def deco(fn):
        STAGED[name] = (fn, oracle)
        return fn

    return deco


# -- multi-phrase blocklist over the positional index ----------------------
_BL = [["table", "table"], ["slow", "scan"], ["merge"]]


def _bl_cte(pid: int, phrase: list[str]) -> str:
    pred = " AND ".join(
        f"t[p+{i}] = '{w}'" if i else f"t[p] = '{w}'"
        for i, w in enumerate(phrase)
    )
    return f"""
    SELECT doc_id, {pid} AS phrase_id, CAST(len(a) AS BIGINT) AS n_hits,
           CAST(a[1] AS INTEGER) AS first_pos
    FROM (
      SELECT doc_id,
             list_filter(range(1, greatest(len(t) - {len(phrase) - 1}, 0) + 1),
                         p -> {pred}) AS a
      FROM base)
    WHERE len(a) > 0"""


@_stage(
    "q_blocklist_match",
    f"""
    WITH base AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents)
    {" UNION ALL ".join(_bl_cte(i, p) for i, p in enumerate(_BL))}
    """,
)
def q_blocklist_match(spark, sf_dir):
    from nonconsumptive_spark.operators.retrieval import (
        blocklist_match,
        build_positional_index,
    )

    idx = build_positional_index(load(spark, sf_dir, "documents"))
    return blocklist_match(idx, _BL)


# -- postings delta-varint storage accounting -------------------------------
@_stage(
    "q_postings_size_stats",
    f"""
    WITH base AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    post AS (
      SELECT doc_id, t[p] AS term, p AS pos
      FROM base, unnest(range(1, len(t) + 1)) AS r(p)),
    per_doc AS (
      SELECT term, doc_id, list_sort(list(CAST(pos AS BIGINT))) AS ps
      FROM post GROUP BY term, doc_id),
    folded AS (
      SELECT term, len(ps) AS n,
             (SELECT sum((length(bin(d)) - 1) // 7 + 1)
              FROM unnest(list_transform(
                     range(1, len(ps) + 1),
                     i -> ps[i] - CASE WHEN i = 1 THEN 0
                                       ELSE ps[i - 1] END)) AS u(d)) AS vb
      FROM per_doc)
    SELECT term, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS n_postings,
           CAST(sum(vb) AS BIGINT) AS varint_bytes,
           CAST(sum(n) * 4 AS BIGINT) AS fixed_bytes,
           round(CAST(sum(vb) AS DOUBLE) / (sum(n) * 4.0), 4) + 0.0 AS ratio
    FROM folded GROUP BY term
    """,
)
def q_postings_size_stats(spark, sf_dir):
    from nonconsumptive_spark.operators.retrieval import (
        build_positional_index,
        postings_size_stats,
    )

    return postings_size_stats(
        build_positional_index(load(spark, sf_dir, "documents")))


# -- indexed min-span: the SAME oracle as q_min_span_proximity -------------
_SPAN_TERMS = ["spark", "join", "filter"]
_SPAN_MS = "flatten([" + ", ".join(
    f"list_transform(list_filter(range(1, len(t) + 1), p -> t[p] = '{w}'),"
    f" p -> {{'pos': p, 'slot': {i}}})"
    for i, w in enumerate(_SPAN_TERMS)
) + "])"


@_stage(
    "q_min_span_indexed",
    f"""
    WITH base AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    mm AS (SELECT doc_id, unnest({_SPAN_MS}) AS u FROM base),
    m AS (SELECT doc_id, u.pos AS pos, u.slot AS slot FROM mm),
    lasts AS (
      SELECT e.doc_id, e.pos AS epos, x.slot, max(x.pos) AS last
      FROM m e JOIN m x ON x.doc_id = e.doc_id AND x.pos <= e.pos
      GROUP BY 1, 2, 3),
    spans AS (
      SELECT doc_id, epos, CAST(epos - min(last) + 1 AS INTEGER) AS span
      FROM lasts GROUP BY doc_id, epos HAVING count(*) = {len(_SPAN_TERMS)}),
    agg AS (SELECT doc_id, min(span) AS span FROM spans GROUP BY doc_id),
    nm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
           FROM m GROUP BY doc_id)
    SELECT a.doc_id, a.span, nm.n_matches FROM agg a JOIN nm USING (doc_id)
    """,
)
def q_min_span_indexed(spark, sf_dir):
    from nonconsumptive_spark.operators.retrieval import (
        build_positional_index,
        min_span_proximity_indexed,
    )

    idx = build_positional_index(load(spark, sf_dir, "documents"))
    return min_span_proximity_indexed(idx, _SPAN_TERMS)


# -- per-source percentile quality thresholding ------------------------------
_PF_P, _PF_Q = 3, 10  # keep_frac = 0.3 as the exact rational


@_stage(
    "q_percentile_filter",
    f"""
    WITH scored AS (
      SELECT source, doc_id, CAST(n_chars AS BIGINT) AS score
      FROM documents),
    rk AS (
      SELECT source, doc_id, score,
             row_number() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id ASC) AS rk,
             count(*) OVER (PARTITION BY source) AS n
      FROM scored)
    SELECT source, doc_id, score
    -- (p*n + q - 1) // q: ceil under BOTH floor and truncating division
    -- (DuckDB // truncates toward zero; Spark floor() floors)
    FROM rk WHERE rk <= (3 * n + 10 - 1) // 10
    """,
)
def q_percentile_filter(spark, sf_dir):
    from nonconsumptive_spark.operators.textstats import (
        percentile_filter_by_group,
    )

    docs = load(spark, sf_dir, "documents").select(
        "source", "doc_id", F.col("n_chars").cast("long").alias("score"))
    return percentile_filter_by_group(docs, "source", "score",
                                      _PF_P / _PF_Q)


# -- unicode normalization (accents injected in SQL on both sides) ---------
@_stage(
    "q_normalize_unicode",
    """
    SELECT doc_id,
           nfc_normalize(replace(text, 'a', 'a' || chr(768))) AS norm_text,
           strip_accents(nfc_normalize(replace(text, 'a', 'a' || chr(768))))
             AS stripped_text
    FROM documents WHERE text IS NOT NULL
    """,
)
def q_normalize_unicode(spark, sf_dir):
    from nonconsumptive_spark.functions.text import (
        normalize_unicode,
        strip_accents,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    decorated = F.regexp_replace("text", "a", "à")
    return docs.select(
        "doc_id",
        normalize_unicode(decorated).alias("norm_text"),
        strip_accents(normalize_unicode(decorated)).alias("stripped_text"),
    )


# -- repeated regions from the suffix array ---------------------------------
_RR_MIN = 10


@_stage(
    "q_repeated_regions",
    f"""
    WITH base AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    suf AS (
      SELECT doc_id, p AS pos, t[p:] AS s
      FROM base, unnest(range(1, len(t) + 1)) AS r(p)),
    ordered AS (
      SELECT doc_id, pos, s,
             lag(s)  OVER w AS prv,
             lead(s) OVER w AS nxt
      FROM suf WINDOW w AS (ORDER BY s, doc_id, pos)),
    lcps AS (
      SELECT doc_id, pos,
             greatest(
               CASE WHEN prv IS NULL THEN 0 ELSE
                 coalesce(list_min(list_filter(
                   range(1, least(len(s), len(prv)) + 1),
                   i -> s[i] <> prv[i])), least(len(s), len(prv)) + 1) - 1
               END,
               CASE WHEN nxt IS NULL THEN 0 ELSE
                 coalesce(list_min(list_filter(
                   range(1, least(len(s), len(nxt)) + 1),
                   i -> s[i] <> nxt[i])), least(len(s), len(nxt)) + 1) - 1
               END) AS lrp
      FROM ordered),
    flagged AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS s,
             CAST(pos + lrp AS BIGINT) AS e
      FROM lcps WHERE lrp >= {_RR_MIN}),
    runmax AS (
      SELECT doc_id, s, e,
             coalesce(max(e) OVER (
               PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
               AS prev_max
      FROM flagged),
    grp AS (
      SELECT doc_id, s, e,
             sum(CASE WHEN s > prev_max THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s, e) AS g
      FROM runmax)
    SELECT doc_id, min(s) AS span_start, max(e) AS span_end,
           max(e) - min(s) AS span_len
    FROM grp GROUP BY doc_id, g
    """,
)
def q_repeated_regions(spark, sf_dir):
    from nonconsumptive_spark.operators.suffix import repeated_regions

    return repeated_regions(load(spark, sf_dir, "documents"),
                            min_len=_RR_MIN)
