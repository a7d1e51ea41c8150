"""The round-5 promotion cohort: 103 (spark_fn, oracle_sql) pairs built
and oracle-verified during round 4 (then called ``r5_staging``), now
REGISTERED — imported by ``queries/__init__.all_queries`` so the driver
gate sees every entry.

Promoted in place rather than re-homed into the topic modules: each
entry already lives next to its oracle builder and shared CTE constants,
and a 6,800-line cross-module move would churn every line the round-4
history explains.  Topic grouping inside this file follows the section
headers; new work stages in ``queries/staging.py`` and is appended to a
topic module or here on promotion.

Every entry was verified with the driver-grade compare at sf0.001
(suite) AND sf0.01 (tools/check_staged.py) before promotion, and is
censused by tools/plan_census.py like any registered query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nonconsumptive_spark.queries import load, register

_DUCK_TOKS = "list_filter(regexp_split_to_array(text, '[^\\pL]+'), x -> x <> '')"

# Kept for the round-4 property tests and examples that resolve these
# entries by name; registration happens in the decorator below.
STAGED: dict[str, tuple] = {}


def _stage(name: str, oracle: str):
    def deco(fn):
        STAGED[name] = (fn, oracle)
        register(name, oracle, doc=_doc_for(name, fn))(fn)
        return fn

    return deco


def _doc_for(name: str, fn) -> str:
    """Registry doc line: the function docstring when present, else the
    one-liner from _DOC (every entry must document itself — the registry
    test enforces it)."""
    if fn.__doc__:
        return fn.__doc__
    return _DOC[name]


_DOC = {
    "q_blocklist_match": "Multi-phrase decontamination matches over the "
        "positional index (see operators/retrieval.blocklist_match): only "
        "blocklist-term postings move, anchor-vote equi-joins per phrase.",
    "q_postings_size_stats": "Delta-varint postings storage accounting per "
        "term (operators/retrieval.postings_size_stats): exact byte sizes "
        "from integer gap folds, one term-keyed agg.",
    "q_min_span_indexed": "Minimal multi-term span via the positional "
        "index — same result as q_min_span_proximity but reading only the "
        "query terms' postings (the production path).",
    "q_percentile_filter": "Rows above a per-group exact percentile cut, "
        "order-statistics from a value histogram (no percentile_disc "
        "float divergence).",
    "q_normalize_unicode": "NFC-normalized text profile (length deltas, "
        "changed-row flags) via a vectorized pandas UDF; DuckDB nfc_"
        "normalize checks it bit-for-bit.",
    "q_repeated_regions": "Repeated substring regions from the distributed "
        "suffix array (operators/suffix.py): prefix-doubling rank rounds, "
        "adjacent-rank LCP, no quadratic scan.",
    "q_query_likelihood": "Dirichlet-smoothed query-likelihood ranking "
        "(operators/retrieval.py): only query-term postings shuffle; "
        "corpus stats attach as 1-row broadcasts.",
    "q_cusum_daily": "Page's CUSUM over the daily event series: one "
        "day-keyed agg then a linear fold on the (tiny) day spine, "
        "integer-quantized increments.",
    "q_kaplan_meier": "Kaplan-Meier survival over user inter-event gaps: "
        "risk sets from one cumulative window over the (gap-day) spine, "
        "product-limit via exact log-sum quantization.",
    "q_ndcg_eval": "nDCG@k of the lexical ranker against semantic truth: "
        "per-query rank joins on the bounded k-row frame, exact "
        "integer-quantized gain sums.",
    "q_code_score": "Code-likeness scoring (brace/indent/keyword "
        "densities) — zero-shuffle per-row scan in builtin expressions.",
    "q_label_propagation": "Community labels after fixed synchronous LPA "
        "rounds (operators/graph.label_propagation): per-round one "
        "adjacency join + min-label agg, lineage cut per round.",
    "q_top_component": "Largest connected component of the token graph: "
        "iterative min-label rounds then one size agg; lineage cut per "
        "round.",
    "q_abtt_residuals": "All-but-the-top embedding residuals: mean + top "
        "principal direction via power iteration (1-row/64-dim attaches), "
        "residual norms per doc.",
    "q_hits_scores": "HITS hub/authority scores over the token bigraph: "
        "per-round degree-normalized joins with integer-quantized "
        "normalization (operators/graph.hits).",
    "q_markov_stationary": "Stationary distribution of the token Markov "
        "chain by quantized power iteration over the transition edges.",
    "q_cusum_by_type": "Per-event-type CUSUM changepoints: type-keyed "
        "day aggs, fold on each type's day spine.",
    "q_kaplan_meier_cohorts": "Kaplan-Meier survival stratified by signup "
        "cohort: the q_kaplan_meier fold per cohort key.",
    "q_lexical_cohesion": "Adjacent-chunk lexical cohesion per document: "
        "chunked token sets, intra-doc adjacent-pair Jaccard (positional "
        "zip, no self-join).",
    "q_silhouette": "Mean-distance silhouette over k-means clusters: "
        "within/between sums from cluster-keyed aggregates, never "
        "pairwise across the corpus.",
    "q_kcenter_select": "Greedy k-center (farthest-first) seed selection: "
        "k bounded rounds, one max-distance agg per round.",
    "q_bitext_margin": "Margin-based bitext mining scores (forward/"
        "backward nearest-neighbor ratio) over a bounded query batch.",
    "q_fs_link_scores": "Fellegi-Sunter record-linkage weights over "
        "nation-blocked customer pairs (operators/linkage.fs_link_scores): "
        "u-rates from one corpus agg, FS_SCALE integer weights.",
    "q_conditional_entropy": "H(event_type | user activity band): "
        "two-level integer-count aggs, entropy from exact counts with "
        "one log per cell.",
    "q_quality_retention": "Quality-score deciles vs doc retention under "
        "the curation pipeline: decile edges from exact order statistics.",
    "q_shuffle_quality": "Training-order shuffle quality: position-vs-"
        "source rank correlation from exact integer rank sums.",
    "q_mixture_budget": "Token-budget allocation across source mixtures "
        "with exact integer proportional rounding (largest remainder).",
    "q_cluster_capped_sample": "Per-cluster capped sampling via hash-"
        "ranked row_number within cluster keys.",
    "q_benford_deviation": "First-digit Benford deviation per event-type "
        "group: 9-row digit spine vs exact digit counts.",
    "q_adamic_adar": "Adamic-Adar link prediction over the token graph: "
        "common-neighbor wedge joins with degree-capped middle nodes.",
    "q_kcore": "k-core node set after fixed synchronous peeling rounds "
        "(operators/graph.kcore).",
    "q_ewma_anomalies": "Per-user EWMA + spike flags, the grouped-map "
        "recurrence (operators/grouped.ewma_anomalies); bit-exact vs the "
        "oracle's recursive CTE.",
    "q_bleu_pairs": "Clipped-precision BLEU-2 over blocked same-lang doc "
        "pairs: n-gram clip sums via count-frame joins.",
    "q_mrr_map_eval": "MRR/MAP of the lexical ranker against semantic "
        "truth on the bounded per-query candidate frame.",
    "q_calibration_bins": "Reliability-diagram bins (operators/evaluation"
        ".calibration_bins, pos_value=0 for the synthetic labels): "
        "CAL_SCALE integer confidence sums, one 10-row agg.",
    "q_ams_f2": "AMS second-moment sketch vs the exact F2 (operators/"
        "wordcount.ams_f2): R sign-sums in one agg, abs rel_err.",
    "q_ppr_tokens": "Personalized PageRank from seed tokens: quantized "
        "push iterations over the out-degree-normalized edge list.",
    "q_clustering_coefficient": "Per-node local clustering coefficient: "
        "wedge count via middle-node join, closed by edge semi-join.",
    "q_rbp_eval": "Rank-biased precision of the lexical ranker: geometric "
        "weights on the bounded k-row rank frame.",
    "q_source_kl": "Per-source KL divergence from the corpus unigram "
        "distribution: vocab joins keyed on token, 1-row total attaches.",
    "q_rouge2_pairs": "ROUGE-2 recall over blocked same-lang doc pairs "
        "via bigram count-frame joins.",
    "q_modularity": "Newman modularity of the LPA partition (operators/"
        "graph.modularity): label-keyed aggs + quantized global sum.",
    "q_ktruss": "k-truss edges after fixed peeling rounds with a "
        "converged flag (operators/graph.ktruss): wedge equi-joins, "
        "1-row convergence attach.",
}


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


# -- Dirichlet query-likelihood ranking (the other classic sparse ranker) --
_QL_TERMS = ["spark", "query", "dup"]
_QL_K, _QL_MU = 10, 100.0
_QL_TOKS_LOWER = (
    "list_filter(regexp_split_to_array(lower(text), '[^\\pL]+'),"
    " x -> x <> '')"
)
_QL_IN = "(" + ", ".join(f"'{t}'" for t in sorted(_QL_TERMS)) + ")"


@_stage(
    "q_query_likelihood",
    f"""
    WITH base AS (SELECT doc_id, {_QL_TOKS_LOWER} AS t FROM documents),
    lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM base),
    cc AS (SELECT CAST(sum(dl) AS BIGINT) AS cc FROM lens),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(t) AS token FROM base)
      WHERE token IN {_QL_IN}
      GROUP BY 1, 2),
    cfq AS (
      SELECT token, cf, cc,
             CAST(floor(1000000000.0 * ln({_QL_MU} * cf / cc)) AS BIGINT)
               AS bg_q
      FROM (SELECT token, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1)
      CROSS JOIN cc),
    konst AS (SELECT CAST(sum(bg_q) AS BIGINT) AS k_q,
                     CAST(count(*) AS BIGINT) AS nq FROM cfq),
    per_doc AS (
      SELECT f.doc_id,
             CAST(sum(CAST(floor(1000000000.0
                    * ln(f.tf + {_QL_MU} * c.cf / c.cc)) AS BIGINT)
                  - c.bg_q) AS BIGINT) AS dq,
             CAST(count(*) AS BIGINT) AS n_terms_matched
      FROM tf f JOIN cfq c USING (token) GROUP BY f.doc_id),
    scored AS (
      SELECT l.doc_id,
             CAST(COALESCE(p.n_terms_matched, 0) AS BIGINT)
               AS n_terms_matched,
             k.k_q + COALESCE(p.dq, 0)
               - k.nq * CAST(floor(1000000000.0 * ln(l.dl + {_QL_MU}))
                             AS BIGINT) AS score_q
      FROM lens l LEFT JOIN per_doc p USING (doc_id) CROSS JOIN konst k)
    SELECT doc_id, n_terms_matched,
           round(score_q / 1000000000.0, 4) + 0.0 AS score
    FROM scored ORDER BY score_q DESC, doc_id ASC LIMIT {_QL_K}
    """,
)
def q_query_likelihood(spark, sf_dir):
    from nonconsumptive_spark.operators.retrieval import query_likelihood_topk

    return query_likelihood_topk(load(spark, sf_dir, "documents"),
                                 _QL_TERMS, k=_QL_K, mu=_QL_MU)


# -- CUSUM changepoint detection over the daily event-count series ---------
# The sequential recurrence s_i = max(0, s_{i-1} + y_i) is exactly
# s_i = cum_i - min(0, running_min(cum_i))  (and its mirror for the
# negative side), so the whole detector is two window passes over the
# #days-sized daily spine — no recursion, no UDF, fully BIGINT (daily
# deviations are scaled by n so the target mean never becomes a float).
_CUSUM_H = 4  # flag when |cusum| exceeds H * s  (s = n * mean daily count)


@_stage(
    "q_cusum_daily",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(c) AS BIGINT) AS s FROM daily),
    dev AS (SELECT d, c, t.n * c - t.s AS y, t.s AS s
            FROM daily CROSS JOIN tot t),
    c1 AS (SELECT d, c, s,
                  CAST(sum(y) OVER (ORDER BY d) AS BIGINT) AS cum
           FROM dev),
    c2 AS (SELECT d, c, s, cum,
                  CAST(least(0, min(cum) OVER (ORDER BY d)) AS BIGINT)
                    AS rmin,
                  CAST(greatest(0, max(cum) OVER (ORDER BY d)) AS BIGINT)
                    AS rmax
           FROM c1)
    SELECT d, c, cum,
           cum - rmin AS cusum_pos,
           rmax - cum AS cusum_neg,
           (cum - rmin > {_CUSUM_H} * s
            OR rmax - cum > {_CUSUM_H} * s) AS flagged
    FROM c2
    """,
)
def q_cusum_daily(spark, sf_dir):
    from pyspark.sql import Window

    from nonconsumptive_spark.plans.checkpoint import materialize_once

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    daily = materialize_once(daily, "cusum_daily")
    tot = daily.agg(F.count("*").cast("long").alias("n"),
                    F.sum("c").cast("long").alias("s"))
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "d", "c", "s", (F.col("n") * F.col("c") - F.col("s")).alias("y"))
    # the spine is #days rows — a bounded single-partition window, the
    # same documented shape as every other daily-series query here
    w = (Window.orderBy("d")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c1 = dev.select("d", "c", "s",
                    F.sum("y").over(w).cast("long").alias("cum"))
    c2 = c1.select(
        "d", "c", "s", "cum",
        F.least(F.lit(0), F.min("cum").over(w)).cast("long").alias("rmin"),
        F.greatest(F.lit(0), F.max("cum").over(w)).cast("long").alias("rmax"),
    )
    return c2.select(
        "d", "c", "cum",
        (F.col("cum") - F.col("rmin")).alias("cusum_pos"),
        (F.col("rmax") - F.col("cum")).alias("cusum_neg"),
        ((F.col("cum") - F.col("rmin") > _CUSUM_H * F.col("s"))
         | (F.col("rmax") - F.col("cum") > _CUSUM_H * F.col("s")))
        .alias("flagged"),
    )


# -- Kaplan–Meier survival over user lifetimes ------------------------------
# Lifetime = days between a user's first and last event; a user whose
# last event falls within _KM_CENS_DAYS of the observation end is
# censored (still active), otherwise the churn event is observed.  The
# survival product is carried as a 1e-9-quantized BIGINT sum of per-step
# ln((n-d)/n) terms (the exact-integer-accumulation playbook), so the
# cross-engine hash never sees float summation order; when a step
# exhausts the risk set (d = n) the term is a -1e15 sentinel whose exp()
# underflows to exactly 0.0 on both engines.
_KM_CENS_DAYS = 7


@_stage(
    "q_kaplan_meier",
    f"""
    WITH pu AS (
      SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
      FROM events GROUP BY user_id),
    obs AS (SELECT max(ts) AS end_ts FROM events),
    durs AS (
      SELECT CAST(date_diff('day', CAST(first_ts AS DATE),
                            CAST(last_ts AS DATE)) AS BIGINT) AS dur,
             (last_ts < end_ts - INTERVAL {_KM_CENS_DAYS} DAY) AS observed
      FROM pu CROSS JOIN obs),
    tbl AS (
      SELECT dur, CAST(count(*) AS BIGINT) AS n_all,
             CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_event
      FROM durs GROUP BY dur),
    risk AS (
      SELECT dur, n_all, n_event,
             CAST((SELECT count(*) FROM durs)
                  - COALESCE(sum(n_all) OVER (
                      ORDER BY dur
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM tbl),
    terms AS (
      SELECT dur, n_risk, n_event, n_all - n_event AS n_censored,
             CASE WHEN n_event = 0 THEN CAST(0 AS BIGINT)
                  WHEN n_event < n_risk THEN
                    CAST(floor(1000000000.0
                         * ln(CAST(n_risk - n_event AS DOUBLE) / n_risk))
                         AS BIGINT)
                  ELSE CAST(-1000000000000000 AS BIGINT) END AS term
      FROM risk),
    surv AS (
      SELECT dur, n_risk, n_event, n_censored,
             CAST(sum(term) OVER (ORDER BY dur) AS BIGINT) AS log_surv_q
      FROM terms)
    SELECT dur, n_risk, n_event, n_censored, log_surv_q,
           round(exp(log_surv_q / 1000000000.0), 6) + 0.0 AS survival
    FROM surv
    """,
)
def q_kaplan_meier(spark, sf_dir):
    from pyspark.sql import Window

    from nonconsumptive_spark.plans.checkpoint import materialize_once

    ev = load(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"),
                                   F.max("ts").alias("last_ts"))
    obs = ev.agg(F.max("ts").alias("end_ts"))
    durs = pu.crossJoin(F.broadcast(obs)).select(
        F.datediff(F.to_date("last_ts"), F.to_date("first_ts"))
        .cast("long").alias("dur"),
        (F.col("last_ts")
         < F.col("end_ts") - F.expr(f"INTERVAL {_KM_CENS_DAYS} DAYS"))
        .alias("observed"),
    )
    durs = materialize_once(durs, "km_durs")  # feeds the table AND the total
    tot = durs.agg(F.count("*").cast("long").alias("n_users"))
    tbl = durs.groupBy("dur").agg(
        F.count("*").cast("long").alias("n_all"),
        F.sum(F.col("observed").cast("long")).cast("long").alias("n_event"),
    )
    # the lifetime table is #distinct-durations rows — bounded spine window
    w_prev = (Window.orderBy("dur")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_cum = (Window.orderBy("dur")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    risk = tbl.crossJoin(F.broadcast(tot)).select(
        "dur", "n_all", "n_event",
        (F.col("n_users")
         - F.coalesce(F.sum("n_all").over(w_prev), F.lit(0)))
        .cast("long").alias("n_risk"),
    )
    terms = risk.select(
        "dur", "n_risk", "n_event",
        (F.col("n_all") - F.col("n_event")).alias("n_censored"),
        F.when(F.col("n_event") == 0, F.lit(0).cast("long"))
        .when(
            F.col("n_event") < F.col("n_risk"),
            F.floor(F.lit(1e9) * F.log(
                (F.col("n_risk") - F.col("n_event")).cast("double")
                / F.col("n_risk"))).cast("long"),
        )
        .otherwise(F.lit(-(10 ** 15)).cast("long")).alias("term"),
    )
    surv = terms.select(
        "dur", "n_risk", "n_event", "n_censored",
        F.sum("term").over(w_cum).cast("long").alias("log_surv_q"),
    )
    return surv.select(
        "dur", "n_risk", "n_event", "n_censored", "log_surv_q",
        (F.round(F.exp(F.col("log_surv_q") / F.lit(1e9)), 6)
         + F.lit(0.0)).alias("survival"),
    )


# -- nDCG@k of the lexical ranker vs semantic pseudo-relevance -------------
def _ndcg_oracle() -> str:
    from nonconsumptive_spark.operators import hybrid as hy
    from nonconsumptive_spark.queries.hybrid import _LEX_CTES, _SEM_CTES, _N_Q

    disc = hy.ndcg_discounts()
    # elements carry an explicit BIGINT cast: a bare list literal types
    # INT32 and gain * discount overflows before any outer cast applies
    disc_sql = "[" + ", ".join(f"{d}::BIGINT" for d in disc) + "]"
    return f"""
    WITH {_LEX_CTES},
    {_SEM_CTES},
    rel AS (
      SELECT query_id, cand_id,
             CASE WHEN sem_rank <= {hy.NDCG_HI_CUT} THEN 3 ELSE 1 END AS gain
      FROM semt),
    dcg AS (
      SELECT l.query_id,
             CAST(sum(COALESCE(r.gain, 0) * {disc_sql}[l.lex_rank])
                  AS BIGINT) AS dcg_q
      FROM lext l LEFT JOIN rel r
        ON r.query_id = l.query_id AND r.cand_id = l.cand_id
      WHERE l.lex_rank <= {hy.NDCG_K} GROUP BY 1),
    ideal AS (
      SELECT query_id, gain,
             row_number() OVER (
               PARTITION BY query_id ORDER BY gain DESC, cand_id ASC) AS ir
      FROM rel),
    idcg AS (
      SELECT query_id, CAST(sum(gain * {disc_sql}[ir]) AS BIGINT) AS idcg_q
      FROM ideal WHERE ir <= {hy.NDCG_K} GROUP BY 1),
    nrel AS (
      SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel FROM rel GROUP BY 1)
    SELECT n.query_id, n.n_rel,
           CAST(COALESCE(d.dcg_q, 0) AS BIGINT) AS dcg_q, i.idcg_q,
           round(COALESCE(d.dcg_q, 0) / i.idcg_q, 6) + 0.0 AS ndcg
    FROM nrel n LEFT JOIN dcg d USING (query_id) JOIN idcg i USING (query_id)
    """


@_stage("q_ndcg_eval", _ndcg_oracle())
def q_ndcg_eval(spark, sf_dir):
    from nonconsumptive_spark.operators.hybrid import ndcg_eval
    from nonconsumptive_spark.queries.hybrid import _N_Q

    return ndcg_eval(load(spark, sf_dir, "documents"),
                     load(spark, sf_dir, "embeddings"), n_queries=_N_Q)


# -- code-likeness curation signal ------------------------------------------
@_stage(
    "q_code_score",
    """
    WITH base AS (SELECT doc_id, coalesce(text, '') AS t FROM documents)
    SELECT doc_id,
           CAST(length(t) AS BIGINT) AS n_chars_obs,
           CAST((length(t) - length(replace(t, '{', '')))
              + (length(t) - length(replace(t, '}', ''))) AS BIGINT)
             AS n_braces,
           CAST(length(t) - length(replace(t, ';', '')) AS BIGINT)
             AS n_semicolons,
           CAST(len(regexp_extract_all(t, '[a-z][A-Z]')) AS BIGINT)
             AS n_camel,
           CAST((length(t) - length(replace(t, chr(10) || '    ', ''))) // 5
             AS BIGINT) AS n_indent,
           (((length(t) - length(replace(t, '{', '')))
             + (length(t) - length(replace(t, '}', '')))
             + (length(t) - length(replace(t, ';', '')))
             + len(regexp_extract_all(t, '[a-z][A-Z]'))
             + (length(t) - length(replace(t, chr(10) || '    ', ''))) // 5)
            * 50 >= length(t) AND length(t) > 0) AS is_codey
    FROM base
    """,
)
def q_code_score(spark, sf_dir):
    from nonconsumptive_spark.operators.textstats import code_score

    return code_score(load(spark, sf_dir, "documents"))


# -- label-propagation communities over the token-adjacency graph ----------
_LPA_ITERS = 4


def _lpa_ctes(k: int) -> list[str]:
    """The shared LPA CTE chain (und / nodes / l0..l{k}) — reused by the
    label-propagation oracle itself and by q_modularity's oracle."""
    cte = [f"""
    tokpos AS (
      SELECT doc_id, generate_subscripts({_DUCK_TOKS}, 1) AS pos,
             unnest({_DUCK_TOKS}) AS token
      FROM documents),
    dedges AS (
      SELECT DISTINCT token AS src,
             lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS dst
      FROM tokpos QUALIFY dst IS NOT NULL),
    und AS (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM dedges UNION ALL
        SELECT dst AS src, src AS dst FROM dedges)
      WHERE src <> dst),
    nodes AS (SELECT src AS node FROM dedges UNION SELECT dst FROM dedges),
    l0 AS (SELECT node, node AS label FROM nodes)"""]
    for i in range(1, k + 1):
        cte.append(f"""
    w{i} AS (
      SELECT node, label FROM (
        SELECT u.src AS node, l.label, count(*) AS cnt,
               row_number() OVER (
                 PARTITION BY u.src
                 ORDER BY count(*) DESC, l.label ASC) AS rn
        FROM und u JOIN l{i - 1} l ON l.node = u.dst
        GROUP BY u.src, l.label)
      WHERE rn = 1),
    l{i} AS (
      SELECT n.node, coalesce(w.label, p.label) AS label
      FROM nodes n LEFT JOIN w{i} w USING (node)
      JOIN l{i - 1} p ON p.node = n.node)""")
    return cte


def _lpa_oracle(k: int) -> str:
    return ("WITH" + ",".join(_lpa_ctes(k))
            + f"\n    SELECT node, label FROM l{k}")


@_stage("q_label_propagation", _lpa_oracle(_LPA_ITERS))
def q_label_propagation(spark, sf_dir):
    from nonconsumptive_spark.operators.graph import (
        bigram_edges,
        label_propagation,
    )

    edges = bigram_edges(load(spark, sf_dir, "documents"))
    return label_propagation(edges, n_iter=_LPA_ITERS)


# -- top principal component by exact-integer power iteration ---------------
def _pca_ctes() -> tuple[str, str, int]:
    """(WITH-body, final v CTE name, dim+1) — shared by the component and
    the all-but-the-top residual oracles."""
    from nonconsumptive_spark.operators.similarity import (
        PCA_DIM,
        PCA_ITERS,
        PCA_SCALE,
    )

    d1 = PCA_DIM + 1
    sc = f"{float(PCA_SCALE)!r}"
    v0 = "[" + ", ".join([repr(1.0 / PCA_DIM ** 0.5)] * PCA_DIM) + "]"
    cte = [f"""
    base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x
             FROM embeddings),
    nn AS (SELECT count(*) AS n FROM base),
    mq AS (
      SELECT j, CAST(sum(CAST(floor({sc} * x[j]) AS BIGINT)) AS BIGINT) AS s
      FROM base, unnest(range(1, {d1})) AS r(j) GROUP BY j),
    mu AS (
      SELECT list_transform(list(s ORDER BY j),
                            e -> CAST(e AS DOUBLE) / (n * {sc})) AS mu
      FROM mq CROSS JOIN nn GROUP BY n),
    centered AS (
      SELECT vec_id, list_transform(range(1, {d1}), j -> x[j] - mu[j]) AS xc
      FROM base CROSS JOIN mu),
    v0 AS (SELECT {v0}::DOUBLE[] AS v)"""]
    for i in range(1, PCA_ITERS + 1):
        cte.append(f"""
    d{i} AS (
      SELECT xc, list_reduce(list_transform(range(1, {d1}),
                                            j -> xc[j] * v[j]),
                             (a, b) -> a + b) AS d
      FROM centered CROSS JOIN v{i - 1}),
    q{i} AS (
      SELECT j, CAST(sum(CAST(floor({sc} * d * xc[j]) AS BIGINT))
                 AS BIGINT) AS s
      FROM d{i}, unnest(range(1, {d1})) AS r(j) GROUP BY j),
    v{i} AS (
      -- mirror the Spark-side zero-variance guard (drift-trap hygiene;
      -- inactive on the fixtures)
      SELECT list_transform(sarr, e -> CASE WHEN n2 > 0
                 THEN CAST(e AS DOUBLE) / sqrt(n2) ELSE 0.0 END) AS v
      FROM (
        SELECT list(s ORDER BY j) AS sarr,
               list_reduce(list_transform(list(s ORDER BY j),
                                          e -> CAST(e AS DOUBLE)
                                               * CAST(e AS DOUBLE)),
                           (a, b) -> a + b) AS n2
        FROM q{i}))""")
    return "WITH" + ",".join(cte), f"v{PCA_ITERS}", d1


def _pca_oracle() -> str:
    ctes, vk, d1 = _pca_ctes()
    return ctes + f"""
    SELECT CAST(j AS BIGINT) AS dim, round(v[j], 6) + 0.0 AS loading
    FROM {vk}, unnest(range(1, {d1})) AS r(j)"""


def _abtt_oracle() -> str:
    ctes, vk, d1 = _pca_ctes()
    return ctes + f"""
    , pr AS (
      SELECT vec_id,
             list_reduce(list_transform(range(1, {d1}),
                                        j -> xc[j] * v[j]),
                         (a, b) -> a + b) AS p,
             xc, v
      FROM centered CROSS JOIN {vk}),
    rr AS (
      SELECT vec_id, p,
             list_reduce(list_transform(
               list_transform(range(1, {d1}), j -> xc[j] - p * v[j]),
               r -> r * r), (a, b) -> a + b) AS r2
      FROM pr)
    SELECT vec_id, round(p, 4) + 0.0 AS proj,
           round(sqrt(r2), 4) + 0.0 AS resid_norm
    FROM rr"""


@_stage("q_top_component", _pca_oracle())
def q_top_component(spark, sf_dir):
    from nonconsumptive_spark.operators.similarity import (
        top_principal_component,
    )

    return top_principal_component(load(spark, sf_dir, "embeddings"))


@_stage("q_abtt_residuals", _abtt_oracle())
def q_abtt_residuals(spark, sf_dir):
    from nonconsumptive_spark.operators.similarity import (
        remove_top_component,
    )

    return remove_top_component(load(spark, sf_dir, "embeddings"))


# -- HITS hubs/authorities over the token-adjacency graph ------------------
def _hits_oracle() -> str:
    from nonconsumptive_spark.operators.graph import HITS_ITERS, HITS_SCALE

    sc = f"{float(HITS_SCALE)!r}"
    cte = [f"""
    tokpos AS (
      SELECT doc_id, generate_subscripts({_DUCK_TOKS}, 1) AS pos,
             unnest({_DUCK_TOKS}) AS token
      FROM documents),
    ed AS (
      SELECT DISTINCT token AS src,
             lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS dst
      FROM tokpos QUALIFY dst IS NOT NULL),
    nodes AS (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
    h0 AS (SELECT node, 1.0 AS s FROM nodes)"""]
    for i in range(HITS_ITERS):
        for half, (src_key, dst_key, prev, out) in enumerate(
            [("src", "dst", f"h{i}", f"a{i}"),
             ("dst", "src", f"a{i}", f"h{i + 1}")]
        ):
            cte.append(f"""
    {out}raw AS (
      SELECT n.node,
             CAST(COALESCE(r.raw, 0) AS BIGINT) AS raw
      FROM nodes n LEFT JOIN (
        SELECT e.{dst_key} AS node,
               CAST(sum(CAST(floor({sc} * p.s) AS BIGINT)) AS BIGINT) AS raw
        FROM ed e JOIN {prev} p ON p.node = e.{src_key}
        GROUP BY e.{dst_key}) r USING (node)),
    {out} AS (
      SELECT node, CAST(raw AS DOUBLE)
                   / (SELECT max(raw) FROM {out}raw) AS s
      FROM {out}raw)""")
    k = HITS_ITERS
    return ("WITH" + ",".join(cte) + f"""
    SELECT h.node, round(h.s, 6) + 0.0 AS hub,
           round(a.s, 6) + 0.0 AS authority
    FROM h{k} h JOIN a{k - 1} a USING (node)""")


@_stage("q_hits_scores", _hits_oracle())
def q_hits_scores(spark, sf_dir):
    from nonconsumptive_spark.operators.graph import bigram_edges, hits_scores

    return hits_scores(bigram_edges(load(spark, sf_dir, "documents")))


# -- damped stationary distribution of the token Markov chain --------------
def _stationary_oracle() -> str:
    from nonconsumptive_spark.operators.markov import (
        STAT_DAMPING,
        STAT_ITERS,
        STAT_SCALE,
    )

    d = STAT_DAMPING
    sc = f"{float(STAT_SCALE)!r}"
    cte = [f"""
    tokpos AS (
      SELECT doc_id, generate_subscripts({_DUCK_TOKS}, 1) AS pos,
             unnest({_DUCK_TOKS}) AS token
      FROM documents),
    bigrams AS (
      SELECT w0, w1, CAST(count(*) AS BIGINT) AS count FROM (
        SELECT doc_id, token AS w0,
               lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
        FROM tokpos) z
      WHERE w1 IS NOT NULL GROUP BY w0, w1),
    tt AS (
      SELECT w0, w1,
             count / sum(count) OVER (PARTITION BY w0) AS prob
      FROM bigrams),
    nodes AS (SELECT w0 AS node FROM tt UNION SELECT w1 FROM tt),
    nn AS (SELECT count(*) AS n FROM nodes),
    p0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS p FROM nodes)"""]
    for i in range(1, STAT_ITERS + 1):
        cte.append(f"""
    p{i} AS (
      SELECT nd.node,
             (1.0 - {d}) / (SELECT n FROM nn)
               + {d} * (COALESCE(c.s, 0) / {sc}) AS p
      FROM nodes nd LEFT JOIN (
        SELECT t.w1 AS node,
               CAST(sum(CAST(floor({sc} * (p.p * t.prob)) AS BIGINT))
                 AS BIGINT) AS s
        FROM tt t JOIN p{i - 1} p ON p.node = t.w0
        GROUP BY t.w1) c USING (node))""")
    return ("WITH" + ",".join(cte) + f"""
    SELECT node, round(p, 9) + 0.0 AS pi FROM p{STAT_ITERS}""")


@_stage("q_markov_stationary", _stationary_oracle())
def q_markov_stationary(spark, sf_dir):
    from nonconsumptive_spark.operators.markov import stationary_distribution
    from nonconsumptive_spark.operators.wordcount import ngram_counts

    return stationary_distribution(
        ngram_counts(load(spark, sf_dir, "documents"), 2))


# -- per-type CUSUM: a fleet of control charts, windows PARTITIONED --------
# (the scale-preferred form: the global q_cusum_daily spine is one
# bounded window; here every event type gets its own chart and the
# windows parallelize across types)
@_stage(
    "q_cusum_by_type",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(c) AS BIGINT) AS s
            FROM daily GROUP BY event_type),
    dev AS (SELECT d.event_type, d.d, d.c, t.n * d.c - t.s AS y, t.s AS s
            FROM daily d JOIN tot t USING (event_type)),
    c1 AS (SELECT event_type, d, c, s,
                  CAST(sum(y) OVER w AS BIGINT) AS cum
           FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY d)),
    c2 AS (SELECT event_type, d, c, s, cum,
                  CAST(least(0, min(cum) OVER w) AS BIGINT) AS rmin,
                  CAST(greatest(0, max(cum) OVER w) AS BIGINT) AS rmax
           FROM c1 WINDOW w AS (PARTITION BY event_type ORDER BY d))
    SELECT event_type, d, c, cum,
           cum - rmin AS cusum_pos,
           rmax - cum AS cusum_neg,
           (cum - rmin > {_CUSUM_H} * s OR rmax - cum > {_CUSUM_H} * s)
             AS flagged
    FROM c2
    """,
)
def q_cusum_by_type(spark, sf_dir):
    from pyspark.sql import Window

    from nonconsumptive_spark.plans.checkpoint import materialize_once

    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    daily = materialize_once(daily, "cusum_ty_daily")
    tot = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"))
    dev = daily.join(F.broadcast(tot), "event_type").select(
        "event_type", "d", "c", "s",
        (F.col("n") * F.col("c") - F.col("s")).alias("y"))
    w = (Window.partitionBy("event_type").orderBy("d")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c1 = dev.select("event_type", "d", "c", "s",
                    F.sum("y").over(w).cast("long").alias("cum"))
    c2 = c1.select(
        "event_type", "d", "c", "s", "cum",
        F.least(F.lit(0), F.min("cum").over(w)).cast("long").alias("rmin"),
        F.greatest(F.lit(0), F.max("cum").over(w)).cast("long").alias("rmax"),
    )
    return c2.select(
        "event_type", "d", "c", "cum",
        (F.col("cum") - F.col("rmin")).alias("cusum_pos"),
        (F.col("rmax") - F.col("cum")).alias("cusum_neg"),
        ((F.col("cum") - F.col("rmin") > _CUSUM_H * F.col("s"))
         | (F.col("rmax") - F.col("cum") > _CUSUM_H * F.col("s")))
        .alias("flagged"),
    )


# -- Kaplan-Meier per signup cohort: survival curves, windows PARTITIONED --
@_stage(
    "q_kaplan_meier_cohorts",
    f"""
    WITH pu AS (
      SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
      FROM events GROUP BY user_id),
    obs AS (SELECT max(ts) AS end_ts FROM events),
    durs AS (
      SELECT CAST(date_trunc('month', first_ts) AS DATE) AS cohort,
             CAST(date_diff('day', CAST(first_ts AS DATE),
                            CAST(last_ts AS DATE)) AS BIGINT) AS dur,
             (last_ts < end_ts - INTERVAL {_KM_CENS_DAYS} DAY) AS observed
      FROM pu CROSS JOIN obs),
    ct AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
           FROM durs GROUP BY cohort),
    tbl AS (
      SELECT cohort, dur, CAST(count(*) AS BIGINT) AS n_all,
             CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_event
      FROM durs GROUP BY cohort, dur),
    risk AS (
      SELECT t.cohort, t.dur, t.n_all, t.n_event,
             CAST(c.n_users - COALESCE(sum(t.n_all) OVER (
                    PARTITION BY t.cohort ORDER BY t.dur
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM tbl t JOIN ct c USING (cohort)),
    terms AS (
      SELECT cohort, dur, n_risk, n_event, n_all - n_event AS n_censored,
             CASE WHEN n_event = 0 THEN CAST(0 AS BIGINT)
                  WHEN n_event < n_risk THEN
                    CAST(floor(1000000000.0
                         * ln(CAST(n_risk - n_event AS DOUBLE) / n_risk))
                         AS BIGINT)
                  ELSE CAST(-1000000000000000 AS BIGINT) END AS term
      FROM risk),
    surv AS (
      SELECT cohort, dur, n_risk, n_event, n_censored,
             CAST(sum(term) OVER (
               PARTITION BY cohort ORDER BY dur) AS BIGINT) AS log_surv_q
      FROM terms)
    SELECT cohort, dur, n_risk, n_event, n_censored, log_surv_q,
           round(exp(log_surv_q / 1000000000.0), 6) + 0.0 AS survival
    FROM surv
    """,
)
def q_kaplan_meier_cohorts(spark, sf_dir):
    from pyspark.sql import Window

    from nonconsumptive_spark.plans.checkpoint import materialize_once

    ev = load(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"),
                                   F.max("ts").alias("last_ts"))
    obs = ev.agg(F.max("ts").alias("end_ts"))
    durs = pu.crossJoin(F.broadcast(obs)).select(
        F.to_date(F.date_trunc("month", "first_ts")).alias("cohort"),
        F.datediff(F.to_date("last_ts"), F.to_date("first_ts"))
        .cast("long").alias("dur"),
        (F.col("last_ts")
         < F.col("end_ts") - F.expr(f"INTERVAL {_KM_CENS_DAYS} DAYS"))
        .alias("observed"),
    )
    durs = materialize_once(durs, "kmc_durs")
    ct = durs.groupBy("cohort").agg(
        F.count("*").cast("long").alias("n_users"))
    tbl = durs.groupBy("cohort", "dur").agg(
        F.count("*").cast("long").alias("n_all"),
        F.sum(F.col("observed").cast("long")).cast("long").alias("n_event"),
    )
    w_prev = (Window.partitionBy("cohort").orderBy("dur")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_cum = (Window.partitionBy("cohort").orderBy("dur")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    risk = tbl.join(F.broadcast(ct), "cohort").select(
        "cohort", "dur", "n_all", "n_event",
        (F.col("n_users")
         - F.coalesce(F.sum("n_all").over(w_prev), F.lit(0)))
        .cast("long").alias("n_risk"),
    )
    terms = risk.select(
        "cohort", "dur", "n_risk", "n_event",
        (F.col("n_all") - F.col("n_event")).alias("n_censored"),
        F.when(F.col("n_event") == 0, F.lit(0).cast("long"))
        .when(
            F.col("n_event") < F.col("n_risk"),
            F.floor(F.lit(1e9) * F.log(
                (F.col("n_risk") - F.col("n_event")).cast("double")
                / F.col("n_risk"))).cast("long"),
        )
        .otherwise(F.lit(-(10 ** 15)).cast("long")).alias("term"),
    )
    surv = terms.select(
        "cohort", "dur", "n_risk", "n_event", "n_censored",
        F.sum("term").over(w_cum).cast("long").alias("log_surv_q"),
    )
    return surv.select(
        "cohort", "dur", "n_risk", "n_event", "n_censored", "log_surv_q",
        (F.round(F.exp(F.col("log_surv_q") / F.lit(1e9)), 6)
         + F.lit(0.0)).alias("survival"),
    )


# -- TextTiling-style lexical cohesion segmentation ------------------------
def _tile_oracle() -> str:
    from nonconsumptive_spark.operators.textstats import TILE_SCALE, TILE_W

    w = TILE_W

    def moments(x, y):
        return (f"list_reduce(list_transform(list_distinct({x} || {y}),"
                f" x -> CAST(len(list_filter({x}, e -> e = x))"
                f" * len(list_filter({y}, e -> e = x)) AS BIGINT)),"
                f" (p, q) -> p + q)")

    return f"""
    WITH base AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    g AS (
      SELECT doc_id, t,
             unnest(range(1, CAST(trunc(len(t) / {w}.0 - 1) AS BIGINT) + 1))
               AS i
      FROM base WHERE len(t) >= {2 * w}),
    m AS (
      SELECT doc_id, i AS gap_idx,
             list_slice(t, (i - 1) * {w} + 1, i * {w}) AS a,
             list_slice(t, i * {w} + 1, (i + 1) * {w}) AS b
      FROM g),
    s AS (
      SELECT doc_id, gap_idx,
             {moments('a', 'b')} AS dot,
             {moments('a', 'a')} AS na2,
             {moments('b', 'b')} AS nb2
      FROM m),
    q AS (
      SELECT doc_id, CAST(gap_idx AS BIGINT) AS gap_idx,
             CAST(CASE WHEN na2 * nb2 > 0
                  THEN (dot * dot * {TILE_SCALE}) // (na2 * nb2)
                  ELSE 0 END AS BIGINT) AS cos2_q
      FROM s)
    SELECT doc_id, gap_idx, cos2_q,
           (lag(cos2_q) OVER win IS NOT NULL
            AND lead(cos2_q) OVER win IS NOT NULL
            AND cos2_q < lag(cos2_q) OVER win
            AND cos2_q < lead(cos2_q) OVER win) AS is_boundary
    FROM q WINDOW win AS (PARTITION BY doc_id ORDER BY gap_idx)
    """


@_stage("q_lexical_cohesion", _tile_oracle())
def q_lexical_cohesion(spark, sf_dir):
    from nonconsumptive_spark.operators.textstats import (
        lexical_cohesion_gaps,
    )

    return lexical_cohesion_gaps(load(spark, sf_dir, "documents"))


# -- simplified silhouette over the k-means result --------------------------
def _silhouette_oracle(k: int, n_iter: int, grid: int, scale: int) -> str:
    from nonconsumptive_spark.queries.clustering import _kmeans_cte

    fin = f"a{n_iter + 1}"
    return (
        _kmeans_cte(k, n_iter, grid)
        + f""",
    ds AS (
      SELECT a.vec_id, a.cid AS own, c.cid AS ocid,
             list_sum(list_transform(list_zip(a.xq, c.cq),
               p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
      FROM {fin} a CROSS JOIN c{n_iter} c),
    ab AS (
      SELECT vec_id, own AS cid,
             min(CASE WHEN ocid = own THEN d2 END) AS a,
             min(CASE WHEN ocid <> own THEN d2 END) AS b
      FROM ds GROUP BY vec_id, own),
    sq AS (
      SELECT vec_id, cid,
             CASE WHEN greatest(a, b) > 0
                  THEN CAST(floor(CAST(b - a AS DOUBLE)
                                  / CAST(greatest(a, b) AS DOUBLE)
                                  * {scale}.0 + 0.5) AS BIGINT)
                  ELSE 0 END AS s
      FROM ab)
    SELECT CAST(cid AS BIGINT) AS cluster,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(s) AS DOUBLE) / (count(*) * {scale}.0), 6) + 0.0
             AS mean_silhouette
    FROM sq GROUP BY cid"""
    )


@_stage("q_silhouette", _silhouette_oracle(10, 4, 1 << 20, 1_000_000))
def q_silhouette(spark, sf_dir):
    from nonconsumptive_spark.operators import clustering as cl

    return cl.silhouette(load(spark, sf_dir, "embeddings"), k=10, n_iter=4)


# -- greedy k-center (farthest-point) coreset -------------------------------
def _kcenter_oracle(m: int, grid: int) -> str:
    parts = [f"""
    q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {grid}.0 + 0.5) AS BIGINT)) AS xq
      FROM embeddings),
    sel1 AS MATERIALIZED (
      SELECT 1 AS step, vec_id, xq, CAST(0 AS BIGINT) AS mind
      FROM q ORDER BY vec_id LIMIT 1)"""]
    for t in range(2, m + 1):
        parts.append(f"""
    pick{t} AS MATERIALIZED (
      SELECT {t} AS step, q.vec_id, q.xq,
             min(list_sum(list_transform(list_zip(q.xq, s.xq),
               p -> (p[1] - p[2]) * (p[1] - p[2])))) AS mind
      FROM q JOIN sel{t - 1} s ON true
      WHERE q.vec_id NOT IN (SELECT vec_id FROM sel{t - 1})
      GROUP BY q.vec_id, q.xq
      ORDER BY mind DESC, q.vec_id
      LIMIT 1),
    sel{t} AS MATERIALIZED (
      SELECT * FROM sel{t - 1} UNION ALL SELECT * FROM pick{t})""")
    return (
        "WITH" + ",".join(parts)
        + f"""
    SELECT CAST(step AS BIGINT) AS step, CAST(vec_id AS BIGINT) AS vec_id,
           CAST(mind AS BIGINT) AS mind
    FROM sel{m}"""
    )


@_stage("q_kcenter_select", _kcenter_oracle(8, 1 << 20))
def q_kcenter_select(spark, sf_dir):
    from nonconsumptive_spark.operators import clustering as cl

    return cl.kcenter_select(load(spark, sf_dir, "embeddings"), m=8)


# -- margin-based bitext mining (Artetxe & Schwenk 2019) ---------------------
_BT_K = 4
_BT_CAP = 128  # src batch: even vec_id below this (64 query vectors)
_BT_GRID = 1 << 20
_BT_SCALE = 1_000_000_000


def _bitext_oracle(k: int, cap: int, grid: int, scale: int) -> str:
    quant = (f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) "
             f"* {grid}.0 + 0.5) AS BIGINT))")
    return f"""
    WITH sn AS (
      SELECT vec_id AS src_id, xq,
             list_sum(list_transform(xq, v -> v * v)) AS nq
      FROM (SELECT vec_id, {quant} AS xq FROM embeddings
            WHERE vec_id % 2 = 0 AND vec_id < {cap})),
    tn AS (
      SELECT vec_id AS tgt_id, xq,
             list_sum(list_transform(xq, v -> v * v)) AS nq
      FROM (SELECT vec_id, {quant} AS xq FROM embeddings
            WHERE vec_id % 2 = 1)),
    p AS (
      SELECT sn.src_id, tn.tgt_id,
             CAST(floor(CAST(list_sum(list_transform(list_zip(sn.xq, tn.xq),
                                z -> z[1] * z[2])) AS DOUBLE)
                        / (sqrt(CAST(sn.nq AS DOUBLE))
                           * sqrt(CAST(tn.nq AS DOUBLE)))
                        * {scale}.0 + 0.5) AS BIGINT) AS qc
      FROM sn CROSS JOIN tn
      WHERE sn.nq > 0 AND tn.nq > 0),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY src_id
                                ORDER BY qc DESC, tgt_id) AS rf,
             row_number() OVER (PARTITION BY tgt_id
                                ORDER BY qc DESC, src_id) AS rb
      FROM p),
    sx AS (SELECT src_id, sum(qc) AS snn_x FROM r WHERE rf <= {k}
           GROUP BY src_id),
    sy AS (SELECT tgt_id, sum(qc) AS snn_y FROM r WHERE rb <= {k}
           GROUP BY tgt_id),
    m AS (
      SELECT r.src_id, r.tgt_id, r.qc,
             2 * {k} * r.qc - sx.snn_x - sy.snn_y AS margin_scaled
      FROM r JOIN sx USING (src_id) JOIN sy USING (tgt_id)
      WHERE r.rf <= {k})
    SELECT src_id, tgt_id, CAST(qc AS BIGINT) AS cos_scaled,
           CAST(margin_scaled AS BIGINT) AS margin_scaled
    FROM m
    QUALIFY row_number() OVER (PARTITION BY src_id
                               ORDER BY margin_scaled DESC, tgt_id) = 1"""


@_stage("q_bitext_margin", _bitext_oracle(_BT_K, _BT_CAP, _BT_GRID, _BT_SCALE))
def q_bitext_margin(spark, sf_dir):
    from nonconsumptive_spark.operators import similarity as sim

    emb = load(spark, sf_dir, "embeddings")
    src = emb.where((F.col("vec_id") % 2 == 0) & (F.col("vec_id") < _BT_CAP))
    tgt = emb.where(F.col("vec_id") % 2 == 1)
    return sim.bitext_margin_pairs(src, tgt, k=_BT_K)


# -- Fellegi–Sunter record-linkage scoring -----------------------------------
_FS_SCALE = 1_000_000
_FS_M = 0.9


def _fs_oracle(m: float, scale: int, min_agree: int) -> str:
    fields = """SELECT c_custkey AS key, c_nationkey AS blk,
             c_mktsegment AS seg,
             floor(c_acctbal / 1000.0) AS bal,
             substr(c_name, length(c_name), 1) AS dig
      FROM customer"""
    wq = []
    for j in (1, 2, 3):
        wq.append(f"""
        CAST(round(CASE WHEN g{j}
               THEN log2({m} * CAST(n AS DOUBLE) / CAST(cc{j} AS DOUBLE))
               ELSE log2((1.0 - {m}) * CAST(n AS DOUBLE)
                         / (CAST(n AS DOUBLE) - CAST(cc{j} AS DOUBLE)))
             END * {scale}.0) AS BIGINT)""")
    return f"""
    WITH c AS ({fields}),
    p AS (
      SELECT a.key AS key_a, b.key AS key_b,
             a.seg = b.seg AS g1, a.bal = b.bal AS g2, a.dig = b.dig AS g3
      FROM c a JOIN c b ON a.blk = b.blk AND a.key < b.key),
    st AS (
      SELECT count(*) AS n,
             greatest(least(sum(CASE WHEN g1 THEN 1 ELSE 0 END), count(*) - 1), 1) AS cc1,
             greatest(least(sum(CASE WHEN g2 THEN 1 ELSE 0 END), count(*) - 1), 1) AS cc2,
             greatest(least(sum(CASE WHEN g3 THEN 1 ELSE 0 END), count(*) - 1), 1) AS cc3
      FROM p)
    SELECT key_a, key_b,
           CAST((CASE WHEN g1 THEN 1 ELSE 0 END)
                + (CASE WHEN g2 THEN 1 ELSE 0 END)
                + (CASE WHEN g3 THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
           {" + ".join(wq)} AS weight_scaled
    FROM p CROSS JOIN st
    WHERE (CASE WHEN g1 THEN 1 ELSE 0 END)
          + (CASE WHEN g2 THEN 1 ELSE 0 END)
          + (CASE WHEN g3 THEN 1 ELSE 0 END) >= {min_agree}"""


@_stage("q_fs_link_scores", _fs_oracle(_FS_M, _FS_SCALE, 2))
def q_fs_link_scores(spark, sf_dir):
    from nonconsumptive_spark.operators import linkage

    return linkage.fs_link_scores(load(spark, sf_dir, "customer"))


# -- corpus bigram conditional entropy ---------------------------------------
_ENT_SCALE = 1_000_000_000


@_stage(
    "q_conditional_entropy",
    f"""
    WITH toks AS (
      SELECT doc_id, generate_subscripts({_DUCK_TOKS}, 1) AS pos,
             unnest({_DUCK_TOKS}) AS w
      FROM documents),
    bg AS (
      SELECT w0, w1, count(*) AS c12 FROM (
        SELECT w AS w0,
               lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
        FROM toks)
      WHERE w1 IS NOT NULL GROUP BY w0, w1),
    hb AS (
      SELECT sum(CAST(c12 AS HUGEINT)
                 * CAST(round(log2(c12) * {_ENT_SCALE}) AS HUGEINT)) AS hq_bi,
             CAST(sum(c12) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_bigrams
      FROM bg),
    hc AS (
      SELECT sum(CAST(c1 AS HUGEINT)
                 * CAST(round(log2(c1) * {_ENT_SCALE}) AS HUGEINT)) AS hq_ctx,
             CAST(count(*) AS BIGINT) AS n_contexts
      FROM (SELECT w0, sum(c12) AS c1 FROM bg GROUP BY w0))
    SELECT n_bigrams, n_contexts,
           round(CAST(hq_ctx - hq_bi AS DOUBLE)
                 / (CAST(n AS DOUBLE) * {_ENT_SCALE}.0), 6) + 0.0
             AS h_cond_bits
    FROM hb CROSS JOIN hc""",
)
def q_conditional_entropy(spark, sf_dir):
    from nonconsumptive_spark.operators import textstats as ts

    return ts.bigram_conditional_entropy(load(spark, sf_dir, "documents"))


# -- quality retention curve (filter-tuning table) ---------------------------
@_stage(
    "q_quality_retention",
    f"""
    WITH pd AS (
      SELECT CASE WHEN length(coalesce(text, '')) > 0
                  THEN least(CAST(floor(
                         length(regexp_replace(coalesce(text, ''),
                                               '[^\\pL]', '', 'g')) * 10
                         / length(coalesce(text, ''))) AS BIGINT), 9)
                  ELSE 0 END AS bucket,
             CAST(len({_DUCK_TOKS}) AS BIGINT) AS nt
      FROM documents),
    pb AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens
      FROM pd GROUP BY bucket)
    SELECT bucket, n_docs, n_tokens,
           CAST(sum(n_docs) OVER w AS BIGINT) AS cum_docs,
           CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens,
           round(CAST(sum(n_tokens) OVER w AS DOUBLE)
                 / CAST(sum(n_tokens) OVER () AS DOUBLE), 6) + 0.0
             AS retained_frac
    FROM pb
    WINDOW w AS (ORDER BY bucket DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
)
def q_quality_retention(spark, sf_dir):
    from nonconsumptive_spark.operators import pipeline as pl

    return pl.quality_retention_curve(load(spark, sf_dir, "documents"))


# -- shuffle-quality diagnostic over the training order ----------------------
@_stage(
    "q_shuffle_quality",
    """
    WITH keyed AS (
      SELECT doc_id, source, md5('42:' || CAST(doc_id AS VARCHAR)) AS k,
             CAST(CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 16 AS INTEGER) AS shard
      FROM documents),
    ordered AS (
      SELECT doc_id, source, shard,
             row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) AS pos
      FROM keyed),
    pairs AS (
      SELECT source, lag(source) OVER (PARTITION BY shard ORDER BY pos) AS prev
      FROM ordered),
    obs AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN source = prev THEN 1 ELSE 0 END) AS BIGINT)
               AS n_same
      FROM pairs WHERE prev IS NOT NULL),
    ex AS (
      SELECT CAST(sum(ns * (ns - 1)) AS BIGINT) AS same_ways,
             CAST(sum(ns) AS BIGINT) AS n
      FROM (SELECT count(*) AS ns FROM documents GROUP BY source))
    SELECT n_pairs, n_same,
           round(CAST(n_same AS DOUBLE) / CAST(n_pairs AS DOUBLE), 6) + 0.0
             AS same_rate,
           round(CAST(same_ways AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6) + 0.0
             AS expected_rate,
           round((CAST(n_same AS DOUBLE) / CAST(n_pairs AS DOUBLE))
                 / (CAST(same_ways AS DOUBLE)
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 4) + 0.0
             AS clumping
    FROM obs CROSS JOIN ex""",
)
def q_shuffle_quality(spark, sf_dir):
    from nonconsumptive_spark.operators import textstats as ts

    return ts.shuffle_quality(load(spark, sf_dir, "documents"))


# -- token-budget allocation under temperature mixing -------------------------
_MB_BUDGET = 1_000_000


@_stage(
    "q_mixture_budget",
    f"""
    WITH c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len({_DUCK_TOKS})) AS BIGINT) AS n_tokens
      FROM (SELECT source, coalesce(text, '') AS text FROM documents)
      GROUP BY source),
    z AS (SELECT sum(sqrt(n_docs)) AS z FROM c)
    SELECT source, n_docs, n_tokens,
           round(sqrt(n_docs) / z, 6) + 0.0 AS mix_frac,
           CAST(round(sqrt(n_docs) / z * {_MB_BUDGET}.0) AS BIGINT)
             AS target_tokens,
           round(sqrt(n_docs) / z * {_MB_BUDGET}.0
                 / CAST(n_tokens AS DOUBLE), 4) + 0.0 AS epochs,
           round(least(1.0, sqrt(n_docs) / z * {_MB_BUDGET}.0
                            / CAST(n_tokens AS DOUBLE)), 6) + 0.0
             AS sample_rate
    FROM c CROSS JOIN z""",
)
def q_mixture_budget(spark, sf_dir):
    from nonconsumptive_spark.operators import textstats as ts

    return ts.mixture_budget(load(spark, sf_dir, "documents"),
                             budget_tokens=_MB_BUDGET)


# -- near-dup-aware sampling: cap per cluster ---------------------------------
_CCS_CAP = 2


def _ccs_oracle(cap: int) -> str:
    from nonconsumptive_spark.queries.dedup import _DUCK_COMP

    return (
        _DUCK_COMP
        + f""",
    asg AS (
      SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
    ranked AS (
      SELECT doc_id, cluster,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rk
      FROM asg)
    SELECT doc_id, CAST(cluster AS BIGINT) AS cluster,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {cap}"""
    )


@_stage("q_cluster_capped_sample", _ccs_oracle(_CCS_CAP))
def q_cluster_capped_sample(spark, sf_dir):
    from nonconsumptive_spark.operators import dedup as dd

    return dd.cluster_capped_sample(load(spark, sf_dir, "documents"),
                                    cap=_CCS_CAP)


# ===========================================================================
# round-4 fourth-session batch: evaluation metrics, link prediction,
# dense-core extraction, sequential anomalies, fuzzy-string linkage,
# leakage-safe splits.
# ===========================================================================

# Shared undirected token-graph CTE (distinct bigram edges, symmetrized).
_DUCK_UND = f"""
    pairs0 AS (
      SELECT doc_id, token AS src,
             lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS dst
      FROM (SELECT doc_id, generate_subscripts({_DUCK_TOKS}, 1) AS pos,
                   unnest({_DUCK_TOKS}) AS token FROM documents)),
    dedges AS (SELECT DISTINCT src, dst FROM pairs0 WHERE dst IS NOT NULL),
    und AS (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM dedges
        UNION ALL
        SELECT dst, src FROM dedges)
      WHERE src <> dst)"""


# -- per-user event-type trigram sequences ----------------------------------
@_stage(
    "q_event_sequences",
    """
    WITH ordered AS (
      SELECT user_id, event_type AS t1,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
    FROM ordered WHERE t3 IS NOT NULL
    GROUP BY 1, 2, 3
    """,
)
def q_event_sequences(spark, sf_dir):
    """Length-3 behavioral sequence support counts (the trigram extension
    of q_event_transitions — sequential pattern mining's k=3 pass).  One
    user-partitioned window over the (ts, event_id) total order + one
    short-key agg."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("t1"),
            F.lead("event_type", 1).over(w).alias("t2"),
            F.lead("event_type", 2).over(w).alias("t3"),
        )
        .filter(F.col("t3").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count("*").cast("long").alias("n"))
    )


# -- Benford first-digit audit ----------------------------------------------
def _benford_oracle() -> str:
    from nonconsumptive_spark.operators.evaluation import (
        BENFORD_P, CHI2_SCALE)

    spine = ", ".join(f"({d}, CAST({p!r} AS DOUBLE))"
                      for d, p in sorted(BENFORD_P.items()))
    return f"""
    WITH q AS (
      SELECT event_type AS g,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq
      FROM events),
    base AS (
      SELECT g, CAST(substr(CAST(vq AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM q WHERE vq >= 1),
    obs AS (SELECT g, digit, CAST(count(*) AS BIGINT) AS o
            FROM base GROUP BY g, digit),
    tot AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY g),
    spine(digit, p) AS (VALUES {spine}),
    filled AS (
      SELECT t.g, t.n, s.digit, s.p,
             CAST(coalesce(o.o, 0) AS BIGINT) AS o
      FROM tot t CROSS JOIN spine s
      LEFT JOIN obs o ON o.g = t.g AND o.digit = s.digit),
    terms AS (
      SELECT g, n,
             CAST(floor(
               (CAST(o AS DOUBLE) - CAST(n AS DOUBLE) * p)
               * (CAST(o AS DOUBLE) - CAST(n AS DOUBLE) * p)
               / (CAST(n AS DOUBLE) * p) * {CHI2_SCALE} + 0.5)
             AS BIGINT) AS tq
      FROM filled)
    SELECT g AS event_type, max(n) AS n,
           round(CAST(sum(tq) AS DOUBLE) / {CHI2_SCALE}, 6) + 0.0 AS chi2
    FROM terms GROUP BY g
    """


@_stage("q_benford_deviation", _benford_oracle())
def q_benford_deviation(spark, sf_dir):
    from nonconsumptive_spark.operators.evaluation import benford_deviation

    return benford_deviation(load(spark, sf_dir, "events"),
                             group_col="event_type", value_col="value")


# -- one-vs-rest ROC AUC over the embedding table ---------------------------
def _auc_oracle() -> str:
    from nonconsumptive_spark.operators.evaluation import AUC_SCALE

    return f"""
    WITH base AS (
      SELECT label AS lbl,
             CAST(floor(CAST(embedding[1] AS DOUBLE) * {AUC_SCALE} + 0.5)
                  AS BIGINT) AS sq
      FROM embeddings),
    hist AS (SELECT lbl, sq, CAST(count(*) AS BIGINT) AS c
             FROM base GROUP BY lbl, sq),
    spine AS (SELECT DISTINCT lbl AS label FROM hist),
    pb AS (
      SELECT s.label, h.sq,
             CAST(sum(h.c) AS BIGINT) AS cnt,
             CAST(sum(CASE WHEN h.lbl = s.label THEN h.c ELSE 0 END)
                  AS BIGINT) AS np_b
      FROM hist h CROSS JOIN spine s
      GROUP BY s.label, h.sq),
    rk AS (
      SELECT label, cnt, np_b,
             sum(cnt) OVER (PARTITION BY label ORDER BY sq
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - cnt AS cum_before
      FROM pb),
    agg AS (
      SELECT label,
             CAST(sum(np_b * (2 * cum_before + cnt + 1)) AS BIGINT) AS s2,
             CAST(sum(np_b) AS BIGINT) AS n_pos,
             CAST(sum(cnt) AS BIGINT) AS n
      FROM rk GROUP BY label)
    SELECT label, n_pos, n - n_pos AS n_neg,
           CASE WHEN n_pos > 0 AND n - n_pos > 0 THEN
             round(CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
                   / (2.0 * n_pos * (n - n_pos)), 6) + 0.0
           END AS auc
    FROM agg
    """


@_stage("q_auc_eval", _auc_oracle())
def q_auc_eval(spark, sf_dir):
    """One-vs-rest ROC AUC of the first embedding coordinate against each
    class label — the grading primitive for every scorer in the curation
    pipeline (quality filters, langid, dedup scorers)."""
    from nonconsumptive_spark.operators.evaluation import auc_one_vs_rest

    emb = load(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").getItem(0).alias("score"))
    return auc_one_vs_rest(emb, label_col="label", score_col="score")


# -- Adamic-Adar link prediction over the token graph -----------------------
def _aa_oracle() -> str:
    import math

    from nonconsumptive_spark.operators.graph import (
        AA_MAX_MIDDLE_DEG, AA_SCALE)

    wt = ", ".join(
        f"({d}, {int(round(AA_SCALE / math.log(d)))})"
        for d in range(2, AA_MAX_MIDDLE_DEG + 1))
    return f"""
    WITH {_DUCK_UND},
    wt(deg, w) AS (VALUES {wt}),
    mids AS (
      SELECT g.mid, w.w
      FROM (SELECT src AS mid, CAST(count(*) AS BIGINT) AS deg
            FROM und GROUP BY src) g
      JOIN wt w ON w.deg = g.deg),
    adj AS (
      SELECT u.src AS mid, u.dst AS leaf, m.w
      FROM und u JOIN mids m ON u.src = m.mid),
    p AS (
      SELECT a.leaf AS node_a, b.leaf AS node_b,
             CAST(count(*) AS BIGINT) AS common_neighbors,
             CAST(sum(a.w) AS BIGINT) AS ws
      FROM adj a JOIN adj b ON a.mid = b.mid AND a.leaf < b.leaf
      GROUP BY 1, 2
      HAVING count(*) >= 2)
    SELECT node_a, node_b, common_neighbors,
           round(CAST(ws AS DOUBLE) / {AA_SCALE}, 6) + 0.0 AS aa_score
    FROM p
    WHERE NOT EXISTS (SELECT 1 FROM und u
                      WHERE u.src = p.node_a AND u.dst = p.node_b)
    """


@_stage("q_adamic_adar", _aa_oracle())
def q_adamic_adar(spark, sf_dir):
    from nonconsumptive_spark.operators.graph import adamic_adar, bigram_edges

    return adamic_adar(bigram_edges(load(spark, sf_dir, "documents")))


# -- k-core of the token graph ----------------------------------------------
_KCORE_K = 3
_KCORE_ROUNDS = 8


def _kcore_oracle(k: int, rounds: int) -> str:
    # Every e{r} is referenced twice by round r+1's two semi-joins; DuckDB
    # inlines plain CTEs per reference, so without MATERIALIZED the chain
    # re-expands 2^rounds times.
    chain = []
    for r in range(rounds):
        chain.append(f"""
    d{r} AS (SELECT src, count(*) AS c FROM e{r} GROUP BY src),
    a{r} AS MATERIALIZED (SELECT src FROM d{r} WHERE c >= {k}),
    e{r + 1} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{r} e
      JOIN a{r} x ON e.src = x.src
      JOIN a{r} y ON e.dst = y.src)""")
    return f"""
    WITH {_DUCK_UND},
    e0 AS MATERIALIZED (SELECT src, dst FROM und),{",".join(chain)}
    SELECT src AS node, CAST(count(*) AS BIGINT) AS core_deg
    FROM e{rounds} GROUP BY src HAVING count(*) >= {k}
    """


@_stage("q_kcore", _kcore_oracle(_KCORE_K, _KCORE_ROUNDS))
def q_kcore(spark, sf_dir):
    from nonconsumptive_spark.operators.graph import bigram_edges, kcore

    return kcore(bigram_edges(load(spark, sf_dir, "documents")),
                 k=_KCORE_K, n_rounds=_KCORE_ROUNDS)


# -- per-user EWMA anomaly flags --------------------------------------------
def _ewma_oracle() -> str:
    from nonconsumptive_spark.operators.grouped import EWMA_ALPHA, EWMA_SPIKE

    a, om = EWMA_ALPHA, 1.0 - EWMA_ALPHA
    return f"""
    WITH RECURSIVE seq AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    e(user_id, event_id, value, rn, ewma, prev) AS (
      SELECT user_id, event_id, value, rn, value, CAST(NULL AS DOUBLE)
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.event_id, s.value, s.rn,
             CAST({a!r} AS DOUBLE) * s.value
               + CAST({om!r} AS DOUBLE) * e.ewma,
             e.ewma
      FROM e JOIN seq s ON s.user_id = e.user_id AND s.rn = e.rn + 1)
    SELECT event_id, user_id, value,
           floor(ewma * 1000000 + 0.5) / 1000000.0 AS ewma,
           CASE WHEN prev IS NULL THEN FALSE
                ELSE abs(value - prev) > {EWMA_SPIKE!r} END AS is_spike
    FROM e
    """


@_stage("q_ewma_anomalies", _ewma_oracle())
def q_ewma_anomalies(spark, sf_dir):
    from nonconsumptive_spark.operators.grouped import ewma_anomalies

    return ewma_anomalies(load(spark, sf_dir, "events"))


# -- BLEU-lite pair scoring --------------------------------------------------
def _bleu_oracle() -> str:
    from nonconsumptive_spark.operators.evaluation import BLEU_BLOCK_MOD

    return f"""
    WITH base AS (SELECT doc_id AS doc, lang, {_DUCK_TOKS} AS t
                  FROM documents),
    lens AS (
      SELECT doc, lang, CAST(len(t) AS BIGINT) AS l1,
             CAST(greatest(len(t) - 1, 0) AS BIGINT) AS l2,
             doc % {BLEU_BLOCK_MOD} AS blk
      FROM base),
    pairs AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b,
             a.l1 AS l1_a, b.l1 AS l1_b, b.l2 AS l2_b
      FROM lens a JOIN lens b
        ON a.lang = b.lang AND a.blk = b.blk AND a.doc < b.doc),
    uni AS (
      SELECT doc, g, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc, unnest(t) AS g FROM base) GROUP BY doc, g),
    big AS (
      SELECT doc, g, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc, t[i] || ' ' || t[i + 1] AS g
            FROM base,
                 unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS r(i))
      GROUP BY doc, g),
    c1 AS (
      SELECT p.doc_a, p.doc_b,
             CAST(sum(least(xa.c, xb.c)) AS BIGINT) AS clip1
      FROM pairs p
      JOIN uni xa ON xa.doc = p.doc_a
      JOIN uni xb ON xb.doc = p.doc_b AND xb.g = xa.g
      GROUP BY p.doc_a, p.doc_b),
    c2 AS (
      SELECT p.doc_a, p.doc_b,
             CAST(sum(least(xa.c, xb.c)) AS BIGINT) AS clip2
      FROM pairs p
      JOIN big xa ON xa.doc = p.doc_a
      JOIN big xb ON xb.doc = p.doc_b AND xb.g = xa.g
      GROUP BY p.doc_a, p.doc_b),
    j AS (
      SELECT p.doc_a, p.doc_b, p.l1_a, p.l1_b, p.l2_b,
             CAST(coalesce(c1.clip1, 0) AS BIGINT) AS clip1,
             CAST(coalesce(c2.clip2, 0) AS BIGINT) AS clip2
      FROM pairs p
      LEFT JOIN c1 ON c1.doc_a = p.doc_a AND c1.doc_b = p.doc_b
      LEFT JOIN c2 ON c2.doc_a = p.doc_a AND c2.doc_b = p.doc_b)
    SELECT doc_a, doc_b,
           CASE WHEN l1_b > 0
                THEN round(CAST(clip1 AS DOUBLE) / l1_b, 6) + 0.0
                ELSE 0.0 END AS p1,
           CASE WHEN l2_b > 0
                THEN round(CAST(clip2 AS DOUBLE) / l2_b, 6) + 0.0
                ELSE 0.0 END AS p2,
           CASE WHEN l1_a > 0 AND l1_b > 0 AND l2_b > 0
                     AND clip1 > 0 AND clip2 > 0
                THEN round(
                  least(CAST(1.0 AS DOUBLE),
                        CAST(l1_b AS DOUBLE) / l1_a)
                  * sqrt((CAST(clip1 AS DOUBLE) / l1_b)
                         * (CAST(clip2 AS DOUBLE) / l2_b)), 6) + 0.0
                ELSE 0.0 END AS bleu2
    FROM j
    """


@_stage("q_bleu_pairs", _bleu_oracle())
def q_bleu_pairs(spark, sf_dir):
    from nonconsumptive_spark.operators.evaluation import bleu_pairs

    return bleu_pairs(load(spark, sf_dir, "documents"))


# -- leakage-safe train/val/test split --------------------------------------
def _lss_oracle() -> str:
    from nonconsumptive_spark.queries.dedup import _DUCK_COMP
    from nonconsumptive_spark.queries.textstats import _SPLIT_CASE

    return (
        _DUCK_COMP
        + f""",
    asg AS (
      SELECT d.doc_id,
             CAST(coalesce(c.cluster, d.doc_id) AS BIGINT) AS cluster
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
    SELECT doc_id, cluster, {_SPLIT_CASE} AS split
    FROM (SELECT doc_id, cluster,
                 CAST(('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 15))
                      AS BIGINT) % 10000 AS b
          FROM asg)"""
    )


@_stage("q_leakage_safe_split", _lss_oracle())
def q_leakage_safe_split(spark, sf_dir):
    """Split assignment keyed on the near-dup CLUSTER id, not the doc id —
    the split that cannot leak a near-duplicate of a test document into
    train (the failure mode a doc-keyed hash split has by construction).
    Components come from the verified LSH pair graph (q_dedup_clusters);
    the band edges are the same exact integer bands as q_dataset_split."""
    from nonconsumptive_spark.operators import dedup as dd
    from nonconsumptive_spark.operators import textstats as ts

    cl = dd.dedup_clusters(load(spark, sf_dir, "documents"), threshold=0.5)
    return cl.select("doc_id", "cluster",
                     ts.split_expr("cluster").alias("split"))


# -- Jaro-Winkler fuzzy-key linkage -----------------------------------------
_JW_THRESHOLD = 0.8


def _jw_oracle() -> str:
    from nonconsumptive_spark.operators.linkage import JW_KEY_CHARS, JW_WINDOW

    return f"""
    WITH keyed AS (
      SELECT doc_id AS doc, lang,
             substr(lower(coalesce(text, '')), 1, {JW_KEY_CHARS}) AS k
      FROM documents),
    ranked AS (
      SELECT doc, lang, k,
             row_number() OVER (ORDER BY lang, k, doc) AS rnk
      FROM keyed),
    p AS (
      SELECT least(a.doc, b.doc) AS doc_a,
             greatest(a.doc, b.doc) AS doc_b,
             round(jaro_winkler_similarity(a.k, b.k), 6) + 0.0 AS jw
      FROM ranked a JOIN ranked b
        ON a.lang = b.lang AND b.rnk > a.rnk
           AND b.rnk - a.rnk < {JW_WINDOW})
    SELECT doc_a, doc_b, jw FROM p WHERE jw >= {_JW_THRESHOLD!r}
    """


@_stage("q_jaro_winkler_links", _jw_oracle())
def q_jaro_winkler_links(spark, sf_dir):
    """SNM-window Jaro-Winkler linkage: candidates bounded to N*window
    by a (lang, key, id) sorted-neighborhood rank join (see
    operators/linkage.jaro_winkler_pairs), scored by the DuckDB-bit-
    parity JW kernel."""
    from nonconsumptive_spark.operators.linkage import jaro_winkler_pairs

    return jaro_winkler_pairs(load(spark, sf_dir, "documents"),
                              threshold=_JW_THRESHOLD)


# -- MRR / MAP ranker evaluation --------------------------------------------
def _mrr_oracle() -> str:
    from nonconsumptive_spark.operators import hybrid as hy
    from nonconsumptive_spark.queries.hybrid import _LEX_CTES, _SEM_CTES

    k, sc = hy.NDCG_K, hy.MAP_SCALE
    return f"""
    WITH {_LEX_CTES},
    {_SEM_CTES},
    rel AS (SELECT query_id, cand_id FROM semt),
    ranked AS (
      SELECT l.query_id, l.lex_rank,
             CASE WHEN r.cand_id IS NULL THEN 0 ELSE 1 END AS hit
      FROM lext l LEFT JOIN rel r
        ON r.query_id = l.query_id AND r.cand_id = l.cand_id
      WHERE l.lex_rank <= {k}),
    cums AS (
      SELECT query_id, lex_rank, hit,
             CAST(sum(hit) OVER (
               PARTITION BY query_id ORDER BY lex_rank
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum
      FROM ranked),
    perq AS (
      SELECT query_id,
             CAST(min(CASE WHEN hit = 1 THEN lex_rank END) AS BIGINT)
               AS first_rel,
             CAST(max(cum) AS BIGINT) AS hits_at_k,
             CAST(sum(CASE WHEN hit = 1 THEN
               CAST(floor(CAST({sc} AS DOUBLE) * cum / lex_rank + 0.5)
                    AS BIGINT) ELSE 0 END) AS BIGINT) AS ap_q
      FROM cums GROUP BY 1),
    nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
             FROM rel GROUP BY 1)
    SELECT n.query_id, n.n_rel, p.first_rel,
           CAST(coalesce(p.hits_at_k, 0) AS BIGINT) AS hits_at_k,
           round(CAST(1.0 AS DOUBLE) / p.first_rel, 6) + 0.0 AS rr,
           coalesce(round((CAST(p.ap_q AS DOUBLE) / {sc})
                          / least(n.n_rel, {k}), 6) + 0.0, 0.0) AS ap
    FROM nrel n LEFT JOIN perq p USING (query_id)
    """


@_stage("q_mrr_map_eval", _mrr_oracle())
def q_mrr_map_eval(spark, sf_dir):
    from nonconsumptive_spark.operators.hybrid import mrr_map_eval
    from nonconsumptive_spark.queries.hybrid import _N_Q

    return mrr_map_eval(load(spark, sf_dir, "documents"),
                        load(spark, sf_dir, "embeddings"), n_queries=_N_Q)


# -- Good-Turing frequency-of-frequency smoothing ---------------------------
@_stage(
    "q_good_turing",
    f"""
    WITH counts AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest({_DUCK_TOKS}) AS token FROM documents)
      GROUP BY token),
    hist AS (SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r
             FROM counts GROUP BY c)
    SELECT h.r, h.n_r,
           round((h.r + 1) * CAST(h2.n_r AS DOUBLE) / h.n_r, 6) + 0.0
             AS r_star
    FROM hist h LEFT JOIN hist h2 ON h2.r = h.r + 1
    """,
)
def q_good_turing(spark, sf_dir):
    """Good-Turing adjusted counts r* = (r+1) N_{{r+1}} / N_r over the
    corpus frequency-of-frequencies — the classic unseen-mass smoother
    (Good 1953) behind Katz backoff; rows where N_{{r+1}} is empty emit
    NULL (the regime where GT hands off to raw counts).  Plan: the
    global wordcount agg, a count-histogram agg (output is #distinct
    frequencies, tiny), and a self-join on r+1."""
    from nonconsumptive_spark.operators.wordcount import global_wordcount

    hist = (
        global_wordcount(load(spark, sf_dir, "documents"))
        .groupBy(F.col("count").alias("r"))
        .agg(F.count("*").cast("long").alias("n_r"))
    )
    nxt = hist.select((F.col("r") - 1).alias("r"),
                      F.col("n_r").alias("n_r2"))
    return (
        hist.join(nxt, "r", "left")
        .select(
            "r", "n_r",
            (F.round((F.col("r") + 1) * F.col("n_r2").cast("double")
                     / F.col("n_r"), 6) + F.lit(0.0)).alias("r_star"),
        )
    )


# -- token burstiness (Fano factor) -----------------------------------------
_BURST_MIN_TOTAL = 50


@_stage(
    "q_token_burstiness",
    f"""
    WITH per AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents)
      GROUP BY doc_id, token),
    tok AS (
      SELECT token, CAST(sum(c) AS BIGINT) AS total,
             CAST(sum(c * c) AS BIGINT) AS ssq,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM per GROUP BY token),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
    SELECT t.token, t.total, t.n_docs,
           round(CAST(nd.n * t.ssq - t.total * t.total AS DOUBLE)
                 / (nd.n * t.total), 6) + 0.0 AS fano
    FROM tok t CROSS JOIN nd
    WHERE t.total >= {_BURST_MIN_TOTAL}
    """,
)
def q_token_burstiness(spark, sf_dir):
    """Per-token burstiness as the Fano factor var/mean of per-document
    counts (zeros included) — Church & Gale's dispersion signal: content
    words clump (fano >> 1), function words spread (fano ~ 1).  All
    moments exact BIGINTs off the (doc, token) count table; fano is ONE
    float division.  Plan: one (doc, token) agg, one token agg, a 1-row
    doc-count attach; output bounded by the >= {_BURST_MIN_TOTAL}-total
    vocabulary cut."""
    from nonconsumptive_spark.functions.text import tokenize

    docs = load(spark, sf_dir, "documents")
    per = (
        docs.select("doc_id", F.explode(tokenize("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("c"))
    )
    tok = per.groupBy("token").agg(
        F.sum("c").cast("long").alias("total"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ssq"),
        F.count("*").cast("long").alias("n_docs"),
    )
    nd = docs.agg(F.count("*").cast("long").alias("n"))
    return (
        tok.crossJoin(F.broadcast(nd))
        .filter(F.col("total") >= _BURST_MIN_TOTAL)
        .select(
            "token", "total", "n_docs",
            (F.round(
                (F.col("n") * F.col("ssq")
                 - F.col("total") * F.col("total")).cast("double")
                / (F.col("n") * F.col("total")), 6) + F.lit(0.0))
            .alias("fano"),
        )
    )


# -- calibration bins / reliability diagram ---------------------------------
def _cal_oracle() -> str:
    from nonconsumptive_spark.operators.evaluation import CAL_BINS, CAL_SCALE

    return f"""
    WITH base AS (
      SELECT least(CAST(floor(
               ((greatest(CAST(-1.0 AS DOUBLE),
                          least(CAST(1.0 AS DOUBLE),
                                CAST(embedding[1] AS DOUBLE)))
                 + CAST(1.0 AS DOUBLE)) / CAST(2.0 AS DOUBLE))
               * {CAL_BINS}) AS BIGINT), {CAL_BINS - 1}) AS bin,
             CAST(floor(
               ((greatest(CAST(-1.0 AS DOUBLE),
                          least(CAST(1.0 AS DOUBLE),
                                CAST(embedding[1] AS DOUBLE)))
                 + CAST(1.0 AS DOUBLE)) / CAST(2.0 AS DOUBLE))
               * {CAL_SCALE} + 0.5) AS BIGINT) AS pq,
             CASE WHEN label = 0 THEN 1 ELSE 0 END AS pos
      FROM embeddings),
    agg AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(sum(pq) AS BIGINT) AS spq
      FROM base GROUP BY bin)
    SELECT bin, n, n_pos,
           round(CAST(spq AS DOUBLE) / (n * {CAL_SCALE}), 6) + 0.0
             AS avg_conf,
           round(CAST(n_pos AS DOUBLE) / n, 6) + 0.0 AS pos_rate,
           round(abs(CAST(spq AS DOUBLE) / (n * {CAL_SCALE})
                     - CAST(n_pos AS DOUBLE) / n), 6) + 0.0 AS gap
    FROM agg
    """


@_stage("q_calibration_bins", _cal_oracle())
def q_calibration_bins(spark, sf_dir):
    from nonconsumptive_spark.operators.evaluation import calibration_bins

    emb = load(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").getItem(0).alias("score"))
    # pos_value=0 explicitly: the synthetic embeddings table encodes its
    # positive class as label 0 (the operator default is the usual 1)
    return calibration_bins(emb, label_col="label", score_col="score",
                            pos_value=0)


# -- l-diversity privacy diagnostic -----------------------------------------
_LDIV_L = 3


@_stage(
    "q_l_diversity",
    f"""
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS class_size,
           CAST(count(DISTINCT user_id) AS BIGINT) AS l_div,
           count(DISTINCT user_id) < {_LDIV_L} AS is_risky
    FROM events GROUP BY 1, 2
    """,
)
def q_l_diversity(spark, sf_dir):
    """l-diversity companion to q_k_anonymity: per quasi-identifier class
    (event_type, day), the count of DISTINCT sensitive values (user_id) —
    a class can be k-anonymous yet single-valued in the sensitive
    attribute, which still leaks it (Machanavajjhala et al. 2007).  One
    groupBy on the quasi columns with a distinct-count; nothing scales
    past the class count."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type",
                   F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").cast("long").alias("class_size"),
             F.countDistinct("user_id").cast("long").alias("l_div"))
        .withColumn("is_risky", F.col("l_div") < _LDIV_L)
    )


# -- AMS F2 sketch -----------------------------------------------------------
def _ams_oracle() -> str:
    from nonconsumptive_spark.operators.wordcount import AMS_R

    xs = ", ".join(
        f"CAST(sum(c * (((h >> {r}) & 1) * 2 - 1)) AS BIGINT) AS x{r}"
        for r in range(AMS_R))
    sumsq = " + ".join(f"x{r} * x{r}" for r in range(AMS_R))
    return f"""
    WITH counts AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest({_DUCK_TOKS}) AS token FROM documents)
      GROUP BY token),
    sgn AS (
      SELECT c, CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS h
      FROM counts),
    agg AS (
      SELECT CAST(sum(c * c) AS BIGINT) AS f2, {xs}
      FROM sgn)
    SELECT f2 AS f2_exact,
           round(CAST(({sumsq}) AS DOUBLE) / {AMS_R}, 4) + 0.0 AS f2_est,
           round(abs(CAST(({sumsq}) - {AMS_R} * f2 AS DOUBLE))
                 / (CAST({AMS_R} AS DOUBLE) * f2), 6) + 0.0 AS rel_err
    FROM agg
    """


@_stage("q_ams_f2", _ams_oracle())
def q_ams_f2(spark, sf_dir):
    from nonconsumptive_spark.operators.wordcount import ams_f2

    return ams_f2(load(spark, sf_dir, "documents"))


# -- personalized PageRank ---------------------------------------------------
_PPR_SEEDS = ["table", "data", "query"]
_PPR_ITERS = 6


def _ppr_oracle() -> str:
    from nonconsumptive_spark.operators.graph import PPR_DAMPING, PPR_SCALE

    teleport = repr((1.0 - PPR_DAMPING) / len(_PPR_SEEDS))
    seeds = ", ".join(f"'{s}'" for s in _PPR_SEEDS)
    cte = [f"""
    pairs0 AS (
      SELECT doc_id, token AS src,
             lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS dst
      FROM (SELECT doc_id, generate_subscripts({_DUCK_TOKS}, 1) AS pos,
                   unnest({_DUCK_TOKS}) AS token FROM documents)),
    dedges AS (SELECT DISTINCT src, dst FROM pairs0 WHERE dst IS NOT NULL),
    odeg AS (SELECT src, CAST(count(*) AS BIGINT) AS out_deg
             FROM dedges GROUP BY src),
    ed AS MATERIALIZED (
      SELECT e.src, e.dst, d.out_deg FROM dedges e JOIN odeg d USING (src)),
    nodesr AS MATERIALIZED (
      SELECT node,
             CASE WHEN node IN ({seeds})
                  THEN CAST({teleport} AS DOUBLE)
                  ELSE CAST(0.0 AS DOUBLE) END AS restart
      FROM (SELECT src AS node FROM dedges
            UNION SELECT dst FROM dedges)),
    r0 AS (SELECT node, restart AS rank FROM nodesr)"""]
    for i in range(1, _PPR_ITERS + 1):
        cte.append(f"""
    r{i} AS MATERIALIZED (
      SELECT nd.node,
             nd.restart + CAST({PPR_DAMPING!r} AS DOUBLE)
               * (CAST(coalesce(c.sq, 0) AS DOUBLE) / {PPR_SCALE}) AS rank
      FROM nodesr nd LEFT JOIN (
        SELECT ed.dst AS node,
               CAST(sum(CAST(floor(
                 CAST(CAST(floor(r.rank * {PPR_SCALE}) AS BIGINT) AS DOUBLE)
                 / ed.out_deg) AS BIGINT)) AS BIGINT) AS sq
        FROM ed JOIN r{i - 1} r ON ed.src = r.node
        GROUP BY ed.dst) c USING (node))""")
    return ("WITH" + ",".join(cte) + f"""
    SELECT * FROM (
      SELECT node, round(rank, 9) + 0.0 AS rank FROM r{_PPR_ITERS})
    WHERE rank > 0.0""")


@_stage("q_ppr_tokens", _ppr_oracle())
def q_ppr_tokens(spark, sf_dir):
    from nonconsumptive_spark.operators.graph import (
        bigram_edges, personalized_pagerank)

    return personalized_pagerank(
        bigram_edges(load(spark, sf_dir, "documents")),
        seeds=_PPR_SEEDS, n_iter=_PPR_ITERS)


# -- local clustering coefficient -------------------------------------------
def _cc_oracle() -> str:
    from nonconsumptive_spark.operators.graph import CC_MAX_DEG

    return f"""
    WITH {_DUCK_UND},
    degs AS (SELECT src AS mid, CAST(count(*) AS BIGINT) AS deg
             FROM und GROUP BY src),
    mids AS (SELECT mid, deg FROM degs
             WHERE deg BETWEEN 2 AND {CC_MAX_DEG}),
    adj AS (SELECT u.src AS mid, u.dst AS leaf
            FROM und u JOIN mids m ON u.src = m.mid),
    closed AS (
      SELECT a.mid, CAST(count(*) AS BIGINT) AS triangles
      FROM adj a JOIN adj b ON a.mid = b.mid AND a.leaf < b.leaf
      WHERE EXISTS (SELECT 1 FROM und u
                    WHERE u.src = a.leaf AND u.dst = b.leaf)
      GROUP BY a.mid)
    SELECT m.mid AS node, m.deg,
           CAST(coalesce(c.triangles, 0) AS BIGINT) AS triangles,
           round(CAST(2 * coalesce(c.triangles, 0) AS DOUBLE)
                 / (m.deg * (m.deg - 1)), 6) + 0.0 AS cc
    FROM mids m LEFT JOIN closed c ON c.mid = m.mid
    """


@_stage("q_clustering_coefficient", _cc_oracle())
def q_clustering_coefficient(spark, sf_dir):
    from nonconsumptive_spark.operators.graph import (
        bigram_edges, clustering_coefficient)

    return clustering_coefficient(
        bigram_edges(load(spark, sf_dir, "documents")))


# -- bigram LM hit@k on a held-out split ------------------------------------
_LMH_K = 3


@_stage(
    "q_lm_hit_at_k",
    f"""
    WITH split AS (
      SELECT doc_id, {_DUCK_TOKS} AS t,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 10000 < 9800 AS is_train
      FROM documents),
    big AS (
      SELECT doc_id, is_train, t[i] AS w1, t[i + 1] AS w2
      FROM split,
           unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS r(i)),
    train AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
      FROM big WHERE is_train GROUP BY w1, w2),
    topk AS (
      SELECT w1, w2 FROM (
        SELECT w1, w2,
               row_number() OVER (PARTITION BY w1
                                  ORDER BY c DESC, w2 ASC) AS rk
        FROM train)
      WHERE rk <= {_LMH_K}),
    held AS (SELECT w1, w2 FROM big WHERE NOT is_train),
    scored AS (
      SELECT h.w1, h.w2,
             EXISTS (SELECT 1 FROM train t WHERE t.w1 = h.w1) AS covered,
             EXISTS (SELECT 1 FROM topk k
                     WHERE k.w1 = h.w1 AND k.w2 = h.w2) AS hit
      FROM held h)
    SELECT CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT)
             AS n_covered,
           CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS hits,
           round(CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) + 0.0 AS coverage,
           round(CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS DOUBLE)
                 / sum(CASE WHEN covered THEN 1 ELSE 0 END), 6) + 0.0
             AS hit_rate
    FROM scored
    """,
)
def q_lm_hit_at_k(spark, sf_dir):
    """Next-token hit@k backtest of the corpus bigram LM: train bigram
    counts on the hash-split train docs, then ask — for each held-out
    bigram whose head was seen in training — whether the true
    continuation sits in the head's top-{k} by count.  The deployment-
    shaped LM eval beside perplexity (it measures the ranking the model
    would actually serve).  Plan: one train-bigram agg, a head-
    partitioned top-k window (vocab-bounded), two left semi-ish joins;
    one summary row."""
    from pyspark.sql import Window

    from nonconsumptive_spark.functions.text import tokenize
    from nonconsumptive_spark.operators.textstats import split_expr

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", tokenize("text").alias("t"),
        (split_expr("doc_id") == "train").alias("is_train"))
    big = docs.select(
        "is_train",
        F.explode(F.zip_with(
            F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
            F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )).alias("g"),
    ).select("is_train", "g.w1", "g.w2")
    train = (
        big.filter("is_train").groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c"))
    )
    w = Window.partitionBy("w1").orderBy(F.desc("c"), F.asc("w2"))
    topk = (
        train.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _LMH_K).select("w1", "w2")
    )
    held = big.filter(~F.col("is_train")).select("w1", "w2")
    heads = train.select("w1").distinct().withColumn("cv", F.lit(1))
    hits = topk.withColumn("ht", F.lit(1))
    scored = (
        held.join(F.broadcast(heads), "w1", "left")
        .join(F.broadcast(hits), ["w1", "w2"], "left")
        .select(F.coalesce("cv", F.lit(0)).alias("covered"),
                F.coalesce("ht", F.lit(0)).alias("hit"))
    )
    return scored.agg(
        F.count("*").cast("long").alias("n_eval"),
        F.sum("covered").cast("long").alias("n_covered"),
        F.sum("hit").cast("long").alias("hits"),
    ).select(
        "n_eval", "n_covered", "hits",
        (F.round(F.col("n_covered").cast("double") / F.col("n_eval"), 6)
         + F.lit(0.0)).alias("coverage"),
        (F.round(F.col("hits").cast("double") / F.col("n_covered"), 6)
         + F.lit(0.0)).alias("hit_rate"),
    )


# -- rank-biased precision ---------------------------------------------------
def _rbp_oracle() -> str:
    from nonconsumptive_spark.operators import hybrid as hy
    from nonconsumptive_spark.queries.hybrid import _LEX_CTES, _SEM_CTES

    k = hy.NDCG_K
    warr = "[" + ", ".join(f"{w}::BIGINT" for w in hy.rbp_weights(k)) + "]"
    return f"""
    WITH {_LEX_CTES},
    {_SEM_CTES},
    rel AS (SELECT query_id, cand_id FROM semt),
    wq AS (
      SELECT l.query_id,
             CAST(sum(CASE WHEN r.cand_id IS NULL THEN 0
                           ELSE {warr}[l.lex_rank] END) AS BIGINT) AS wq
      FROM lext l LEFT JOIN rel r
        ON r.query_id = l.query_id AND r.cand_id = l.cand_id
      WHERE l.lex_rank <= {k} GROUP BY 1),
    nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
             FROM rel GROUP BY 1)
    SELECT n.query_id, n.n_rel,
           round(CAST(coalesce(w.wq, 0) AS DOUBLE) / {hy.MAP_SCALE}, 6)
             + 0.0 AS rbp
    FROM nrel n LEFT JOIN wq w USING (query_id)
    """


@_stage("q_rbp_eval", _rbp_oracle())
def q_rbp_eval(spark, sf_dir):
    from nonconsumptive_spark.operators.hybrid import rbp_eval
    from nonconsumptive_spark.queries.hybrid import _N_Q

    return rbp_eval(load(spark, sf_dir, "documents"),
                    load(spark, sf_dir, "embeddings"), n_queries=_N_Q)


# -- per-source KL divergence from the corpus mixture ------------------------
def _skl_oracle() -> str:
    from nonconsumptive_spark.operators.textstats import JSD_SCALE

    return f"""
    WITH cnt AS (
      SELECT source AS s, w, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT source, unnest({_DUCK_TOKS}) AS w FROM documents) z
      GROUP BY source, w),
    corpus AS (SELECT w, CAST(sum(c) AS BIGINT) AS c_all
               FROM cnt GROUP BY w),
    vt AS (SELECT CAST(count(*) AS BIGINT) AS v,
                  CAST(sum(c_all) AS BIGINT) AS n_all FROM corpus),
    strata AS (SELECT s, CAST(sum(c) AS BIGINT) AS n_s FROM cnt GROUP BY s),
    filled AS (
      SELECT st.s, co.w, co.c_all, st.n_s, vt.v, vt.n_all,
             CAST(coalesce(c.c, 0) AS BIGINT) AS c_s
      FROM corpus co CROSS JOIN strata st CROSS JOIN vt
      LEFT JOIN cnt c ON c.s = st.s AND c.w = co.w),
    terms AS (
      SELECT s, n_s, v,
             CAST(round(((c_s + 1) / (n_s + v))
                        * ln(((c_s + 1) / (n_s + v))
                             / ((c_all + 1) / (n_all + v)))
                        * {JSD_SCALE}) AS BIGINT) AS tq
      FROM filled)
    SELECT s AS source, max(n_s) AS n_tokens, max(v) AS v,
           round(CAST(sum(tq) AS BIGINT) * 1.0 / {JSD_SCALE}, 6) + 0.0 AS kl
    FROM terms GROUP BY s
    """


@_stage("q_source_kl", _skl_oracle())
def q_source_kl(spark, sf_dir):
    from nonconsumptive_spark.operators.textstats import source_kl_divergence

    return source_kl_divergence(load(spark, sf_dir, "documents"))


# -- Mann-Kendall trend test + Sen's slope per event type --------------------
_MK_SCALE = 10**6


@_stage(
    "q_mann_kendall",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    prs AS (
      SELECT a.event_type,
             CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END
               AS sg,
             CAST(floor({_MK_SCALE} * (b.c - a.c)
                        / date_diff('day', a.d, b.d) + 0.5) AS BIGINT)
               AS slope_q
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d),
    sstat AS (
      SELECT event_type, CAST(sum(sg) AS BIGINT) AS s_stat
      FROM prs GROUP BY event_type),
    ties AS (
      SELECT event_type,
             CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie18
      FROM (SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
            FROM daily GROUP BY event_type, c) g
      WHERE t > 1 GROUP BY event_type),
    med AS (
      SELECT event_type,
             CAST(sum(CASE WHEN rn = (m + 1) // 2 OR rn = m // 2 + 1
                           THEN slope_q ELSE 0 END) AS DOUBLE)
               / sum(CASE WHEN rn = (m + 1) // 2 OR rn = m // 2 + 1
                          THEN 1 ELSE 0 END) AS med_q
      FROM (SELECT event_type, slope_q,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY slope_q) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS m
            FROM prs) r
      GROUP BY event_type)
    SELECT b.event_type, b.n AS n_days, s.s_stat,
           b.raw18 - coalesce(t.tie18, 0) AS var18,
           round(CASE WHEN s.s_stat > 0 THEN
                   (s.s_stat - 1)
                   / sqrt(CAST(b.raw18 - coalesce(t.tie18, 0) AS DOUBLE)
                          / 18.0)
                 WHEN s.s_stat < 0 THEN
                   (s.s_stat + 1)
                   / sqrt(CAST(b.raw18 - coalesce(t.tie18, 0) AS DOUBLE)
                          / 18.0)
                 ELSE CAST(0.0 AS DOUBLE) END, 6) + 0.0 AS z,
           round(m.med_q / {_MK_SCALE}, 6) + 0.0 AS sen_slope
    FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(count(*) * (count(*) - 1) * (2 * count(*) + 5)
                      AS BIGINT) AS raw18
          FROM daily GROUP BY event_type) b
    JOIN sstat s USING (event_type)
    LEFT JOIN ties t USING (event_type)
    JOIN med m USING (event_type)
    """,
)
def q_mann_kendall(spark, sf_dir):
    """Mann-Kendall trend test + Sen's slope per event type over the
    daily count series: S = sum of pairwise sign(c_j - c_i), tie-
    corrected variance, the +-1-continuity z statistic, and the median
    pairwise slope (Sen 1968) — the nonparametric is-this-metric-
    drifting detector beside CUSUM (which finds WHEN it changed).

    Exactness: S, the variance terms, and the 1e6-quantized slopes are
    all BIGINTs; the median averages at most two integers; z is a
    3-float-op chain mirrored verbatim.  Plan: daily agg first (spine-
    sized), then an O(days^2)-per-type self-join — bounded by the day
    spine, never the event count (document the 10-year bound: 3650 days
    -> 6.7M pairs per type)."""
    from pyspark.sql import Window

    from nonconsumptive_spark.plans.checkpoint import materialize_once

    ev = load(spark, sf_dir, "events")
    # daily feeds FOUR subtrees (both pair sides, base, ties) and prs
    # feeds two (s_stat, median) — un-materialized, the events-corpus
    # agg ran 4x and the pair join twice (r9; guide §1.2)
    daily = materialize_once(
        ev.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("long").alias("c")),
        "mk_daily")
    a = daily.select("event_type", F.col("d").alias("da"),
                     F.col("c").alias("ca"))
    b = daily.select("event_type", F.col("d").alias("db"),
                     F.col("c").alias("cb"))
    prs = (
        # broadcast the day spine: daily is bounded by #types x #days,
        # never the event count, so the pair build needs no shuffle
        a.join(F.broadcast(b), "event_type")
        .filter(F.col("da") < F.col("db"))
        .select(
            "event_type",
            F.when(F.col("cb") > F.col("ca"), 1)
            .when(F.col("cb") < F.col("ca"), -1).otherwise(0).alias("sg"),
            F.floor(F.lit(_MK_SCALE) * (F.col("cb") - F.col("ca"))
                    / F.datediff("db", "da") + F.lit(0.5))
            .cast("long").alias("slope_q"),
        )
    )
    prs = materialize_once(prs, "mk_prs")
    base = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"))
    raw18 = (F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5))
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count("*").cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("event_type")
        .agg(F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
             .cast("long").alias("tie18"))
    )
    sstat = prs.groupBy("event_type").agg(
        F.sum("sg").cast("long").alias("s_stat"))
    w = Window.partitionBy("event_type").orderBy("slope_q")
    mid = (
        prs.select("event_type", "slope_q",
                   F.row_number().over(w).alias("rn"),
                   F.count("*").over(
                       Window.partitionBy("event_type")).alias("m"))
        .filter((F.col("rn") == F.floor((F.col("m") + 1) / 2))
                | (F.col("rn") == F.floor(F.col("m") / 2) + 1))
        .groupBy("event_type")
        .agg((F.sum("slope_q").cast("double") / F.count("*"))
             .alias("med_q"))
    )
    var18 = (raw18 - F.coalesce("tie18", F.lit(0))).cast("long")
    sd = F.sqrt(var18.cast("double") / F.lit(18.0))
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / sd)
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / sd)
        .otherwise(F.lit(0.0))
    )
    return (
        base.join(sstat, "event_type")
        .join(ties, "event_type", "left")
        .join(mid, "event_type")
        .select(
            "event_type", F.col("n").alias("n_days"), "s_stat",
            var18.alias("var18"),
            (F.round(z, 6) + F.lit(0.0)).alias("z"),
            (F.round(F.col("med_q") / _MK_SCALE, 6) + F.lit(0.0))
            .alias("sen_slope"),
        )
    )


# -- Neyman optimal sample allocation ----------------------------------------
_NEY_BUDGET = 100
_NEY_SCALE = 10**6


@_stage(
    "q_neyman_allocation",
    f"""
    WITH mom AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(n_chars) AS BIGINT) AS sm,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS ssq
      FROM documents GROUP BY source),
    wq AS (
      SELECT source, n_rows,
             round(sqrt(CAST(n_rows * ssq - sm * sm AS DOUBLE)
                        / (CAST(n_rows AS DOUBLE) * n_rows)), 6) + 0.0
               AS sigma,
             CAST(floor(n_rows
                        * sqrt(CAST(n_rows * ssq - sm * sm AS DOUBLE)
                               / (CAST(n_rows AS DOUBLE) * n_rows))
                        * {_NEY_SCALE} + 0.5) AS BIGINT) AS w
      FROM mom),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM wq)
    SELECT source, n_rows, sigma,
           CAST(floor({_NEY_BUDGET} * CAST(w AS DOUBLE) / wt + 0.5)
                AS BIGINT) AS alloc
    FROM wq CROSS JOIN tot
    """,
)
def q_neyman_allocation(spark, sf_dir):
    """Neyman optimal allocation of a {budget}-row sample across sources:
    n_s proportional to N_s * sigma_s (minimum-variance stratified
    sampling for a fixed budget — the statistically-grounded upgrade to
    proportional allocation; Neyman 1934).  Population sigma comes from
    exact BIGINT moments with one division + one sqrt; the N*sigma
    weights quantize to BIGINTs before the normalizing sum, so the
    allocation replays exactly.  Plan: one stratum moment agg + a 1-row
    broadcast total."""
    docs = load(spark, sf_dir, "documents")
    mom = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("n_chars").cast("long").alias("sm"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("ssq"),
    )
    sigma = F.sqrt(
        (F.col("n_rows") * F.col("ssq") - F.col("sm") * F.col("sm"))
        .cast("double")
        / (F.col("n_rows").cast("double") * F.col("n_rows"))
    )
    wq = mom.select(
        "source", "n_rows",
        (F.round(sigma, 6) + F.lit(0.0)).alias("sigma"),
        F.floor(F.col("n_rows") * sigma * _NEY_SCALE + F.lit(0.5))
        .cast("long").alias("w"),
    )
    tot = wq.agg(F.sum("w").cast("long").alias("wt"))
    return (
        wq.crossJoin(F.broadcast(tot))
        .select(
            "source", "n_rows", "sigma",
            F.floor(F.lit(_NEY_BUDGET) * F.col("w").cast("double")
                    / F.col("wt") + F.lit(0.5)).cast("long").alias("alloc"),
        )
    )


# -- Kendall tau-b over bucketized (length, token-count) ----------------------
# Cells bound the pair build: documents aggregate to (x_bucket, y_bucket,
# count) first, so the concordance join touches #cells^2 rows (a few
# hundred), never n^2 document pairs.  Doc counts per cell keep nc/nd/
# tie sums exact BIGINTs; tau-b itself is the one mirrored float.
_KT_XW = 50   # n_chars bucket width
_KT_YW = 10   # token-count bucket width


@_stage(
    "q_kendall_tau_b",
    f"""
    WITH cells AS (
      SELECT n_chars // {_KT_XW} AS xb,
             len(list_filter(regexp_split_to_array(coalesce(text, ''),
                                                   '[^\\pL]+'),
                             x -> x <> '')) // {_KT_YW} AS yb,
             CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
    xt AS (
      SELECT CAST(sum(nx * (nx - 1) // 2) AS BIGINT) AS n1
      FROM (SELECT CAST(sum(c) AS BIGINT) AS nx FROM cells GROUP BY xb)),
    yt AS (
      SELECT CAST(sum(ny * (ny - 1) // 2) AS BIGINT) AS n2
      FROM (SELECT CAST(sum(c) AS BIGINT) AS ny FROM cells GROUP BY yb)),
    cd AS (
      SELECT
        CAST(coalesce(sum(CASE WHEN b.yb > a.yb
                               THEN a.c * b.c END), 0) AS BIGINT) AS nc,
        CAST(coalesce(sum(CASE WHEN b.yb < a.yb
                               THEN a.c * b.c END), 0) AS BIGINT) AS nd
      FROM cells a JOIN cells b ON a.xb < b.xb AND a.yb <> b.yb)
    SELECT n, CAST(n * (n - 1) // 2 AS BIGINT) AS n0, n1, n2, nc, nd,
           CASE WHEN (n * (n - 1) // 2 - n1) * (n * (n - 1) // 2 - n2) > 0
                THEN round((nc - nd) / sqrt(
                       CAST(n * (n - 1) // 2 - n1 AS DOUBLE)
                       * (n * (n - 1) // 2 - n2)), 6) + 0.0
                ELSE CAST(0.0 AS DOUBLE) END AS tau_b
    FROM tot CROSS JOIN xt CROSS JOIN yt CROSS JOIN cd
    """,
)
def q_kendall_tau_b(spark, sf_dir):
    """Kendall tau-b rank correlation between document length and token
    count (bucketized).  tau-b handles the heavy ties bucketing creates:
    nc/nd count concordant/discordant CELL pairs weighted by c_a*c_b, and
    the marginal tie terms n1/n2 come off the bucket histograms — all
    exact BIGINT sums, with one mirrored sqrt at the end.  Plan: one
    cell agg, then everything runs on the <=#cells frame (tiny); the
    strict-inequality self-join is a whitelisted bounded BNLJ."""
    from nonconsumptive_spark.functions.text import tokenize

    docs = load(spark, sf_dir, "documents")
    cells = (
        docs.select(
            (F.col("n_chars") / _KT_XW).cast("long").alias("xb"),
            (F.size(tokenize(F.coalesce("text", F.lit(""))))
             / _KT_YW).cast("long").alias("yb"),
        )
        .groupBy("xb", "yb")
        .agg(F.count("*").cast("long").alias("c"))
    )
    tot = cells.agg(F.sum("c").cast("long").alias("n"))
    xt = (
        cells.groupBy("xb").agg(F.sum("c").cast("long").alias("nx"))
        .agg(F.sum(F.expr("nx * (nx - 1) div 2")).cast("long").alias("n1"))
    )
    yt = (
        cells.groupBy("yb").agg(F.sum("c").cast("long").alias("ny"))
        .agg(F.sum(F.expr("ny * (ny - 1) div 2")).cast("long").alias("n2"))
    )
    a = cells.select(F.col("xb").alias("xa"), F.col("yb").alias("ya"),
                     F.col("c").alias("ca"))
    b = cells.select(F.col("xb").alias("xbb"), F.col("yb").alias("ybb"),
                     F.col("c").alias("cb"))
    cd = (
        a.join(F.broadcast(b),
               (F.col("xa") < F.col("xbb")) & (F.col("ya") != F.col("ybb")))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("ybb") > F.col("ya"),
                             F.col("ca") * F.col("cb"))), F.lit(0))
            .cast("long").alias("nc"),
            F.coalesce(
                F.sum(F.when(F.col("ybb") < F.col("ya"),
                             F.col("ca") * F.col("cb"))), F.lit(0))
            .cast("long").alias("nd"),
        )
    )
    n0 = F.expr("n * (n - 1) div 2")
    denom = (n0 - F.col("n1")) * (n0 - F.col("n2"))
    return (
        tot.crossJoin(F.broadcast(xt))
        .crossJoin(F.broadcast(yt))
        .crossJoin(F.broadcast(cd))
        .select(
            "n", n0.cast("long").alias("n0"), "n1", "n2", "nc", "nd",
            F.when(denom > 0,
                   F.round((F.col("nc") - F.col("nd"))
                           / F.sqrt(denom.cast("double")), 6) + F.lit(0.0))
            .otherwise(F.lit(0.0)).alias("tau_b"),
        )
    )


# -- Cohen's kappa: lang-id prediction vs labeled lang ------------------------
def _kappa_oracle() -> str:
    from nonconsumptive_spark.queries.textstats import (
        _CASE_PRED, _HIT_EXPRS, _LANGS)

    hits = ", ".join("hits_" + lg for lg in _LANGS)
    return f"""
    WITH pred AS (
      SELECT doc_id, lang, {_CASE_PRED} AS pred_lang
      FROM (
        SELECT doc_id, lang, greatest({hits}) AS m, {hits}
        FROM (
          SELECT doc_id, lang,
{_HIT_EXPRS}
          FROM (SELECT doc_id, lang, coalesce(text, '') AS text
                FROM documents) documents))),
    conf AS (
      SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
      FROM pred GROUP BY lang, pred_lang),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_docs,
             CAST(coalesce(sum(CASE WHEN lang = pred_lang THEN n END), 0)
                  AS BIGINT) AS n_agree
      FROM conf),
    rows_ AS (SELECT lang AS lbl, CAST(sum(n) AS BIGINT) AS r
              FROM conf GROUP BY lang),
    cols_ AS (SELECT pred_lang AS lbl, CAST(sum(n) AS BIGINT) AS c
              FROM conf GROUP BY pred_lang),
    pe AS (
      SELECT CAST(coalesce(sum(r * c), 0) AS BIGINT) AS pe_num
      FROM rows_ JOIN cols_ USING (lbl))
    SELECT n_docs, n_agree, pe_num,
           round(CAST(n_agree AS DOUBLE) / n_docs, 6) + 0.0 AS po,
           round(CAST(pe_num AS DOUBLE) / (CAST(n_docs AS DOUBLE) * n_docs),
                 6) + 0.0 AS pe,
           CASE WHEN n_docs * n_docs - pe_num <> 0
                THEN round(CAST(n_docs * n_agree - pe_num AS DOUBLE)
                           / (CAST(n_docs AS DOUBLE) * n_docs - pe_num), 6)
                     + 0.0
                ELSE CAST(0.0 AS DOUBLE) END AS kappa
    FROM tot CROSS JOIN pe
    """


@_stage("q_cohens_kappa", _kappa_oracle())
def q_cohens_kappa(spark, sf_dir):
    """Cohen's kappa between the stopword-vote language-ID prediction and
    the labeled lang column: chance-corrected agreement, the standard
    upgrade to raw accuracy when the label distribution is skewed.
    kappa = (N*agree - sum_l row_l*col_l) / (N^2 - sum_l row_l*col_l) —
    every input is an exact BIGINT off the <=|langs|^2 confusion matrix,
    so the single mirrored division is the only float.  Plan: one lang-id
    scan + confusion agg; all downstream frames are label-sized."""
    from nonconsumptive_spark.operators import textstats as ts

    from nonconsumptive_spark.plans.checkpoint import materialize_once

    docs = load(spark, sf_dir, "documents")
    # label carried through the lang-id projection — no doc-keyed join
    # back to the corpus for a column this scan already read (r8);
    # the <=|langs|^2 confusion matrix materializes once because THREE
    # consumers read it (tot, rows_, cols_) and each would otherwise
    # re-run the full lang-id scan (r8: 2.1 -> 0.6 s warm)
    conf = materialize_once(
        ts.lang_id(docs, extra_cols=("lang",))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n")),
        "kappa_conf",
    )
    tot = conf.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.coalesce(
            F.sum(F.when(F.col("lang") == F.col("pred_lang"), F.col("n"))),
            F.lit(0)).cast("long").alias("n_agree"),
    )
    rows_ = conf.groupBy(F.col("lang").alias("lbl")).agg(
        F.sum("n").cast("long").alias("r"))
    cols_ = conf.groupBy(F.col("pred_lang").alias("lbl")).agg(
        F.sum("n").cast("long").alias("c"))
    pe = (
        rows_.join(cols_, "lbl")
        .agg(F.coalesce(F.sum(F.col("r") * F.col("c")), F.lit(0))
             .cast("long").alias("pe_num"))
    )
    nn = F.col("n_docs").cast("double") * F.col("n_docs")
    return (
        tot.crossJoin(F.broadcast(pe))
        .select(
            "n_docs", "n_agree", "pe_num",
            (F.round(F.col("n_agree").cast("double") / F.col("n_docs"), 6)
             + F.lit(0.0)).alias("po"),
            (F.round(F.col("pe_num").cast("double") / nn, 6)
             + F.lit(0.0)).alias("pe"),
            F.when(
                F.col("n_docs") * F.col("n_docs") - F.col("pe_num") != 0,
                F.round(
                    (F.col("n_docs") * F.col("n_agree") - F.col("pe_num"))
                    .cast("double") / (nn - F.col("pe_num")), 6)
                + F.lit(0.0))
            .otherwise(F.lit(0.0)).alias("kappa"),
        )
    )


# -- lexical-diversity estimators: Yule's K / Simpson, Chao1 / coverage ------
@_stage(
    "q_yules_k",
    f"""
    WITH counts AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT source, unnest({_DUCK_TOKS}) AS token FROM documents)
      GROUP BY source, token),
    mom AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(c * c) AS BIGINT) AS s2
      FROM counts GROUP BY source)
    SELECT source, n_tokens, n_types, s2,
           round(10000.0 * (s2 - n_tokens)
                 / (CAST(n_tokens AS DOUBLE) * n_tokens), 4) + 0.0
             AS yules_k,
           CASE WHEN n_tokens > 1
                THEN round(CAST(s2 - n_tokens AS DOUBLE)
                           / (CAST(n_tokens AS DOUBLE) * (n_tokens - 1)), 6)
                     + 0.0 END AS simpson_d
    FROM mom
    """,
)
def q_yules_k(spark, sf_dir):
    """Yule's K and Simpson's D lexical diversity per source, both pure
    functions of the frequency spectrum: K = 1e4*(S2 - N)/N^2 and
    D = (S2 - N)/(N*(N-1)) with N = token count, S2 = sum of squared
    type frequencies.  N and S2 are exact BIGINT aggregates off the
    (source, token) counts, so each output is one mirrored division.
    Plan: tokenize scan -> (source, token) agg -> per-source moment agg;
    two shuffles on short keys, nothing pairwise."""
    from nonconsumptive_spark.functions.text import tokenize

    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.select("source", F.explode(tokenize("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").cast("long").alias("c"))
    )
    mom = counts.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    nt = F.col("n_tokens").cast("double")
    return mom.select(
        "source", "n_tokens", "n_types", "s2",
        (F.round(1e4 * (F.col("s2") - F.col("n_tokens")) / (nt * nt), 4)
         + F.lit(0.0)).alias("yules_k"),
        F.when(F.col("n_tokens") > 1,
               F.round((F.col("s2") - F.col("n_tokens"))
                       / (nt * (F.col("n_tokens") - 1)), 6) + F.lit(0.0))
        .alias("simpson_d"),
    )


@_stage(
    "q_chao1_richness",
    f"""
    WITH counts AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT source, unnest({_DUCK_TOKS}) AS token FROM documents)
      GROUP BY source, token),
    spec AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(coalesce(sum(CASE WHEN c = 1 THEN 1 END), 0) AS BIGINT)
               AS f1,
             CAST(coalesce(sum(CASE WHEN c = 2 THEN 1 END), 0) AS BIGINT)
               AS f2
      FROM counts GROUP BY source)
    SELECT source, n_types, n_tokens, f1, f2,
           round(n_types + CAST(f1 * (f1 - 1) AS DOUBLE) / (2 * (f2 + 1)),
                 4) + 0.0 AS chao1,
           round(1.0 - CAST(f1 AS DOUBLE) / n_tokens, 6) + 0.0 AS coverage
    FROM spec
    """,
)
def q_chao1_richness(spark, sf_dir):
    """Chao1 vocabulary-richness estimate and Good-Turing sample coverage
    per source: chao1 = V + f1*(f1-1)/(2*(f2+1)) (bias-corrected form,
    Chao 1984) and coverage = 1 - f1/N, both pure functions of the hapax
    (f1) and dis-legomena (f2) spectrum — the how-much-vocabulary-is-
    unseen companion to q_heaps_fit.  All inputs are exact BIGINTs; one
    mirrored division each.  Plan: identical shape to q_yules_k — two
    short-key aggs, no joins."""
    from nonconsumptive_spark.functions.text import tokenize

    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.select("source", F.explode(tokenize("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").cast("long").alias("c"))
    )
    spec = counts.groupBy("source").agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.coalesce(F.sum(F.when(F.col("c") == 1, 1)), F.lit(0))
        .cast("long").alias("f1"),
        F.coalesce(F.sum(F.when(F.col("c") == 2, 1)), F.lit(0))
        .cast("long").alias("f2"),
    )
    return spec.select(
        "source", "n_types", "n_tokens", "f1", "f2",
        (F.round(
            F.col("n_types")
            + (F.col("f1") * (F.col("f1") - 1)).cast("double")
            / (2 * (F.col("f2") + 1)), 4) + F.lit(0.0)).alias("chao1"),
        (F.round(1.0 - F.col("f1").cast("double") / F.col("n_tokens"), 6)
         + F.lit(0.0)).alias("coverage"),
    )


# -- Flesch readability -------------------------------------------------------
# Counting RUNS via two regexp_replace passes is engine-portable: the
# first collapses every target run to a single marker char (any original
# marker chars were themselves part of a run, so none survive
# independently), the second strips everything else, and length() is the
# run count.  No regexp_count dependency, no split-edge-case drift.
def _runs_duck(expr: str, cls: str, marker: str) -> str:
    return (f"length(regexp_replace(regexp_replace({expr}, '{cls}', "
            f"'{marker}', 'g'), '[^{marker}]', '', 'g'))")


@_stage(
    "q_flesch_reading",
    f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(
                    coalesce(text, ''), '[^\\pL]+'), x -> x <> ''))
                  AS BIGINT) AS n_words,
             CAST(greatest(1, {_runs_duck("coalesce(text, '')",
                                          "[.!?]+", ".")})
                  AS BIGINT) AS n_sentences,
             CAST({_runs_duck("lower(coalesce(text, ''))",
                              "[aeiouy]+", "a")} AS BIGINT) AS n_syllables
      FROM documents)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CASE WHEN n_words > 0
                THEN round(206.835
                           - 1.015 * CAST(n_words AS DOUBLE) / n_sentences
                           - 84.6 * CAST(n_syllables AS DOUBLE) / n_words,
                           3) + 0.0 END AS flesch,
           CASE WHEN n_words > 0
                THEN round(0.39 * CAST(n_words AS DOUBLE) / n_sentences
                           + 11.8 * CAST(n_syllables AS DOUBLE) / n_words
                           - 15.59, 3) + 0.0 END AS fk_grade
    FROM base
    """,
)
def q_flesch_reading(spark, sf_dir):
    """Flesch reading-ease + Flesch-Kincaid grade per document, the
    classic readability quality signal for corpus curation.  Syllables
    are approximated as vowel-group runs and sentences as terminal-
    punctuation runs (clamped to >=1), both counted with the portable
    collapse-then-strip regexp_replace pair (see _runs_duck); NULL text
    counts as empty and yields NULL scores.  All three counts are exact
    integers, so the two score formulas are single mirrored float
    expressions.  Plan: zero-shuffle per-row scan."""
    from nonconsumptive_spark.functions.text import tokenize

    def runs(col, cls, marker):
        return F.length(F.regexp_replace(
            F.regexp_replace(col, cls, marker), "[^" + marker + "]", ""))

    txt = F.coalesce("text", F.lit(""))
    base = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokenize(txt)).cast("long").alias("n_words"),
        F.greatest(F.lit(1), runs(txt, "[.!?]+", ".")).cast("long")
        .alias("n_sentences"),
        runs(F.lower(txt), "[aeiouy]+", "a").cast("long")
        .alias("n_syllables"),
    )
    ws = F.col("n_words").cast("double") / F.col("n_sentences")
    sw = F.col("n_syllables").cast("double") / F.col("n_words")
    return base.select(
        "doc_id", "n_words", "n_sentences", "n_syllables",
        F.when(F.col("n_words") > 0,
               F.round(206.835 - 1.015 * ws - 84.6 * sw, 3) + F.lit(0.0))
        .alias("flesch"),
        F.when(F.col("n_words") > 0,
               F.round(0.39 * ws + 11.8 * sw - 15.59, 3) + F.lit(0.0))
        .alias("fk_grade"),
    )


# -- Kruskal-Wallis H across sources ------------------------------------------
# k-group generalization of q_mann_whitney_sources, same doubled-midrank
# exactness: per distinct value v with combined tie size t and prior
# cumulative C, 2*midrank = 2C + t + 1, so 2R_g is a pure BIGINT.  The
# per-group (2R_g)^2/n_g terms quantize to integer 1e-3 units through ONE
# mirrored double expression before the cross-group sum, which makes the
# H statistic summation-order independent.
_KW_SCALE = 1000


@_stage(
    "q_kruskal_wallis",
    f"""
    WITH counts AS (
      SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY source, n_chars),
    spine AS (
      SELECT v, t,
             CAST(coalesce(sum(t) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS cum
      FROM (SELECT v, CAST(sum(c) AS BIGINT) AS t
            FROM counts GROUP BY v)),
    grp AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n_g,
             CAST(sum(c * (2 * s.cum + s.t + 1)) AS BIGINT) AS r2
      FROM counts JOIN spine s USING (v)
      GROUP BY source),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_g) AS BIGINT) AS n,
             CAST(sum(CAST(floor(CAST(r2 AS DOUBLE) * r2 / n_g
                                 * {_KW_SCALE}) AS BIGINT)) AS BIGINT) AS sq
      FROM grp),
    ties AS (
      SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tsum FROM spine)
    SELECT k AS n_groups, n AS n_total, sq AS s_q, tsum AS tie_q,
           round(3.0 * sq / {_KW_SCALE} / (CAST(n AS DOUBLE) * (n + 1))
                 - 3.0 * (n + 1), 4) + 0.0 AS h_stat,
           CASE WHEN tsum < CAST(n AS BIGINT) * n * n - n
                THEN round((3.0 * sq / {_KW_SCALE}
                            / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))
                           / (1.0 - CAST(tsum AS DOUBLE)
                              / (CAST(n AS DOUBLE) * n * n - n)), 4) + 0.0
                END AS h_corrected
    FROM agg CROSS JOIN ties
    """,
)
def q_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis H test on document length across ALL sources at
    once (the k-group rank test; Welch/MWU/KS cover the pairwise family).
    Doubled midranks keep every per-group rank sum an exact BIGINT; see
    the _KW_SCALE note for how the squared-rank terms stay order-
    independent.  Plan: (source, v) agg, a value-spine window bounded by
    #distinct lengths (never document rows), one broadcast spine join,
    and two tiny aggregates."""
    from pyspark.sql import Window

    from nonconsumptive_spark.plans.checkpoint import materialize_once

    # counts feeds spine AND grp, spine feeds grp AND ties —
    # un-materialized, the documents scan + (source, v) agg ran 4x (r9)
    counts = materialize_once(
        load(spark, sf_dir, "documents")
        .groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count("*").cast("long").alias("c")),
        "kw_counts")
    # unpartitioned window over DISTINCT length values only (bounded by
    # the value domain, ~500 at test SF; lengths are capped in practice)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    spine = materialize_once(
        counts.groupBy("v").agg(F.sum("c").cast("long").alias("t"))
        .select("v", "t",
                F.coalesce(F.sum("t").over(w), F.lit(0))
                .cast("long").alias("cum")),
        "kw_spine")
    grp = (
        counts.join(F.broadcast(spine), "v")
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_g"),
            F.sum(F.col("c")
                  * (2 * F.col("cum") + F.col("t") + 1))
            .cast("long").alias("r2"),
        )
    )
    agg = grp.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum(
            F.floor(F.col("r2").cast("double") * F.col("r2") / F.col("n_g")
                    * _KW_SCALE).cast("long")
        ).cast("long").alias("sq"),
    )
    ties = spine.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long").alias("tsum"))
    nd = F.col("n").cast("double")
    h = (3.0 * F.col("sq") / _KW_SCALE / (nd * (F.col("n") + 1))
         - 3.0 * (F.col("n") + 1))
    n3n = F.col("n").cast("long") * F.col("n") * F.col("n") - F.col("n")
    return (
        agg.crossJoin(F.broadcast(ties))
        .select(
            F.col("k").alias("n_groups"), F.col("n").alias("n_total"),
            F.col("sq").alias("s_q"), F.col("tsum").alias("tie_q"),
            (F.round(h, 4) + F.lit(0.0)).alias("h_stat"),
            F.when(F.col("tsum") < n3n,
                   F.round(h / (1.0 - F.col("tsum").cast("double")
                                / n3n.cast("double")), 4) + F.lit(0.0))
            .alias("h_corrected"),
        )
    )


# -- Brown-Forsythe (median-based Levene) variance-homogeneity test -----------
_BF_SCALE = 100


@_stage(
    "q_levene_bf",
    f"""
    WITH counts AS (
      SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY source, n_chars),
    cdf AS (
      SELECT source, v, c,
             CAST(sum(c) OVER (PARTITION BY source ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n
      FROM counts),
    med AS (
      SELECT source, n,
             CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
                  + min(CASE WHEN cum >= (n + 2) // 2 THEN v END)
                  AS BIGINT) AS med2
      FROM cdf GROUP BY source, n),
    dev AS (
      SELECT c.source, m.n,
             CAST(sum(c.c * abs(2 * c.v - m.med2)) AS BIGINT) AS a_q,
             CAST(sum(c.c * abs(2 * c.v - m.med2)
                          * abs(2 * c.v - m.med2)) AS BIGINT) AS b_q,
             m.med2
      FROM counts c JOIN med m USING (source)
      GROUP BY c.source, m.n, m.med2),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nt,
             CAST(sum(a_q) AS BIGINT) AS t,
             CAST(sum(b_q) AS BIGINT) AS bt,
             CAST(sum(CAST(floor(CAST(a_q AS DOUBLE) * a_q / n
                                 * {_BF_SCALE}) AS BIGINT)) AS BIGINT) AS q1
      FROM dev)
    SELECT d.source, d.n AS n_docs,
           round(d.med2 / 2.0, 1) + 0.0 AS median,
           d.a_q, d.b_q,
           round(CAST(d.a_q AS DOUBLE) / (2 * d.n), 6) + 0.0 AS z_mean,
           CASE WHEN t.bt * {_BF_SCALE} - t.q1 > 0 AND t.k > 1
                THEN round(CAST(t.nt - t.k AS DOUBLE) / (t.k - 1)
                           * (t.q1 - floor(CAST(t.t AS DOUBLE) * t.t / t.nt
                                           * {_BF_SCALE}))
                           / (t.bt * {_BF_SCALE} - t.q1), 4) + 0.0
                END AS w_stat
    FROM dev d CROSS JOIN tot t
    """,
)
def q_levene_bf(spark, sf_dir):
    """Brown-Forsythe test (median-based Levene) for homogeneity of
    document-length variance across sources.  Exact per-source medians
    come off the length histogram as the two central order statistics
    (med2 = their sum, an integer), absolute deviations are kept in
    doubled units so A_g/B_g are exact BIGINTs, and the cross-group sums
    behind the W statistic quantize per group through one mirrored
    floor() (same trick as q_kruskal_wallis) — W is order-independent.
    Plan: histogram agg, per-source bounded windows, broadcast join back,
    1-row totals attach."""
    from pyspark.sql import Window

    counts = (
        load(spark, sf_dir, "documents")
        .groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    w_cum = (Window.partitionBy("source").orderBy("v")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy("source")
    cdf = counts.select(
        "source", "v", "c",
        F.sum("c").over(w_cum).cast("long").alias("cum"),
        F.sum("c").over(w_all).cast("long").alias("n"),
    )
    med = (
        cdf.groupBy("source", "n")
        .agg(
            (F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"),
                          F.col("v")))
             + F.min(F.when(F.col("cum") >= F.expr("(n + 2) div 2"),
                            F.col("v"))))
            .cast("long").alias("med2"))
    )
    z2 = F.abs(2 * F.col("v") - F.col("med2"))
    dev = (
        counts.join(F.broadcast(med), "source")
        .groupBy("source", "n", "med2")
        .agg(F.sum(F.col("c") * z2).cast("long").alias("a_q"),
             F.sum(F.col("c") * z2 * z2).cast("long").alias("b_q"))
    )
    tot = dev.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n").cast("long").alias("nt"),
        F.sum("a_q").cast("long").alias("t"),
        F.sum("b_q").cast("long").alias("bt"),
        F.sum(F.floor(F.col("a_q").cast("double") * F.col("a_q")
                      / F.col("n") * _BF_SCALE).cast("long"))
        .cast("long").alias("q1"),
    )
    ssw = F.col("bt") * _BF_SCALE - F.col("q1")
    ssb = (F.col("q1")
           - F.floor(F.col("t").cast("double") * F.col("t") / F.col("nt")
                     * _BF_SCALE))
    return (
        dev.crossJoin(F.broadcast(tot))
        .select(
            "source", F.col("n").alias("n_docs"),
            (F.round(F.col("med2") / 2.0, 1) + F.lit(0.0)).alias("median"),
            "a_q", "b_q",
            (F.round(F.col("a_q").cast("double") / (2 * F.col("n")), 6)
             + F.lit(0.0)).alias("z_mean"),
            F.when((ssw > 0) & (F.col("k") > 1),
                   F.round((F.col("nt") - F.col("k")).cast("double")
                           / (F.col("k") - 1) * ssb / ssw, 4) + F.lit(0.0))
            .alias("w_stat"),
        )
    )


# -- t-closeness over (event_type, day) quasi-identifier classes --------------
# Completes the privacy trio (q_k_anonymity, q_l_diversity): a class can
# be k-anonymous AND l-diverse while its sensitive-value DISTRIBUTION
# still differs enough from the global one to leak.  For an ordered
# attribute the EMD is the mean absolute cumulative-probability gap; with
# per-bucket counts the cumulative gap numerator cum_cb*N - cum_b*n_class
# is an exact BIGINT, so only the final normalization is float.
_TC_BUCKETS = 10
_TC_WIDTH = 50
_TC_T = 0.2


@_stage(
    "q_t_closeness",
    f"""
    WITH ev AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             least(CAST(floor(value / {_TC_WIDTH}) AS BIGINT),
                   {_TC_BUCKETS - 1}) AS b
      FROM events),
    cls AS (
      SELECT event_type, day, b, CAST(count(*) AS BIGINT) AS c
      FROM ev GROUP BY 1, 2, 3),
    classes AS (
      SELECT event_type, day, CAST(sum(c) AS BIGINT) AS n_class
      FROM cls GROUP BY 1, 2),
    gtot AS (
      SELECT b, CAST(count(*) AS BIGINT) AS gc FROM ev GROUP BY b),
    tot AS (SELECT CAST(sum(gc) AS BIGINT) AS n FROM gtot),
    spine AS (
      SELECT k.event_type, k.day, k.n_class, s.b,
             coalesce(c.c, 0) AS c, coalesce(g.gc, 0) AS gc
      FROM classes k
      CROSS JOIN (SELECT unnest(range({_TC_BUCKETS})) AS b) s
      LEFT JOIN cls c ON c.event_type = k.event_type
                     AND c.day = k.day AND c.b = s.b
      LEFT JOIN gtot g ON g.b = s.b),
    cum AS (
      SELECT event_type, day, n_class, b,
             CAST(sum(c) OVER (PARTITION BY event_type, day ORDER BY b)
                  AS BIGINT) AS cum_c,
             CAST(sum(gc) OVER (PARTITION BY event_type, day ORDER BY b)
                  AS BIGINT) AS cum_g
      FROM spine),
    emd AS (
      SELECT event_type, day, n_class,
             CAST(sum(abs(cum_c * t.n - cum_g * n_class)) AS BIGINT)
               AS emd_num,
             any_value(t.n) AS n
      FROM cum CROSS JOIN tot t
      GROUP BY event_type, day, n_class)
    SELECT event_type, day, n_class,
           round(CAST(emd_num AS DOUBLE)
                 / (CAST({_TC_BUCKETS - 1} AS DOUBLE) * n_class * n), 6)
             + 0.0 AS emd,
           CAST(emd_num AS DOUBLE)
             / (CAST({_TC_BUCKETS - 1} AS DOUBLE) * n_class * n)
             > {_TC_T} AS is_risky
    FROM emd
    """,
)
def q_t_closeness(spark, sf_dir):
    """t-closeness of each (event_type, day) quasi-identifier class:
    ordered-attribute earth-mover's distance between the class's bucketed
    `value` distribution and the global one (Li et al. 2007).  See the
    header note for the BIGINT cumulative-gap form.  Plan: one class+
    bucket agg, a broadcast 10-row bucket spine fill, per-class 10-row
    windows, 1-row global-count attach — nothing pairwise, nothing
    proportional to event rows after the first agg."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.least(F.floor(F.col("value") / _TC_WIDTH).cast("long"),
                F.lit(_TC_BUCKETS - 1)).alias("b"),
    )
    cls = ev.groupBy("event_type", "day", "b").agg(
        F.count("*").cast("long").alias("c"))
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    cls = materialize_once(cls, "tclose_cls")
    classes = cls.groupBy("event_type", "day").agg(
        F.sum("c").cast("long").alias("n_class"))
    glob = cls.groupBy("b").agg(F.sum("c").cast("long").alias("gc"))
    tot = glob.agg(F.sum("gc").cast("long").alias("n"))
    buckets = spark.range(_TC_BUCKETS).select(F.col("id").alias("b"))
    spine = (
        classes.crossJoin(F.broadcast(buckets))
        .join(cls, ["event_type", "day", "b"], "left")
        .join(F.broadcast(glob), "b", "left")
        .select("event_type", "day", "n_class", "b",
                F.coalesce("c", F.lit(0)).alias("c"),
                F.coalesce("gc", F.lit(0)).alias("gc"))
    )
    w = Window.partitionBy("event_type", "day").orderBy("b")
    cum = spine.select(
        "event_type", "day", "n_class", "b",
        F.sum("c").over(w).cast("long").alias("cum_c"),
        F.sum("gc").over(w).cast("long").alias("cum_g"),
    )
    emd = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("event_type", "day", "n_class")
        .agg(
            F.sum(F.abs(F.col("cum_c") * F.col("n")
                        - F.col("cum_g") * F.col("n_class")))
            .cast("long").alias("emd_num"),
            F.first("n").alias("n"),
        )
    )
    emd_val = (F.col("emd_num").cast("double")
               / (F.lit(float(_TC_BUCKETS - 1)) * F.col("n_class")
                  * F.col("n")))
    return emd.select(
        "event_type", "day", "n_class",
        (F.round(emd_val, 6) + F.lit(0.0)).alias("emd"),
        (emd_val > _TC_T).alias("is_risky"),
    )


# -- delete-one-source jackknife for the tokens-per-doc ratio ------------------
_JK_SCALE = 10**6


@_stage(
    "q_jackknife_ratio",
    f"""
    WITH grp AS (
      SELECT source, CAST(count(*) AS BIGINT) AS d_g,
             CAST(sum(len(list_filter(regexp_split_to_array(
                    coalesce(text, ''), '[^\\pL]+'), x -> x <> '')))
                  AS BIGINT) AS t_g
      FROM documents GROUP BY source),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS g,
             CAST(sum(d_g) AS BIGINT) AS d, CAST(sum(t_g) AS BIGINT) AS t
      FROM grp),
    theta AS (
      SELECT g, d, t,
             CAST(floor(CAST(t.t - grp.t_g AS DOUBLE) / (t.d - grp.d_g)
                        * {_JK_SCALE}) AS BIGINT) AS th_q
      FROM grp CROSS JOIN tot t),
    mom AS (
      SELECT any_value(g) AS g, any_value(d) AS d, any_value(t) AS t,
             CAST(sum(th_q) AS BIGINT) AS s1,
             CAST(sum((th_q - (SELECT sum(th_q) // count(*) FROM theta))
                      * (th_q - (SELECT sum(th_q) // count(*) FROM theta)))
               AS BIGINT) AS s2
      FROM theta)
    SELECT g AS n_groups, d AS n_docs, t AS n_tokens,
           round(CAST(t AS DOUBLE) / d, 6) + 0.0 AS theta_hat,
           round(CAST(s1 AS DOUBLE) / g / {_JK_SCALE}, 6) + 0.0
             AS theta_bar,
           round(sqrt(CAST(g - 1 AS DOUBLE) / g * s2)
                 / {_JK_SCALE}, 6) + 0.0 AS jk_se,
           round((g - 1) * (CAST(s1 AS DOUBLE) / g / {_JK_SCALE}
                            - CAST(t AS DOUBLE) / d), 6) + 0.0 AS jk_bias
    FROM mom
    """,
)
def q_jackknife_ratio(spark, sf_dir):
    """Delete-one-source jackknife for the corpus tokens-per-document
    ratio: standard error + bias of a ratio estimator under source-level
    resampling — the honest uncertainty for "how many tokens does a doc
    contribute", where docs within a source are correlated.  Leave-one-
    out thetas quantize to 1e-6 BIGINT units before any cross-group sum,
    and the squared deviations use the INTEGER mean (s1 div g), so every
    aggregate replays exactly.  Plan: one per-source agg, a 1-row totals
    attach, then arithmetic on a #sources-row frame."""
    from nonconsumptive_spark.functions.text import tokenize

    grp = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("d_g"),
             F.sum(F.size(tokenize(F.coalesce("text", F.lit("")))))
             .cast("long").alias("t_g"))
    )
    tot = grp.agg(F.count("*").cast("long").alias("g"),
                  F.sum("d_g").cast("long").alias("d"),
                  F.sum("t_g").cast("long").alias("t"))
    theta = (
        grp.crossJoin(F.broadcast(tot))
        .select(
            "g", "d", "t",
            F.floor((F.col("t") - F.col("t_g")).cast("double")
                    / (F.col("d") - F.col("d_g")) * _JK_SCALE)
            .cast("long").alias("th_q"),
        )
    )
    mom = theta.agg(
        F.first("g").alias("g"), F.first("d").alias("d"),
        F.first("t").alias("t"),
        F.sum("th_q").cast("long").alias("s1"),
        F.sum(F.col("th_q") * F.col("th_q")).cast("long").alias("ssq"),
        F.count("*").cast("long").alias("cnt"),
    )
    # sum of squared deviations from the INTEGER mean, computed exactly
    # from (ssq, s1, mean_q): sum((x - m)^2) = ssq - 2*m*s1 + g*m^2
    mean_q = F.expr("s1 div cnt")
    s2 = (F.col("ssq") - 2 * mean_q * F.col("s1")
          + F.col("cnt") * mean_q * mean_q)
    return mom.select(
        F.col("g").alias("n_groups"), F.col("d").alias("n_docs"),
        F.col("t").alias("n_tokens"),
        (F.round(F.col("t").cast("double") / F.col("d"), 6) + F.lit(0.0))
        .alias("theta_hat"),
        (F.round(F.col("s1").cast("double") / F.col("g") / _JK_SCALE, 6)
         + F.lit(0.0)).alias("theta_bar"),
        (F.round(F.sqrt((F.col("g") - 1).cast("double") / F.col("g")
                        * s2.cast("double")) / _JK_SCALE, 6) + F.lit(0.0))
        .alias("jk_se"),
        (F.round((F.col("g") - 1)
                 * (F.col("s1").cast("double") / F.col("g") / _JK_SCALE
                    - F.col("t").cast("double") / F.col("d")), 6)
         + F.lit(0.0)).alias("jk_bias"),
    )


# -- ROUGE-2 between blocked pairs --------------------------------------------
def _rouge_oracle() -> str:
    from nonconsumptive_spark.operators.evaluation import BLEU_BLOCK_MOD

    return f"""
    WITH base AS (SELECT doc_id AS doc, lang, {_DUCK_TOKS} AS t
                  FROM documents),
    lens AS (
      SELECT doc, lang, CAST(greatest(len(t) - 1, 0) AS BIGINT) AS l2,
             doc % {BLEU_BLOCK_MOD} AS blk
      FROM base),
    pairs AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b,
             a.l2 AS l2_a, b.l2 AS l2_b
      FROM lens a JOIN lens b
        ON a.lang = b.lang AND a.blk = b.blk AND a.doc < b.doc),
    big AS (
      SELECT doc, g, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc, t[i] || ' ' || t[i + 1] AS g
            FROM base,
                 unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS r(i))
      GROUP BY doc, g),
    c2 AS (
      SELECT p.doc_a, p.doc_b,
             CAST(sum(least(xa.c, xb.c)) AS BIGINT) AS clip2
      FROM pairs p
      JOIN big xa ON xa.doc = p.doc_a
      JOIN big xb ON xb.doc = p.doc_b AND xb.g = xa.g
      GROUP BY p.doc_a, p.doc_b)
    SELECT p.doc_a, p.doc_b,
           CAST(coalesce(c2.clip2, 0) AS BIGINT) AS clip2,
           CASE WHEN p.l2_b > 0
                THEN round(CAST(coalesce(c2.clip2, 0) AS DOUBLE) / p.l2_b,
                           6) + 0.0 ELSE 0.0 END AS rouge2_p,
           CASE WHEN p.l2_a > 0
                THEN round(CAST(coalesce(c2.clip2, 0) AS DOUBLE) / p.l2_a,
                           6) + 0.0 ELSE 0.0 END AS rouge2_r,
           CASE WHEN p.l2_a + p.l2_b > 0
                THEN round(CAST(2 * coalesce(c2.clip2, 0) AS DOUBLE)
                           / (p.l2_a + p.l2_b), 6) + 0.0
                ELSE 0.0 END AS rouge2_f1
    FROM pairs p
    LEFT JOIN c2 ON c2.doc_a = p.doc_a AND c2.doc_b = p.doc_b
    """


@_stage("q_rouge2_pairs", _rouge_oracle())
def q_rouge2_pairs(spark, sf_dir):
    from nonconsumptive_spark.operators.evaluation import rouge2_pairs

    return rouge2_pairs(load(spark, sf_dir, "documents"))


# -- modularity of the label-propagation partition ----------------------------
def _modularity_oracle() -> str:
    from nonconsumptive_spark.operators.graph import MOD_SCALE

    k = _LPA_ITERS
    return ("WITH" + ",".join(_lpa_ctes(k)) + f""",
    m2t AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM und),
    deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
            FROM und GROUP BY src),
    lab AS (
      SELECT l.node, l.label, CAST(coalesce(d.deg, 0) AS BIGINT) AS deg
      FROM l{k} l LEFT JOIN deg d USING (node)),
    grp AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(deg) AS BIGINT) AS deg_sum
      FROM lab GROUP BY label),
    inn AS (
      SELECT la.label AS label, CAST(count(*) AS BIGINT) AS in2
      FROM und u JOIN l{k} la ON la.node = u.src
                 JOIN l{k} lb ON lb.node = u.dst
      WHERE la.label = lb.label GROUP BY la.label),
    perq AS (
      SELECT g.label, g.n_nodes, g.deg_sum,
             CAST(coalesce(i.in2, 0) AS BIGINT) AS in2,
             CASE WHEN m.m2 > 0 THEN CAST(floor(
               (CAST(coalesce(i.in2, 0) AS DOUBLE) / m.m2
                - (CAST(g.deg_sum AS DOUBLE) / m.m2)
                  * (CAST(g.deg_sum AS DOUBLE) / m.m2))
               * {MOD_SCALE}) AS BIGINT) ELSE 0 END AS cq
      FROM grp g LEFT JOIN inn i USING (label) CROSS JOIN m2t m),
    gtot AS (SELECT CAST(sum(cq) AS BIGINT) AS gq FROM perq)
    SELECT label, n_nodes, in2, deg_sum,
           round(cq / {float(MOD_SCALE)!r}, 9) + 0.0 AS q_contrib,
           round(gq / {float(MOD_SCALE)!r}, 6) + 0.0 AS modularity
    FROM perq CROSS JOIN gtot""")


@_stage("q_modularity", _modularity_oracle())
def q_modularity(spark, sf_dir):
    from nonconsumptive_spark.operators.graph import bigram_edges, modularity

    return modularity(bigram_edges(load(spark, sf_dir, "documents")),
                      n_iter=_LPA_ITERS)


# -- Wilson score interval for per-source pass proportions ---------------------
_WILSON_Z = 1.96
_WILSON_Z2 = 3.8416
_WILSON_MIN_CHARS = 200


@_stage(
    "q_wilson_ci",
    f"""
    WITH g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(coalesce(sum(CASE WHEN n_chars >= {_WILSON_MIN_CHARS}
                                    THEN 1 END), 0) AS BIGINT) AS k
      FROM documents GROUP BY source)
    SELECT source, n, k,
           round(CAST(k AS DOUBLE) / n, 6) + 0.0 AS p_hat,
           greatest(0.0, round((CAST(k AS DOUBLE) / n + {_WILSON_Z2} / (2 * n)
                  - {_WILSON_Z} * sqrt((CAST(k AS DOUBLE) / n)
                        * (1 - CAST(k AS DOUBLE) / n) / n
                        + {_WILSON_Z2} / (4.0 * n * n)))
                 / (1 + {_WILSON_Z2} / n), 6) + 0.0) AS wilson_lo,
           least(1.0, round((CAST(k AS DOUBLE) / n + {_WILSON_Z2} / (2 * n)
                  + {_WILSON_Z} * sqrt((CAST(k AS DOUBLE) / n)
                        * (1 - CAST(k AS DOUBLE) / n) / n
                        + {_WILSON_Z2} / (4.0 * n * n)))
                 / (1 + {_WILSON_Z2} / n), 6) + 0.0) AS wilson_hi
    FROM g
    """,
)
def q_wilson_ci(spark, sf_dir):
    """Wilson 95% score interval for the per-source proportion of
    documents passing a length gate — the proportion CI that behaves at
    k=0/k=n and small n, where the Wald interval collapses (Wilson 1927;
    the standard for per-slice pass-rate dashboards).  Both bounds are
    one fixed IEEE chain over the exact BIGINT (k, n) with z and z^2 as
    shared DECIMAL literals, mirrored token-for-token in the oracle.
    Plan: one groupBy(source) — nothing else."""
    g = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n"),
             F.coalesce(F.sum(F.when(
                 F.col("n_chars") >= _WILSON_MIN_CHARS, 1)), F.lit(0))
             .cast("long").alias("k"))
    )
    p = F.col("k").cast("double") / F.col("n")
    center = p + _WILSON_Z2 / (2 * F.col("n"))
    half = _WILSON_Z * F.sqrt(p * (1 - p) / F.col("n")
                              + _WILSON_Z2 / (4.0 * F.col("n") * F.col("n")))
    denom = 1 + _WILSON_Z2 / F.col("n")
    return g.select(
        "source", "n", "k",
        (F.round(p, 6) + F.lit(0.0)).alias("p_hat"),
        F.greatest(F.lit(0.0),
                   F.round((center - half) / denom, 6) + F.lit(0.0))
        .alias("wilson_lo"),
        F.least(F.lit(1.0),
                F.round((center + half) / denom, 6) + F.lit(0.0))
        .alias("wilson_hi"),
    )


# -- Theil-T inequality of token counts within each source --------------------
_THEIL_SCALE = 10**12


@_stage(
    "q_theil_index",
    f"""
    WITH per AS (
      SELECT source,
             CAST(len(list_filter(regexp_split_to_array(
                    coalesce(text, ''), '[^\\pL]+'), x -> x <> ''))
                  AS BIGINT) AS x
      FROM documents),
    tot AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS xt,
             CAST(coalesce(sum(CASE WHEN x = 0 THEN 1 END), 0) AS BIGINT)
               AS n_zero
      FROM per GROUP BY source),
    terms AS (
      SELECT p.source, t.n, t.xt, t.n_zero,
             CASE WHEN p.x > 0 AND t.xt > 0
                  THEN CAST(floor((CAST(p.x AS DOUBLE) / t.xt)
                                  * ln(CAST(p.x AS DOUBLE) * t.n / t.xt)
                                  * {_THEIL_SCALE}) AS BIGINT)
                  ELSE 0 END AS tq
      FROM per p JOIN tot t USING (source))
    SELECT source, any_value(n) AS n_docs, any_value(xt) AS n_tokens,
           any_value(n_zero) AS n_zero,
           round(CAST(sum(tq) AS BIGINT) / {float(_THEIL_SCALE)!r}, 6)
             + 0.0 AS theil_t
    FROM terms GROUP BY source
    """,
)
def q_theil_index(spark, sf_dir):
    """Theil-T inequality of per-document token counts within each
    source: T = sum_i (x_i/X) * ln(x_i * n / X) — 0 for perfectly even
    contribution, ln(n) when one doc holds everything; the
    decomposable inequality measure that complements q_gini_tokens.
    Zero-token docs contribute 0 to T by the x*ln(x) -> 0 convention
    (NULL text counts as empty).  Per-doc terms quantize to 1e-12
    BIGINT units through one mirrored float chain, so the per-source
    sum is aggregation-order independent.  Plan: per-doc scan, one
    source agg, one broadcast totals join back, one source agg."""
    from nonconsumptive_spark.functions.text import tokenize

    per = load(spark, sf_dir, "documents").select(
        "source",
        F.size(tokenize(F.coalesce("text", F.lit("")))).cast("long")
        .alias("x"),
    )
    tot = per.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("xt"),
        F.coalesce(F.sum(F.when(F.col("x") == 0, 1)), F.lit(0))
        .cast("long").alias("n_zero"),
    )
    terms = per.join(F.broadcast(tot), "source").select(
        "source", "n", "xt", "n_zero",
        F.when((F.col("x") > 0) & (F.col("xt") > 0),
               F.floor((F.col("x").cast("double") / F.col("xt"))
                       * F.log(F.col("x").cast("double") * F.col("n")
                               / F.col("xt"))
                       * _THEIL_SCALE).cast("long"))
        .otherwise(F.lit(0)).alias("tq"),
    )
    return (
        terms.groupBy("source")
        .agg(F.first("n").alias("n_docs"),
             F.first("xt").alias("n_tokens"),
             F.first("n_zero").alias("n_zero"),
             F.sum("tq").cast("long").alias("sq"))
        .select(
            "source", "n_docs", "n_tokens", "n_zero",
            (F.round(F.col("sq") / F.lit(float(_THEIL_SCALE)), 6)
             + F.lit(0.0)).alias("theil_t"),
        )
    )


# -- context-window truncation loss -------------------------------------------
_TRUNC_LENS = [128, 256, 512, 1024]


@_stage(
    "q_truncation_loss",
    f"""
    WITH per AS (
      SELECT CAST(len(list_filter(regexp_split_to_array(
               coalesce(text, ''), '[^\\pL]+'), x -> x <> '')) AS BIGINT)
             AS x
      FROM documents),
    spine AS (SELECT unnest({_TRUNC_LENS}) AS max_len)
    SELECT CAST(max_len AS BIGINT) AS max_len,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(CASE WHEN x > max_len THEN 1 END), 0)
                AS BIGINT) AS n_truncated,
           CAST(sum(x) AS BIGINT) AS total_tokens,
           CAST(sum(least(x, max_len)) AS BIGINT) AS kept_tokens,
           CASE WHEN sum(x) > 0
                THEN round(1.0 - CAST(sum(least(x, max_len)) AS DOUBLE)
                                 / sum(x), 6) + 0.0
                ELSE 0.0 END AS loss_frac
    FROM per CROSS JOIN spine GROUP BY max_len
    """,
)
def q_truncation_loss(spark, sf_dir):
    """Token loss from truncating every document at a context window of
    L, for a spine of candidate L values — the first question any
    pretraining-data pipeline asks before choosing max_seq_len (kept =
    sum min(x, L); complement of q_pack_sequences' packing view).  NULL
    text counts as empty.  All counts are exact BIGINTs; the loss
    fraction is one mirrored division per spine row.  Plan: one per-doc
    scan crossed with a 4-row literal spine, one 4-group agg."""
    from nonconsumptive_spark.functions.text import tokenize

    per = load(spark, sf_dir, "documents").select(
        F.size(tokenize(F.coalesce("text", F.lit("")))).cast("long")
        .alias("x"))
    spine = spark.range(0).sparkSession.createDataFrame(
        [(v,) for v in _TRUNC_LENS], "max_len long")
    return (
        per.crossJoin(F.broadcast(spine))
        .groupBy("max_len")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.coalesce(F.sum(F.when(F.col("x") > F.col("max_len"), 1)),
                       F.lit(0)).cast("long").alias("n_truncated"),
            F.sum("x").cast("long").alias("total_tokens"),
            F.sum(F.least("x", "max_len")).cast("long").alias("kept_tokens"),
        )
        .select(
            "max_len", "n_docs", "n_truncated", "total_tokens",
            "kept_tokens",
            F.when(F.col("total_tokens") > 0,
                   F.round(1.0 - F.col("kept_tokens").cast("double")
                           / F.col("total_tokens"), 6) + F.lit(0.0))
            .otherwise(F.lit(0.0)).alias("loss_frac"),
        )
    )


# -- T5-style span-corruption statistics ---------------------------------------
# Mask positions chosen by an engine-portable hash (md5 of doc_id:pos,
# first 60 bits, mod _SPAN_RATE == 0 -> ~1/_SPAN_RATE mask ratio);
# adjacent masked positions merge into spans, T5-style.  Pure in-row
# array math — the mask decision replays bit-for-bit in both engines.
_SPAN_RATE = 5


@_stage(
    "q_span_corruption",
    f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(
               coalesce(text, ''), '[^\\pL]+'), x -> x <> '')) AS BIGINT)
             AS x
      FROM documents),
    bits AS (
      SELECT doc_id, x,
             list_transform(range(1, x + 1),
               p -> (CAST(('0x' || substr(md5(doc_id || ':' || p), 1, 15))
                          AS BIGINT) % {_SPAN_RATE}) = 0) AS b
      FROM base)
    SELECT doc_id, x AS n_tokens,
           CAST(len(list_filter(b, v -> v)) AS BIGINT) AS n_masked,
           CAST(len(list_filter(range(1, x + 1),
                    p -> b[p] AND (p = 1 OR NOT b[p - 1]))) AS BIGINT)
             AS n_spans,
           CASE WHEN x > 0
                THEN round(CAST(len(list_filter(b, v -> v)) AS DOUBLE) / x,
                           6) + 0.0 END AS mask_ratio
    FROM bits
    """,
)
def q_span_corruption(spark, sf_dir):
    """T5-style span-corruption statistics per document: which positions
    a deterministic hash masks (~20% at rate 5), how many contiguous
    spans they merge into, and the realized mask ratio — the
    denoising-objective shape check a pretraining pipeline runs before
    committing a corruption config (Raffel et al. 2020).  See the
    header note for the portable hash; NULL text counts as empty.
    Plan: zero-shuffle per-row scan; all span math is in-row array
    folds over the position sequence."""
    from nonconsumptive_spark.functions.text import tokenize

    base = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokenize(F.coalesce("text", F.lit("")))).cast("long")
        .alias("x"),
    )
    seq = F.when(F.col("x") > 0,
                 F.sequence(F.lit(1).cast("long"), F.col("x"))
                 ).otherwise(F.array().cast("array<long>"))
    mask_bit = lambda p: (  # noqa: E731
        F.conv(F.substring(F.md5(F.concat(
            F.col("doc_id").cast("string"), F.lit(":"),
            p.cast("string"))), 1, 15), 16, 10).cast("long")
        % _SPAN_RATE) == 0
    bits = base.select(
        "doc_id", "x",
        F.transform(seq, mask_bit).alias("b"),
        seq.alias("ps"),
    )
    n_masked = F.size(F.filter("b", lambda v: v)).cast("long")
    n_spans = F.size(F.filter(
        F.col("ps"),
        lambda p: F.element_at(F.col("b"), p.cast("int"))
        & ((p == 1) | ~F.element_at(F.col("b"), (p - 1).cast("int"))),
    )).cast("long")
    return bits.select(
        "doc_id", F.col("x").alias("n_tokens"),
        n_masked.alias("n_masked"), n_spans.alias("n_spans"),
        F.when(F.col("x") > 0,
               F.round(n_masked.cast("double") / F.col("x"), 6)
               + F.lit(0.0)).alias("mask_ratio"),
    )


# -- binary-segmentation changepoint on the daily series ----------------------
# One exact binary-segmentation round: the split s maximizing the
# between-segment gain sl^2/nl + sr^2/nr (equivalently the SSE drop —
# the Sigma-y^2 term cancels), scored on a floor(x*1000) BIGINT so the
# argmax is total-order deterministic with an earliest-day tie-break.
_BINSEG_SCALE = 1000


@_stage(
    "q_binseg_daily",
    f"""
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS d,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    cum AS (
      SELECT event_type, d, y,
             CAST(row_number() OVER w AS BIGINT) AS i,
             CAST(sum(y) OVER w AS BIGINT) AS sl,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS s
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    scored AS (
      SELECT event_type, d, i, n, sl, s,
             CAST(floor((CAST(sl AS DOUBLE) * sl / i
                         + CAST(s - sl AS DOUBLE) * (s - sl) / (n - i))
                        * {_BINSEG_SCALE}) AS BIGINT) AS score_q
      FROM cum WHERE i < n),
    best AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY event_type
                 ORDER BY score_q DESC, d ASC) AS rn
        FROM scored) WHERE rn = 1)
    SELECT event_type, n AS n_days, d AS split_day, score_q,
           round(CAST(sl AS DOUBLE) * sl / i
                 + CAST(s - sl AS DOUBLE) * (s - sl) / (n - i)
                 - CAST(s AS DOUBLE) * s / n, 4) + 0.0 AS gain,
           round(CAST(sl AS DOUBLE) / i, 4) + 0.0 AS mean_left,
           round(CAST(s - sl AS DOUBLE) / (n - i), 4) + 0.0 AS mean_right
    FROM best
    """,
)
def q_binseg_daily(spark, sf_dir):
    """Exact single-changepoint detection (one binary-segmentation
    round, Scott & Knott 1974) on each event type's daily count series:
    the day boundary that maximizes the between-segment SSE reduction —
    the offline complement to the online CUSUM queries.  Cumulative
    sums make every candidate split O(1), the gain quantizes to a
    BIGINT for a deterministic argmax (earliest-day tie-break), and the
    reported gain/means are mirrored float chains on the single winning
    row.  Plan: one daily agg, two bounded per-type windows over #days
    rows, one top-1 window."""
    from pyspark.sql import Window

    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(F.count("*").cast("long").alias("y"))
    )
    w = (Window.partitionBy("event_type").orderBy("d")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wp = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type", "d", "y",
        F.row_number().over(Window.partitionBy("event_type").orderBy("d"))
        .cast("long").alias("i"),
        F.sum("y").over(w).cast("long").alias("sl"),
        F.count("*").over(wp).cast("long").alias("n"),
        F.sum("y").over(wp).cast("long").alias("s"),
    )
    sr = (F.col("s") - F.col("sl")).cast("double")
    score = (F.col("sl").cast("double") * F.col("sl") / F.col("i")
             + sr * (F.col("s") - F.col("sl")) / (F.col("n") - F.col("i")))
    scored = cum.filter(F.col("i") < F.col("n")).withColumn(
        "score_q", F.floor(score * _BINSEG_SCALE).cast("long"))
    best = (
        scored.withColumn(
            "rn", F.row_number().over(
                Window.partitionBy("event_type")
                .orderBy(F.desc("score_q"), F.asc("d"))))
        .filter(F.col("rn") == 1)
    )
    return best.select(
        "event_type", F.col("n").alias("n_days"),
        F.col("d").alias("split_day"), "score_q",
        (F.round(score - F.col("s").cast("double") * F.col("s")
                 / F.col("n"), 4) + F.lit(0.0)).alias("gain"),
        (F.round(F.col("sl").cast("double") / F.col("i"), 4)
         + F.lit(0.0)).alias("mean_left"),
        (F.round(sr / (F.col("n") - F.col("i")), 4) + F.lit(0.0))
        .alias("mean_right"),
    )


# -- Wald-Wolfowitz runs test on daily up/down moves ---------------------------
@_stage(
    "q_runs_test",
    """
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS d,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    moves AS (
      SELECT event_type, d, sgn FROM (
        SELECT event_type, d,
               CASE WHEN y > lag(y) OVER w THEN 1
                    WHEN y < lag(y) OVER w THEN -1 END AS sgn
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d))
      WHERE sgn IS NOT NULL),
    runs AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(coalesce(sum(CASE WHEN sgn = 1 THEN 1 END), 0)
                  AS BIGINT) AS n_up,
             CAST(coalesce(sum(CASE WHEN sgn = -1 THEN 1 END), 0)
                  AS BIGINT) AS n_down,
             CAST(coalesce(sum(CASE WHEN prev IS NULL OR sgn <> prev
                                    THEN 1 END), 0) AS BIGINT) AS n_runs
      FROM (SELECT event_type, sgn,
                   lag(sgn) OVER (PARTITION BY event_type ORDER BY d)
                     AS prev
            FROM moves)
      GROUP BY event_type)
    SELECT event_type, n AS n_moves, n_up, n_down, n_runs,
           CASE WHEN n_up > 0 AND n_down > 0 AND n > 1
                     AND (2.0 * n_up * n_down / n)
                         * (2.0 * n_up * n_down / n - 1) / (n - 1) > 0
                THEN round((n_runs - (2.0 * n_up * n_down / n + 1))
                           / sqrt((2.0 * n_up * n_down / n)
                                  * (2.0 * n_up * n_down / n - 1)
                                  / (n - 1)), 4) + 0.0
                END AS z_stat
    FROM runs
    """,
)
def q_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test for randomness of each event type's
    daily up/down moves: too FEW runs = trending, too MANY =
    oscillating — the nonparametric is-this-series-random check that
    complements q_mann_kendall's monotone-trend view.  Run and sign
    counts are exact BIGINTs off two bounded per-type windows; z uses
    the sigma^2 = (mu-1)(mu-2)/(n-1) identity as one mirrored float
    chain with a zero-variance guard.  Plan: one daily agg + two
    #days-bounded windows per type."""
    from pyspark.sql import Window

    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(F.count("*").cast("long").alias("y"))
    )
    w = Window.partitionBy("event_type").orderBy("d")
    moves = (
        daily.select(
            "event_type", "d",
            F.when(F.col("y") > F.lag("y").over(w), 1)
            .when(F.col("y") < F.lag("y").over(w), -1).alias("sgn"))
        .filter(F.col("sgn").isNotNull())
    )
    runs = (
        moves.select("event_type", "sgn",
                     F.lag("sgn").over(w).alias("prev"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.coalesce(F.sum(F.when(F.col("sgn") == 1, 1)), F.lit(0))
            .cast("long").alias("n_up"),
            F.coalesce(F.sum(F.when(F.col("sgn") == -1, 1)), F.lit(0))
            .cast("long").alias("n_down"),
            F.coalesce(
                F.sum(F.when(F.col("prev").isNull()
                             | (F.col("sgn") != F.col("prev")), 1)),
                F.lit(0)).cast("long").alias("n_runs"),
        )
    )
    mu1 = 2.0 * F.col("n_up") * F.col("n_down") / F.col("n")
    var = mu1 * (mu1 - 1) / (F.col("n") - 1)
    return runs.select(
        F.col("event_type"), F.col("n").alias("n_moves"),
        "n_up", "n_down", "n_runs",
        F.when((F.col("n_up") > 0) & (F.col("n_down") > 0)
               & (F.col("n") > 1) & (var > 0),
               F.round((F.col("n_runs") - (mu1 + 1)) / F.sqrt(var), 4)
               + F.lit(0.0)).alias("z_stat"),
    )


# -- dedup survivorship by source ----------------------------------------------
def _dedup_rate_oracle() -> str:
    from nonconsumptive_spark.queries.dedup import _DUCK_COMP

    return _DUCK_COMP + """,
    asg AS (
      SELECT d.doc_id, d.source,
             CAST(coalesce(c.cluster, d.doc_id) AS BIGINT) AS cluster
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
    canon AS (
      SELECT cluster, source AS canon_source FROM asg
      WHERE doc_id = cluster)
    SELECT a.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(CASE WHEN a.doc_id = a.cluster THEN 1 END), 0)
                AS BIGINT) AS n_kept,
           CAST(coalesce(sum(CASE WHEN a.doc_id <> a.cluster THEN 1 END), 0)
                AS BIGINT) AS n_removed,
           CAST(coalesce(sum(CASE WHEN a.doc_id <> a.cluster
                                   AND k.canon_source <> a.source
                             THEN 1 END), 0) AS BIGINT) AS n_cross_source,
           round(CAST(coalesce(sum(CASE WHEN a.doc_id <> a.cluster
                                        THEN 1 END), 0) AS DOUBLE)
                 / count(*), 6) + 0.0 AS removal_rate
    FROM asg a JOIN canon k USING (cluster)
    GROUP BY a.source"""


@_stage("q_dedup_rate_by_source", _dedup_rate_oracle())
def q_dedup_rate_by_source(spark, sf_dir):
    """Near-dup survivorship per source: how many of each source's
    documents the MinHash-cluster dedup removes, and how many of those
    removals are CROSS-source (this source's docs losing to another
    source's canonical copy) — the "which feed is a mirror of which"
    diagnostic that the corpus-level q_dedup_stats histogram can't
    answer.  Keeper = the cluster's min-id member (dedup_clusters'
    convention), so the canonical's source comes from one equi-join on
    the cluster label.  Plan: the shared LSH cluster machinery, then
    two label/source-keyed joins + one source agg — nothing pairwise
    beyond the banded candidate join."""
    from nonconsumptive_spark.operators import dedup as dd

    docs = load(spark, sf_dir, "documents")
    cl = dd.dedup_clusters(docs, threshold=0.5)
    asg = docs.select("doc_id", "source").join(cl, "doc_id")
    canon = (
        asg.filter(F.col("doc_id") == F.col("cluster"))
        .select("cluster", F.col("source").alias("canon_source"))
    )
    removed = F.col("doc_id") != F.col("cluster")
    return (
        asg.join(canon, "cluster")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.coalesce(F.sum(F.when(~removed, 1)), F.lit(0))
            .cast("long").alias("n_kept"),
            F.coalesce(F.sum(F.when(removed, 1)), F.lit(0))
            .cast("long").alias("n_removed"),
            F.coalesce(
                F.sum(F.when(
                    removed & (F.col("canon_source") != F.col("source")),
                    1)), F.lit(0)).cast("long").alias("n_cross_source"),
        )
        .select(
            "source", "n_docs", "n_kept", "n_removed", "n_cross_source",
            (F.round(F.col("n_removed").cast("double") / F.col("n_docs"),
                     6) + F.lit(0.0)).alias("removal_rate"),
        )
    )


# -- OLS influence diagnostics (Cook's distance) -------------------------------
_COOKS_SCALE = 10**6


@_stage(
    "q_cooks_distance",
    f"""
    WITH per AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
             CAST(len(list_filter(regexp_split_to_array(
               coalesce(text, ''), '[^\\pL]+'), t -> t <> '')) AS BIGINT)
               AS y
      FROM documents),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM per),
    fit AS (
      SELECT p.doc_id, p.x, p.y, m.n, m.sx, m.sxx,
             p.y - ((CAST(m.sy AS DOUBLE)
                     - CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
                       / (m.n * m.sxx - m.sx * m.sx) * m.sx) / m.n
                    + CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
                      / (m.n * m.sxx - m.sx * m.sx) * p.x) AS e,
             1.0 / m.n
               + (p.x - CAST(m.sx AS DOUBLE) / m.n)
                 * (p.x - CAST(m.sx AS DOUBLE) / m.n)
                 / (CAST(m.sxx AS DOUBLE) - CAST(m.sx AS DOUBLE) * m.sx / m.n)
               AS h
      FROM per p CROSS JOIN mom m),
    sse AS (
      SELECT CAST(sum(CAST(floor(e * e * {_COOKS_SCALE}) AS BIGINT))
                  AS BIGINT) AS sse_q
      FROM fit)
    SELECT f.doc_id,
           round(f.e, 4) + 0.0 AS resid,
           round(f.h, 6) + 0.0 AS leverage,
           CASE WHEN f.n > 2 AND s.sse_q > 0 AND f.h < 1.0
                THEN round(f.e * f.e * f.h
                           / (2.0 * (CAST(s.sse_q AS DOUBLE)
                                     / {_COOKS_SCALE} / (f.n - 2))
                              * (1.0 - f.h) * (1.0 - f.h)), 6) + 0.0
                END AS cooks_d
    FROM fit f CROSS JOIN sse s
    """,
)
def q_cooks_distance(spark, sf_dir):
    """OLS influence diagnostics for the corpus length-vs-tokens
    regression: per-document residual, leverage h_i, and Cook's
    distance — the which-documents-drive-the-fit check behind outlier
    triage (complements q_zscore/mad_outliers with a MODEL-based
    notion of anomalous).  Slope/intercept come from exact BIGINT
    moments; the SSE behind the MSE quantizes per-doc squared
    residuals to 1e-6 BIGINTs so it is order-independent; NULL text
    counts as empty.  Plan: per-doc scan + a 1-row moment attach + a
    1-row SSE attach — nothing beyond two tiny broadcasts."""
    from nonconsumptive_spark.functions.text import tokenize

    per = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("x"),
        F.size(tokenize(F.coalesce("text", F.lit("")))).cast("long")
        .alias("y"),
    )
    mom = per.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    beta = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    alpha = (F.col("sy").cast("double") - beta * F.col("sx")) / F.col("n")
    xc = F.col("x") - F.col("sx").cast("double") / F.col("n")
    h = (1.0 / F.col("n")
         + xc * xc / (F.col("sxx").cast("double")
                      - F.col("sx").cast("double") * F.col("sx")
                      / F.col("n")))
    fit = per.crossJoin(F.broadcast(mom)).select(
        "doc_id", "x", "y", "n",
        (F.col("y") - (alpha + beta * F.col("x"))).alias("e"),
        h.alias("h"),
    )
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    fit = materialize_once(fit, "cooks_fit")
    sse = fit.agg(
        F.sum(F.floor(F.col("e") * F.col("e") * _COOKS_SCALE)
              .cast("long")).cast("long").alias("sse_q"))
    mse = (F.col("sse_q").cast("double") / _COOKS_SCALE
           / (F.col("n") - 2))
    return (
        fit.crossJoin(F.broadcast(sse))
        .select(
            "doc_id",
            (F.round(F.col("e"), 4) + F.lit(0.0)).alias("resid"),
            (F.round(F.col("h"), 6) + F.lit(0.0)).alias("leverage"),
            F.when((F.col("n") > 2) & (F.col("sse_q") > 0)
                   & (F.col("h") < 1.0),
                   F.round(F.col("e") * F.col("e") * F.col("h")
                           / (2.0 * mse * (1.0 - F.col("h"))
                              * (1.0 - F.col("h"))), 6) + F.lit(0.0))
            .alias("cooks_d"),
        )
    )


# -- SAX symbolization of the daily series -------------------------------------
# Gaussian 4-letter breakpoints at z = ±0.6745 and 0, applied to the
# per-type z-score QUANTIZED to integer 1e-6 units — the letter decision
# compares BIGINTs against integer thresholds, so the symbol stream
# replays identically cross-engine even at breakpoint boundaries.
_SAX_SCALE = 10**6
_SAX_BP = 674500  # 0.6745 in 1e-6 units


@_stage(
    "q_sax_daily",
    f"""
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS d,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    mom AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s,
             CAST(sum(y * y) AS BIGINT) AS ssq
      FROM daily GROUP BY event_type),
    z AS (
      SELECT d.event_type, d.d, d.y, m.n,
             CASE WHEN m.n * m.ssq - m.s * m.s > 0
                  THEN CAST(floor((d.y - CAST(m.s AS DOUBLE) / m.n)
                         / sqrt((CAST(m.ssq AS DOUBLE)
                                 - CAST(m.s AS DOUBLE) * m.s / m.n) / m.n)
                         * {_SAX_SCALE}) AS BIGINT)
                  ELSE 0 END AS zq
      FROM daily d JOIN mom m USING (event_type))
    SELECT event_type, d AS day, y, zq,
           CASE WHEN zq < -{_SAX_BP} THEN 'a'
                WHEN zq < 0 THEN 'b'
                WHEN zq < {_SAX_BP} THEN 'c'
                ELSE 'd' END AS symbol
    FROM z
    """,
)
def q_sax_daily(spark, sf_dir):
    """SAX symbolization (Lin et al. 2003) of each event type's daily
    count series: z-normalize against the type's own mean/std (exact
    BIGINT moments, population variance) and map to a 4-letter alphabet
    at the Gaussian quartile breakpoints — the discretization under
    symbolic motif/anomaly mining.  See the header note for why the
    letter decision is boundary-safe.  Plan: one daily agg, one
    per-type moment agg, one broadcast join back — no windows at all."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(F.count("*").cast("long").alias("y"))
    )
    mom = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ssq"),
    )
    var_num = F.col("n") * F.col("ssq") - F.col("s") * F.col("s")
    zq = F.floor(
        (F.col("y") - F.col("s").cast("double") / F.col("n"))
        / F.sqrt((F.col("ssq").cast("double")
                  - F.col("s").cast("double") * F.col("s") / F.col("n"))
                 / F.col("n"))
        * _SAX_SCALE).cast("long")
    z = (
        daily.join(F.broadcast(mom), "event_type")
        .select("event_type", "d", "y",
                F.when(var_num > 0, zq).otherwise(F.lit(0)).alias("zq"))
    )
    return z.select(
        "event_type", F.col("d").alias("day"), "y", "zq",
        F.when(F.col("zq") < -_SAX_BP, "a")
        .when(F.col("zq") < 0, "b")
        .when(F.col("zq") < _SAX_BP, "c")
        .otherwise("d").alias("symbol"),
    )


# -- day-of-week seasonality strength ------------------------------------------
_SEAS_SCALE = 10**6


@_stage(
    "q_seasonality_strength",
    f"""
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS d,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    dowd AS (
      SELECT event_type, dayofweek(CAST(d AS DATE)) AS dow, y
      FROM daily),
    bydow AS (
      SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_d,
             CAST(sum(y) AS BIGINT) AS s_d
      FROM dowd GROUP BY event_type, dow),
    mom AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s,
             CAST(sum(y * y) AS BIGINT) AS ssq
      FROM dowd GROUP BY event_type),
    agg AS (
      SELECT b.event_type,
             CAST(sum(s_d * s_d * {_SEAS_SCALE} // n_d) AS BIGINT) AS ssb_r,
             any_value(m.n) AS n, any_value(m.s) AS s,
             any_value(m.ssq) AS ssq,
             CAST(count(*) AS BIGINT) AS n_dows
      FROM bydow b JOIN mom m USING (event_type)
      GROUP BY b.event_type)
    SELECT event_type, n AS n_days, n_dows,
           CAST(ssb_r - s * s * {_SEAS_SCALE} // n AS BIGINT) AS ssb_q,
           CAST(ssq * {_SEAS_SCALE} - s * s * {_SEAS_SCALE} // n AS BIGINT)
             AS sst_q,
           CASE WHEN ssq * {_SEAS_SCALE} - s * s * {_SEAS_SCALE} // n > 0
                THEN round(CAST(ssb_r - s * s * {_SEAS_SCALE} // n
                                AS DOUBLE)
                           / (ssq * {_SEAS_SCALE}
                              - s * s * {_SEAS_SCALE} // n), 6) + 0.0
                ELSE 0.0 END AS eta_sq
    FROM agg
    """,
)
def q_seasonality_strength(spark, sf_dir):
    """Day-of-week seasonality strength per event type: eta-squared of
    the daily counts grouped by weekday (between-dow sum of squares
    over total) — 0 for a flat week, 1 when weekday alone determines
    volume; the is-there-a-weekly-cycle screen before seasonal
    adjustment (complements q_seasonal_residuals, which REMOVES the
    cycle).  Every sum of squares is exact integer arithmetic scaled
    by 1e6 with floor division, so eta^2 is one mirrored division of
    BIGINTs.  Plan: daily agg -> 7-row-per-type dow agg + moment agg
    -> one join; nothing past the dow histogram."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(F.count("*").cast("long").alias("y"))
    )
    dowd = daily.select(
        "event_type",
        (F.dayofweek(F.to_date("d")) - 1).cast("long").alias("dow"),
        "y",
    )
    bydow = dowd.groupBy("event_type", "dow").agg(
        F.count("*").cast("long").alias("n_d"),
        F.sum("y").cast("long").alias("s_d"),
    )
    mom = dowd.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ssq"),
    )
    agg = (
        bydow.join(mom, "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(F.expr(f"s_d * s_d * {_SEAS_SCALE} div n_d"))
            .cast("long").alias("ssb_r"),
            F.first("n").alias("n"), F.first("s").alias("s"),
            F.first("ssq").alias("ssq"),
            F.count("*").cast("long").alias("n_dows"),
        )
    )
    corr = F.expr(f"s * s * {_SEAS_SCALE} div n")
    ssb = (F.col("ssb_r") - corr).cast("long")
    sst = (F.col("ssq") * _SEAS_SCALE - corr).cast("long")
    return agg.select(
        "event_type", F.col("n").alias("n_days"), "n_dows",
        ssb.alias("ssb_q"), sst.alias("sst_q"),
        F.when(sst > 0,
               F.round(ssb.cast("double") / sst, 6) + F.lit(0.0))
        .otherwise(F.lit(0.0)).alias("eta_sq"),
    )


# -- moving-average type-token ratio (MATTR) -----------------------------------
# Plain TTR falls with document length (Heaps); MATTR (Covington &
# McFall 2010) fixes the window so diversity is comparable across
# lengths: the mean TTR over all W-token sliding windows, i.e.
# sum(distinct-per-window) / (n_windows * W) — one division of exact
# BIGINTs.  Docs shorter than W fall back to plain TTR.
_MATTR_W = 25


@_stage(
    "q_mattr",
    f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(coalesce(text, ''),
                                               '[^\\pL]+'),
                         x -> x <> '') AS t
      FROM documents),
    per AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS x,
             CAST(len(list_distinct(t)) AS BIGINT) AS n_types,
             CASE WHEN len(t) >= {_MATTR_W}
                  THEN CAST(list_sum(list_transform(
                         range(1, len(t) - {_MATTR_W} + 2),
                         p -> len(list_distinct(
                                list_slice(t, p, p + {_MATTR_W} - 1)))))
                       AS BIGINT) END AS wsum
      FROM base)
    SELECT doc_id, x AS n_tokens, n_types,
           CASE WHEN x > 0
                THEN round(CAST(n_types AS DOUBLE) / x, 6) + 0.0
                END AS ttr,
           CASE WHEN x >= {_MATTR_W}
                THEN round(CAST(wsum AS DOUBLE)
                           / ((x - {_MATTR_W} + 1) * {_MATTR_W}), 6) + 0.0
                WHEN x > 0
                THEN round(CAST(n_types AS DOUBLE) / x, 6) + 0.0
                END AS mattr
    FROM per
    """,
)
def q_mattr(spark, sf_dir):
    """Moving-average type-token ratio per document (see header note) —
    the length-robust lexical-diversity score, alongside plain TTR and
    the distinct-type count.  NULL text counts as empty (NULL scores).
    All window distinct-counts are in-row integer array math; one
    mirrored division per score.  Plan: zero-shuffle per-row scan;
    per-row cost is O(tokens * W), embarrassingly parallel."""
    from nonconsumptive_spark.functions.text import tokenize

    base = load(spark, sf_dir, "documents").select(
        "doc_id", tokenize(F.coalesce("text", F.lit(""))).alias("t"))
    x = F.size("t").cast("long")
    wins = F.sequence(F.lit(1), F.size("t") - _MATTR_W + 1)
    wsum = F.aggregate(
        F.transform(wins, lambda p: F.size(F.array_distinct(
            F.slice("t", p.cast("int"), _MATTR_W)))),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    per = base.select(
        "doc_id", x.alias("x"),
        F.size(F.array_distinct("t")).cast("long").alias("n_types"),
        F.when(x >= _MATTR_W, wsum.cast("long")).alias("wsum"),
    )
    ttr = F.round(F.col("n_types").cast("double") / F.col("x"), 6) + F.lit(0.0)
    return per.select(
        "doc_id", F.col("x").alias("n_tokens"), "n_types",
        F.when(F.col("x") > 0, ttr).alias("ttr"),
        F.when(F.col("x") >= _MATTR_W,
               F.round(F.col("wsum").cast("double")
                       / ((F.col("x") - _MATTR_W + 1) * _MATTR_W), 6)
               + F.lit(0.0))
        .when(F.col("x") > 0, ttr).alias("mattr"),
    )


# -- inter-arrival gap statistics + burstiness ---------------------------------
@_stage(
    "q_interarrival_stats",
    """
    WITH es AS (
      SELECT event_type, event_id,
             (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) // 1000000
               AS t
      FROM events),
    gaps AS (
      SELECT event_type,
             t - lag(t) OVER (PARTITION BY event_type
                              ORDER BY t, event_id) AS g
      FROM es QUALIFY g IS NOT NULL),
    mom AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(g) AS BIGINT) AS s,
             CAST(sum(g * g) AS BIGINT) AS ssq,
             CAST(min(g) AS BIGINT) AS min_gap_s,
             CAST(max(g) AS BIGINT) AS max_gap_s
      FROM gaps GROUP BY event_type)
    SELECT event_type, n AS n_gaps, min_gap_s, max_gap_s,
           round(CAST(s AS DOUBLE) / n, 3) + 0.0 AS mean_gap_s,
           CASE WHEN sqrt((CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                          / n) + CAST(s AS DOUBLE) / n > 0
                THEN round((sqrt((CAST(ssq AS DOUBLE)
                                  - CAST(s AS DOUBLE) * s / n) / n)
                            - CAST(s AS DOUBLE) / n)
                           / (sqrt((CAST(ssq AS DOUBLE)
                                    - CAST(s AS DOUBLE) * s / n) / n)
                              + CAST(s AS DOUBLE) / n), 6) + 0.0
                END AS burstiness
    FROM mom
    """,
)
def q_interarrival_stats(spark, sf_dir):
    """Inter-arrival gap statistics per event type, with the Goh-
    Barabasi burstiness B = (sigma - mu)/(sigma + mu): -1 for a
    metronome, ~0 for a Poisson stream, ->1 for heavy bursts — the
    event-stream twin of q_token_burstiness.  Gaps are exact integer
    seconds (epoch microseconds floor-divided on both engines), the
    moments are BIGINTs, and B is one mirrored float chain.  Plan: one
    per-type ordered window for the lag, one moment agg.  Scale note:
    event_type is low-cardinality, so this window concentrates a type's
    events in one partition; at 100-TB scale the same gaps come from a
    two-pass form — diff inside (type, day) buckets, then stitch bucket
    boundaries with per-bucket min/max ts — which shuffles on the
    composite key instead.  The moments are identical either way."""
    from pyspark.sql import Window

    es = load(spark, sf_dir, "events").select(
        "event_type", "event_id",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
               " div 1000000").alias("t"))
    w = Window.partitionBy("event_type").orderBy("t", "event_id")
    gaps = (
        es.select("event_type",
                  (F.col("t") - F.lag("t").over(w)).alias("g"))
        .filter(F.col("g").isNotNull())
    )
    mom = gaps.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("g").cast("long").alias("s"),
        F.sum(F.col("g") * F.col("g")).cast("long").alias("ssq"),
        F.min("g").cast("long").alias("min_gap_s"),
        F.max("g").cast("long").alias("max_gap_s"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    sigma = F.sqrt((F.col("ssq").cast("double")
                    - F.col("s").cast("double") * F.col("s") / F.col("n"))
                   / F.col("n"))
    return mom.select(
        "event_type", F.col("n").alias("n_gaps"),
        "min_gap_s", "max_gap_s",
        (F.round(mu, 3) + F.lit(0.0)).alias("mean_gap_s"),
        F.when(sigma + mu > 0,
               F.round((sigma - mu) / (sigma + mu), 6) + F.lit(0.0))
        .alias("burstiness"),
    )


# -- embedding-space isotropy --------------------------------------------------
# Components quantize to integer 1e-4 units BEFORE any sum, so the
# per-dimension moments are exact BIGINTs at any row count; per-dim
# variances and the entropy terms then quantize to 1e-12 BIGINTs so the
# cross-dimension sums are order-independent.
_ISO_Q = 10**4
_ISO_SCALE = 10**12


@_stage(
    "q_embedding_isotropy",
    f"""
    WITH comp AS (
      SELECT generate_subscripts(embedding, 1) AS d,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_ISO_Q})
                  AS BIGINT) AS vq
      FROM embeddings),
    mom AS (
      SELECT d, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(vq) AS BIGINT) AS s,
             CAST(sum(vq * vq) AS BIGINT) AS ssq
      FROM comp GROUP BY d),
    vars_ AS (
      SELECT d, n,
             CAST(floor((CAST(ssq AS DOUBLE)
                         - CAST(s AS DOUBLE) * s / n) / n
                        / {_ISO_Q * _ISO_Q} * {_ISO_SCALE}) AS BIGINT)
               AS var_q
      FROM mom),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_dims,
             any_value(n) AS n_vecs,
             CAST(sum(var_q) AS BIGINT) AS vt,
             CAST(min(var_q) AS BIGINT) AS var_min_q,
             CAST(max(var_q) AS BIGINT) AS var_max_q
      FROM vars_),
    ent AS (
      SELECT CAST(sum(CASE WHEN var_q > 0 THEN CAST(floor(
               (CAST(var_q AS DOUBLE) / t.vt)
               * ln(CAST(var_q AS DOUBLE) / t.vt) * {_ISO_SCALE})
               AS BIGINT) ELSE 0 END) AS BIGINT) AS hq
      FROM vars_ CROSS JOIN tot t)
    SELECT n_vecs, n_dims,
           round(var_min_q / {float(_ISO_SCALE)!r}, 8) + 0.0 AS var_min,
           round(var_max_q / {float(_ISO_SCALE)!r}, 8) + 0.0 AS var_max,
           CASE WHEN var_max_q > 0
                THEN round(CAST(var_min_q AS DOUBLE) / var_max_q, 6) + 0.0
                END AS var_ratio,
           round(-hq / {float(_ISO_SCALE)!r}, 6) + 0.0 AS entropy,
           round(-hq / {float(_ISO_SCALE)!r} / ln(CAST(n_dims AS DOUBLE)),
                 6) + 0.0 AS isotropy
    FROM tot CROSS JOIN ent
    """,
)
def q_embedding_isotropy(spark, sf_dir):
    """Isotropy of the embedding space: per-dimension variance spread
    (min/max/ratio) and the entropy of the normalized variance
    distribution, scaled by ln(D) to [0, 1] — 1 means every dimension
    carries equal variance, low values mean a few rogue dimensions
    dominate (the anisotropy problem ABTT post-processing fixes; see
    q_abtt_residuals).  See the header note for the two quantization
    layers that keep every cross-row and cross-dimension sum exact.
    Plan: one posexplode + per-dim agg (64 groups), then all frames are
    dimension-sized; two 1-row attaches."""
    emb = load(spark, sf_dir, "embeddings")
    comp = emb.select(
        F.posexplode("embedding").alias("p", "v")).select(
        (F.col("p") + 1).alias("d"),
        F.floor(F.col("v").cast("double") * _ISO_Q).cast("long")
        .alias("vq"))
    mom = comp.groupBy("d").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("vq").cast("long").alias("s"),
        F.sum(F.col("vq") * F.col("vq")).cast("long").alias("ssq"),
    )
    var_q = F.floor(
        (F.col("ssq").cast("double")
         - F.col("s").cast("double") * F.col("s") / F.col("n")) / F.col("n")
        / (_ISO_Q * _ISO_Q) * _ISO_SCALE).cast("long")
    vars_ = mom.select("d", "n", var_q.alias("var_q"))
    tot = vars_.agg(
        F.count("*").cast("long").alias("n_dims"),
        F.first("n").alias("n_vecs"),
        F.sum("var_q").cast("long").alias("vt"),
        F.min("var_q").cast("long").alias("var_min_q"),
        F.max("var_q").cast("long").alias("var_max_q"),
    )
    p = F.col("var_q").cast("double") / F.col("vt")
    ent = (
        vars_.crossJoin(F.broadcast(tot.select("vt")))
        .agg(F.sum(F.when(F.col("var_q") > 0,
                          F.floor(p * F.log(p) * _ISO_SCALE).cast("long"))
                   .otherwise(F.lit(0))).cast("long").alias("hq"))
    )
    sc = float(_ISO_SCALE)
    return (
        tot.crossJoin(F.broadcast(ent))
        .select(
            "n_vecs", "n_dims",
            (F.round(F.col("var_min_q") / sc, 8) + F.lit(0.0))
            .alias("var_min"),
            (F.round(F.col("var_max_q") / sc, 8) + F.lit(0.0))
            .alias("var_max"),
            F.when(F.col("var_max_q") > 0,
                   F.round(F.col("var_min_q").cast("double")
                           / F.col("var_max_q"), 6) + F.lit(0.0))
            .alias("var_ratio"),
            (F.round(-F.col("hq") / sc, 6) + F.lit(0.0)).alias("entropy"),
            (F.round(-F.col("hq") / sc
                     / F.log(F.col("n_dims").cast("double")), 6)
             + F.lit(0.0)).alias("isotropy"),
        )
    )


# -- cohort cumulative value (LTV curve) ---------------------------------------
@_stage(
    "q_cohort_value",
    """
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY user_id),
    cohort_sizes AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
      FROM firsts GROUP BY cohort),
    wk AS (
      SELECT f.cohort,
             CAST((epoch(date_trunc('week', e.ts)) - epoch(f.cohort))
                  // 604800 AS BIGINT) AS week_offset,
             CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active,
             CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS value_cents
      FROM events e JOIN firsts f USING (user_id)
      GROUP BY 1, 2),
    cum AS (
      SELECT cohort, week_offset, n_active, value_cents,
             CAST(sum(value_cents) OVER (
               PARTITION BY cohort ORDER BY week_offset
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_value_cents
      FROM wk)
    SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_week,
           c.week_offset, s.cohort_users, c.n_active, c.value_cents,
           c.cum_value_cents,
           round(c.cum_value_cents / 100.0 / s.cohort_users, 4) + 0.0
             AS cum_value_per_user
    FROM cum c JOIN cohort_sizes s USING (cohort)
    """,
)
def q_cohort_value(spark, sf_dir):
    """Cohort lifetime-value curve: cumulative event value per first-seen
    week cohort across week offsets, normalized per cohort user — the
    money twin of q_retention_cohorts' activity matrix.  Values quantize
    to integer cents at the row level (the established cents discipline),
    so every aggregate including the running cumulative is an exact
    BIGINT; the per-user normalization is one mirrored division.  Plan:
    two user/cohort aggs + a cohort-size broadcast + one #offsets-bounded
    window per cohort."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort"))
    sizes = firsts.groupBy("cohort").agg(
        F.count("*").cast("long").alias("cohort_users"))
    offset = (
        F.datediff(F.date_trunc("week", "ts").cast("date"),
                   F.col("cohort").cast("date")) / 7
    ).cast("long")
    wk = (
        ev.join(firsts, "user_id")
        .groupBy("cohort", offset.alias("week_offset"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"),
             F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
             .cast("long").alias("value_cents"))
    )
    w = (Window.partitionBy("cohort").orderBy("week_offset")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = wk.withColumn(
        "cum_value_cents", F.sum("value_cents").over(w).cast("long"))
    return (
        cum.join(F.broadcast(sizes), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset", "cohort_users", "n_active", "value_cents",
            "cum_value_cents",
            (F.round(F.col("cum_value_cents") / 100.0
                     / F.col("cohort_users"), 4) + F.lit(0.0))
            .alias("cum_value_per_user"),
        )
    )


# -- RFM segmentation ----------------------------------------------------------
# Quintile edges are ORDER STATISTICS off per-metric value histograms
# (k_j-th smallest with k_j = ceil(j*n/5)), found as min(v) where the
# cumulative count reaches k_j — the same exact-median discipline as
# q_levene_bf generalized to 4 cut points.  score(v) = 1 + #edges < v,
# a pure integer comparison, so segments replay exactly.
def _rfm_edges_sql(metric: str) -> str:
    return f"""
      SELECT {", ".join(
        f"min(CASE WHEN cum >= (({j} * n + 4) // 5) THEN v END) AS e{j}"
        for j in range(1, 5))}
      FROM (
        SELECT v, CAST(sum(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
               CAST(sum(c) OVER () AS BIGINT) AS n
        FROM (SELECT {metric} AS v, CAST(count(*) AS BIGINT) AS c
              FROM rfm GROUP BY 1))"""


def _rfm_oracle() -> str:
    return f"""
    WITH mx AS (SELECT max(ts) AS mt FROM events),
    rfm AS (
      SELECT user_id,
             CAST(datediff('day', CAST(max(ts) AS DATE),
                           CAST(any_value(mx.mt) AS DATE)) AS BIGINT)
               AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) // 100
                  AS BIGINT) AS monetary_usd
      FROM events CROSS JOIN mx GROUP BY user_id),
    re AS ({_rfm_edges_sql("recency_days")}),
    fe AS ({_rfm_edges_sql("frequency")}),
    me AS ({_rfm_edges_sql("monetary_usd")})
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(frequency) AS BIGINT) AS total_events,
           CAST(sum(monetary_usd) AS BIGINT) AS total_usd
    FROM (
      SELECT CAST(1 + (recency_days > re_.e1)::INT + (recency_days > re_.e2)::INT
                  + (recency_days > re_.e3)::INT + (recency_days > re_.e4)::INT
                  AS BIGINT) AS r_score,
             CAST(1 + (frequency > fe_.e1)::INT + (frequency > fe_.e2)::INT
                  + (frequency > fe_.e3)::INT + (frequency > fe_.e4)::INT
                  AS BIGINT) AS f_score,
             CAST(1 + (monetary_usd > me_.e1)::INT
                  + (monetary_usd > me_.e2)::INT
                  + (monetary_usd > me_.e3)::INT
                  + (monetary_usd > me_.e4)::INT AS BIGINT) AS m_score,
             frequency, monetary_usd
      FROM rfm CROSS JOIN re re_ CROSS JOIN fe fe_ CROSS JOIN me me_)
    GROUP BY 1, 2, 3
    """


@_stage("q_rfm_segments", _rfm_oracle())
def q_rfm_segments(spark, sf_dir):
    """RFM segmentation of the user base: recency (days since last
    event, against the corpus max), frequency (event count), monetary
    (cent-quantized value sum), each scored 1-5 by exact order-statistic
    quintile edges (see header note) and aggregated to segment counts —
    the classic behavioral-cohort table.  Scores are ascending-value
    quintiles on all three axes; monetary quantizes to whole dollars
    (cents div 100) so the edge histogram's value domain stays bounded
    at any user count (cent sums are near-unique per user at scale).  Plan: one user agg, three bounded
    value-histogram windows for the edges, three 1-row edge broadcasts,
    one segment agg."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mt"))
    rfm = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.datediff(F.first("mt").cast("date"),
                       F.max("ts").cast("date"))
            .cast("long").alias("recency_days"),
            F.count("*").cast("long").alias("frequency"),
            F.expr("sum(CAST(floor(value * 100 + 0.5) AS LONG)) div 100")
            .cast("long").alias("monetary_usd"),
        )
    )
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    rfm = materialize_once(rfm, "rfm_users")

    def edges(metric):
        hist = rfm.groupBy(F.col(metric).alias("v")).agg(
            F.count("*").cast("long").alias("c"))
        w = (Window.orderBy("v")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        cdf = hist.select(
            "v", F.sum("c").over(w).cast("long").alias("cum"),
            F.sum("c").over(
                Window.rowsBetween(Window.unboundedPreceding,
                                   Window.unboundedFollowing))
            .cast("long").alias("n"))
        return cdf.agg(*[
            F.min(F.when(
                F.col("cum") >= F.expr(f"({j} * n + 4) div 5"),
                F.col("v"))).alias(f"e{j}")
            for j in range(1, 5)])

    def score(metric, e):
        s = F.lit(1)
        for j in range(1, 5):
            s = s + F.when(F.col(metric) > e[f"e{j}"], 1).otherwise(0)
        return s.cast("long")

    re_, fe, me = edges("recency_days"), edges("frequency"), edges(
        "monetary_usd")
    re_ = re_.select(*[F.col(f"e{j}").alias(f"re{j}") for j in range(1, 5)])
    fe = fe.select(*[F.col(f"e{j}").alias(f"fe{j}") for j in range(1, 5)])
    me = me.select(*[F.col(f"e{j}").alias(f"me{j}") for j in range(1, 5)])
    scored = (
        rfm.crossJoin(F.broadcast(re_))
        .crossJoin(F.broadcast(fe))
        .crossJoin(F.broadcast(me))
        .select(
            score("recency_days",
                  {f"e{j}": F.col(f"re{j}") for j in range(1, 5)})
            .alias("r_score"),
            score("frequency",
                  {f"e{j}": F.col(f"fe{j}") for j in range(1, 5)})
            .alias("f_score"),
            score("monetary_usd",
                  {f"e{j}": F.col(f"me{j}") for j in range(1, 5)})
            .alias("m_score"),
            "frequency", "monetary_usd",
        )
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("frequency").cast("long").alias("total_events"),
        F.sum("monetary_usd").cast("long").alias("total_usd"),
    )


# -- split sample-ratio-mismatch (SRM) check -----------------------------------
# chi2 of observed split sizes against the configured 98/1/1 weights:
# the guard experimentation platforms run on every assignment hash.
# Per-split terms (o*W - n*w)^2 / (n*w*W) have an exact BIGINT
# numerator; each term quantizes to 1e-6 before the 3-term sum.
_SRM_SCALE = 10**6
_SRM_CRIT = 5.991  # chi2(df=2) at 5%


def _srm_oracle() -> str:
    from nonconsumptive_spark.queries.textstats import (
        _SPLIT_CASE, _SPLIT_WEIGHTS)

    wtot = sum(w for _, w in _SPLIT_WEIGHTS)
    wcase = ("CASE " + " ".join(
        f"WHEN split = '{n}' THEN {w}" for n, w in _SPLIT_WEIGHTS)
        + " END")
    return f"""
    WITH asg AS (
      SELECT {_SPLIT_CASE} AS split
      FROM (SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                        AS BIGINT) % 10000 AS b
            FROM documents)),
    obs AS (
      SELECT split, CAST(count(*) AS BIGINT) AS o FROM asg GROUP BY split),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
    terms AS (
      SELECT split, o, {wcase} AS w, t.n,
             CAST(floor(
               CAST((o * {wtot} - t.n * {wcase})
                    * (o * {wtot} - t.n * {wcase}) AS DOUBLE)
               / (CAST(t.n AS DOUBLE) * {wcase} * {wtot})
               * {_SRM_SCALE}) AS BIGINT) AS tq
      FROM obs CROSS JOIN tot t)
    SELECT any_value(n) AS n_docs,
           CAST(coalesce(sum(CASE WHEN split = 'train' THEN o END), 0)
                AS BIGINT) AS n_train,
           CAST(coalesce(sum(CASE WHEN split = 'val' THEN o END), 0)
                AS BIGINT) AS n_val,
           CAST(coalesce(sum(CASE WHEN split = 'test' THEN o END), 0)
                AS BIGINT) AS n_test,
           round(CAST(sum(tq) AS BIGINT) / {float(_SRM_SCALE)!r}, 6) + 0.0
             AS chi2,
           CAST(sum(tq) AS BIGINT)
             > CAST({_SRM_CRIT} * {_SRM_SCALE} AS BIGINT) AS srm_flag
    FROM terms
    """


@_stage("q_split_balance", _srm_oracle())
def q_split_balance(spark, sf_dir):
    """Sample-ratio-mismatch check on the deterministic dataset split:
    chi2 of the observed train/val/test counts against the configured
    98/1/1 weights, flagged at the 5% critical value — the assignment-
    hash health check every experimentation platform runs (a biased
    hash silently skews every downstream eval).  See the header note
    for the exact-integer chi2 terms.  Plan: one split agg (3 rows),
    then constant-sized arithmetic."""
    from nonconsumptive_spark.operators import textstats as ts
    from nonconsumptive_spark.queries.textstats import _SPLIT_WEIGHTS

    wtot = sum(w for _, w in _SPLIT_WEIGHTS)
    wmap = dict(_SPLIT_WEIGHTS)
    obs = (
        ts.dataset_split(load(spark, sf_dir, "documents"), _SPLIT_WEIGHTS)
        .groupBy("split")
        .agg(F.count("*").cast("long").alias("o"))
    )
    tot = obs.agg(F.sum("o").cast("long").alias("n"))
    wcol = F.when(F.col("split") == "train", F.lit(wmap["train"]))
    for name, w in _SPLIT_WEIGHTS[1:]:
        wcol = wcol.when(F.col("split") == name, F.lit(w))
    num = F.col("o") * wtot - F.col("n") * wcol
    tq = F.floor(
        (num * num).cast("double")
        / (F.col("n").cast("double") * wcol * wtot) * _SRM_SCALE
    ).cast("long")
    terms = obs.crossJoin(F.broadcast(tot)).select(
        "split", "o", "n", tq.alias("tq"))
    return terms.agg(
        F.first("n").alias("n_docs"),
        F.coalesce(F.sum(F.when(F.col("split") == "train", F.col("o"))),
                   F.lit(0)).cast("long").alias("n_train"),
        F.coalesce(F.sum(F.when(F.col("split") == "val", F.col("o"))),
                   F.lit(0)).cast("long").alias("n_val"),
        F.coalesce(F.sum(F.when(F.col("split") == "test", F.col("o"))),
                   F.lit(0)).cast("long").alias("n_test"),
        (F.round(F.sum("tq").cast("long") / F.lit(float(_SRM_SCALE)), 6)
         + F.lit(0.0)).alias("chi2"),
        (F.sum("tq").cast("long")
         > int(_SRM_CRIT * _SRM_SCALE)).alias("srm_flag"),
    )


# -- one-way ANOVA on document length across sources ---------------------------
# The parametric twin of q_kruskal_wallis, sharing its quantized-term
# discipline: per-group squared-sum terms pass through ONE mirrored
# floor(x*SCALE) before the cross-group sum, so F / eta^2 / omega^2
# replay under any aggregation order.
_ANOVA_SCALE = 1000


@_stage(
    "q_anova_oneway",
    f"""
    WITH grp AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(n_chars) AS BIGINT) AS s_g,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS ssq_g
      FROM documents GROUP BY source),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_g) AS BIGINT) AS n,
             CAST(sum(s_g) AS BIGINT) AS s,
             CAST(sum(ssq_g) AS BIGINT) AS ssq,
             CAST(sum(CAST(floor(CAST(s_g AS DOUBLE) * s_g / n_g
                                 * {_ANOVA_SCALE}) AS BIGINT)) AS BIGINT)
               AS q1
      FROM grp)
    SELECT k AS n_groups, n AS n_total,
           round((q1 / {float(_ANOVA_SCALE)!r}
                  - CAST(s AS DOUBLE) * s / n)
                 / (k - 1)
                 / ((CAST(ssq AS DOUBLE) - q1 / {float(_ANOVA_SCALE)!r})
                    / (n - k)), 4) + 0.0 AS f_stat,
           round((q1 / {float(_ANOVA_SCALE)!r}
                  - CAST(s AS DOUBLE) * s / n)
                 / (CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * s / n), 6)
             + 0.0 AS eta_sq,
           round((q1 / {float(_ANOVA_SCALE)!r}
                  - CAST(s AS DOUBLE) * s / n
                  - (k - 1) * ((CAST(ssq AS DOUBLE)
                                - q1 / {float(_ANOVA_SCALE)!r}) / (n - k)))
                 / (CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * s / n
                    + (CAST(ssq AS DOUBLE) - q1 / {float(_ANOVA_SCALE)!r})
                      / (n - k)), 6) + 0.0 AS omega_sq
    FROM agg
    """,
)
def q_anova_oneway(spark, sf_dir):
    """One-way ANOVA of document length across sources: F statistic plus
    the eta^2 and bias-corrected omega^2 effect sizes — the parametric
    twin of q_kruskal_wallis (see header note for the shared quantized-
    term exactness).  Plan: one per-source moment agg + one 1-row agg;
    nothing scales past the source count."""
    grp = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_g"),
             F.sum("n_chars").cast("long").alias("s_g"),
             F.sum(F.col("n_chars") * F.col("n_chars")).cast("long")
             .alias("ssq_g"))
    )
    agg = grp.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
        F.sum("ssq_g").cast("long").alias("ssq"),
        F.sum(F.floor(F.col("s_g").cast("double") * F.col("s_g")
                      / F.col("n_g") * _ANOVA_SCALE).cast("long"))
        .cast("long").alias("q1"),
    )
    sc = float(_ANOVA_SCALE)
    ssb = F.col("q1") / sc - F.col("s").cast("double") * F.col("s") / F.col("n")
    ssw = F.col("ssq").cast("double") - F.col("q1") / sc
    sst = (F.col("ssq").cast("double")
           - F.col("s").cast("double") * F.col("s") / F.col("n"))
    msw = ssw / (F.col("n") - F.col("k"))
    return agg.select(
        F.col("k").alias("n_groups"), F.col("n").alias("n_total"),
        (F.round(ssb / (F.col("k") - 1) / msw, 4) + F.lit(0.0))
        .alias("f_stat"),
        (F.round(ssb / sst, 6) + F.lit(0.0)).alias("eta_sq"),
        (F.round((ssb - (F.col("k") - 1) * msw) / (sst + msw), 6)
         + F.lit(0.0)).alias("omega_sq"),
    )


# -- Cramér's V for lang x source association ----------------------------------
_CV_SCALE = 10**6


@_stage(
    "q_cramers_v",
    f"""
    WITH cells AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS o
      FROM documents GROUP BY lang, source),
    ml AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY lang),
    ms AS (SELECT source, CAST(sum(o) AS BIGINT) AS c
           FROM cells GROUP BY source),
    nt AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
    grid AS (
      SELECT ml.lang, ms.source, ml.r, ms.c, nt.n,
             CAST(coalesce(x.o, 0) AS BIGINT) AS o
      FROM ml CROSS JOIN ms CROSS JOIN nt
      LEFT JOIN cells x ON x.lang = ml.lang AND x.source = ms.source),
    terms AS (
      SELECT n,
             CAST(floor(CAST(o * n - r * c AS DOUBLE)
                        * (o * n - r * c)
                        / (CAST(n AS DOUBLE) * r * c)
                        * {_CV_SCALE}) AS BIGINT) AS tq
      FROM grid),
    dims AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM ml) AS nl,
             (SELECT CAST(count(*) AS BIGINT) FROM ms) AS ns)
    SELECT any_value(t.n) AS n_docs, d.nl AS n_langs, d.ns AS n_sources,
           round(CAST(sum(t.tq) AS BIGINT) / {float(_CV_SCALE)!r}, 4) + 0.0
             AS chi2,
           round(sqrt(CAST(sum(t.tq) AS BIGINT) / {float(_CV_SCALE)!r}
                      / any_value(t.n)
                      / least(d.nl - 1, d.ns - 1)), 6) + 0.0 AS cramers_v
    FROM terms t CROSS JOIN dims d
    GROUP BY d.nl, d.ns
    """,
)
def q_cramers_v(spark, sf_dir):
    """Cramér's V for the lang x source contingency: the normalized
    [0, 1] association strength (how strongly does source determine
    language), the effect-size companion to q_lang_source_chi2's test
    statistic.  Per-cell chi2 terms use the exact BIGINT numerator
    (o*N - r*c)^2 over the full grid including empty cells, quantized
    before the sum.  Plan: one cell agg, then everything is
    #langs x #sources-sized with 1-row attaches."""
    cells = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("o"))
    )
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    cells = materialize_once(cells, "cv_cells")
    ml = cells.groupBy("lang").agg(F.sum("o").cast("long").alias("r"))
    ms = cells.groupBy("source").agg(F.sum("o").cast("long").alias("c"))
    nt = cells.agg(F.sum("o").cast("long").alias("n"))
    grid = (
        ml.crossJoin(F.broadcast(ms))
        .crossJoin(F.broadcast(nt))
        .join(cells, ["lang", "source"], "left")
        .select("lang", "source", "r", "c", "n",
                F.coalesce("o", F.lit(0)).cast("long").alias("o"))
    )
    num = F.col("o") * F.col("n") - F.col("r") * F.col("c")
    tq = F.floor(
        num.cast("double") * num
        / (F.col("n").cast("double") * F.col("r") * F.col("c"))
        * _CV_SCALE).cast("long")
    dims = ml.agg(F.count("*").cast("long").alias("nl")).crossJoin(
        F.broadcast(ms.agg(F.count("*").cast("long").alias("ns"))))
    terms = grid.select("n", tq.alias("tq"))
    sc = float(_CV_SCALE)
    return (
        terms.crossJoin(F.broadcast(dims))
        .groupBy("nl", "ns")
        .agg(F.first("n").alias("n_docs"),
             F.sum("tq").cast("long").alias("sq"))
        .select(
            "n_docs", F.col("nl").alias("n_langs"),
            F.col("ns").alias("n_sources"),
            (F.round(F.col("sq") / sc, 4) + F.lit(0.0)).alias("chi2"),
            (F.round(F.sqrt(F.col("sq") / sc / F.col("n_docs")
                            / F.least(F.col("nl") - 1, F.col("ns") - 1)),
                     6) + F.lit(0.0)).alias("cramers_v"),
        )
    )


# -- top-k vocabulary coverage curve -------------------------------------------
_COV_KS = [100, 1000, 10000]


@_stage(
    "q_vocab_coverage",
    f"""
    WITH counts AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest({_DUCK_TOKS}) AS token FROM documents)
      GROUP BY token),
    ranked AS (
      SELECT c, CAST(row_number() OVER (ORDER BY c DESC, token ASC)
                     AS BIGINT) AS rk
      FROM counts),
    tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types
      FROM ranked)
    SELECT CAST(k AS BIGINT) AS top_k, t.n_types, t.n_tokens,
           CAST(coalesce(sum(CASE WHEN rk <= k THEN c END), 0) AS BIGINT)
             AS covered_tokens,
           round(CAST(coalesce(sum(CASE WHEN rk <= k THEN c END), 0)
                      AS DOUBLE) / t.n_tokens, 6) + 0.0 AS coverage
    FROM ranked CROSS JOIN (SELECT unnest({_COV_KS}) AS k)
    CROSS JOIN tot t
    GROUP BY k, t.n_types, t.n_tokens
    """,
)
def q_vocab_coverage(spark, sf_dir):
    """Top-k vocabulary coverage curve: the fraction of all corpus
    tokens covered by the k most frequent types, for a spine of k —
    the Zipf-head table behind every vocabulary-size decision
    (q_vocabulary picks the cap; this prices it).  Rank ties break on
    the token string, so the curve replays exactly.  Plan: one global
    wordcount agg, one vocab-bounded rank window, a 3-row literal
    spine, one 3-group agg."""
    from pyspark.sql import Window
    from nonconsumptive_spark.functions.text import tokenize
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    counts = materialize_once(
        load(spark, sf_dir, "documents")
        .select(F.explode(tokenize("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("c")),
        "cov_counts",
    )
    # distributed TakeOrderedAndProject for the head, then rank INSIDE
    # the <=max(k)-row frame — no unpartitioned window ever sees the
    # full vocabulary (the q_vocabulary dense-id lesson)
    top = counts.orderBy(F.desc("c"), F.asc("token")).limit(max(_COV_KS))
    ranked = top.select(
        "c",
        F.row_number().over(
            Window.orderBy(F.desc("c"), F.asc("token")))
        .cast("long").alias("rk"),
    )
    tot = counts.agg(F.sum("c").cast("long").alias("n_tokens"),
                     F.count("*").cast("long").alias("n_types"))
    spine = spark.createDataFrame([(k,) for k in _COV_KS], "k long")
    return (
        ranked.crossJoin(F.broadcast(spine))
        .crossJoin(F.broadcast(tot))
        .groupBy("k", "n_types", "n_tokens")
        .agg(F.coalesce(
            F.sum(F.when(F.col("rk") <= F.col("k"), F.col("c"))),
            F.lit(0)).cast("long").alias("covered_tokens"))
        .select(
            F.col("k").alias("top_k"), "n_types", "n_tokens",
            "covered_tokens",
            (F.round(F.col("covered_tokens").cast("double")
                     / F.col("n_tokens"), 6) + F.lit(0.0))
            .alias("coverage"),
        )
    )


# -- k-truss of the token graph ------------------------------------------------
_TRUSS_K = 4
_TRUSS_ROUNDS = 3


def _truss_oracle() -> str:
    k, rounds = _TRUSS_K, _TRUSS_ROUNDS
    cte = [f"""
    tokpos AS (
      SELECT doc_id, generate_subscripts({_DUCK_TOKS}, 1) AS pos,
             unnest({_DUCK_TOKS}) AS token
      FROM documents),
    dedges AS (
      SELECT DISTINCT token AS src,
             lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS dst
      FROM tokpos QUALIFY dst IS NOT NULL),
    c0 AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM dedges WHERE src <> dst)"""]
    for r in range(1, rounds + 1):
        cte.append(f"""
    adj{r} AS MATERIALIZED (
      SELECT a AS node, b AS nbr FROM c{r - 1}
      UNION ALL SELECT b, a FROM c{r - 1}),
    sup{r} AS MATERIALIZED (
      SELECT w.a, w.b, CAST(count(*) AS BIGINT) AS support
      FROM (SELECT xa.node AS a, xb.node AS b
            FROM adj{r} xa JOIN adj{r} xb
              ON xa.nbr = xb.nbr AND xa.node < xb.node) w
      SEMI JOIN c{r - 1} e ON e.a = w.a AND e.b = w.b
      GROUP BY w.a, w.b),
    c{r} AS MATERIALIZED (
      SELECT e.a, e.b FROM c{r - 1} e
      LEFT JOIN sup{r} s ON s.a = e.a AND s.b = e.b
      WHERE coalesce(s.support, 0) >= {k - 2})""")
    cte.append(f"""
    adjF AS MATERIALIZED (
      SELECT a AS node, b AS nbr FROM c{rounds}
      UNION ALL SELECT b, a FROM c{rounds}),
    supF AS (
      SELECT w.a, w.b, CAST(count(*) AS BIGINT) AS support
      FROM (SELECT xa.node AS a, xb.node AS b
            FROM adjF xa JOIN adjF xb
              ON xa.nbr = xb.nbr AND xa.node < xb.node) w
      SEMI JOIN c{rounds} e ON e.a = w.a AND e.b = w.b
      GROUP BY w.a, w.b)""")
    cte.append(f"""
    fin AS MATERIALIZED (
      SELECT e.a, e.b, CAST(coalesce(s.support, 0) AS BIGINT) AS support
      FROM c{rounds} e LEFT JOIN supF s ON s.a = e.a AND s.b = e.b),
    conv AS (
      SELECT coalesce(min(CASE WHEN support >= {k - 2} THEN 1 ELSE 0 END),
                      1) = 1 AS converged
      FROM fin)""")
    return ("WITH" + ",".join(cte) + """
    SELECT f.a AS src, f.b AS dst, f.support, c.converged
    FROM fin f CROSS JOIN conv c""")


@_stage("q_ktruss", _truss_oracle())
def q_ktruss(spark, sf_dir):
    from nonconsumptive_spark.operators.graph import bigram_edges, ktruss

    return ktruss(bigram_edges(load(spark, sf_dir, "documents")),
                  k=_TRUSS_K, n_rounds=_TRUSS_ROUNDS)


# -- event-type user-overlap matrix ---------------------------------------------
@_stage(
    "q_event_type_overlap",
    """
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
    sizes AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM tu GROUP BY event_type),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM tu a JOIN tu b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b, i.n_both,
           round(CAST(i.n_both AS DOUBLE)
                 / (sa.n + sb.n - i.n_both), 6) + 0.0 AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    """,
)
def q_event_type_overlap(spark, sf_dir):
    """User-base overlap between every pair of event types: exact
    intersection counts off the distinct (type, user) frame and the
    Jaccard of the user sets — the feature-co-usage matrix (which
    behaviors share an audience).  Plan: one distinct agg, a user-keyed
    self-join producing #types^2-bounded pairs, two broadcast size
    joins; one mirrored division."""
    tu = (
        load(spark, sf_dir, "events")
        .select("event_type", "user_id").distinct()
    )
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    tu = materialize_once(tu, "eto_tu")
    sizes = tu.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"),
                      F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"),
                      F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a", "type_b", "n_a", "n_b", "n_both",
            (F.round(F.col("n_both").cast("double")
                     / (F.col("n_a") + F.col("n_b") - F.col("n_both")), 6)
             + F.lit(0.0)).alias("jaccard"),
        )
    )


# -- skewness / kurtosis by source ----------------------------------------------
@_stage(
    "q_higher_moments",
    """
    WITH mom AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS s1,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS s2,
             CAST(sum(n_chars * n_chars * n_chars) AS BIGINT) AS s3,
             CAST(sum(n_chars * n_chars * n_chars * n_chars) AS BIGINT)
               AS s4
      FROM documents GROUP BY source)
    SELECT source, n,
           round(CAST(s1 AS DOUBLE) / n, 4) + 0.0 AS mean,
           round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                      / n), 4) + 0.0 AS std_pop,
           CASE WHEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n
                     > 0
                THEN round((CAST(s3 AS DOUBLE) / n
                            - 3 * (CAST(s1 AS DOUBLE) / n)
                              * ((CAST(s2 AS DOUBLE)
                                  - CAST(s1 AS DOUBLE) * s1 / n) / n)
                            - (CAST(s1 AS DOUBLE) / n)
                              * (CAST(s1 AS DOUBLE) / n)
                              * (CAST(s1 AS DOUBLE) / n))
                           / pow(sqrt((CAST(s2 AS DOUBLE)
                                       - CAST(s1 AS DOUBLE) * s1 / n) / n),
                                 3), 4) + 0.0 END AS skewness,
           CASE WHEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n
                     > 0
                THEN round((CAST(s4 AS DOUBLE) / n
                            - 4 * (CAST(s1 AS DOUBLE) / n)
                              * (CAST(s3 AS DOUBLE) / n)
                            + 6 * (CAST(s1 AS DOUBLE) / n)
                              * (CAST(s1 AS DOUBLE) / n)
                              * (CAST(s2 AS DOUBLE) / n)
                            - 3 * (CAST(s1 AS DOUBLE) / n)
                              * (CAST(s1 AS DOUBLE) / n)
                              * (CAST(s1 AS DOUBLE) / n)
                              * (CAST(s1 AS DOUBLE) / n))
                           / (((CAST(s2 AS DOUBLE)
                                - CAST(s1 AS DOUBLE) * s1 / n) / n)
                              * ((CAST(s2 AS DOUBLE)
                                  - CAST(s1 AS DOUBLE) * s1 / n) / n))
                           - 3.0, 4) + 0.0 END AS excess_kurtosis
    FROM mom
    """,
)
def q_higher_moments(spark, sf_dir):
    """Population skewness and excess kurtosis of document length per
    source, from exact BIGINT raw moments (s1..s4) via the central-
    moment expansions m3 = E[x^3] - 3*mu*var - mu^3 and m4 = E[x^4]
    - 4*mu*E[x^3] + 6*mu^2*E[x^2] - 3*mu^4 — the shape diagnostics
    behind "is this source's length distribution heavy-tailed", one
    mirrored float chain each.  Plan: one per-source moment agg;
    nothing scales past the source count."""
    mom = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("s1"),
            F.sum(F.col("n_chars") * F.col("n_chars")).cast("long")
            .alias("s2"),
            F.sum(F.col("n_chars") * F.col("n_chars") * F.col("n_chars"))
            .cast("long").alias("s3"),
            F.sum(F.col("n_chars") * F.col("n_chars") * F.col("n_chars")
                  * F.col("n_chars")).cast("long").alias("s4"),
        )
    )
    n = F.col("n")
    mu = F.col("s1").cast("double") / n
    var = (F.col("s2").cast("double")
           - F.col("s1").cast("double") * F.col("s1") / n) / n
    m3 = (F.col("s3").cast("double") / n - 3 * mu * var - mu * mu * mu)
    m4 = (F.col("s4").cast("double") / n
          - 4 * mu * (F.col("s3").cast("double") / n)
          + 6 * mu * mu * (F.col("s2").cast("double") / n)
          - 3 * mu * mu * mu * mu)
    return mom.select(
        "source", "n",
        (F.round(mu, 4) + F.lit(0.0)).alias("mean"),
        (F.round(F.sqrt(var), 4) + F.lit(0.0)).alias("std_pop"),
        F.when(var > 0,
               F.round(m3 / F.pow(F.sqrt(var), 3), 4) + F.lit(0.0))
        .alias("skewness"),
        F.when(var > 0,
               F.round(m4 / (var * var) - 3.0, 4) + F.lit(0.0))
        .alias("excess_kurtosis"),
    )


# -- daily event-mix entropy ------------------------------------------------------
_MIX_SCALE = 10**12


@_stage(
    "q_daily_mix_entropy",
    f"""
    WITH cells AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    days AS (
      SELECT day, CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_types
      FROM cells GROUP BY day),
    terms AS (
      SELECT c.day, d.n, d.n_types,
             CAST(floor((CAST(c.c AS DOUBLE) / d.n)
                        * ln(CAST(c.c AS DOUBLE) / d.n)
                        * {_MIX_SCALE}) AS BIGINT) AS tq
      FROM cells c JOIN days d USING (day))
    SELECT day, any_value(n) AS n_events, any_value(n_types) AS n_types,
           round(-CAST(sum(tq) AS BIGINT) / {float(_MIX_SCALE)!r}, 6)
             + 0.0 AS mix_entropy,
           CASE WHEN any_value(n_types) > 1
                THEN round(-CAST(sum(tq) AS BIGINT) / {float(_MIX_SCALE)!r}
                           / ln(CAST(any_value(n_types) AS DOUBLE)), 6)
                     + 0.0 END AS evenness
    FROM terms GROUP BY day
    """,
)
def q_daily_mix_entropy(spark, sf_dir):
    """Entropy of the event-type mix per day, with Pielou evenness
    (entropy / ln(#types)) — the one-number drift signal for "did the
    traffic composition change today" (complements q_psi_drift's
    bucket-level view).  Per-cell p*ln(p) terms quantize to 1e-12
    BIGINTs so the per-day sum is order-independent.  Plan: one
    (day, type) agg + one day agg + a broadcast-size join back."""
    cells = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"),
                 "event_type")
        .agg(F.count("*").cast("long").alias("c"))
    )
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    cells = materialize_once(cells, "mix_cells")
    days = cells.groupBy("day").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_types"))
    p = F.col("c").cast("double") / F.col("n")
    terms = cells.join(F.broadcast(days), "day").select(
        "day", "n", "n_types",
        F.floor(p * F.log(p) * _MIX_SCALE).cast("long").alias("tq"))
    sc = float(_MIX_SCALE)
    return (
        terms.groupBy("day")
        .agg(F.first("n").alias("n_events"),
             F.first("n_types").alias("n_types"),
             F.sum("tq").cast("long").alias("sq"))
        .select(
            "day", "n_events", "n_types",
            (F.round(-F.col("sq") / sc, 6) + F.lit(0.0))
            .alias("mix_entropy"),
            F.when(F.col("n_types") > 1,
                   F.round(-F.col("sq") / sc
                           / F.log(F.col("n_types").cast("double")), 6)
                   + F.lit(0.0)).alias("evenness"),
        )
    )


# -- Lorenz concentration curve of token mass over documents --------------------
# Deciles are value-based: a doc's decile = 1 + #edges below its token
# count, with the 9 edges as exact order statistics off the count
# histogram (the RFM edge machinery) — ties share a decile, so the
# assignment replays exactly on both engines.
@_stage(
    "q_lorenz_curve",
    f"""
    WITH per AS (
      SELECT CAST(len(list_filter(regexp_split_to_array(
               coalesce(text, ''), '[^\\pL]+'), t -> t <> '')) AS BIGINT)
               AS x
      FROM documents),
    hist AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS c
             FROM per GROUP BY x),
    cdf AS (
      SELECT v, c,
             CAST(sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             CAST(sum(c) OVER () AS BIGINT) AS n
      FROM hist),
    ed AS (
      SELECT {", ".join(
        f"min(CASE WHEN cum >= (({j} * n + 9) // 10) THEN v END) AS e{j}"
        for j in range(1, 10))}
      FROM cdf),
    dec AS (
      SELECT CAST(1 {" ".join(
        f"+ CASE WHEN h.v > ed.e{j} THEN 1 ELSE 0 END"
        for j in range(1, 10))} AS BIGINT) AS decile,
             CAST(sum(h.c) AS BIGINT) AS n_docs,
             CAST(sum(h.v * h.c) AS BIGINT) AS tokens
      FROM hist h CROSS JOIN ed GROUP BY 1),
    tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt FROM dec)
    SELECT decile, n_docs, tokens,
           CAST(sum(tokens) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_tokens,
           CASE WHEN t.tt > 0
                THEN round(CAST(sum(tokens) OVER (ORDER BY decile
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS DOUBLE) / t.tt, 6) + 0.0
                ELSE 0.0 END AS cum_share
    FROM dec CROSS JOIN tot t
    """,
)
def q_lorenz_curve(spark, sf_dir):
    """Lorenz concentration curve of token mass over documents: docs
    bucketed into value-based deciles of their token count (see header
    note), with each decile's token mass and the cumulative share — the
    table behind "the longest 10% of documents hold X% of the corpus"
    (the distributional view q_gini_tokens summarizes to one number).
    All masses are exact BIGINTs; the share is one mirrored division.
    Plan: per-doc scan -> count histogram -> bounded-value windows ->
    <=10-row frames."""
    from pyspark.sql import Window
    from nonconsumptive_spark.functions.text import tokenize
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    per = load(spark, sf_dir, "documents").select(
        F.size(tokenize(F.coalesce("text", F.lit(""))))
        .cast("long").alias("x"))
    hist = materialize_once(
        per.groupBy(F.col("x").alias("v"))
        .agg(F.count("*").cast("long").alias("c")),
        "lorenz_hist",
    )
    w = (Window.orderBy("v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cdf = hist.select(
        "v", "c", F.sum("c").over(w).cast("long").alias("cum"),
        F.sum("c").over(Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))
        .cast("long").alias("n"))
    ed = cdf.agg(*[
        F.min(F.when(F.col("cum") >= F.expr(f"({j} * n + 9) div 10"),
                     F.col("v"))).alias(f"e{j}")
        for j in range(1, 10)])
    decile = F.lit(1)
    for j in range(1, 10):
        decile = decile + F.when(F.col("v") > F.col(f"e{j}"), 1).otherwise(0)
    dec = (
        hist.crossJoin(F.broadcast(ed))
        .groupBy(decile.cast("long").alias("decile"))
        .agg(F.sum("c").cast("long").alias("n_docs"),
             F.sum(F.col("v") * F.col("c")).cast("long").alias("tokens"))
    )
    tot = dec.agg(F.sum("tokens").cast("long").alias("tt"))
    wd = (Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        dec.crossJoin(F.broadcast(tot))
        .select(
            "decile", "n_docs", "tokens",
            F.sum("tokens").over(wd).cast("long").alias("cum_tokens"),
            F.when(F.col("tt") > 0,
                   F.round(F.sum("tokens").over(wd).cast("double")
                           / F.col("tt"), 6) + F.lit(0.0))
            .otherwise(F.lit(0.0)).alias("cum_share"),
        )
    )


# -- entropy rate of the event-type Markov chain ---------------------------------
@_stage(
    "q_event_entropy_rate",
    f"""
    WITH seq AS (
      SELECT user_id, event_type AS a,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS b
      FROM events QUALIFY b IS NOT NULL),
    tr AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS c12
      FROM seq GROUP BY a, b),
    hb AS (
      SELECT sum(CAST(c12 AS HUGEINT)
                 * CAST(round(log2(c12) * {_ENT_SCALE}) AS HUGEINT))
               AS hq_bi,
             CAST(sum(c12) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM tr),
    hc AS (
      SELECT sum(CAST(c1 AS HUGEINT)
                 * CAST(round(log2(c1) * {_ENT_SCALE}) AS HUGEINT))
               AS hq_ctx,
             CAST(count(*) AS BIGINT) AS n_states
      FROM (SELECT a, sum(c12) AS c1 FROM tr GROUP BY a))
    SELECT n AS n_transitions, n_states, n_pairs,
           round(CAST(hq_ctx - hq_bi AS DOUBLE)
                 / (CAST(n AS DOUBLE) * {_ENT_SCALE}.0), 6) + 0.0
             AS h_rate_bits
    FROM hb CROSS JOIN hc
    """,
)
def q_event_entropy_rate(spark, sf_dir):
    """Entropy rate of the user-behavior Markov chain: H(next type |
    current type) over all per-user consecutive event pairs — how
    predictable the NEXT action is given the current one (0 =
    deterministic flows, log2(#types) = uniform wandering); the event
    twin of the corpus bigram conditional entropy, same exact HUGEINT/
    decimal(38,0) identity H = (Σ c1·log2 c1 − Σ c12·log2 c12)/N.
    Plan: one user-ordered window for the transitions, one (a, b) agg,
    two 1-row attaches."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.select("user_id", F.col("event_type").alias("a"),
                  F.lead("event_type").over(w).alias("b"))
        .filter(F.col("b").isNotNull())
    )
    tr = seq.groupBy("a", "b").agg(F.count("*").cast("long").alias("c12"))
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    tr = materialize_once(tr, "eer_tr")

    def lg(c):
        return F.round(F.log2(c) * F.lit(_ENT_SCALE)).cast("long")

    hb = tr.agg(
        F.sum((F.col("c12") * lg(F.col("c12"))).cast("decimal(38,0)"))
        .alias("hq_bi"),
        F.sum("c12").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_pairs"),
    )
    hc = (
        tr.groupBy("a").agg(F.sum("c12").alias("c1"))
        .agg(F.sum((F.col("c1") * lg(F.col("c1")))
                   .cast("decimal(38,0)")).alias("hq_ctx"),
             F.count("*").cast("long").alias("n_states"))
    )
    return (
        hb.crossJoin(F.broadcast(hc))
        .select(
            F.col("n").alias("n_transitions"), "n_states", "n_pairs",
            (F.round((F.col("hq_ctx") - F.col("hq_bi")).cast("double")
                     / (F.col("n").cast("double") * _ENT_SCALE), 6)
             + F.lit(0.0)).alias("h_rate_bits"),
        )
    )


# -- Herfindahl source concentration ----------------------------------------------
@_stage(
    "q_hhi_concentration",
    f"""
    WITH grp AS (
      SELECT source, CAST(count(*) AS BIGINT) AS d,
             CAST(sum(len(list_filter(regexp_split_to_array(
               coalesce(text, ''), '[^\\pL]+'), t -> t <> '')))
               AS BIGINT) AS t
      FROM documents GROUP BY source),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(d) AS BIGINT) AS nd, CAST(sum(t) AS BIGINT) AS nt,
             CAST(sum(d * d) AS BIGINT) AS sd2,
             CAST(sum(t * t) AS BIGINT) AS st2
      FROM grp)
    SELECT k AS n_sources, nd AS n_docs, nt AS n_tokens,
           round(CAST(sd2 AS DOUBLE) / nd / nd, 6) + 0.0 AS hhi_docs,
           round(CAST(st2 AS DOUBLE) / nt / nt, 6) + 0.0 AS hhi_tokens,
           round(CAST(nd AS DOUBLE) * nd / sd2, 4) + 0.0
             AS effective_sources_docs,
           round(CAST(nt AS DOUBLE) * nt / st2, 4) + 0.0
             AS effective_sources_tokens
    FROM agg
    """,
)
def q_hhi_concentration(spark, sf_dir):
    """Herfindahl-Hirschman concentration of the corpus over sources,
    by document count and by token mass, with the effective-source
    count 1/HHI — the one-number "is this corpus really 20 sources or
    3 big ones" check (complements q_temperature_mix, which FIXES the
    imbalance).  HHI = sum share^2 = sum n_i^2 / N^2, exact BIGINTs
    and one mirrored division each; NULL text counts as empty.  Plan:
    one source agg + one 1-row agg."""
    from nonconsumptive_spark.functions.text import tokenize

    grp = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("d"),
             F.sum(F.size(tokenize(F.coalesce("text", F.lit("")))))
             .cast("long").alias("t"))
    )
    agg = grp.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("d").cast("long").alias("nd"),
        F.sum("t").cast("long").alias("nt"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sd2"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("st2"),
    )
    return agg.select(
        F.col("k").alias("n_sources"), F.col("nd").alias("n_docs"),
        F.col("nt").alias("n_tokens"),
        (F.round(F.col("sd2").cast("double") / F.col("nd") / F.col("nd"),
                 6) + F.lit(0.0)).alias("hhi_docs"),
        (F.round(F.col("st2").cast("double") / F.col("nt") / F.col("nt"),
                 6) + F.lit(0.0)).alias("hhi_tokens"),
        (F.round(F.col("nd").cast("double") * F.col("nd") / F.col("sd2"),
                 4) + F.lit(0.0)).alias("effective_sources_docs"),
        (F.round(F.col("nt").cast("double") * F.col("nt") / F.col("st2"),
                 4) + F.lit(0.0)).alias("effective_sources_tokens"),
    )


# -- verified-Jaccard histogram over LSH candidates ------------------------------
# The threshold-tuning table for near-dedup: every LSH candidate pair is
# verified once, then bucketed by exact Jaccard — read it to pick the
# dedup threshold instead of guessing (the pair counts above each bin
# floor are the "how much would we remove at t" curve).
def _jhist_oracle() -> str:
    from nonconsumptive_spark.queries.dedup import _DUCK_BANDS

    return _DUCK_BANDS + """,
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS i
      FROM cands c
      JOIN shingles x ON x.doc_id = c.doc_a
      JOIN shingles y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
      GROUP BY c.doc_a, c.doc_b),
    jac AS (
      SELECT least(CAST(floor(round(coalesce(i.i, 0) * 1.0
                                    / (sa.n + sb.n - coalesce(i.i, 0)), 4)
                              * 10) AS BIGINT), 9) AS bin
      FROM cands c
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
      LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b),
    hist AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs
      FROM jac GROUP BY bin)
    SELECT bin,
           round(bin / 10.0, 1) + 0.0 AS bin_floor,
           n_pairs,
           CAST(sum(n_pairs) OVER (ORDER BY bin DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS pairs_at_or_above
    FROM hist"""


@_stage("q_jaccard_histogram", _jhist_oracle())
def q_jaccard_histogram(spark, sf_dir):
    """Exact-Jaccard histogram of every LSH candidate pair (see header
    note) — bin floors at 0.1 steps with the cumulative
    pairs-at-or-above curve.  Reuses the shared banding machinery; the
    verify stage runs once at threshold 0.  Plan: band equi-join ->
    survivor verify -> 10-row frames; windows never exceed 10 rows."""
    from pyspark.sql import Window
    from nonconsumptive_spark.operators import dedup as dd

    pairs = dd.minhash_dedup_pairs(
        load(spark, sf_dir, "documents"), threshold=0.0)
    hist = (
        pairs.select(
            F.least(F.floor(F.col("jaccard") * 10).cast("long"),
                    F.lit(9)).alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )
    w = (Window.orderBy(F.desc("bin"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return hist.select(
        "bin",
        (F.round(F.col("bin") / 10.0, 1) + F.lit(0.0)).alias("bin_floor"),
        "n_pairs",
        F.sum("n_pairs").over(w).cast("long").alias("pairs_at_or_above"),
    )


# -- weekly growth accounting -----------------------------------------------------
@_stage(
    "q_growth_accounting",
    """
    WITH activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
    firsts AS (
      SELECT user_id, min(wk) AS first_wk FROM activity GROUP BY user_id),
    flags AS (
      SELECT a.user_id, a.wk,
             a.wk = f.first_wk AS is_new,
             p.user_id IS NOT NULL AS was_prev
      FROM activity a
      JOIN firsts f USING (user_id)
      LEFT JOIN activity p
        ON p.user_id = a.user_id AND p.wk = a.wk - INTERVAL 7 DAY),
    weekly AS (
      SELECT strftime(wk, '%Y-%m-%d') AS week,
             CAST(count(*) AS BIGINT) AS n_active,
             CAST(coalesce(sum(CASE WHEN is_new THEN 1 END), 0) AS BIGINT)
               AS n_new,
             CAST(coalesce(sum(CASE WHEN was_prev THEN 1 END), 0)
                  AS BIGINT) AS n_retained,
             CAST(coalesce(sum(CASE WHEN NOT is_new AND NOT was_prev
                               THEN 1 END), 0) AS BIGINT) AS n_resurrected
      FROM flags GROUP BY 1),
    churn AS (
      SELECT strftime(a.wk + INTERVAL 7 DAY, '%Y-%m-%d') AS week,
             CAST(count(*) AS BIGINT) AS n_churned
      FROM activity a
      LEFT JOIN activity nx
        ON nx.user_id = a.user_id AND nx.wk = a.wk + INTERVAL 7 DAY
      WHERE nx.user_id IS NULL
      GROUP BY 1)
    SELECT w.week, w.n_active, w.n_new, w.n_retained, w.n_resurrected,
           CAST(coalesce(c.n_churned, 0) AS BIGINT) AS n_churned_into
    FROM weekly w LEFT JOIN churn c USING (week)
    """,
)
def q_growth_accounting(spark, sf_dir):
    """Weekly growth accounting of the user base: active = new +
    retained + resurrected, plus the churn flowing INTO each week
    (users active the prior week who did not return) — the standard
    decomposition behind every growth dashboard (n_churned_into for a
    week beyond the observed range is simply not emitted; rows exist
    only for observed activity weeks).  Pure set logic on the distinct
    (user, week) frame, all BIGINT counts.  Plan: one distinct agg +
    user/week-keyed self-joins; nothing wider than (user, week)."""
    ev = load(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    activity = materialize_once(activity, "ga_activity")
    firsts = activity.groupBy("user_id").agg(F.min("wk").alias("first_wk"))
    prev = activity.select(
        "user_id",
        (F.col("wk").cast("date") + F.expr("INTERVAL 7 DAY"))
        .cast("timestamp").alias("wk"),
        F.lit(True).alias("was_prev"))
    flags = (
        activity.join(firsts, "user_id")
        .join(prev, ["user_id", "wk"], "left")
        .select(
            "wk",
            (F.col("wk") == F.col("first_wk")).alias("is_new"),
            F.coalesce("was_prev", F.lit(False)).alias("was_prev"))
    )
    weekly = (
        flags.groupBy(F.date_format("wk", "yyyy-MM-dd").alias("week"))
        .agg(
            F.count("*").cast("long").alias("n_active"),
            F.coalesce(F.sum(F.when(F.col("is_new"), 1)), F.lit(0))
            .cast("long").alias("n_new"),
            F.coalesce(F.sum(F.when(F.col("was_prev"), 1)), F.lit(0))
            .cast("long").alias("n_retained"),
            F.coalesce(
                F.sum(F.when(~F.col("is_new") & ~F.col("was_prev"), 1)),
                F.lit(0)).cast("long").alias("n_resurrected"),
        )
    )
    nxt = activity.select(
        "user_id",
        (F.col("wk").cast("date") + F.expr("INTERVAL 7 DAY"))
        .cast("timestamp").alias("nwk"))
    churn = (
        nxt.join(activity.withColumnRenamed("wk", "nwk"),
                 ["user_id", "nwk"], "left_anti")
        .groupBy(F.date_format("nwk", "yyyy-MM-dd").alias("week"))
        .agg(F.count("*").cast("long").alias("n_churned"))
    )
    return (
        weekly.join(churn, "week", "left")
        .select("week", "n_active", "n_new", "n_retained",
                "n_resurrected",
                F.coalesce("n_churned", F.lit(0)).cast("long")
                .alias("n_churned_into"))
    )


# -- DAU/WAU stickiness -----------------------------------------------------------
@_stage(
    "q_stickiness",
    """
    WITH daily AS (
      SELECT date_trunc('week', ts) AS wk, strftime(ts, '%Y-%m-%d') AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY 1, 2),
    weekly AS (
      SELECT date_trunc('week', ts) AS wk,
             CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      FROM events GROUP BY 1)
    SELECT strftime(d.wk, '%Y-%m-%d') AS week, w.wau,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(d.dau) AS BIGINT) AS dau_sum,
           round(CAST(sum(d.dau) AS DOUBLE) / count(*) / w.wau, 6) + 0.0
             AS stickiness
    FROM daily d JOIN weekly w USING (wk)
    GROUP BY d.wk, w.wau
    """,
)
def q_stickiness(spark, sf_dir):
    """DAU/WAU stickiness per week: mean daily actives over weekly
    actives — the canonical engagement-frequency ratio (1.0 = everyone
    active every day).  Distinct counts are exact BIGINTs; one
    mirrored division.  Plan: two distinct-count aggs + one week-keyed
    join; nothing wider than (week, day)."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("week", "ts").alias("wk"),
                   F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").cast("long").alias("dau"))
    )
    weekly = (
        ev.groupBy(F.date_trunc("week", "ts").alias("wk"))
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )
    return (
        daily.join(weekly, "wk")
        .groupBy(F.date_format("wk", "yyyy-MM-dd").alias("week"), "wau")
        .agg(F.count("*").cast("long").alias("n_days"),
             F.sum("dau").cast("long").alias("dau_sum"))
        .select(
            "week", "wau", "n_days", "dau_sum",
            (F.round(F.col("dau_sum").cast("double") / F.col("n_days")
                     / F.col("wau"), 6) + F.lit(0.0)).alias("stickiness"),
        )
    )


# -- return-time histogram ----------------------------------------------------------
@_stage(
    "q_return_time_hist",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    gaps AS (
      SELECT user_id,
             datediff('day', lag(d) OVER (PARTITION BY user_id ORDER BY d),
                      d) AS gap
      FROM days QUALIFY gap IS NOT NULL),
    hist AS (
      SELECT CAST(gap AS BIGINT) AS gap_days,
             CAST(count(*) AS BIGINT) AS n_returns
      FROM gaps GROUP BY gap),
    tot AS (SELECT CAST(sum(n_returns) AS BIGINT) AS n FROM hist)
    SELECT gap_days, n_returns,
           round(CAST(n_returns AS DOUBLE) / t.n, 6) + 0.0 AS frac,
           round(CAST(sum(n_returns) OVER (ORDER BY gap_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / t.n, 6) + 0.0 AS cum_frac
    FROM hist CROSS JOIN tot t
    """,
)
def q_return_time_hist(spark, sf_dir):
    """Return-time histogram: days between a user's consecutive ACTIVE
    days, with the cumulative "returned within g days" curve — the
    distribution behind retention-window choices (the user-granular
    twin of q_interarrival_stats' per-type gaps).  Gaps are exact
    integer day differences; fractions are mirrored divisions.  Plan:
    one distinct (user, day) agg, one user-ordered window, a
    #distinct-gaps-bounded histogram."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")) \
        .distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    gaps = (
        days.select("user_id",
                    F.datediff("d", F.lag("d").over(w)).alias("gap"))
        .filter(F.col("gap").isNotNull())
    )
    hist = gaps.groupBy(F.col("gap").cast("long").alias("gap_days")) \
        .agg(F.count("*").cast("long").alias("n_returns"))
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    hist = materialize_once(hist, "rth_hist")
    tot = hist.agg(F.sum("n_returns").cast("long").alias("n"))
    wc = (Window.orderBy("gap_days")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "gap_days", "n_returns",
            (F.round(F.col("n_returns").cast("double") / F.col("n"), 6)
             + F.lit(0.0)).alias("frac"),
            (F.round(F.sum("n_returns").over(wc).cast("double")
                     / F.col("n"), 6) + F.lit(0.0)).alias("cum_frac"),
        )
    )


# -- character-level entropy by source ------------------------------------------
_CHENT_SCALE = 10**12


@_stage(
    "q_char_entropy",
    f"""
    WITH chars AS (
      SELECT source, unnest(regexp_split_to_array(
               lower(regexp_replace(coalesce(text, ''), '\\s+', '', 'g')),
               '')) AS ch
      FROM documents),
    counts AS (
      SELECT source, ch, CAST(count(*) AS BIGINT) AS c
      FROM chars WHERE ch <> '' GROUP BY source, ch),
    tot AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_chars_distinct
      FROM counts GROUP BY source),
    terms AS (
      SELECT c.source, t.n, t.n_chars_distinct,
             CAST(floor((CAST(c.c AS DOUBLE) / t.n)
                        * ln(CAST(c.c AS DOUBLE) / t.n)
                        * {_CHENT_SCALE}) AS BIGINT) AS tq
      FROM counts c JOIN tot t USING (source))
    SELECT source, any_value(n) AS n_chars_total,
           any_value(n_chars_distinct) AS n_distinct,
           round(-CAST(sum(tq) AS BIGINT) / {float(_CHENT_SCALE)!r}
                 / ln(2.0), 6) + 0.0 AS char_entropy_bits
    FROM terms GROUP BY source
    """,
)
def q_char_entropy(spark, sf_dir):
    """Character-level entropy per source (whitespace stripped,
    lowercased), in bits — the alphabet-granular diversity signal that
    flags encoding damage and boilerplate before any tokenizer runs
    (English prose sits near 4.1 bits; mojibake and repeated templates
    fall far outside).  Per-char p*ln(p) terms quantize to 1e-12
    BIGINTs so per-source sums are order-independent; the bit
    conversion is one mirrored /ln(2).  Plan: char explode -> (source,
    char) agg (alphabet-bounded) -> source agg."""
    docs = load(spark, sf_dir, "documents")
    chars = docs.select(
        "source",
        F.explode(F.split(
            F.lower(F.regexp_replace(
                F.coalesce("text", F.lit("")), r"\s+", "")), ""))
        .alias("ch"),
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("source", "ch").agg(
        F.count("*").cast("long").alias("c"))
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    counts = materialize_once(counts, "chent_counts")
    tot = counts.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_chars_distinct"))
    p = F.col("c").cast("double") / F.col("n")
    terms = counts.join(F.broadcast(tot), "source").select(
        "source", "n", "n_chars_distinct",
        F.floor(p * F.log(p) * _CHENT_SCALE).cast("long").alias("tq"))
    import math as _math

    return (
        terms.groupBy("source")
        .agg(F.first("n").alias("n_chars_total"),
             F.first("n_chars_distinct").alias("n_distinct"),
             F.sum("tq").cast("long").alias("sq"))
        .select(
            "source", "n_chars_total", "n_distinct",
            (F.round(-F.col("sq") / float(_CHENT_SCALE)
                     / F.lit(_math.log(2.0)), 6) + F.lit(0.0))
            .alias("char_entropy_bits"),
        )
    )


# -- word-length profile by source ------------------------------------------------
@_stage(
    "q_word_length_profile",
    f"""
    WITH toks AS (
      SELECT source, length(t) AS l
      FROM (SELECT source, unnest({_DUCK_TOKS}) AS t FROM documents)),
    mom AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(l) AS BIGINT) AS s,
             CAST(sum(l * l) AS BIGINT) AS ssq,
             CAST(coalesce(sum(CASE WHEN l >= 10 THEN 1 END), 0)
                  AS BIGINT) AS n_long
      FROM toks GROUP BY source)
    SELECT source, n AS n_tokens,
           round(CAST(s AS DOUBLE) / n, 4) + 0.0 AS mean_len,
           round(sqrt((CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                      / n), 4) + 0.0 AS std_len,
           round(CAST(n_long AS DOUBLE) / n, 6) + 0.0 AS long_frac
    FROM mom
    """,
)
def q_word_length_profile(spark, sf_dir):
    """Word-length profile per source: mean/std token length and the
    fraction of long (>=10-char) tokens — the cheap stylometric
    fingerprint that separates technical prose from chat (complements
    q_char_diversity and the Burrows' Delta machinery).  Exact BIGINT
    moments, mirrored divisions.  Plan: token explode -> one source
    moment agg."""
    from nonconsumptive_spark.functions.text import tokenize

    toks = load(spark, sf_dir, "documents").select(
        "source", F.explode(tokenize("text")).alias("t"))
    mom = toks.select("source", F.length("t").alias("l")).groupBy(
        "source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("l").cast("long").alias("s"),
        F.sum(F.col("l") * F.col("l")).cast("long").alias("ssq"),
        F.coalesce(F.sum(F.when(F.col("l") >= 10, 1)), F.lit(0))
        .cast("long").alias("n_long"),
    )
    return mom.select(
        "source", F.col("n").alias("n_tokens"),
        (F.round(F.col("s").cast("double") / F.col("n"), 4) + F.lit(0.0))
        .alias("mean_len"),
        (F.round(F.sqrt((F.col("ssq").cast("double")
                         - F.col("s").cast("double") * F.col("s")
                         / F.col("n")) / F.col("n")), 4) + F.lit(0.0))
        .alias("std_len"),
        (F.round(F.col("n_long").cast("double") / F.col("n"), 6)
         + F.lit(0.0)).alias("long_frac"),
    )


# -- OOV rate per source against the top-K corpus vocabulary -----------------------
_OOV_K = 1000


@_stage(
    "q_oov_by_source",
    f"""
    WITH counts AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest({_DUCK_TOKS}) AS token FROM documents)
      GROUP BY token),
    vocab AS (
      SELECT token FROM counts
      ORDER BY c DESC, token ASC LIMIT {_OOV_K}),
    st AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT source, unnest({_DUCK_TOKS}) AS token FROM documents)
      GROUP BY source, token),
    agg AS (
      SELECT st.source, CAST(sum(st.c) AS BIGINT) AS n_tokens,
             CAST(coalesce(sum(CASE WHEN v.token IS NULL THEN st.c END),
                           0) AS BIGINT) AS oov_tokens,
             CAST(coalesce(sum(CASE WHEN v.token IS NULL THEN 1 END), 0)
                  AS BIGINT) AS oov_types
      FROM st LEFT JOIN vocab v USING (token)
      GROUP BY st.source)
    SELECT source, n_tokens, oov_tokens, oov_types,
           round(CAST(oov_tokens AS DOUBLE) / n_tokens, 6) + 0.0
             AS oov_rate
    FROM agg
    """,
)
def q_oov_by_source(spark, sf_dir):
    """Out-of-vocabulary rate per source against the corpus top-K
    vocabulary: which feeds the vocab cap hurts most — the per-source
    refinement of q_vocab_coverage's corpus curve (and the fairness
    check before committing a tokenizer vocab).  Vocabulary selection
    uses the distributed sort+limit head with the deterministic
    (count desc, token) tie-break; OOV mass is an exact BIGINT.  Plan:
    one global wordcount agg + top-K head, one (source, token) agg, a
    broadcast vocab anti-membership join, one source agg."""
    from nonconsumptive_spark.functions.text import tokenize
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    toks = load(spark, sf_dir, "documents").select(
        "source", F.explode(tokenize("text")).alias("token"))
    toks = materialize_once(toks, "oov_toks")
    counts = toks.groupBy("token").agg(
        F.count("*").cast("long").alias("c"))
    vocab = (counts.orderBy(F.desc("c"), F.asc("token")).limit(_OOV_K)
             .select("token", F.lit(True).alias("in_vocab")))
    st = toks.groupBy("source", "token").agg(
        F.count("*").cast("long").alias("c"))
    agg = (
        st.join(F.broadcast(vocab), "token", "left")
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.coalesce(F.sum(F.when(F.col("in_vocab").isNull(),
                                    F.col("c"))), F.lit(0))
            .cast("long").alias("oov_tokens"),
            F.coalesce(F.sum(F.when(F.col("in_vocab").isNull(), 1)),
                       F.lit(0)).cast("long").alias("oov_types"),
        )
    )
    return agg.select(
        "source", "n_tokens", "oov_tokens", "oov_types",
        (F.round(F.col("oov_tokens").cast("double") / F.col("n_tokens"),
                 6) + F.lit(0.0)).alias("oov_rate"),
    )


# -- Hill tail-index estimator over the token-frequency head -----------------------
_HILL_K = 50
_HILL_SCALE = 10**12


@_stage(
    "q_hill_tail",
    f"""
    WITH counts AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest({_DUCK_TOKS}) AS token FROM documents)
      GROUP BY token),
    head AS (
      SELECT c, CAST(row_number() OVER (ORDER BY c DESC, token ASC)
                     AS BIGINT) AS rk
      FROM counts ORDER BY c DESC, token ASC LIMIT {_HILL_K + 1}),
    ref AS (
      SELECT c AS c_ref, rk AS rk_ref FROM head
      WHERE rk = (SELECT max(rk) FROM head)),
    terms AS (
      SELECT CAST(floor(ln(CAST(h.c AS DOUBLE) / r.c_ref)
                        * {_HILL_SCALE}) AS BIGINT) AS tq
      FROM head h CROSS JOIN ref r WHERE h.rk < r.rk_ref),
    agg AS (SELECT CAST(sum(tq) AS BIGINT) AS sq,
                   CAST(count(*) AS BIGINT) AS k
            FROM terms)
    SELECT a.k, r.c_ref,
           CASE WHEN a.sq > 0
                THEN round(CAST(a.k AS DOUBLE)
                           / (a.sq / {float(_HILL_SCALE)!r}), 6) + 0.0
                END AS hill_alpha
    FROM agg a CROSS JOIN ref r
    """,
)
def q_hill_tail(spark, sf_dir):
    """Hill maximum-likelihood tail-index of the token-frequency
    distribution: alpha = k / sum ln(c_i / c_(k+1)) over the k largest
    type frequencies — the MLE twin of q_zipf_slope's regression
    estimate (a Zipf exponent s corresponds to alpha ~ 1/s on the
    frequency tail).  The head comes from the distributed sort+limit
    (deterministic (count, token) tie-break), per-term logs quantize to
    1e-12 BIGINTs before the k-term sum.  When the vocabulary has
    fewer than k+1 types the reference falls back to the smallest
    available order statistic (k shrinks with it).  Plan: one
    wordcount agg + TakeOrdered(k+1); everything after is a
    <=k+1-row frame."""
    from pyspark.sql import Window
    from nonconsumptive_spark.functions.text import tokenize
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    counts = (
        load(spark, sf_dir, "documents")
        .select(F.explode(tokenize("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("c"))
    )
    head = materialize_once(
        counts.orderBy(F.desc("c"), F.asc("token")).limit(_HILL_K + 1)
        .select("c", F.row_number().over(
            Window.orderBy(F.desc("c"), F.asc("token")))
            .cast("long").alias("rk")),
        "hill_head",
    )
    mx = head.agg(F.max("rk").alias("rk_ref"))
    ref = (head.crossJoin(F.broadcast(mx))
           .filter(F.col("rk") == F.col("rk_ref"))
           .select(F.col("c").alias("c_ref"), "rk_ref"))
    terms = (
        head.crossJoin(F.broadcast(ref))
        .filter(F.col("rk") < F.col("rk_ref"))
        .select(F.floor(F.log(F.col("c").cast("double") / F.col("c_ref"))
                        * _HILL_SCALE).cast("long").alias("tq"))
    )
    agg = terms.agg(F.sum("tq").cast("long").alias("sq"),
                    F.count("*").cast("long").alias("k"))
    return (
        agg.crossJoin(F.broadcast(ref.select("c_ref")))
        .select(
            "k", "c_ref",
            F.when(F.col("sq") > 0,
                   F.round(F.col("k").cast("double")
                           / (F.col("sq") / float(_HILL_SCALE)), 6)
                   + F.lit(0.0)).alias("hill_alpha"),
        )
    )


# -- daily control bands (exact P10/P50/P90 per event type) -------------------------
@_stage(
    "q_daily_bands",
    """
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS d,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    hist AS (
      SELECT event_type, y AS v, CAST(count(*) AS BIGINT) AS c
      FROM daily GROUP BY event_type, y),
    cdf AS (
      SELECT event_type, v,
             CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM hist)
    SELECT event_type, any_value(n) AS n_days,
           CAST(min(CASE WHEN cum >= (1 * n + 9) // 10 THEN v END)
                AS BIGINT) AS p10,
           CAST(min(CASE WHEN cum >= (5 * n + 9) // 10 THEN v END)
                AS BIGINT) AS p50,
           CAST(min(CASE WHEN cum >= (9 * n + 9) // 10 THEN v END)
                AS BIGINT) AS p90
    FROM cdf GROUP BY event_type
    """,
)
def q_daily_bands(spark, sf_dir):
    """Exact P10/P50/P90 control bands of the daily count per event
    type — the dashboard bands behind "is today's volume unusual"
    (reads against q_sax_daily/q_cusum_by_type, which flag points; this
    draws the envelope).  Percentiles are order statistics at
    ceil(q*n) off the per-type day histogram — pure integers, no
    interpolation, replays exactly.  Plan: daily agg -> per-type
    bounded histogram windows -> one agg."""
    from pyspark.sql import Window

    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(F.count("*").cast("long").alias("y"))
    )
    hist = daily.groupBy("event_type", F.col("y").alias("v")).agg(
        F.count("*").cast("long").alias("c"))
    w = (Window.partitionBy("event_type").orderBy("v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cdf = hist.select(
        "event_type", "v",
        F.sum("c").over(w).cast("long").alias("cum"),
        F.sum("c").over(Window.partitionBy("event_type"))
        .cast("long").alias("n"))

    def pct(q):
        return F.min(F.when(
            F.col("cum") >= F.expr(f"({q} * n + 9) div 10"),
            F.col("v"))).cast("long")

    return cdf.groupBy("event_type").agg(
        F.first("n").alias("n_days"),
        pct(1).alias("p10"), pct(5).alias("p50"), pct(9).alias("p90"))


# -- 1-NN label agreement (embedding-quality probe) ---------------------------------
def _nn_label_oracle() -> str:
    from nonconsumptive_spark.queries.similarity import _N_QUERIES

    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, label AS own_label,
             CAST(embedding AS DOUBLE[]) AS qvec
      FROM embeddings WHERE vec_id < {_N_QUERIES}),
    c AS (
      SELECT vec_id AS neighbor_id, label AS nn_label,
             CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings),
    scored AS (
      SELECT q.query_id, q.own_label, c.neighbor_id, c.nn_label,
             round(list_dot_product(q.qvec, c.cvec) /
                   (sqrt(list_dot_product(q.qvec, q.qvec)) *
                    sqrt(list_dot_product(c.cvec, c.cvec))), 4)
               AS cosine_sim
      FROM q CROSS JOIN c WHERE q.query_id <> c.neighbor_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rk
      FROM scored)
    SELECT query_id, CAST(own_label AS BIGINT) AS own_label,
           neighbor_id AS nn_id, CAST(nn_label AS BIGINT) AS nn_label,
           cosine_sim, own_label = nn_label AS agree
    FROM ranked WHERE rk = 1
    """


@_stage("q_nn_label_agreement", _nn_label_oracle())
def q_nn_label_agreement(spark, sf_dir):
    """1-nearest-neighbor label agreement for the standard 10-vector
    query set: does each query vector's closest OTHER vector carry the
    same label — the cheapest leave-one-out probe of whether the
    embedding space respects the labeling (the precursor to the full
    kNN-classifier eval).  Reuses knn_bruteforce (broadcast query side,
    deterministic rounded-sim/id ranking).  Plan: the documented
    intentional BNLJ against the <=10-row query side + two label
    joins."""
    from nonconsumptive_spark.operators import similarity as sim
    from nonconsumptive_spark.queries.similarity import _N_QUERIES

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    nn = sim.knn_bruteforce(emb, queries, k=1)
    own = emb.select(F.col("vec_id").alias("query_id"),
                     F.col("label").cast("long").alias("own_label"))
    other = emb.select(F.col("vec_id").alias("neighbor_id"),
                       F.col("label").cast("long").alias("nn_label"))
    return (
        nn.join(F.broadcast(own), "query_id")
        .join(other, "neighbor_id")
        .select(
            "query_id", "own_label",
            F.col("neighbor_id").alias("nn_id"), "nn_label",
            "cosine_sim",
            (F.col("own_label") == F.col("nn_label")).alias("agree"),
        )
    )


# -- boilerplate prefix detection per source ------------------------------------------
# LCP(all docs of a source) = LCP(min(text), max(text)) — the classic
# ordered-set identity: the lexicographic extremes bound every other
# string, so any prefix they share is shared by all.
@_stage(
    "q_common_prefix",
    """
    WITH ext AS (
      SELECT source, min(coalesce(text, '')) AS lo,
             max(coalesce(text, '')) AS hi,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source),
    lcp AS (
      SELECT source, n_docs,
             CAST(len(list_filter(
               range(1, least(length(lo), length(hi)) + 1),
               p -> substr(lo, 1, p) = substr(hi, 1, p))) AS BIGINT)
               AS prefix_len,
             lo
      FROM ext)
    SELECT source, n_docs, prefix_len,
           substr(lo, 1, least(prefix_len, 24)) AS prefix_sample,
           prefix_len >= 12 AS is_templated
    FROM lcp
    """,
)
def q_common_prefix(spark, sf_dir):
    """Boilerplate-prefix detector per source: the longest common
    prefix of ALL the source's documents, via the ordered-set identity
    LCP(all) = LCP(min, max) (see header note) — two string aggregates
    replace any all-pairs comparison, so the check is one groupBy at
    any corpus size.  A long shared prefix is the signature of
    templated/boilerplate feeds that near-dedup misses when bodies
    differ.  NULL text counts as empty (forcing LCP 0 for that
    source).  Plan: one (min, max) string agg + in-row prefix
    comparison bounded by the shorter extreme."""
    docs = load(spark, sf_dir, "documents")
    txt = F.coalesce("text", F.lit(""))
    ext = docs.groupBy("source").agg(
        F.min(txt).alias("lo"), F.max(txt).alias("hi"),
        F.count("*").cast("long").alias("n_docs"))
    out = ext.selectExpr(
        "source", "n_docs",
        "CAST(size(filter(CASE WHEN least(length(lo), length(hi)) > 0 "
        "  THEN sequence(1, least(length(lo), length(hi))) "
        "  ELSE array() END, "
        "  p -> substr(lo, 1, CAST(p AS INT)) = "
        "       substr(hi, 1, CAST(p AS INT)))) AS LONG) AS prefix_len",
        "lo",
    )
    return out.selectExpr(
        "source", "n_docs", "prefix_len",
        "substr(lo, 1, CAST(least(prefix_len, 24) AS INT)) AS prefix_sample",
        "prefix_len >= 12 AS is_templated",
    )


# -- positional bias of the top terms ------------------------------------------------
# Where do frequent terms sit inside documents?  Front-loaded terms
# (mean normalized position well under 0.5) are the lead-bias signal
# summarization corpora must report.  Per-occurrence normalized
# positions quantize to integer 1e-6 units (pos*1e6 div len) BEFORE the
# cross-occurrence sum, so the mean replays exactly.
_TPB_K = 20
_TPB_SCALE = 10**6


@_stage(
    "q_term_position_bias",
    f"""
    WITH toks AS (
      SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS token,
             len(t) AS l
      FROM (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents)),
    counts AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY token),
    vocab AS (
      SELECT token FROM counts ORDER BY c DESC, token ASC LIMIT {_TPB_K}),
    occ AS (
      SELECT t.token,
             CAST((t.pos * {_TPB_SCALE}) // t.l AS BIGINT) AS npos_q
      FROM toks t SEMI JOIN vocab v ON v.token = t.token),
    agg AS (
      SELECT token, CAST(count(*) AS BIGINT) AS n_occ,
             CAST(sum(npos_q) AS BIGINT) AS s
      FROM occ GROUP BY token)
    SELECT token, n_occ,
           round(CAST(s AS DOUBLE) / n_occ / {_TPB_SCALE}, 6) + 0.0
             AS mean_norm_pos,
           CAST(s AS DOUBLE) / n_occ / {_TPB_SCALE} < 0.4 AS front_loaded
    FROM agg
    """,
)
def q_term_position_bias(spark, sf_dir):
    """Mean normalized in-document position for the top-K corpus terms
    (see header note) — terms that always appear early flag lead bias
    and templated openings; terms pinned late flag boilerplate
    footers.  Vocabulary selection is the deterministic sort+limit
    head; membership rides a broadcast semi-join.  Plan: one positional
    explode, one wordcount agg + TakeOrdered(K), one K-term agg."""
    from pyspark.sql import Window
    from nonconsumptive_spark.functions.text import tokenize
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    base = load(spark, sf_dir, "documents").select(
        "doc_id", tokenize(F.coalesce("text", F.lit(""))).alias("t"))
    toks = materialize_once(
        base.select(F.posexplode("t").alias("p", "token"),
                    F.size("t").alias("l"))
        .select("token", (F.col("p") + 1).alias("pos"), "l"),
        "tpb_toks",
    )
    counts = toks.groupBy("token").agg(
        F.count("*").cast("long").alias("c"))
    vocab = counts.orderBy(F.desc("c"), F.asc("token")).limit(_TPB_K) \
        .select("token")
    occ = (
        toks.join(F.broadcast(vocab), "token", "left_semi")
        .select("token",
                F.expr(f"(pos * {_TPB_SCALE}) div l").cast("long")
                .alias("npos_q"))
    )
    agg = occ.groupBy("token").agg(
        F.count("*").cast("long").alias("n_occ"),
        F.sum("npos_q").cast("long").alias("s"))
    mean = F.col("s").cast("double") / F.col("n_occ") / _TPB_SCALE
    return agg.select(
        "token", "n_occ",
        (F.round(mean, 6) + F.lit(0.0)).alias("mean_norm_pos"),
        (mean < 0.4).alias("front_loaded"),
    )


# -- user concentration per event type --------------------------------------------------
@_stage(
    "q_type_user_hhi",
    """
    WITH grp AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, user_id),
    agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(c) AS BIGINT) AS n_events,
             CAST(sum(c * c) AS BIGINT) AS s2
      FROM grp GROUP BY event_type)
    SELECT event_type, n_users, n_events,
           round(CAST(s2 AS DOUBLE) / n_events / n_events, 6) + 0.0
             AS hhi,
           round(CAST(n_events AS DOUBLE) * n_events / s2, 4) + 0.0
             AS effective_users
    FROM agg
    """,
)
def q_type_user_hhi(spark, sf_dir):
    """Herfindahl concentration of each event type over its users: is
    the type's volume broad-based or driven by a handful of heavy
    accounts (effective_users = 1/HHI) — the per-type refinement of
    q_hhi_concentration's corpus view, and the bot-traffic smell test.
    Exact BIGINT share sums, one mirrored division each.  Plan: one
    (type, user) agg + one type agg."""
    grp = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").cast("long").alias("c"))
    )
    agg = grp.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("c").cast("long").alias("n_events"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    ne = F.col("n_events").cast("double")
    return agg.select(
        "event_type", "n_users", "n_events",
        (F.round(F.col("s2") / ne / F.col("n_events"), 6) + F.lit(0.0))
        .alias("hhi"),
        (F.round(ne * F.col("n_events") / F.col("s2"), 4) + F.lit(0.0))
        .alias("effective_users"),
    )


# -- cluster representatives (closest-to-centroid) -----------------------------------
def _reps_oracle() -> str:
    from nonconsumptive_spark.queries.clustering import (
        _GRID, _ITERS, _K, _kmeans_cte)

    fin = f"a{_ITERS + 1}"
    return (
        _kmeans_cte(_K, _ITERS, _GRID)
        + f""",
    best AS (
      SELECT cid, min(dist) AS min_dist FROM {fin} GROUP BY cid),
    reps AS (
      SELECT a.cid, b.min_dist, min(a.vec_id) AS rep_id
      FROM {fin} a JOIN best b ON b.cid = a.cid AND a.dist = b.min_dist
      GROUP BY a.cid, b.min_dist),
    sizes AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_members
              FROM {fin} GROUP BY cid)
    SELECT CAST(r.cid AS BIGINT) AS cluster,
           CAST(r.rep_id AS BIGINT) AS rep_id,
           CAST(r.min_dist AS BIGINT) AS dist_sq,
           s.n_members
    FROM reps r JOIN sizes s USING (cid)"""
    )


@_stage("q_cluster_representatives", _reps_oracle())
def q_cluster_representatives(spark, sf_dir):
    """One representative vector per k-means cluster: the member
    closest to its centroid (exact integer grid distance, min-id
    tie-break) plus the cluster size — the "show me an example of each
    cluster" selector behind dataset cards and cluster labeling (the
    centroid-based stand-in for the O(size^2) medoid).  Plan: the
    shared Lloyd loop, then one cluster agg of min(struct(dist, id)) —
    nothing pairwise."""
    from nonconsumptive_spark.operators import clustering as cl
    from nonconsumptive_spark.queries.clustering import _ITERS, _K

    km = cl.kmeans(load(spark, sf_dir, "embeddings"),
                   k=_K, n_iter=_ITERS)
    return (
        km.groupBy("cluster")
        .agg(F.min(F.struct(F.col("dist_sq"), F.col("vec_id")))
             .alias("b"),
             F.count("*").cast("long").alias("n_members"))
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            F.col("b.vec_id").cast("long").alias("rep_id"),
            F.col("b.dist_sq").cast("long").alias("dist_sq"),
            "n_members",
        )
    )


# -- k-means elbow table -------------------------------------------------------------
_ELBOW_KS = [5, 10, 20]
_ELBOW_ITERS = 4


def _elbow_oracle() -> str:
    from nonconsumptive_spark.queries.clustering import _GRID, _kmeans_cte

    parts = []
    for k in _ELBOW_KS:
        inner = (_kmeans_cte(k, _ELBOW_ITERS, _GRID)
                 + f"\n    SELECT dist FROM a{_ELBOW_ITERS + 1}")
        parts.append(f"""
    SELECT CAST({k} AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(dist) AS BIGINT) AS inertia_q
    FROM ({inner})""")
    return (" UNION ALL ".join(parts))


@_stage("q_kmeans_elbow", _elbow_oracle())
def q_kmeans_elbow(spark, sf_dir):
    """The k-means elbow table: total within-cluster squared grid
    distance (inertia) for a spine of k values — the how-many-clusters
    decision input, each point an independent Lloyd run with the shared
    exact-integer machinery (distances are BIGINTs, so every inertia
    replays bit-for-bit).  Plan: one Lloyd loop per k (zero-shuffle
    assignment scans + k-group update aggs), one 1-row inertia agg
    each; runs are independent and could execute concurrently."""
    from concurrent.futures import ThreadPoolExecutor

    from nonconsumptive_spark.operators import clustering as cl

    emb = load(spark, sf_dir, "embeddings")

    # The three Lloyd runs are independent (each seeds from the same
    # deterministic first-k rows and iterates its own centroids), so
    # they run CONCURRENTLY from driver threads: each run's per-round
    # collect()s overlap the others' scans and wall-clock drops from
    # the sum of runs to roughly the slowest one (12.4 -> ~6s warm at
    # sf0.1).  Results are bit-identical to the sequential loop —
    # threading changes scheduling, never the per-run arithmetic.
    # All three runs read ONE materialized quantized frame (r8: each
    # run used to quantize + checkpoint the corpus separately).
    q_df = cl.quantized_vectors(emb)

    def run(k):
        km = cl.kmeans(emb, k=k, n_iter=_ELBOW_ITERS, q_df=q_df)
        return km.agg(
            F.lit(k).cast("long").alias("k"),
            F.count("*").cast("long").alias("n_vecs"),
            F.sum("dist_sq").cast("long").alias("inertia_q"))

    with ThreadPoolExecutor(max_workers=len(_ELBOW_KS)) as ex:
        frames = list(ex.map(run, _ELBOW_KS))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# -- cross-correlation between event-type daily series --------------------------------
_XCORR_LAGS = [0, 1, 2, 3]


@_stage(
    "q_xcorr_types",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    lags AS (SELECT unnest({_XCORR_LAGS}) AS lag),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
             a.y AS x, b.y AS y
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b
        ON b.event_type > a.event_type
       AND b.d = a.d + CAST(l.lag AS INTEGER)),
    mom AS (
      SELECT type_a, type_b, lag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM pairs GROUP BY 1, 2, 3)
    SELECT type_a, type_b, CAST(lag AS BIGINT) AS lag, n AS n_days,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                  * (n * syy - sy * sy)), 6) + 0.0
                END AS pearson_r
    FROM mom
    """,
)
def q_xcorr_types(spark, sf_dir):
    """Lagged cross-correlation between every event-type pair's daily
    series: Pearson r of (x_t, y_(t+lag)) for a small lag spine — does
    one behavior lead another (lag 0 = co-movement, positive lags =
    type_a leads type_b).  Exact BIGINT moments off the day-aligned
    join, one mirrored float per cell, zero-variance guard.  Plan: one
    daily agg, a 4-row lag spine, a day-keyed equi-join bounded by
    #types^2 x #days x #lags, one moment agg."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(F.count("*").cast("long").alias("y"))
    )
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    daily = materialize_once(daily, "xcorr_daily")
    lags = spark.createDataFrame([(l,) for l in _XCORR_LAGS], "lag int")
    a = daily.select(F.col("event_type").alias("type_a"),
                     F.col("d").alias("da"), F.col("y").alias("x"))
    b = daily.select(F.col("event_type").alias("type_b"),
                     F.col("d").alias("db"), F.col("y").alias("yy"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, (F.col("type_b") > F.col("type_a"))
              & (F.col("db") == F.expr("date_add(da, lag)")))
    )
    mom = pairs.groupBy("type_a", "type_b", "lag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("yy").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("yy") * F.col("yy")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("yy")).cast("long").alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return mom.select(
        "type_a", "type_b", F.col("lag").cast("long").alias("lag"),
        F.col("n").alias("n_days"),
        F.when((vx > 0) & (vy > 0),
               F.round((F.col("n") * F.col("sxy")
                        - F.col("sx") * F.col("sy")).cast("double")
                       / F.sqrt(vx.cast("double") * vy), 6) + F.lit(0.0))
        .alias("pearson_r"),
    )
