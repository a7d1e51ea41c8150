"""The round-6 promotion cohort: 55 (spark_fn, oracle_sql) pairs built
and oracle-verified during round 5 (then ``queries/staging.py``), now
REGISTERED — imported by ``queries/__init__.all_queries`` so the driver
gate sees every entry.

Promoted in place rather than re-homed into the topic modules, exactly
like the round-5 cohort (``queries/promoted.py``): each entry lives
next to its oracle builder and shared constants.  Every entry was
verified with the driver-grade dtype-strict compare at sf0.001 (suite)
AND sf0.01 (tools/check_staged.py) before promotion, censused by
tools/plan_census.py, benched as extras, and 10x scale-stressed.  New
work stages in the fresh ``queries/staging.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (used by staged entries)

from nonconsumptive_spark.queries import load, register  # noqa: F401

_DUCK_TOKS = "list_filter(regexp_split_to_array(text, '[^\\pL]+'), x -> x <> '')"

# Kept so pre-promotion tooling and examples that resolve these entries
# by name keep working; registration happens in the decorator below.
STAGED: dict[str, tuple] = {}


def _stage(name: str, oracle: str):
    def deco(fn):
        STAGED[name] = (fn, oracle)
        register(name, oracle, doc=fn.__doc__ or "")(fn)
        return fn

    return deco


# -- Dunning G2 log-likelihood collocations ---------------------------------
def _g2_oracle() -> str:
    # the four k·ln(k·N/(row·col)) terms, zero at k = 0, folded in the
    # SAME left-to-right order as the Spark expression
    def term(k, row, col):
        return (f"CASE WHEN {k} > 0 THEN CAST({k} AS DOUBLE)"
                f" * ln(CAST(({k}) * n_tot AS DOUBLE) / (({row}) * ({col})))"
                f" ELSE 0.0 END")

    t11 = term("c2", "r_tot", "c_tot")
    t12 = term("(r_tot - c2)", "r_tot", "(n_tot - c_tot)")
    t21 = term("(c_tot - c2)", "(n_tot - r_tot)", "c_tot")
    t22 = term("(n_tot - r_tot - c_tot + c2)",
               "(n_tot - r_tot)", "(n_tot - c_tot)")
    return f"""
    WITH tokpos AS (
      SELECT doc_id, generate_subscripts({_DUCK_TOKS}, 1) AS pos,
             unnest({_DUCK_TOKS}) AS token
      FROM documents),
    bg AS (
      SELECT w0, w1, CAST(count(*) AS BIGINT) AS c2 FROM (
        SELECT doc_id, token AS w0,
               lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
        FROM tokpos) z
      WHERE w1 IS NOT NULL GROUP BY w0, w1),
    lm AS (SELECT w0, CAST(sum(c2) AS BIGINT) AS r_tot FROM bg GROUP BY w0),
    rm AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c_tot FROM bg GROUP BY w1),
    nt AS (SELECT CAST(sum(c2) AS BIGINT) AS n_tot FROM bg)
    SELECT b.w0, b.w1, b.c2,
           round(2.0 * ((({t11} + {t12}) + {t21}) + {t22}), 4) + 0.0 AS g2
    FROM bg b
    JOIN lm ON lm.w0 = b.w0
    JOIN rm ON rm.w1 = b.w1
    CROSS JOIN nt
    WHERE b.c2 >= 5
    """


@_stage("q_g2_collocations", _g2_oracle())
def q_g2_collocations(spark, sf_dir):
    """Dunning log-likelihood-ratio collocations (operators/wordcount.
    g2_collocations) — the third classic association measure beside PMI
    and log-Dice; margins and N come from the bigram frame itself, so
    one corpus pass feeds everything."""
    from nonconsumptive_spark.operators.wordcount import g2_collocations

    return g2_collocations(load(spark, sf_dir, "documents"))


# -- Cohen's d / Hedges' g effect sizes per source pair ----------------------
# per-source exact moments (columns n, s, ss); pair columns n1.. / n2..
_D_M = "CAST(s AS DOUBLE) / n"
_D_V = "(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)"
_D_POOL = "sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))"
_D_D = f"round((m1 - m2) / {_D_POOL}, 6) + 0.0"
_D_G = (f"round(((m1 - m2) / {_D_POOL})"
        " * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6) + 0.0")


@_stage(
    "q_cohens_d_sources",
    f"""
    WITH mom AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS s,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
      FROM documents GROUP BY source),
    sided AS (SELECT source, n, {_D_M} AS m, {_D_V} AS v FROM mom),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.n AS n1, a.m AS m1, a.v AS v1,
             b.n AS n2, b.m AS m2, b.v AS v2
      FROM sided a JOIN sided b ON a.source < b.source)
    SELECT source_a, source_b,
           CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
           {_D_D} AS cohens_d, {_D_G} AS hedges_g
    FROM pairs
    """,
)
def q_cohens_d_sources(spark, sf_dir):
    """Pooled-SD standardized mean difference (Cohen's d) + the small-
    sample Hedges' g correction for document length between every source
    pair — the effect-size companion to q_welch_ttest_sources (a t-test
    says IF lengths differ; d says by HOW MUCH in SD units).  Moments
    are one exact BIGINT agg per source; every float is a mirrored
    expression over those integers; pair frame = the #sources^2
    broadcast self-join."""
    mom = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("s"),
            F.sum(F.col("n_chars") * F.col("n_chars")).cast("long")
            .alias("ss"),
        )
    )
    sided = mom.selectExpr("source", "n", f"{_D_M} AS m", f"{_D_V} AS v")
    a = sided.select(F.col("source").alias("source_a"),
                     F.col("n").alias("n1"), F.col("m").alias("m1"),
                     F.col("v").alias("v1"))
    b = sided.select(F.col("source").alias("source_b"),
                     F.col("n").alias("n2"), F.col("m").alias("m2"),
                     F.col("v").alias("v2"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("source_a") < F.col("source_b"))
        .selectExpr(
            "source_a", "source_b",
            "CAST(n1 AS BIGINT) AS n_a", "CAST(n2 AS BIGINT) AS n_b",
            f"{_D_D} AS cohens_d", f"{_D_G} AS hedges_g",
        )
    )


# -- seeded two-sample permutation test ---------------------------------------
_PERM_R = 200
_PERM_SCALE = 1_000_000


def _perm_oracle() -> str:
    # replica r assigns doc i to group A iff bit 0 of the portable 60-bit
    # md5(doc_id || ':' || r) is 0; the test statistic is
    # floor(|mean_A - mean_B| * 1e6) — two exact-integer divisions, one
    # subtract, abs, scale, floor: identical IEEE chains on both engines
    q = (lambda sa, na, sb, nb:
         f"CASE WHEN {na} > 0 AND {nb} > 0 THEN "
         f"CAST(floor(abs(CAST({sa} AS DOUBLE) / {na}"
         f" - CAST({sb} AS DOUBLE) / {nb}) * {_PERM_SCALE}) AS BIGINT)"
         f" ELSE NULL END")
    return f"""
    WITH srcs AS (
      SELECT source FROM documents GROUP BY source ORDER BY source LIMIT 2),
    sa AS (SELECT min(source) AS s FROM srcs),
    base AS (
      SELECT d.doc_id, d.source,
             CAST(coalesce(d.n_chars, 0) AS BIGINT) AS x
      FROM documents d SEMI JOIN srcs s ON d.source = s.source),
    obs AS (
      SELECT CAST(sum(CASE WHEN source = (SELECT s FROM sa)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN source = (SELECT s FROM sa)
                           THEN x ELSE 0 END) AS BIGINT) AS s_a,
             CAST(count(*) AS BIGINT) AS n_t,
             CAST(sum(x) AS BIGINT) AS s_t
      FROM base),
    obsq AS (
      SELECT n_a, n_t - n_a AS n_b,
             {q('s_a', 'n_a', '(s_t - s_a)', '(n_t - n_a)')} AS diff_obs_q
      FROM obs),
    reps AS (
      SELECT r,
             CAST(sum(CASE WHEN bit = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN bit = 0 THEN x ELSE 0 END) AS BIGINT) AS s_a,
             CAST(count(*) AS BIGINT) AS n_t,
             CAST(sum(x) AS BIGINT) AS s_t
      FROM (
        SELECT b.x, t.r,
               CAST(('0x' || substr(md5(CAST(b.doc_id AS VARCHAR) || ':'
                     || CAST(t.r AS VARCHAR)), 1, 15)) AS BIGINT) % 2 AS bit
        FROM base b, range(1, {_PERM_R} + 1) t(r))
      GROUP BY r),
    repq AS (
      SELECT r, {q('s_a', 'n_a', '(s_t - s_a)', '(n_t - n_a)')} AS diff_q
      FROM reps)
    SELECT o.n_a, o.n_b, o.diff_obs_q,
           CAST(count(p.diff_q) AS BIGINT) AS n_eff,
           CAST(sum(CASE WHEN p.diff_q >= o.diff_obs_q THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ge,
           round(CAST(sum(CASE WHEN p.diff_q >= o.diff_obs_q
                               THEN 1 ELSE 0 END) + 1 AS DOUBLE)
                 / (count(p.diff_q) + 1), 6) + 0.0 AS p_value
    FROM repq p CROSS JOIN obsq o
    GROUP BY o.n_a, o.n_b, o.diff_obs_q
    """


@_stage("q_permutation_test", _perm_oracle())
def q_permutation_test(spark, sf_dir):
    """Seeded two-sample permutation test for mean document length
    (n_chars) between the two lexicographically-first sources: replica r
    reassigns every doc by bit 0 of the portable 60-bit
    md5(doc_id ':' r), the statistic is the 1e-6-floored |mean diff|,
    and p = (#replicas >= observed + 1)/(R + 1) — the distribution-free
    significance check beside the parametric Welch battery.  Scale:
    docs x R rows collapse through ONE map-side-combined R-group agg
    (R = 200 output rows), then 1-row attaches; nothing after the agg
    scales with the corpus."""
    docs = load(spark, sf_dir, "documents")
    srcs = (docs.groupBy("source").agg(F.lit(1).alias("__o"))
            .orderBy("source").limit(2).select("source"))
    base = (
        docs.join(F.broadcast(srcs), "source", "left_semi")
        .select("source", "doc_id",
                F.coalesce(F.col("n_chars"), F.lit(0)).cast("long")
                .alias("x"))
    )
    base = base.crossJoin(
        F.broadcast(srcs.agg(F.min("source").alias("s"))))

    def diffq(sa, na, sb, nb):
        return F.when(
            (na > 0) & (nb > 0),
            F.floor(F.abs(sa.cast("double") / na - sb.cast("double") / nb)
                    * _PERM_SCALE).cast("long"),
        ).otherwise(F.lit(None).cast("long"))

    obs = base.agg(
        F.sum(F.when(F.col("source") == F.col("s"), 1).otherwise(0))
        .cast("long").alias("n_a"),
        F.sum(F.when(F.col("source") == F.col("s"), F.col("x"))
              .otherwise(0)).cast("long").alias("s_a"),
        F.count("*").cast("long").alias("n_t"),
        F.sum("x").cast("long").alias("s_t"),
    )
    obsq = obs.select(
        "n_a", (F.col("n_t") - F.col("n_a")).alias("n_b"),
        diffq(F.col("s_a"), F.col("n_a"),
              F.col("s_t") - F.col("s_a"),
              F.col("n_t") - F.col("n_a")).alias("diff_obs_q"),
    )
    bit = (
        F.conv(F.substring(F.md5(F.concat(
            F.col("doc_id").cast("string"), F.lit(":"),
            F.col("r").cast("string"))), 1, 15), 16, 10).cast("long") % 2
    )
    reps = (
        base.select("doc_id", "x",
                    F.explode(F.sequence(F.lit(1), F.lit(_PERM_R)))
                    .alias("r"))
        .select("x", "r", bit.alias("bit"))
        .groupBy("r")
        .agg(
            F.sum(F.when(F.col("bit") == 0, 1).otherwise(0))
            .cast("long").alias("n_a"),
            F.sum(F.when(F.col("bit") == 0, F.col("x")).otherwise(0))
            .cast("long").alias("s_a"),
            F.count("*").cast("long").alias("n_t"),
            F.sum("x").cast("long").alias("s_t"),
        )
    )
    repq = reps.select(
        "r",
        diffq(F.col("s_a"), F.col("n_a"),
              F.col("s_t") - F.col("s_a"),
              F.col("n_t") - F.col("n_a")).alias("diff_q"),
    )
    return (
        repq.crossJoin(F.broadcast(obsq))  # 1-row observed attach
        .groupBy("n_a", "n_b", "diff_obs_q")
        .agg(
            F.count("diff_q").cast("long").alias("n_eff"),
            F.sum(F.when(F.col("diff_q") >= F.col("diff_obs_q"), 1)
                  .otherwise(0)).cast("long").alias("n_ge"),
            (F.round(
                (F.sum(F.when(F.col("diff_q") >= F.col("diff_obs_q"), 1)
                       .otherwise(0)) + F.lit(1)).cast("double")
                / (F.count("diff_q") + F.lit(1)), 6) + F.lit(0.0))
            .alias("p_value"),
        )
        .select("n_a", "n_b", "diff_obs_q", "n_eff", "n_ge", "p_value")
    )


# -- Holt linear (double-exponential) smoothing over daily volume -----------
def _holt_oracle() -> str:
    from nonconsumptive_spark.operators.grouped import (
        HOLT_ALPHA, HOLT_BETA, HOLT_SCALE)

    a, b = HOLT_ALPHA, HOLT_BETA
    quant = (lambda v: f"CAST(floor(({v}) * {HOLT_SCALE}) AS BIGINT)"
             f" / {float(HOLT_SCALE)} + 0.0")
    return f"""
    WITH RECURSIVE days AS (
      SELECT day, cnt,
             row_number() OVER (ORDER BY day) AS i
      FROM (SELECT strftime(ts, '%Y-%m-%d') AS day,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1)),
    rec AS (
      SELECT i, day, cnt, CAST(cnt AS DOUBLE) AS l,
             CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS fe
      FROM days WHERE i = 1
      UNION ALL
      SELECT d.i, d.day, d.cnt,
             {a} * CAST(d.cnt AS DOUBLE) + {1.0 - a} * (r.l + r.b) AS l,
             {b} * (({a} * CAST(d.cnt AS DOUBLE)
                     + {1.0 - a} * (r.l + r.b)) - r.l)
               + {1.0 - b} * r.b AS b,
             CAST(d.cnt AS DOUBLE) - (r.l + r.b) AS fe
      FROM rec r JOIN days d ON d.i = r.i + 1)
    SELECT day, cnt AS n_events,
           {quant('l')} AS level,
           {quant('b')} AS trend,
           {quant('fe')} AS forecast_err
    FROM rec
    """


@_stage("q_holt_linear_daily", _holt_oracle())
def q_holt_linear_daily(spark, sf_dir):
    """Holt's linear-trend smoothing over the daily event series
    (operators/grouped.holt_linear_daily): the trend-aware sibling of
    the EWMA monitor, fold bounded by the day spine; the oracle replays
    the coupled (level, trend) recurrence with a recursive CTE over the
    identical IEEE op sequence."""
    from nonconsumptive_spark.operators.grouped import holt_linear_daily

    return holt_linear_daily(load(spark, sf_dir, "events"))


# -- gapped sequential-pattern support (a ... then b) ------------------------
@_stage(
    "q_seq_pattern_pairs",
    """
    WITH ut AS (
      SELECT user_id, event_type,
             min(ts) AS t_min, max(ts) AS t_max
      FROM events GROUP BY user_id, event_type)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_users_both,
           CAST(sum(CASE WHEN a.t_min < b.t_max THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ordered,
           round(CAST(sum(CASE WHEN a.t_min < b.t_max THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) + 0.0 AS ordered_ratio
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type <> b.event_type
    GROUP BY a.event_type, b.event_type
    """,
)
def q_seq_pattern_pairs(spark, sf_dir):
    """Gapped sequential-pattern support: for every ordered event-type
    pair (a, b), the count of users with SOME a strictly before SOME b
    (min ts of a < max ts of b) — the any-gap generalization of the
    adjacent-only q_event_transitions, i.e. sequential pattern mining's
    k=2 pass with unbounded gap.  Per-user per-type (min, max) is one
    exact agg; the user-keyed self-join fans out only to the per-user
    TYPE count (bounded by the type vocabulary, not events), then one
    short-key agg."""
    ev = load(spark, sf_dir, "events")
    ut = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("t_min"), F.max("ts").alias("t_max"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"),
                  F.col("t_min").alias("ta_min"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"),
                  F.col("t_max").alias("tb_max"))
    ordered = F.when(F.col("ta_min") < F.col("tb_max"), 1).otherwise(0)
    return (
        a.join(b, "user_id")
        .filter(F.col("type_a") != F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").cast("long").alias("n_users_both"),
            F.sum(ordered).cast("long").alias("n_ordered"),
            (F.round(F.sum(ordered).cast("double") / F.count("*"), 6)
             + F.lit(0.0)).alias("ordered_ratio"),
        )
    )


# -- RM3 pseudo-relevance-feedback query expansion ---------------------------
_RM3_K = 10
_RM3_M = 15


def _rm3_oracle() -> str:
    from nonconsumptive_spark.operators import retrieval as rt
    from nonconsumptive_spark.queries.retrieval import (
        _BM25_TERMS, _DUCK_TOKS_LOWER, _TERMS_SQL)

    return f"""
    WITH base AS (
      SELECT doc_id, {_DUCK_TOKS_LOWER} AS t FROM documents),
    lens AS (SELECT doc_id, len(t) AS dl FROM base),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
    qtf AS (
      SELECT doc_id, dl, token, count(*) AS tf
      FROM (SELECT doc_id, len(t) AS dl, unnest(t) AS token FROM base)
      WHERE token IN {_TERMS_SQL}
      GROUP BY doc_id, dl, token),
    dfs AS (SELECT token, count(DISTINCT doc_id) AS df FROM qtf GROUP BY token),
    top AS (
      SELECT doc_id, round(raw, 4) + 0.0 AS score
      FROM (
        SELECT f.doc_id,
               sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * f.tf * ({rt.K1} + 1)
                   / (f.tf + {rt.K1} * (1 - {rt.B} + {rt.B} * f.dl / s.avgdl))) AS raw
        FROM qtf f JOIN dfs d USING (token) CROSS JOIN stats s
        GROUP BY f.doc_id)
      ORDER BY round(raw, 6) DESC, doc_id ASC
      LIMIT {_RM3_K}),
    rel AS (
      SELECT b.doc_id, p.score, len(b.t) AS dl, unnest(b.t) AS term
      FROM base b JOIN top p USING (doc_id)),
    tf AS (
      SELECT doc_id, term, dl, score, CAST(count(*) AS BIGINT) AS tf
      FROM rel GROUP BY doc_id, term, dl, score),
    per_term AS (
      SELECT term,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(sum(CAST(floor(CAST(tf AS DOUBLE) / dl * score
                                 * {rt.RM3_SCALE}) AS BIGINT)) AS BIGINT) AS w
      FROM tf WHERE dl > 0
      GROUP BY term
      HAVING term NOT IN {_TERMS_SQL}),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM per_term)
    SELECT term, n_docs,
           round(CAST(w AS DOUBLE) / wt, 6) + 0.0 AS rm3_weight
    FROM per_term CROSS JOIN tot
    ORDER BY w DESC, term ASC
    LIMIT {_RM3_M}
    """


@_stage("q_rm3_expansion", _rm3_oracle())
def q_rm3_expansion(spark, sf_dir):
    """RM3 pseudo-relevance-feedback expansion terms for the shared BM25
    query (operators/retrieval.rm3_expansion): the relevance model over
    the deterministic BM25 top-k, contributions integer-quantized before
    every cross-row sum, normalized by a 1-row total attach."""
    from nonconsumptive_spark.operators.retrieval import rm3_expansion
    from nonconsumptive_spark.queries.retrieval import _BM25_TERMS

    return rm3_expansion(load(spark, sf_dir, "documents"), _BM25_TERMS,
                         k=_RM3_K, m=_RM3_M)


# -- Gunning fog index --------------------------------------------------------
_FOG_RUNS = ("length(regexp_replace(regexp_replace({e}, '[aeiouy]+', 'a', "
             "'g'), '[^a]', '', 'g'))")


@_stage(
    "q_gunning_fog",
    f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                         '[^\\pL]+'), x -> x <> '') AS t,
             coalesce(text, '') AS txt
      FROM documents),
    feat AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n_words,
             CAST(greatest(1, length(regexp_replace(regexp_replace(txt,
                    '[.!?]+', '.', 'g'), '[^.]', '', 'g'))) AS BIGINT)
               AS n_sentences,
             CAST(len(list_filter(t,
                    x -> {_FOG_RUNS.format(e='x')} >= 3)) AS BIGINT)
               AS n_complex
      FROM base)
    SELECT doc_id, n_words, n_sentences, n_complex,
           CASE WHEN n_words > 0
                THEN round(0.4 * (CAST(n_words AS DOUBLE) / n_sentences
                           + 100.0 * CAST(n_complex AS DOUBLE) / n_words),
                           3) + 0.0 END AS fog
    FROM feat
    """,
)
def q_gunning_fog(spark, sf_dir):
    """Gunning fog readability per document — the second classic grade
    formula beside Flesch-Kincaid, driven by the COMPLEX-word rate
    (>= 3 vowel-group runs, the shared syllable proxy) instead of the
    total syllable rate.  Sentence runs use the portable collapse-then-
    strip regexp pair; NULL text counts as empty and scores NULL.  All
    three counts are exact integers; zero-shuffle per-row scan."""
    from nonconsumptive_spark.functions.text import tokenize

    def runs(col, cls, marker):
        return F.length(F.regexp_replace(
            F.regexp_replace(col, cls, marker), "[^" + marker + "]", ""))

    txt = F.coalesce("text", F.lit(""))
    syl = lambda t: F.length(F.regexp_replace(
        F.regexp_replace(t, "[aeiouy]+", "a"), "[^a]", ""))
    base = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokenize(F.lower(txt))).cast("long").alias("n_words"),
        F.greatest(F.lit(1), runs(txt, "[.!?]+", ".")).cast("long")
        .alias("n_sentences"),
        F.size(F.filter(tokenize(F.lower(txt)), lambda t: syl(t) >= 3))
        .cast("long").alias("n_complex"),
    )
    return base.select(
        "doc_id", "n_words", "n_sentences", "n_complex",
        F.when(
            F.col("n_words") > 0,
            F.round(0.4 * (F.col("n_words").cast("double")
                           / F.col("n_sentences")
                           + 100.0 * F.col("n_complex").cast("double")
                           / F.col("n_words")), 3) + F.lit(0.0))
        .alias("fog"),
    )


# -- Grubbs-style extreme outlier per source ----------------------------------
_GRUBBS_FLAG = 3.0


@_stage(
    "q_grubbs_outlier",
    f"""
    WITH mom AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS s,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
      FROM documents GROUP BY source),
    dev AS (
      SELECT d.source, d.doc_id, CAST(d.n_chars AS BIGINT) AS x,
             abs(CAST(d.n_chars AS BIGINT) * m.n - m.s) AS devq,
             m.n, m.s, m.ss
      FROM documents d JOIN mom m USING (source)),
    top AS (
      SELECT source, doc_id, x, devq, n, s, ss,
             row_number() OVER (PARTITION BY source
                                ORDER BY devq DESC, doc_id ASC) AS rn
      FROM dev)
    SELECT source, n, doc_id, x,
           round(CAST(devq AS DOUBLE) / n
                 / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                        / (n - 1)), 6) + 0.0 AS g_stat,
           CAST(devq AS DOUBLE) / n
             / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                    / (n - 1)) > {_GRUBBS_FLAG} AS is_extreme
    FROM top WHERE rn = 1
    """,
)
def q_grubbs_outlier(spark, sf_dir):
    """Grubbs-style single-outlier statistic per source: the maximum
    |x - mean|/sd of document length, with the arg-max document
    identified.  The arg-max is located on the EXACT integer deviation
    |x*n - s| (so ranking never touches a float), ties break on doc_id;
    the G statistic divides once by n and once by the mirrored sample
    SD at emit.  is_extreme flags G > 3 (a plain threshold, documented —
    not the t-based critical value).  Plan: one moment agg + broadcast
    moment join + one per-source top-1 window."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    mom = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("ss"),
    )
    dev = (
        docs.join(F.broadcast(mom), "source")
        .select(
            "source", "doc_id", F.col("n_chars").cast("long").alias("x"),
            F.abs(F.col("n_chars").cast("long") * F.col("n") - F.col("s"))
            .alias("devq"),
            "n", "s", "ss",
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("devq"), F.asc("doc_id"))
    sd = F.sqrt((F.col("ss").cast("double")
                 - F.col("s").cast("double") * F.col("s") / F.col("n"))
                / (F.col("n") - 1))
    g = F.col("devq").cast("double") / F.col("n") / sd
    return (
        dev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "source", "n", "doc_id", "x",
            (F.round(g, 6) + F.lit(0.0)).alias("g_stat"),
            (g > _GRUBBS_FLAG).alias("is_extreme"),
        )
    )


# -- keyness: per-source G2 keyword extraction -------------------------------
def _keyness_oracle() -> str:
    from nonconsumptive_spark.operators.wordcount import KEYNESS_TOPK

    def t(k, row, col):
        return (f"CASE WHEN {k} > 0 THEN CAST({k} AS DOUBLE)"
                f" * ln(CAST(({k}) * n_tot AS DOUBLE) / (({row}) * ({col})))"
                f" ELSE 0.0 END")

    t11 = t("c", "r_tot", "c_tot")
    t12 = t("(r_tot - c)", "r_tot", "(n_tot - c_tot)")
    t21 = t("(c_tot - c)", "(n_tot - r_tot)", "c_tot")
    t22 = t("(n_tot - r_tot - c_tot + c)",
            "(n_tot - r_tot)", "(n_tot - c_tot)")
    return f"""
    WITH cells AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT source, unnest({_DUCK_TOKS}) AS token FROM documents)
      GROUP BY source, token),
    grp AS (SELECT source, CAST(sum(c) AS BIGINT) AS r_tot
            FROM cells GROUP BY source),
    term AS (SELECT token, CAST(sum(c) AS BIGINT) AS c_tot
             FROM cells GROUP BY token),
    nt AS (SELECT CAST(sum(c) AS BIGINT) AS n_tot FROM cells),
    scored AS (
      SELECT s.source, s.token, s.c,
             round(2.0 * ((({t11} + {t12}) + {t21}) + {t22}), 4) + 0.0 AS g2,
             s.c * (n_tot - r_tot) > (c_tot - s.c) * r_tot AS overused
      FROM cells s
      JOIN grp USING (source)
      JOIN term USING (token)
      CROSS JOIN nt
      WHERE s.c >= 5)
    SELECT source, token, c, g2, overused
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY source
                               ORDER BY g2 DESC, token ASC) <= {KEYNESS_TOPK}
    """


@_stage("q_keyness_terms", _keyness_oracle())
def q_keyness_terms(spark, sf_dir):
    """Per-source keyword extraction by Dunning G² keyness (operators/
    wordcount.keyness_terms): term-in-source vs term-in-rest 2×2, the
    corpus-linguistics keyword standard; overused decided by exact
    integer cross-multiplication, top-10 per source."""
    from nonconsumptive_spark.operators.wordcount import keyness_terms

    return keyness_terms(load(spark, sf_dir, "documents"))


# -- join-key skew report ------------------------------------------------------
@_stage(
    "q_skew_report",
    """
    WITH kc AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id),
    tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys
      FROM kc),
    hot AS (
      SELECT user_id AS hot_key, cnt AS max_rows
      FROM kc ORDER BY cnt DESC, user_id ASC LIMIT 1),
    hist AS (
      SELECT cnt, CAST(count(*) AS BIGINT) AS n_at,
             CAST(sum(count(*)) OVER (ORDER BY cnt ASC) AS BIGINT) AS cum
      FROM kc GROUP BY cnt),
    p99 AS (
      SELECT min(cnt) AS p99_rows
      FROM hist CROSS JOIN tot
      WHERE cum >= (99 * n_keys + 99) // 100)
    SELECT t.n_rows, t.n_keys, h.hot_key, h.max_rows, p.p99_rows,
           round(CAST(h.max_rows * t.n_keys AS DOUBLE) / t.n_rows, 4) + 0.0
             AS skew_factor
    FROM tot t CROSS JOIN hot h CROSS JOIN p99 p
    """,
)
def q_skew_report(spark, sf_dir):
    """Join-key skew diagnosis for events.user_id — the measurement step
    BEFORE reaching for salting (operators/skew.py) or AQE skew joins:
    one row with the key count, the hottest key (exact top-1, id
    tiebreak), the exact p99 per-key row count (order statistic off the
    count histogram), and skew_factor = max/avg rows per key.  Plan: one
    key agg, then everything runs on the per-key count frame — a
    count-valued histogram, a top-1 cut, and 1-row attaches; nothing
    after the first agg scales with rows."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    kc = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("cnt"))
    from nonconsumptive_spark.plans.checkpoint import materialize_once
    kc = materialize_once(kc, "skew_kc")
    tot = kc.agg(F.sum("cnt").cast("long").alias("n_rows"),
                 F.count("*").cast("long").alias("n_keys"))
    hot = (kc.orderBy(F.desc("cnt"), F.asc("user_id")).limit(1)
           .select(F.col("user_id").alias("hot_key"),
                   F.col("cnt").alias("max_rows")))
    w = Window.orderBy(F.asc("cnt")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    hist = (kc.groupBy("cnt").agg(F.count("*").cast("long").alias("n_at"))
            .withColumn("cum", F.sum("n_at").over(w).cast("long")))
    p99 = (
        hist.crossJoin(F.broadcast(tot))
        .filter(F.col("cum")
                >= F.expr("(99 * n_keys + 99) div 100"))  # ceil(.99*nk)
        .agg(F.min("cnt").alias("p99_rows"))
    )
    return (
        tot.crossJoin(F.broadcast(hot))
        .crossJoin(F.broadcast(p99))
        .select(
            "n_rows", "n_keys", "hot_key", "max_rows", "p99_rows",
            (F.round((F.col("max_rows") * F.col("n_keys")).cast("double")
                     / F.col("n_rows"), 4) + F.lit(0.0))
            .alias("skew_factor"),
        )
    )


# -- Craig's Zeta marker words -----------------------------------------------
_ZETA_TOPK = 10
_ZETA_MIN_DF = 3


def _zeta_oracle() -> str:
    return f"""
    WITH srcs AS (
      SELECT source FROM documents GROUP BY source ORDER BY source LIMIT 2),
    lab AS (SELECT min(source) AS sa, max(source) AS sb FROM srcs),
    base AS (
      SELECT d.doc_id, d.source,
             unnest(list_distinct({_DUCK_TOKS})) AS token
      FROM documents d SEMI JOIN srcs s ON d.source = s.source),
    nd AS (
      SELECT CAST(sum(CASE WHEN source = (SELECT sa FROM lab)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN source <> (SELECT sa FROM lab)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM (SELECT DISTINCT doc_id, source FROM base)),
    dfs AS (
      SELECT token,
             CAST(sum(CASE WHEN source = (SELECT sa FROM lab)
                           THEN 1 ELSE 0 END) AS BIGINT) AS df_a,
             CAST(sum(CASE WHEN source <> (SELECT sa FROM lab)
                           THEN 1 ELSE 0 END) AS BIGINT) AS df_b
      FROM base GROUP BY token
      HAVING count(*) >= {_ZETA_MIN_DF}),
    scored AS (
      SELECT token, df_a, df_b,
             df_a * n_b - df_b * n_a AS zq,
             round(CAST(df_a * n_b - df_b * n_a AS DOUBLE)
                   / (n_a * n_b), 6) + 0.0 AS zeta
      FROM dfs CROSS JOIN nd),
    marked AS (
      SELECT 'A' AS side, token, df_a, df_b, zeta,
             row_number() OVER (ORDER BY zq DESC, token ASC) AS rn
      FROM scored
      UNION ALL
      SELECT 'B' AS side, token, df_a, df_b, zeta,
             row_number() OVER (ORDER BY zq ASC, token ASC) AS rn
      FROM scored)
    SELECT side, token, df_a, df_b, zeta
    FROM marked WHERE rn <= {_ZETA_TOPK}
    """


@_stage("q_zeta_markers", _zeta_oracle())
def q_zeta_markers(spark, sf_dir):
    """Craig's Zeta marker words between the two lexicographically-first
    sources (Burrows 2007 / Craig & Kinney): zeta(w) = the document-
    presence rate difference df_A/n_A - df_B/n_B, the PRESENCE-based
    stylometric discriminator beside the frequency-based keyness.  Top
    markers of each side ranked on the EXACT integer numerator
    df_a*n_b - df_b*n_a (no float ever orders rows), token tiebreak.
    Plan: per-doc distinct tokens -> one (token) agg with conditional
    sums + a 1-row (n_a, n_b) attach, materialized ONCE; each side's cut
    is a TakeOrderedAndProject on the integer key (never a single-
    partition window over the vocabulary-sized frame)."""
    from nonconsumptive_spark.functions.text import tokenize
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    docs = load(spark, sf_dir, "documents")
    srcs = (docs.groupBy("source").agg(F.lit(1).alias("__o"))
            .orderBy("source").limit(2).select("source"))
    lab = srcs.agg(F.min("source").alias("sa"))
    base = (
        docs.join(F.broadcast(srcs), "source", "left_semi")
        .select("doc_id", "source",
                F.explode(F.array_distinct(tokenize("text")))
                .alias("token"))
    )
    base = base.crossJoin(F.broadcast(lab))
    is_a = (F.col("source") == F.col("sa")).cast("long")
    nd = (
        base.select("doc_id", "source", "sa").distinct()
        .agg(F.sum(is_a).cast("long").alias("n_a"),
             F.sum(1 - is_a).cast("long").alias("n_b"))
    )
    dfs = (
        base.groupBy("token")
        .agg(F.sum(is_a).cast("long").alias("df_a"),
             F.sum(1 - is_a).cast("long").alias("df_b"),
             F.count("*").alias("n"))
        .filter(F.col("n") >= _ZETA_MIN_DF)
        .drop("n")
    )
    zq = F.col("df_a") * F.col("n_b") - F.col("df_b") * F.col("n_a")
    scored = materialize_once(
        dfs.crossJoin(F.broadcast(nd))  # 1-row (n_a, n_b) attach
        .select("token", "df_a", "df_b", zq.alias("zq"),
                (F.round(zq.cast("double") / (F.col("n_a") * F.col("n_b")),
                         6) + F.lit(0.0)).alias("zeta")),
        "zeta_scored",
    )
    a = (scored.orderBy(F.desc("zq"), F.asc("token")).limit(_ZETA_TOPK)
         .select(F.lit("A").alias("side"), "token", "df_a", "df_b", "zeta"))
    b = (scored.orderBy(F.asc("zq"), F.asc("token")).limit(_ZETA_TOPK)
         .select(F.lit("B").alias("side"), "token", "df_a", "df_b", "zeta"))
    return a.unionByName(b)


# -- referential-integrity audit ----------------------------------------------
@_stage(
    "q_fk_integrity",
    """
    SELECT 'orders.o_custkey->customer' AS fk_edge,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_child,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans
    """,
)
def q_fk_integrity(spark, sf_dir):
    """Referential-integrity audit over the warehouse FK edges
    (orders->customer, lineitem->orders): child row count + orphan count
    per edge — the classic load-validation check.  Each orphan count is
    one LEFT ANTI join on the key (shuffle-keyed, no row ever widens);
    the output is two 1-row frames unioned."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")

    def edge(name, child, key_c, parent, key_p):
        orphans = child.join(
            parent.select(F.col(key_p).alias(key_c)), key_c, "left_anti")
        return (
            child.agg(F.count("*").cast("long").alias("n_child"))
            .crossJoin(F.broadcast(
                orphans.agg(F.count("*").cast("long").alias("n_orphans"))))
            .select(F.lit(name).alias("fk_edge"), "n_child", "n_orphans")
        )
    return edge("orders.o_custkey->customer", orders, "o_custkey",
                cust, "c_custkey").unionByName(
        edge("lineitem.l_orderkey->orders", li, "l_orderkey",
             orders, "o_orderkey"))


# -- McNemar paired test: stopword lang-id vs majority baseline ---------------
def _mcnemar_oracle() -> str:
    from nonconsumptive_spark.queries.textstats import _CASE_PRED, _HIT_EXPRS, _LANGS

    g = ", ".join("hits_" + lg for lg in _LANGS)
    return f"""
    WITH maj AS (
      SELECT lang AS maj_lang FROM documents
      GROUP BY lang ORDER BY count(*) DESC, lang ASC LIMIT 1),
    pred AS (
      SELECT doc_id, lang, {_CASE_PRED} AS pred_lang
      FROM (
        SELECT doc_id, lang, greatest({g}) AS m, {g}
        FROM (
          SELECT doc_id, lang,
{_HIT_EXPRS}
          FROM (SELECT doc_id, lang, coalesce(text, '') AS text
                FROM documents) documents))),
    cells AS (
      SELECT CAST(sum(CASE WHEN pred_lang = lang
                            AND maj_lang <> lang THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(sum(CASE WHEN pred_lang <> lang
                            AND maj_lang = lang THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(count(*) AS BIGINT) AS n
      FROM pred CROSS JOIN maj)
    SELECT n, b, c,
           CASE WHEN b + c > 0
                THEN round(CAST((b - c) * (b - c) AS DOUBLE) / (b + c), 6)
                     + 0.0
                ELSE 0.0 END AS mcnemar_chi2
    FROM cells
    """


@_stage("q_mcnemar_langid", _mcnemar_oracle())
def q_mcnemar_langid(spark, sf_dir):
    """McNemar's paired test: does the stopword-vote language identifier
    beat the majority-class baseline on the SAME documents?  b/c are the
    exact discordant-pair counts (only-langid-right / only-baseline-
    right) and chi2 = (b-c)^2/(b+c) is one integer-exact ratio — the
    paired sibling of the independent-sample test battery.  Plan: the
    zero-shuffle lang-id scan + a 1-row majority-label attach + one
    1-row agg."""
    from nonconsumptive_spark.operators import textstats as ts

    docs = load(spark, sf_dir, "documents")
    maj = (docs.groupBy("lang").agg(F.count("*").alias("n"))
           .orderBy(F.desc("n"), F.asc("lang")).limit(1)
           .select(F.col("lang").alias("maj_lang")))
    # label carried through the lang-id projection — no doc-keyed join
    # back to the corpus for a column this scan already read (r8)
    joined = (
        ts.lang_id(docs, extra_cols=("lang",))
        .crossJoin(F.broadcast(maj))
    )
    b = F.sum(F.when((F.col("pred_lang") == F.col("lang"))
                     & (F.col("maj_lang") != F.col("lang")), 1)
              .otherwise(0)).cast("long")
    c = F.sum(F.when((F.col("pred_lang") != F.col("lang"))
                     & (F.col("maj_lang") == F.col("lang")), 1)
              .otherwise(0)).cast("long")
    cells = joined.agg(F.count("*").cast("long").alias("n"),
                       b.alias("b"), c.alias("c"))
    return cells.select(
        "n", "b", "c",
        F.when(F.col("b") + F.col("c") > 0,
               F.round(((F.col("b") - F.col("c"))
                        * (F.col("b") - F.col("c"))).cast("double")
                       / (F.col("b") + F.col("c")), 6) + F.lit(0.0))
        .otherwise(F.lit(0.0)).alias("mcnemar_chi2"),
    )


# -- audio windowed RMS energy over deterministic PCM --------------------------
_AU_FRAME = 64


def _audio_payload_expr() -> str:
    """Spark SQL expression building the synthetic audio content: a
    16-byte header + n int8 PCM samples, every sample an ASCII-safe
    byte 32 + (doc_id*31 + j*7) % 95 so the SAME bytes are expressible
    in both engines (UTF-8 encodes [32,126] one byte each)."""
    n = f"(((n_chars % 4) + 1) * {_AU_FRAME})"
    return (
        "encode(concat('NCAU|16b-header|', array_join(transform("
        f"sequence(0, {n} - 1), "
        "j -> char(32 + pmod(doc_id * 31 + j * 7, 95))), '')), 'UTF-8')"
    )


def _audio_oracle() -> str:
    return f"""
    WITH dims AS (
      SELECT doc_id, ((n_chars % 4) + 1) AS nf FROM documents),
    frames AS (
      SELECT doc_id, CAST(f AS INTEGER) AS frame
      FROM dims, unnest(range(0, nf)) r(f)),
    svals AS (
      SELECT doc_id, frame, CAST(sum(b * b) AS BIGINT) AS s2
      FROM (
        SELECT doc_id, frame,
               32 + (doc_id * 31 + j * 7) % 95 AS b
        FROM frames,
             unnest(range(frame * {_AU_FRAME},
                          frame * {_AU_FRAME} + {_AU_FRAME})) u(j))
      GROUP BY doc_id, frame)
    SELECT doc_id AS media_id, frame,
           CAST({_AU_FRAME} AS INTEGER) AS n_samples,
           CAST(floor(sqrt(CAST(s2 AS DOUBLE) / 16384.0 / {_AU_FRAME})
                      * 10000 + 0.5) AS BIGINT) AS rms_q
    FROM svals
    """


@_stage("q_audio_window_energy", _audio_oracle())
def q_audio_window_energy(spark, sf_dir):
    """Windowed RMS energy over a deterministic int8-PCM audio column
    (operators/multimodal.audio_window_energy): REAL signal math through
    the Arrow-batched mapInPandas kernel — binary bytes for non-audio
    rows never move.  The synthetic payload keeps every sample in the
    ASCII range so the oracle reconstructs the identical bytes in SQL;
    frames are always full (a multiple of the frame length), which makes
    the mean an exact multiple of 2^-14 regardless of summation order,
    so sqrt + the shared half-up quantization agree bit-for-bit."""
    from nonconsumptive_spark.operators.multimodal import (
        audio_window_energy)

    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.lit("audio/pcm").alias("mime"),
        F.expr(_audio_payload_expr()).alias("content"),
    )
    return audio_window_energy(media, frame_len=_AU_FRAME)


# -- Monroe et al. log-odds with informative Dirichlet prior ------------------
_LO_TOPK = 15
_LO_A0 = 1000.0
_LO_MIN = 5


def _logodds_oracle() -> str:
    # delta and z are per-row fixed IEEE chains over exact BIGINT counts
    # plus the prior alpha_w = c_w * (a0 / N) — one mul+div, mirrored.
    d = ("(ln((a + aw) / (ta + {a0} - a - aw))"
         " - ln((b + aw) / (tb + {a0} - b - aw)))").format(a0=_LO_A0)
    z = f"({d} / sqrt(1.0 / (a + aw) + 1.0 / (b + aw)))"
    return f"""
    WITH srcs AS (
      SELECT source FROM documents GROUP BY source ORDER BY source LIMIT 2),
    lab AS (SELECT min(source) AS sa FROM srcs),
    toks AS (
      SELECT d.source, unnest({_DUCK_TOKS}) AS token
      FROM documents d SEMI JOIN srcs s ON d.source = s.source),
    cnt AS (
      SELECT token,
             CAST(sum(CASE WHEN source = (SELECT sa FROM lab)
                           THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN source <> (SELECT sa FROM lab)
                           THEN 1 ELSE 0 END) AS BIGINT) AS b
      FROM toks GROUP BY token),
    tot AS (
      SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb,
             CAST(sum(a + b) AS BIGINT) AS n
      FROM cnt),
    scored AS (
      SELECT token, a, b,
             round({z}, 6) + 0.0 AS z
      FROM (SELECT token, a, b, ta, tb,
                   (a + b) * ({_LO_A0} / n) AS aw
            FROM cnt CROSS JOIN tot
            WHERE a + b >= {_LO_MIN})),
    marked AS (
      SELECT 'A' AS side, token, a, b, z,
             row_number() OVER (ORDER BY z DESC, token ASC) AS rn
      FROM scored
      UNION ALL
      SELECT 'B' AS side, token, a, b, z,
             row_number() OVER (ORDER BY z ASC, token ASC) AS rn
      FROM scored)
    SELECT side, token, a, b, z FROM marked WHERE rn <= {_LO_TOPK}
    """


@_stage("q_log_odds_dirichlet", _logodds_oracle())
def q_log_odds_dirichlet(spark, sf_dir):
    """Monroe/Colaresi/Quinn 'fightin' words' (2008): log-odds-ratio
    difference between two sources with an informative Dirichlet prior
    drawn from the pooled counts, z-scored by the delta's approximate
    variance — the Bayesian-shrinkage third of the source-comparison
    trio beside frequency keyness and presence zeta (the prior tames
    exactly the rare-word z-inflation those suffer).  Counts are exact
    BIGINTs; prior, delta, variance, z are one mirrored float chain per
    term; the two marker sides are TakeOrderedAndProject cuts on
    (round(z,6), token).  Plan: one token agg + 1-row totals attach,
    materialized once."""
    from nonconsumptive_spark.functions.text import tokenize
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    docs = load(spark, sf_dir, "documents")
    srcs = (docs.groupBy("source").agg(F.lit(1).alias("__o"))
            .orderBy("source").limit(2).select("source"))
    lab = srcs.agg(F.min("source").alias("sa"))
    toks = (
        docs.join(F.broadcast(srcs), "source", "left_semi")
        .crossJoin(F.broadcast(lab))
        .select((F.col("source") == F.col("sa")).alias("in_a"),
                F.explode(tokenize("text")).alias("token"))
    )
    cnt = toks.groupBy("token").agg(
        F.sum(F.col("in_a").cast("long")).cast("long").alias("a"),
        F.sum((~F.col("in_a")).cast("long")).cast("long").alias("b"),
    )
    tot = cnt.agg(F.sum("a").cast("long").alias("ta"),
                  F.sum("b").cast("long").alias("tb"),
                  F.sum(F.col("a") + F.col("b")).cast("long").alias("n"))
    base = (
        cnt.filter(F.col("a") + F.col("b") >= _LO_MIN)
        .crossJoin(F.broadcast(tot))  # 1-row totals attach
        .withColumn("aw", (F.col("a") + F.col("b"))
                    * (F.lit(_LO_A0) / F.col("n")))
    )
    delta = (
        F.log((F.col("a") + F.col("aw"))
              / (F.col("ta") + F.lit(_LO_A0) - F.col("a") - F.col("aw")))
        - F.log((F.col("b") + F.col("aw"))
                / (F.col("tb") + F.lit(_LO_A0) - F.col("b") - F.col("aw")))
    )
    z = delta / F.sqrt(1.0 / (F.col("a") + F.col("aw"))
                       + 1.0 / (F.col("b") + F.col("aw")))
    scored = materialize_once(
        base.select("token", "a", "b",
                    (F.round(z, 6) + F.lit(0.0)).alias("z")),
        "logodds_scored",
    )
    a = (scored.orderBy(F.desc("z"), F.asc("token")).limit(_LO_TOPK)
         .select(F.lit("A").alias("side"), "token", "a", "b", "z"))
    b = (scored.orderBy(F.asc("z"), F.asc("token")).limit(_LO_TOPK)
         .select(F.lit("B").alias("side"), "token", "a", "b", "z"))
    return a.unionByName(b)


# -- Mantel-Haenszel stratified odds ratio -------------------------------------
_MH_SCALE = 1_000_000
_MH_LONG_DOC = 500  # outcome: n_chars >= this literal


def _mh_oracle() -> str:
    return f"""
    WITH lab AS (
      SELECT min(source) AS sa
      FROM (SELECT source FROM documents GROUP BY source
            ORDER BY source LIMIT 1)),
    cells AS (
      SELECT lang,
             CAST(sum(CASE WHEN exposed AND long_doc THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(sum(CASE WHEN exposed AND NOT long_doc THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(sum(CASE WHEN NOT exposed AND long_doc THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(sum(CASE WHEN NOT exposed AND NOT long_doc THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM (SELECT d.lang, d.source = (SELECT sa FROM lab) AS exposed,
                   coalesce(d.n_chars, 0) >= {_MH_LONG_DOC} AS long_doc
            FROM documents d)
      GROUP BY lang),
    terms AS (
      SELECT CAST(floor(CAST(a * d AS DOUBLE) / (a + b + c + d)
                        * {_MH_SCALE}) AS BIGINT) AS adq,
             CAST(floor(CAST(b * c AS DOUBLE) / (a + b + c + d)
                        * {_MH_SCALE}) AS BIGINT) AS bcq
      FROM cells WHERE a + b + c + d > 0)
    SELECT CAST(count(*) AS BIGINT) AS n_strata,
           CAST(sum(adq) AS BIGINT) AS sum_ad_q,
           CAST(sum(bcq) AS BIGINT) AS sum_bc_q,
           CASE WHEN sum(bcq) > 0
                THEN round(CAST(sum(adq) AS DOUBLE) / sum(bcq), 6) + 0.0
                ELSE 0.0 END AS mh_odds_ratio
    FROM terms
    """


@_stage("q_mantel_haenszel", _mh_oracle())
def q_mantel_haenszel(spark, sf_dir):
    """Mantel-Haenszel common odds ratio across lang strata: is the
    first source's long-document rate elevated CONSISTENTLY once
    language is controlled for?  The stratified 2x2 battery member
    beside the marginal chi2/MI grid — Simpson's-paradox-proof where the
    pooled table is not.  Each stratum's a*d/n and b*c/n term quantizes
    to a 1e-6 BIGINT before the cross-stratum sums (strata counts bound
    a*d < 2^53/scale — documented).  Plan: one (lang)-keyed agg over a
    zero-shuffle scan + one #strata-row agg."""
    docs = load(spark, sf_dir, "documents")
    lab = (docs.groupBy("source").agg(F.lit(1).alias("__o"))
           .orderBy("source").limit(1)
           .select(F.col("source").alias("sa")))
    base = docs.crossJoin(F.broadcast(lab)).select(
        "lang",
        (F.col("source") == F.col("sa")).alias("exposed"),
        (F.coalesce(F.col("n_chars"), F.lit(0)) >= _MH_LONG_DOC)
        .alias("long_doc"),
    )
    cells = base.groupBy("lang").agg(
        F.sum((F.col("exposed") & F.col("long_doc")).cast("long"))
        .cast("long").alias("a"),
        F.sum((F.col("exposed") & ~F.col("long_doc")).cast("long"))
        .cast("long").alias("b"),
        F.sum((~F.col("exposed") & F.col("long_doc")).cast("long"))
        .cast("long").alias("c"),
        F.sum((~F.col("exposed") & ~F.col("long_doc")).cast("long"))
        .cast("long").alias("d"),
    )
    n_i = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    terms = cells.filter(n_i > 0).select(
        F.floor((F.col("a") * F.col("d")).cast("double") / n_i
                * _MH_SCALE).cast("long").alias("adq"),
        F.floor((F.col("b") * F.col("c")).cast("double") / n_i
                * _MH_SCALE).cast("long").alias("bcq"),
    )
    return terms.agg(
        F.count("*").cast("long").alias("n_strata"),
        F.sum("adq").cast("long").alias("sum_ad_q"),
        F.sum("bcq").cast("long").alias("sum_bc_q"),
        F.when(F.sum("bcq") > 0,
               F.round(F.sum("adq").cast("double") / F.sum("bcq"), 6)
               + F.lit(0.0)).otherwise(F.lit(0.0)).alias("mh_odds_ratio"),
    )


# -- Juilland's D dispersion ----------------------------------------------------
_JD_TOPK = 20
_JD_SCALE = 10**8  # f*f must stay within INT64 even at per-part freq 1.0


def _juilland_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT source, unnest({_DUCK_TOKS}) AS token FROM documents),
    parts AS (SELECT source, CAST(count(*) AS BIGINT) AS t
              FROM toks GROUP BY source),
    k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM parts),
    top AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY token
      ORDER BY c DESC, token ASC LIMIT {_JD_TOPK}),
    cell AS (
      SELECT t.token, p.source, p.t,
             CAST(count(x.token) AS BIGINT) AS c
      FROM top t CROSS JOIN parts p
      LEFT JOIN toks x ON x.token = t.token AND x.source = p.source
      GROUP BY t.token, p.source, p.t),
    fq AS (
      SELECT token,
             CAST(floor(CAST(c AS DOUBLE) / t * {_JD_SCALE}) AS BIGINT) AS f
      FROM cell),
    mom AS (
      SELECT token, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(f) AS BIGINT) AS s,
             CAST(sum(f * f) AS BIGINT) AS ss
      FROM fq GROUP BY token)
    SELECT m.token, t.c,
           CASE WHEN s > 0
                THEN round(1.0 - sqrt((CAST(ss AS DOUBLE) * k
                                       - CAST(s AS DOUBLE) * s)
                                      / (k * CAST(s AS DOUBLE) * s
                                         / (k * 1.0)))
                           / sqrt(k - 1.0), 6) + 0.0
                ELSE 0.0 END AS juilland_d
    FROM mom m JOIN top t USING (token)
    """


@_stage("q_juilland_dispersion", _juilland_oracle())
def q_juilland_dispersion(spark, sf_dir):
    """Juilland's D dispersion of the corpus top-20 terms across the
    source parts: D = 1 - CV/sqrt(k-1) over per-part relative
    frequencies — the is-this-word-everywhere-or-one-subcorpus measure
    behind dispersion-adjusted frequency lists.  Per-part frequencies
    quantize to 1e-8 BIGINTs (squares must fit INT64 at freq 1.0), so the cross-part moments are exact
    integers and CV is one mirrored chain.  Plan: one (source, token)
    agg + a top-k head + a #parts-bounded grid join."""
    from nonconsumptive_spark.functions.text import tokenize
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    docs = load(spark, sf_dir, "documents")
    toks = materialize_once(
        docs.select("source", F.explode(tokenize("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").cast("long").alias("c")),
        "juilland_cells",
    )
    parts = toks.groupBy("source").agg(F.sum("c").cast("long").alias("t"))
    top = (toks.groupBy("token").agg(F.sum("c").cast("long").alias("c"))
           .orderBy(F.desc("c"), F.asc("token")).limit(_JD_TOPK))
    grid = (
        F.broadcast(top).crossJoin(F.broadcast(parts))
        .join(toks.select("source", F.col("token").alias("token"),
                          F.col("c").alias("cs")),
              ["token", "source"], "left")
        .select("token", "c", "t",
                F.coalesce("cs", F.lit(0)).cast("long").alias("cs"))
    )
    fq = grid.select(
        "token", "c",
        F.floor(F.col("cs").cast("double") / F.col("t") * _JD_SCALE)
        .cast("long").alias("f"),
    )
    mom = fq.groupBy("token", "c").agg(
        F.count("*").cast("long").alias("k"),
        F.sum("f").cast("long").alias("s"),
        F.sum(F.col("f") * F.col("f")).cast("long").alias("ss"),
    )
    cv = (F.sqrt((F.col("ss").cast("double") * F.col("k")
                  - F.col("s").cast("double") * F.col("s"))
                 / (F.col("k") * F.col("s").cast("double") * F.col("s")
                    / (F.col("k") * F.lit(1.0)))))
    return mom.select(
        "token", "c",
        F.when(F.col("s") > 0,
               F.round(1.0 - cv / F.sqrt(F.col("k") - F.lit(1.0)), 6)
               + F.lit(0.0)).otherwise(F.lit(0.0)).alias("juilland_d"),
    )


# -- Brier score + Murphy decomposition ----------------------------------------
_BR_SCALE = 10**9


def _brier_oracle() -> str:
    from nonconsumptive_spark.operators.evaluation import CAL_BINS, CAL_SCALE

    ph = ("((greatest(CAST(-1.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE), "
          "CAST(embedding[1] AS DOUBLE))) + CAST(1.0 AS DOUBLE)) "
          "/ CAST(2.0 AS DOUBLE))")
    return f"""
    WITH base AS (
      SELECT least(CAST(floor({ph} * {CAL_BINS}) AS BIGINT),
                   {CAL_BINS - 1}) AS bin,
             CAST(floor({ph} * {CAL_SCALE} + 0.5) AS BIGINT) AS pq,
             CASE WHEN label = 0 THEN 1 ELSE 0 END AS pos,
             CAST(floor(({ph} - CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END)
                        * ({ph} - CASE WHEN label = 0
                                       THEN 1.0 ELSE 0.0 END)
                        * {_BR_SCALE}) AS BIGINT) AS bq
      FROM embeddings),
    bins AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(sum(pq) AS BIGINT) AS spq
      FROM base GROUP BY bin),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt,
             CAST(sum(n_pos) AS BIGINT) AS npt,
             CAST((SELECT sum(bq) FROM base) AS BIGINT) AS sbq
      FROM bins),
    terms AS (
      SELECT CAST(sum(CAST(floor(
               n * (CAST(spq AS DOUBLE) / (n * {CAL_SCALE})
                    - CAST(n_pos AS DOUBLE) / n)
                 * (CAST(spq AS DOUBLE) / (n * {CAL_SCALE})
                    - CAST(n_pos AS DOUBLE) / n) * {_BR_SCALE})
               AS BIGINT)) AS BIGINT) AS rel_q,
             CAST(sum(CAST(floor(
               n * (CAST(n_pos AS DOUBLE) / n
                    - CAST(npt AS DOUBLE) / nt)
                 * (CAST(n_pos AS DOUBLE) / n
                    - CAST(npt AS DOUBLE) / nt) * {_BR_SCALE})
               AS BIGINT)) AS BIGINT) AS res_q
      FROM bins CROSS JOIN tot)
    SELECT nt AS n,
           round(CAST(sbq AS DOUBLE) / nt / {_BR_SCALE}, 6) + 0.0 AS brier,
           round(CAST(rel_q AS DOUBLE) / nt / {_BR_SCALE}, 6) + 0.0
             AS reliability,
           round(CAST(res_q AS DOUBLE) / nt / {_BR_SCALE}, 6) + 0.0
             AS resolution,
           round((CAST(npt AS DOUBLE) / nt)
                 * (1.0 - CAST(npt AS DOUBLE) / nt), 6) + 0.0
             AS uncertainty
    FROM terms CROSS JOIN tot
    """


@_stage("q_brier_decomposition", _brier_oracle())
def q_brier_decomposition(spark, sf_dir):
    """Brier score + Murphy (1973) decomposition over the calibration
    bins: brier (direct, per-row squared error), reliability (bin
    confidence vs bin outcome), resolution (bin outcome vs base rate),
    uncertainty (base-rate variance) — the one-number companions to the
    q_calibration_bins table (brier ≈ rel - res + unc up to the
    within-bin variance the binning hides).  Every squared term
    quantizes to a 1e-9 BIGINT the instant it is produced, so all
    cross-row/cross-bin sums are exact.  Plan: one 10-bin agg + two
    1-row attaches on a zero-shuffle scan."""
    from nonconsumptive_spark.operators.evaluation import CAL_BINS, CAL_SCALE

    emb = load(spark, sf_dir, "embeddings")
    clipped = F.greatest(F.lit(-1.0), F.least(
        F.lit(1.0), F.col("embedding").getItem(0).cast("double")))
    ph = (clipped + F.lit(1.0)) / F.lit(2.0)
    y = F.when(F.col("label") == 0, F.lit(1.0)).otherwise(F.lit(0.0))
    base = emb.select(
        F.least(F.floor(ph * CAL_BINS).cast("long"),
                F.lit(CAL_BINS - 1)).alias("bin"),
        F.floor(ph * CAL_SCALE + F.lit(0.5)).cast("long").alias("pq"),
        (F.col("label") == 0).cast("long").alias("pos"),
        F.floor((ph - y) * (ph - y) * _BR_SCALE).cast("long").alias("bq"),
    )
    from nonconsumptive_spark.plans.checkpoint import materialize_once
    base = materialize_once(base, "brier_base")
    bins = base.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("pq").cast("long").alias("spq"),
    )
    tot = (
        bins.agg(F.sum("n").cast("long").alias("nt"),
                 F.sum("n_pos").cast("long").alias("npt"))
        .crossJoin(F.broadcast(
            base.agg(F.sum("bq").cast("long").alias("sbq"))))
    )
    joined = bins.crossJoin(F.broadcast(tot))
    conf = F.col("spq").cast("double") / (F.col("n") * CAL_SCALE)
    orate = F.col("n_pos").cast("double") / F.col("n")
    brate = F.col("npt").cast("double") / F.col("nt")
    terms = joined.agg(
        F.sum(F.floor(F.col("n") * (conf - orate) * (conf - orate)
                      * _BR_SCALE).cast("long")).cast("long").alias("rel_q"),
        F.sum(F.floor(F.col("n") * (orate - brate) * (orate - brate)
                      * _BR_SCALE).cast("long")).cast("long").alias("res_q"),
    )
    out = terms.crossJoin(F.broadcast(tot))
    brate2 = F.col("npt").cast("double") / F.col("nt")
    return out.select(
        F.col("nt").alias("n"),
        (F.round(F.col("sbq").cast("double") / F.col("nt") / _BR_SCALE, 6)
         + F.lit(0.0)).alias("brier"),
        (F.round(F.col("rel_q").cast("double") / F.col("nt") / _BR_SCALE, 6)
         + F.lit(0.0)).alias("reliability"),
        (F.round(F.col("res_q").cast("double") / F.col("nt") / _BR_SCALE, 6)
         + F.lit(0.0)).alias("resolution"),
        (F.round(brate2 * (F.lit(1.0) - brate2), 6) + F.lit(0.0))
        .alias("uncertainty"),
    )


# -- per-class precision / recall / F1 for the lang identifier ----------------
def _prf_oracle() -> str:
    from nonconsumptive_spark.queries.textstats import (
        _CASE_PRED, _HIT_EXPRS, _LANGS)

    g = ", ".join("hits_" + lg for lg in _LANGS)
    return f"""
    WITH pred AS (
      SELECT doc_id, lang, {_CASE_PRED} AS pred_lang
      FROM (
        SELECT doc_id, lang, greatest({g}) AS m, {g}
        FROM (
          SELECT doc_id, lang,
{_HIT_EXPRS}
          FROM (SELECT doc_id, lang, coalesce(text, '') AS text
                FROM documents) documents))),
    classes AS (SELECT DISTINCT lang AS cls FROM pred),
    per AS (
      SELECT c.cls,
             CAST(sum(CASE WHEN p.lang = c.cls AND p.pred_lang = c.cls
                           THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN p.lang <> c.cls AND p.pred_lang = c.cls
                           THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN p.lang = c.cls AND p.pred_lang <> c.cls
                           THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM pred p CROSS JOIN classes c
      GROUP BY c.cls)
    SELECT cls AS lang, tp, fp, fn,
           CASE WHEN tp + fp > 0
                THEN round(CAST(tp AS DOUBLE) / (tp + fp), 6) + 0.0
                ELSE 0.0 END AS precision,
           CASE WHEN tp + fn > 0
                THEN round(CAST(tp AS DOUBLE) / (tp + fn), 6) + 0.0
                ELSE 0.0 END AS recall,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6)
                     + 0.0
                ELSE 0.0 END AS f1
    FROM per
    """


@_stage("q_langid_prf", _prf_oracle())
def q_langid_prf(spark, sf_dir):
    """Per-class precision / recall / F1 of the stopword language
    identifier against the labeled lang column — the summary layer over
    the q_langid_vs_labels confusion matrix (tp/fp/fn are exact
    integers; each score is one mirrored ratio; F1 uses the 2tp/(2tp+
    fp+fn) integer form, never the harmonic-mean float chain).  Plan:
    zero-shuffle lang-id scan + a #classes-row broadcast spine + one
    class agg."""
    from nonconsumptive_spark.operators import textstats as ts

    docs = load(spark, sf_dir, "documents")
    # label carried through the lang-id projection — no doc-keyed join
    # back to the corpus for a column this scan already read (r8)
    pred = ts.lang_id(docs, extra_cols=("lang",))
    classes = pred.select(F.col("lang").alias("cls")).distinct()
    per = (
        pred.crossJoin(F.broadcast(classes))
        .groupBy("cls")
        .agg(
            F.sum(((F.col("lang") == F.col("cls"))
                   & (F.col("pred_lang") == F.col("cls"))).cast("long"))
            .cast("long").alias("tp"),
            F.sum(((F.col("lang") != F.col("cls"))
                   & (F.col("pred_lang") == F.col("cls"))).cast("long"))
            .cast("long").alias("fp"),
            F.sum(((F.col("lang") == F.col("cls"))
                   & (F.col("pred_lang") != F.col("cls"))).cast("long"))
            .cast("long").alias("fn"),
        )
    )
    def ratio(num, den):
        return F.when(den > 0,
                      F.round(num.cast("double") / den, 6) + F.lit(0.0)) \
            .otherwise(F.lit(0.0))
    return per.select(
        F.col("cls").alias("lang"), "tp", "fp", "fn",
        ratio(F.col("tp"), F.col("tp") + F.col("fp")).alias("precision"),
        ratio(F.col("tp"), F.col("tp") + F.col("fn")).alias("recall"),
        ratio(2 * F.col("tp"),
              2 * F.col("tp") + F.col("fp") + F.col("fn")).alias("f1"),
    )


# -- cumulative gains / lift chart by score decile ------------------------------
@_stage(
    "q_gain_chart",
    """
    WITH ranked AS (
      SELECT CASE WHEN label = 0 THEN 1 ELSE 0 END AS pos,
             row_number() OVER (
               ORDER BY CAST(embedding[1] AS DOUBLE) DESC, vec_id ASC)
               AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM embeddings),
    bucketed AS (
      SELECT CAST(((rn - 1) * 10) // n AS BIGINT) AS decile,
             pos, n
      FROM ranked),
    per AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(pos) AS BIGINT) AS n_pos
      FROM bucketed GROUP BY decile),
    tot AS (SELECT CAST(sum(n_pos) AS BIGINT) AS pt,
                   CAST(sum(n_rows) AS BIGINT) AS nt FROM per)
    SELECT decile, n_rows, n_pos,
           CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
           round(CAST(sum(n_pos) OVER (ORDER BY decile) AS DOUBLE) / pt,
                 6) + 0.0 AS capture_rate,
           round((CAST(n_pos AS DOUBLE) / n_rows)
                 / (CAST(pt AS DOUBLE) / nt), 6) + 0.0 AS lift
    FROM per CROSS JOIN tot
    """,
)
def q_gain_chart(spark, sf_dir):
    """Cumulative-gains / lift table by score decile: rank everything by
    the model score (embedding[0], vec_id tiebreak), split into 10
    equal-count buckets with the explicit ((rn-1)*10) div n formula (no
    engine-specific ntile semantics), and report per-decile positive
    capture and lift — the triage-a-scored-corpus table.  The rank comes
    from ``assign_dense_ids`` (range partition + offsets, never a
    single-reducer sort); everything after the bucket agg is a 10-row
    frame."""
    from nonconsumptive_spark.plans.checkpoint import materialize_once
    from nonconsumptive_spark.sources.readers import assign_dense_ids

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        (-F.col("embedding").getItem(0).cast("double")).alias("neg_s"),
        (F.col("label") == 0).cast("long").alias("pos"),
    )
    ranked = assign_dense_ids(emb, ["neg_s", "vec_id"], id_name="rn")
    n = ranked.agg(F.count("*").cast("long").alias("n"))
    per = (
        ranked.crossJoin(F.broadcast(n))
        .select(F.expr("(rn * 10) div n").alias("decile"), "pos")
        .groupBy("decile")
        .agg(F.count("*").cast("long").alias("n_rows"),
             F.sum("pos").cast("long").alias("n_pos"))
    )
    per = materialize_once(per, "gain_deciles")
    tot = per.agg(F.sum("n_pos").cast("long").alias("pt"),
                  F.sum("n_rows").cast("long").alias("nt"))
    from pyspark.sql import Window
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn("cum_pos", F.sum("n_pos").over(w).cast("long"))
        .select(
            "decile", "n_rows", "n_pos", "cum_pos",
            (F.round(F.col("cum_pos").cast("double") / F.col("pt"), 6)
             + F.lit(0.0)).alias("capture_rate"),
            (F.round((F.col("n_pos").cast("double") / F.col("n_rows"))
                     / (F.col("pt").cast("double") / F.col("nt")), 6)
             + F.lit(0.0)).alias("lift"),
        )
    )


# -- IVF recall-vs-nprobe tuning curve -----------------------------------------
# per-nprobe recall floors (measured 0.08-0.14 / 0.22-0.44 / 0.46-0.52 / 0.78 at
# sf0.001/sf0.01, floors set below both;
# probe sets are nested, so recall is structurally non-decreasing in
# n_probe up to rounding-tie displacement)
_CURVE_BOUNDS = {1: 0.05, 2: 0.15, 4: 0.4, 8: 0.6}


def _curve_oracle() -> str:
    from nonconsumptive_spark.queries.similarity import _DUCK_KNN

    rows = " UNION ALL ".join(
        f"""SELECT CAST({p} AS BIGINT) AS n_probe,
               CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
               CAST(count(*) AS BIGINT) AS n_exact,
               TRUE AS recall_ok
        FROM ({_DUCK_KNN})"""
        for p in sorted(_CURVE_BOUNDS))
    return rows


@_stage("q_ann_recall_curve", _curve_oracle())
def q_ann_recall_curve(spark, sf_dir):
    """IVF recall-vs-n_probe tuning curve: one row per probe depth
    (1, 2, 4, 8) with recall against the exact brute-force top-k —
    the table that prices the ANN speed/recall dial before committing a
    production n_probe.  The exact baseline materializes ONCE and feeds
    all four probe levels; each level's recall must clear its measured
    floor (the oracle asserts the flag + DuckDB-recomputed exact-side
    counts, the q_knn_cosine_ivf discipline).  Probe cells are nested
    across levels, so candidate sets are supersets and recall is
    structurally non-decreasing up to rounded-cosine tie displacement.

    r8 perf: probe sets are nested, so cell assignment + candidate
    scoring run ONCE at the deepest probe (sim.ivf_probe_scored keeps
    each candidate's probe_rank) and every level is a filter + top-k
    window over that materialized frame — the old per-level knn_ivf
    calls re-assigned the corpus and re-scored the nested candidates
    4x (A/B warm sf0.1: 3.2 -> 1.3 s; results hash-identical)."""
    from pyspark.sql import Window

    from nonconsumptive_spark.operators import similarity as sim
    from nonconsumptive_spark.plans.checkpoint import materialize_once
    from nonconsumptive_spark.queries.similarity import _K, _N_QUERIES

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    exact = materialize_once(
        sim.knn_bruteforce(emb, queries, k=_K), "curve_exact")
    agg = exact.agg(
        F.countDistinct("query_id").cast("long").alias("n_queries"),
        F.count("*").cast("long").alias("n_exact"),
    )
    small = sim._small_corpus(emb)
    if not small:
        scored = materialize_once(
            sim.ivf_probe_scored(emb, queries, n_centroids=16,
                                 max_probe=max(_CURVE_BOUNDS)),
            "curve_scored",
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id"))
    out = None
    for p, bound in sorted(_CURVE_BOUNDS.items()):
        if small:
            # knn_ivf's sub-MIN_ANN_CORPUS fallback is the exact scan:
            # every level's result IS the baseline frame.
            approx = exact
        else:
            approx = (
                scored.filter(F.col("probe_rank") < p)
                .withColumn("rank", F.row_number().over(w).cast("long"))
                .filter(F.col("rank") <= _K)
            )
        hits = exact.join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"])
        row = (
            agg.crossJoin(F.broadcast(
                hits.agg(F.count("*").cast("long").alias("n_hits"))))
            .select(
                F.lit(p).cast("long").alias("n_probe"),
                "n_queries", "n_exact",
                (F.col("n_hits") / F.col("n_exact") >= bound)
                .alias("recall_ok"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# -- isotonic calibration (PAVA via the minimax formula) -----------------------
_ISO_SCALE = 10**9


def _iso_oracle() -> str:
    from nonconsumptive_spark.operators.evaluation import CAL_BINS, CAL_SCALE

    ph = ("((greatest(CAST(-1.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE), "
          "CAST(embedding[1] AS DOUBLE))) + CAST(1.0 AS DOUBLE)) "
          "/ CAST(2.0 AS DOUBLE))")
    return f"""
    WITH base AS (
      SELECT least(CAST(floor({ph} * {CAL_BINS}) AS BIGINT),
                   {CAL_BINS - 1}) AS bin,
             CASE WHEN label = 0 THEN 1 ELSE 0 END AS pos
      FROM embeddings),
    bins AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS n_pos
      FROM base GROUP BY bin),
    pre AS (
      SELECT bin, n, n_pos,
             CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
             CAST(sum(n_pos) OVER (ORDER BY bin) AS BIGINT) AS cp
      FROM bins),
    grid AS (
      SELECT a.bin AS i, b.bin AS j,
             CAST(floor(CAST(b.cp - (a.cp - a.n_pos) AS DOUBLE)
                        / (b.cn - (a.cn - a.n)) * {_ISO_SCALE}) AS BIGINT)
               AS qd
      FROM pre a JOIN pre b ON a.bin <= b.bin),
    inner_min AS (
      SELECT p.bin AS k, g.i, CAST(min(g.qd) AS BIGINT) AS mn
      FROM pre p JOIN grid g ON g.i <= p.bin AND g.j >= p.bin
      GROUP BY p.bin, g.i),
    fit AS (
      SELECT k AS bin, CAST(max(mn) AS BIGINT) AS iso_q
      FROM inner_min GROUP BY k)
    SELECT b.bin, b.n, b.n_pos,
           round(CAST(b.n_pos AS DOUBLE) / b.n, 6) + 0.0 AS raw_rate,
           round(CAST(f.iso_q AS DOUBLE) / {_ISO_SCALE}, 6) + 0.0
             AS iso_rate
    FROM bins b JOIN fit f USING (bin)
    """


@_stage("q_isotonic_bins", _iso_oracle())
def q_isotonic_bins(spark, sf_dir):
    """Isotonic (PAVA) calibration of the reliability-diagram bins via
    the exact minimax formula r_k = max_{i<=k} min_{j>=k} rate(i..j) —
    the monotone recalibration map a scorer would ship, computed without
    the sequential pool-adjacent-violators loop (the minimax form is
    order-free, so both engines replay it exactly).  Range rates come
    from prefix sums of exact BIGINT bin counts and quantize to 1e-9
    BIGINTs BEFORE min/max, so the fit is pure integer comparison.
    Plan: one 10-bin agg, a 10-row prefix window, a <=55-row (i,j) grid
    and a <=220-row (k,i,j) fan — everything after the first agg is
    bin-bounded, corpus-size independent."""
    from pyspark.sql import Window
    from nonconsumptive_spark.operators.evaluation import CAL_BINS
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    emb = load(spark, sf_dir, "embeddings")
    clipped = F.greatest(F.lit(-1.0), F.least(
        F.lit(1.0), F.col("embedding").getItem(0).cast("double")))
    ph = (clipped + F.lit(1.0)) / F.lit(2.0)
    bins = materialize_once(
        emb.select(
            F.least(F.floor(ph * CAL_BINS).cast("long"),
                    F.lit(CAL_BINS - 1)).alias("bin"),
            (F.col("label") == 0).cast("long").alias("pos"))
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("n"),
             F.sum("pos").cast("long").alias("n_pos")),
        "iso_bins",
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    pre = bins.select(
        "bin", "n", "n_pos",
        F.sum("n").over(w).cast("long").alias("cn"),
        F.sum("n_pos").over(w).cast("long").alias("cp"),
    )
    a = pre.select(F.col("bin").alias("i"),
                   (F.col("cp") - F.col("n_pos")).alias("cp0"),
                   (F.col("cn") - F.col("n")).alias("cn0"))
    b = pre.select(F.col("bin").alias("j"), F.col("cp").alias("cp1"),
                   F.col("cn").alias("cn1"))
    grid = (
        a.crossJoin(b).filter(F.col("i") <= F.col("j"))
        .select("i", "j",
                F.floor((F.col("cp1") - F.col("cp0")).cast("double")
                        / (F.col("cn1") - F.col("cn0")) * _ISO_SCALE)
                .cast("long").alias("qd"))
    )
    spine = pre.select(F.col("bin").alias("k"))
    inner = (
        spine.crossJoin(grid)
        .filter((F.col("i") <= F.col("k")) & (F.col("j") >= F.col("k")))
        .groupBy("k", "i")
        .agg(F.min("qd").cast("long").alias("mn"))
    )
    fit = inner.groupBy("k").agg(F.max("mn").cast("long").alias("iso_q"))
    return (
        bins.join(fit, bins["bin"] == fit["k"])
        .select(
            "bin", "n", "n_pos",
            (F.round(F.col("n_pos").cast("double") / F.col("n"), 6)
             + F.lit(0.0)).alias("raw_rate"),
            (F.round(F.col("iso_q").cast("double") / _ISO_SCALE, 6)
             + F.lit(0.0)).alias("iso_rate"),
        )
    )


# -- von Neumann successive-difference ratio ------------------------------------
@_stage(
    "q_von_neumann_ratio",
    """
    WITH days AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    seq AS (
      SELECT x, lead(x) OVER (ORDER BY day) AS nx
      FROM days),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(x * x) AS BIGINT) AS ss,
             CAST(sum(CASE WHEN nx IS NOT NULL
                           THEN (nx - x) * (nx - x) ELSE 0 END)
                  AS BIGINT) AS sd2
      FROM seq)
    SELECT n, sd2,
           CAST(n * ss - s * s AS BIGINT) AS ssq_n,
           round(CAST(sd2 AS DOUBLE) / (n - 1)
                 / (CAST(n * ss - s * s AS DOUBLE) / (n * CAST(n AS DOUBLE)
                    - n)), 6) + 0.0 AS vn_ratio
    FROM mom
    """,
)
def q_von_neumann_ratio(spark, sf_dir):
    """Von Neumann ratio of the daily event-count series: mean squared
    successive difference over the sample variance — ~2 for a random
    series, < 2 under positive trend/autocorrelation, > 2 under
    oscillation; the classic third randomness screen beside the runs
    test and Mann-Kendall.  Numerator and the n*ss - s^2 variance
    kernel are exact BIGINTs off one day agg + one lead window over the
    day spine; the ratio is one mirrored chain."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    days = (ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .agg(F.count("*").cast("long").alias("x")))
    w = Window.orderBy("day")
    seq = days.select("x", F.lead("x").over(w).alias("nx"))
    mom = seq.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("ss"),
        F.sum(F.when(F.col("nx").isNotNull(),
                     (F.col("nx") - F.col("x"))
                     * (F.col("nx") - F.col("x"))).otherwise(0))
        .cast("long").alias("sd2"),
    )
    ssq_n = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return mom.select(
        "n", "sd2", ssq_n.cast("long").alias("ssq_n"),
        (F.round(F.col("sd2").cast("double") / (F.col("n") - 1)
                 / (ssq_n.cast("double")
                    / (F.col("n") * F.col("n").cast("double") - F.col("n"))),
                 6) + F.lit(0.0)).alias("vn_ratio"),
    )


# -- Simpson's-paradox flip detector --------------------------------------------
@_stage(
    "q_simpson_flip",
    f"""
    WITH lab AS (
      SELECT min(source) AS sa
      FROM (SELECT source FROM documents GROUP BY source
            ORDER BY source LIMIT 1)),
    cells AS (
      SELECT lang,
             CAST(sum(CASE WHEN exposed AND long_doc THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(sum(CASE WHEN exposed AND NOT long_doc THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(sum(CASE WHEN NOT exposed AND long_doc THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(sum(CASE WHEN NOT exposed AND NOT long_doc
                           THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM (SELECT d.lang, d.source = (SELECT sa FROM lab) AS exposed,
                   coalesce(d.n_chars, 0) >= 500 AS long_doc
            FROM documents d)
      GROUP BY lang),
    marg AS (
      SELECT CAST(sum(a) AS BIGINT) AS a, CAST(sum(b) AS BIGINT) AS b,
             CAST(sum(c) AS BIGINT) AS c, CAST(sum(d) AS BIGINT) AS d
      FROM cells)
    SELECT s.lang, s.a, s.b, s.c, s.d,
           s.a * (s.c + s.d) > s.c * (s.a + s.b) AS stratum_favors_exposed,
           m.a * (m.c + m.d) > m.c * (m.a + m.b) AS marginal_favors_exposed,
           (s.a * (s.c + s.d) > s.c * (s.a + s.b))
             <> (m.a * (m.c + m.d) > m.c * (m.a + m.b)) AS flipped
    FROM cells s CROSS JOIN marg m
    """,
)
def q_simpson_flip(spark, sf_dir):
    """Simpson's-paradox audit for the Mantel-Haenszel setup: per lang
    stratum, does the long-document rate direction between the first
    source and the rest DISAGREE with the pooled (marginal) direction?
    Direction is decided by the exact integer cross-multiplication
    a*(c+d) > c*(a+b) (rate comparison without a float), so a stratum
    row flags `flipped` exactly when aggregation would mislead.  Plan:
    one lang agg on a zero-shuffle scan + a 1-row marginal attach."""
    docs = load(spark, sf_dir, "documents")
    lab = (docs.groupBy("source").agg(F.lit(1).alias("__o"))
           .orderBy("source").limit(1)
           .select(F.col("source").alias("sa")))
    base = docs.crossJoin(F.broadcast(lab)).select(
        "lang",
        (F.col("source") == F.col("sa")).alias("exposed"),
        (F.coalesce(F.col("n_chars"), F.lit(0)) >= 500).alias("long_doc"),
    )
    cells = base.groupBy("lang").agg(
        F.sum((F.col("exposed") & F.col("long_doc")).cast("long"))
        .cast("long").alias("a"),
        F.sum((F.col("exposed") & ~F.col("long_doc")).cast("long"))
        .cast("long").alias("b"),
        F.sum((~F.col("exposed") & F.col("long_doc")).cast("long"))
        .cast("long").alias("c"),
        F.sum((~F.col("exposed") & ~F.col("long_doc")).cast("long"))
        .cast("long").alias("d"),
    )
    from nonconsumptive_spark.plans.checkpoint import materialize_once
    cells = materialize_once(cells, "simpson_cells")
    marg = cells.agg(F.sum("a").cast("long").alias("ma"),
                     F.sum("b").cast("long").alias("mb"),
                     F.sum("c").cast("long").alias("mc"),
                     F.sum("d").cast("long").alias("md"))
    sdir = (F.col("a") * (F.col("c") + F.col("d"))
            > F.col("c") * (F.col("a") + F.col("b")))
    mdir = (F.col("ma") * (F.col("mc") + F.col("md"))
            > F.col("mc") * (F.col("ma") + F.col("mb")))
    return (
        cells.crossJoin(F.broadcast(marg))  # 1-row marginal attach
        .select("lang", "a", "b", "c", "d",
                sdir.alias("stratum_favors_exposed"),
                mdir.alias("marginal_favors_exposed"),
                (sdir != mdir).alias("flipped"))
    )


# -- per-stratum odds ratios with Woolf CIs --------------------------------------
_OR_Z = 1.959964  # ~N(0,1) 97.5% quantile, shared literal


@_stage(
    "q_odds_ratio_ci",
    f"""
    WITH lab AS (
      SELECT min(source) AS sa
      FROM (SELECT source FROM documents GROUP BY source
            ORDER BY source LIMIT 1)),
    cells AS (
      SELECT lang,
             CAST(sum(CASE WHEN exposed AND long_doc THEN 1 ELSE 0 END)
                  AS BIGINT) + 0.5 AS a,
             CAST(sum(CASE WHEN exposed AND NOT long_doc THEN 1 ELSE 0 END)
                  AS BIGINT) + 0.5 AS b,
             CAST(sum(CASE WHEN NOT exposed AND long_doc THEN 1 ELSE 0 END)
                  AS BIGINT) + 0.5 AS c,
             CAST(sum(CASE WHEN NOT exposed AND NOT long_doc
                           THEN 1 ELSE 0 END) AS BIGINT) + 0.5 AS d
      FROM (SELECT d.lang, d.source = (SELECT sa FROM lab) AS exposed,
                   coalesce(d.n_chars, 0) >= 500 AS long_doc
            FROM documents d)
      GROUP BY lang)
    SELECT lang,
           CAST(a - 0.5 AS BIGINT) AS n_a, CAST(b - 0.5 AS BIGINT) AS n_b,
           CAST(c - 0.5 AS BIGINT) AS n_c, CAST(d - 0.5 AS BIGINT) AS n_d,
           round(ln(a * d / (b * c)), 6) + 0.0 AS log_or,
           round(ln(a * d / (b * c))
                 - {_OR_Z} * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d),
                 6) + 0.0 AS ci_lo,
           round(ln(a * d / (b * c))
                 + {_OR_Z} * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d),
                 6) + 0.0 AS ci_hi
    FROM cells
    """,
)
def q_odds_ratio_ci(spark, sf_dir):
    """Per-lang-stratum log odds ratio of long-document rate (first
    source vs rest) with Woolf confidence intervals under the Haldane-
    Anscombe +0.5 continuity correction — the per-stratum detail table
    behind q_mantel_haenszel's pooled number (and the CI companion the
    Wilson intervals give proportions).  Cell counts are exact BIGINTs;
    the corrected cells, ln, and the variance chain are token-mirrored;
    zero cells stay finite by construction.  Plan: one lang agg over a
    zero-shuffle scan."""
    docs = load(spark, sf_dir, "documents")
    lab = (docs.groupBy("source").agg(F.lit(1).alias("__o"))
           .orderBy("source").limit(1)
           .select(F.col("source").alias("sa")))
    base = docs.crossJoin(F.broadcast(lab)).select(
        "lang",
        (F.col("source") == F.col("sa")).alias("exposed"),
        (F.coalesce(F.col("n_chars"), F.lit(0)) >= 500).alias("long_doc"),
    )

    def cell(cond):
        return (F.sum(cond.cast("long")).cast("long").cast("double")
                + F.lit(0.5))

    cells = base.groupBy("lang").agg(
        cell(F.col("exposed") & F.col("long_doc")).alias("a"),
        cell(F.col("exposed") & ~F.col("long_doc")).alias("b"),
        cell(~F.col("exposed") & F.col("long_doc")).alias("c"),
        cell(~F.col("exposed") & ~F.col("long_doc")).alias("d"),
    )
    lor = F.log(F.col("a") * F.col("d") / (F.col("b") * F.col("c")))
    se = F.sqrt(1.0 / F.col("a") + 1.0 / F.col("b")
                + 1.0 / F.col("c") + 1.0 / F.col("d"))
    return cells.select(
        "lang",
        (F.col("a") - 0.5).cast("long").alias("n_a"),
        (F.col("b") - 0.5).cast("long").alias("n_b"),
        (F.col("c") - 0.5).cast("long").alias("n_c"),
        (F.col("d") - 0.5).cast("long").alias("n_d"),
        (F.round(lor, 6) + F.lit(0.0)).alias("log_or"),
        (F.round(lor - _OR_Z * se, 6) + F.lit(0.0)).alias("ci_lo"),
        (F.round(lor + _OR_Z * se, 6) + F.lit(0.0)).alias("ci_hi"),
    )


# -- CUPED-adjusted A/B readout with MDE ------------------------------------------
_CUPED_CUT = "2024-01-16 00:00:00"
_Z_ALPHA = 1.959964  # 97.5%
_Z_POWER = 0.841621  # 80%


def _cuped_oracle() -> str:
    # exact BIGINT kernels; every float is one mirrored chain
    return f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 2 AS grp,
             CAST(sum(CASE WHEN ts < TIMESTAMP '{_CUPED_CUT}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUT}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY user_id),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN grp = 0 THEN x ELSE 0 END) AS BIGINT) AS sax,
             CAST(sum(CASE WHEN grp = 0 THEN y ELSE 0 END) AS BIGINT) AS say
      FROM per_user),
    d AS (
      SELECT n, na, n - na AS nb,
             CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS cxy,
             CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS vx,
             CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS vy,
             CAST(say AS DOUBLE) / na
               - CAST(sy - say AS DOUBLE) / (n - na) AS diff_raw,
             CAST(sax AS DOUBLE) / na
               - CAST(sx - sax AS DOUBLE) / (n - na) AS dx
      FROM mom)
    SELECT n AS n_users, na AS n_a, nb AS n_b,
           round(cxy / vx, 6) + 0.0 AS theta,
           round(diff_raw, 6) + 0.0 AS diff_raw,
           round(diff_raw - (cxy / vx) * dx, 6) + 0.0 AS diff_cuped,
           round(cxy * cxy / (vx * vy), 6) + 0.0 AS rho2,
           round(({_Z_ALPHA} + {_Z_POWER})
                 * sqrt(vy / (n * CAST(n AS DOUBLE) - n)
                        * (1.0 / na + 1.0 / nb)), 6) + 0.0 AS mde_raw,
           round(({_Z_ALPHA} + {_Z_POWER})
                 * sqrt(vy / (n * CAST(n AS DOUBLE) - n)
                        * (1.0 - cxy * cxy / (vx * vy))
                        * (1.0 / na + 1.0 / nb)), 6) + 0.0 AS mde_cuped
    FROM d
    """


@_stage("q_cuped_abtest", _cuped_oracle())
def q_cuped_abtest(spark, sf_dir):
    """CUPED-adjusted A/B readout (Deng et al. 2013, the industry-
    standard variance-reduction for online experiments): users split by
    the portable md5 bit, metric = post-period event count, covariate =
    pre-period count; theta = cov(x,y)/var(x) folds the pre-period out
    of the effect, and the minimum detectable effect is reported both
    raw and CUPED-reduced (x sqrt(1-rho^2)) — the why-bother number.
    All kernels (n*Sxy - Sx*Sy etc.) are exact BIGINT integer moments
    promoted to double only for the final mirrored chains.  Plan: one
    user agg, one 1-row moment agg."""
    ev = load(spark, sf_dir, "events")
    grp = (F.conv(F.substring(F.md5(F.col("user_id").cast("string")),
                              1, 15), 16, 10).cast("long") % 2)
    cut = F.lit(_CUPED_CUT).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, 1).otherwise(0))
        .cast("long").alias("x"),
        F.sum(F.when(F.col("ts") >= cut, 1).otherwise(0))
        .cast("long").alias("y"),
    ).select(grp.alias("grp"), "x", "y")
    mom = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long").alias("na"),
        F.sum(F.when(F.col("grp") == 0, F.col("x")).otherwise(0))
        .cast("long").alias("sax"),
        F.sum(F.when(F.col("grp") == 0, F.col("y")).otherwise(0))
        .cast("long").alias("say"),
    )
    n, na = F.col("n"), F.col("na")
    nb = n - na
    cxy = n.cast("double") * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    vx = n.cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vy = n.cast("double") * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    diff_raw = (F.col("say").cast("double") / na
                - (F.col("sy") - F.col("say")).cast("double") / nb)
    dx = (F.col("sax").cast("double") / na
          - (F.col("sx") - F.col("sax")).cast("double") / nb)
    rho2 = cxy * cxy / (vx * vy)
    zsum = F.lit(_Z_ALPHA + _Z_POWER)
    inv = 1.0 / na + 1.0 / nb
    vyn = vy / (n * n.cast("double") - n)
    return mom.select(
        n.alias("n_users"), na.alias("n_a"), nb.cast("long").alias("n_b"),
        (F.round(cxy / vx, 6) + F.lit(0.0)).alias("theta"),
        (F.round(diff_raw, 6) + F.lit(0.0)).alias("diff_raw"),
        (F.round(diff_raw - (cxy / vx) * dx, 6) + F.lit(0.0))
        .alias("diff_cuped"),
        (F.round(rho2, 6) + F.lit(0.0)).alias("rho2"),
        (F.round(zsum * F.sqrt(vyn * inv), 6) + F.lit(0.0)).alias("mde_raw"),
        (F.round(zsum * F.sqrt(vyn * (F.lit(1.0) - rho2) * inv), 6)
         + F.lit(0.0)).alias("mde_cuped"),
    )


# -- funnel time-to-convert quantiles --------------------------------------------
_TTC_FROM = "click"
_TTC_TO = "purchase"


def _ttc_oracle() -> str:
    return f"""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = '{_TTC_FROM}' THEN ts END) AS t0
      FROM events GROUP BY user_id),
    conv AS (
      SELECT f.user_id,
             (epoch_us(min(e.ts)) - epoch_us(f.t0)) // 1000000 AS secs
      FROM firsts f
      JOIN events e ON e.user_id = f.user_id
                    AND e.event_type = '{_TTC_TO}' AND e.ts > f.t0
      WHERE f.t0 IS NOT NULL
      GROUP BY f.user_id, f.t0),
    hist AS (
      SELECT secs, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(count(*)) OVER (ORDER BY secs) AS BIGINT) AS cum
      FROM conv GROUP BY secs),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM conv)
    SELECT t.n AS n_converted,
           (SELECT min(secs) FROM hist
            WHERE cum >= (t.n + 1) // 2) AS median_s,
           (SELECT min(secs) FROM hist
            WHERE cum >= (9 * t.n + 9) // 10) AS p90_s
    FROM tot t
    """


@_stage("q_time_to_convert", _ttc_oracle())
def q_time_to_convert(spark, sf_dir):
    """Funnel latency: per user, seconds from the FIRST '{from}' event to
    the first subsequent '{to}' event, with the exact median and p90 as
    order statistics off a seconds histogram (the repo's exact-quantile
    discipline — no percentile float interpolation).  Durations come
    from microsecond epoch differences floored to seconds with integer
    division (second-truncation semantics differ across engines; the
    micros route does not).  Plan: one user agg + one user-keyed join
    narrowed to the target type + a histogram window over distinct
    durations."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    firsts = (ev.groupBy("user_id")
              .agg(F.min(F.when(F.col("event_type") == _TTC_FROM,
                                F.col("ts"))).alias("t0"))
              .filter(F.col("t0").isNotNull()))
    conv = (
        ev.filter(F.col("event_type") == _TTC_TO)
        .join(firsts, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id", "t0")
        .agg(F.min("ts").alias("t1"))
        .select(F.expr("timestampdiff(MICROSECOND, t0, t1) div 1000000")
                .alias("secs"))
    )
    from nonconsumptive_spark.plans.checkpoint import materialize_once
    conv = materialize_once(conv, "ttc_secs")
    w = Window.orderBy("secs").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    hist = (conv.groupBy("secs").agg(F.count("*").cast("long").alias("c"))
            .withColumn("cum", F.sum("c").over(w).cast("long")))
    tot = conv.agg(F.count("*").cast("long").alias("n"))
    hx = hist.crossJoin(F.broadcast(tot))
    med = (hx.filter(F.col("cum") >= F.expr("(n + 1) div 2"))
           .agg(F.min("secs").alias("median_s")))
    p90 = (hx.filter(F.col("cum") >= F.expr("(9 * n + 9) div 10"))
           .agg(F.min("secs").alias("p90_s")))
    return (
        tot.select(F.col("n").alias("n_converted"))
        .crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(p90))
    )


# -- Poisson SPRT over the daily series -------------------------------------------
# H0: rate = lambda0 (the observed mean), H1: rate = 1.5 * lambda0;
# boundaries ln((1-beta)/alpha), ln(beta/(1-alpha)) at alpha=.05, beta=.2,
# pre-quantized to 1e-6 integers so the decision compares BIGINTs.
_SPRT_UP_Q = 2772588     # floor(ln(0.8/0.05) * 1e6)
_SPRT_LO_Q = -1558145    # floor(ln(0.2/0.95) * 1e6)
_SPRT_SCALE = 10**6
_SPRT_BASE_DAYS = 7      # lambda0 comes from this leading baseline window


@_stage(
    "q_sprt_daily",
    f"""
    WITH days AS (
      SELECT day, x, row_number() OVER (ORDER BY day) AS rn
      FROM (SELECT strftime(ts, '%Y-%m-%d') AS day,
                   CAST(count(*) AS BIGINT) AS x
            FROM events GROUP BY 1)),
    base AS (
      SELECT CAST(sum(x) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS d
      FROM days WHERE rn <= {_SPRT_BASE_DAYS}),
    terms AS (
      SELECT day, x,
             CAST(floor((x * ln(1.5)
                         - 0.5 * (CAST(n AS DOUBLE) / d))
                        * {_SPRT_SCALE}) AS BIGINT) AS lq
      FROM days CROSS JOIN base
      WHERE rn > {_SPRT_BASE_DAYS}),
    cum AS (
      SELECT day, x,
             CAST(sum(lq) OVER (ORDER BY day) AS BIGINT) AS cum_q
      FROM terms)
    SELECT day, x,
           round(CAST(cum_q AS DOUBLE) / {_SPRT_SCALE}, 6) + 0.0 AS cum_llr,
           CASE WHEN cum_q >= {_SPRT_UP_Q} THEN 'accept_h1'
                WHEN cum_q <= {_SPRT_LO_Q} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM cum
    """,
)
def q_sprt_daily(spark, sf_dir):
    """Wald's sequential probability ratio test over the daily event
    series (Poisson form): λ0 is the mean rate of the LEADING 7-day
    baseline window, and the cumulative log-likelihood ratio of
    rate = 1.5·λ0 vs λ0 runs over every later day with the classic
    (α=.05, β=.2) decision boundaries — the SEQUENTIAL member of the
    experimentation family beside the fixed-horizon Welch/permutation
    tests and the CUPED readout (stop the moment the evidence crosses a
    boundary instead of waiting out the horizon; a self-referential
    full-series mean would make H1 unreachable by construction, which
    is why the null is a baseline window).  Each day's LLR term
    quantizes to a 1e-6 BIGINT (one ln(1.5) constant, one mean-rate
    division — both mirrored), so the cumulative sum and the boundary
    comparisons are exact integers.  Plan: one day agg + a 1-row
    baseline attach + one window over the day spine."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    wd = Window.orderBy("day")
    days = (ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .agg(F.count("*").cast("long").alias("x"))
            .withColumn("rn", F.row_number().over(wd)))
    base = (days.filter(F.col("rn") <= _SPRT_BASE_DAYS)
            .agg(F.sum("x").cast("long").alias("n"),
                 F.count("*").cast("long").alias("d")))
    terms = (days.filter(F.col("rn") > _SPRT_BASE_DAYS)
             .crossJoin(F.broadcast(base)).select(
        "day", "x",
        F.floor((F.col("x") * F.log(F.lit(1.5))
                 - F.lit(0.5) * (F.col("n").cast("double") / F.col("d")))
                * _SPRT_SCALE).cast("long").alias("lq"),
    ))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = terms.withColumn("cum_q", F.sum("lq").over(w).cast("long"))
    return cum.select(
        "day", "x",
        (F.round(F.col("cum_q").cast("double") / _SPRT_SCALE, 6)
         + F.lit(0.0)).alias("cum_llr"),
        F.when(F.col("cum_q") >= _SPRT_UP_Q, F.lit("accept_h1"))
        .when(F.col("cum_q") <= _SPRT_LO_Q, F.lit("accept_h0"))
        .otherwise(F.lit("continue")).alias("decision"),
    )


# -- Theil-Sen robust slope of the daily event series ------------------------
@_stage(
    "q_theil_sen_slope",
    """
    WITH days AS (
      SELECT CAST(date_diff('day',
                  (SELECT min(CAST(ts AS DATE)) FROM events),
                  CAST(ts AS DATE)) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
    pairs AS (
      SELECT a.d AS d1, b.d AS d2,
             CAST(b.c - a.c AS DOUBLE) / (b.d - a.d) AS slope
      FROM days a JOIN days b ON a.d < b.d),
    ranked AS (
      SELECT slope, d1, d2,
             CAST(row_number() OVER (ORDER BY slope, d1, d2) AS BIGINT)
               AS rn,
             CAST(count(*) OVER () AS BIGINT) AS m
      FROM pairs),
    sel AS (
      SELECT slope, m FROM ranked
      WHERE rn = CAST(floor((m + 1) / 2.0) AS BIGINT)
         OR rn = CAST(floor((m + 2) / 2.0) AS BIGINT))
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM days) AS n_days,
           CAST(max(m) AS BIGINT) AS n_pairs,
           round(avg(slope), 6) + 0.0 AS ts_slope
    FROM sel
    """,
)
def q_theil_sen_slope(spark, sf_dir):
    """Theil-Sen estimator for the daily event-count trend: the MEDIAN
    of all pairwise slopes (c_j - c_i)/(d_j - d_i) — the robust
    companion to q_mann_kendall (which tests trend DIRECTION; Theil-Sen
    gives its magnitude, immune to ~29% outlier contamination where OLS
    breaks).  Each slope is ONE float division over exact day/count
    integers; the median picks positional middles under a total
    (slope, d1, d2) order, so ties can't reorder the selected values.
    Scale: the pair frame is #days^2 — a spine self-join, never
    row-scaled; everything upstream is one day agg."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    raw = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c"))
    d0 = raw.agg(F.min("day").alias("d0"))
    days = raw.crossJoin(F.broadcast(d0)).select(
        F.datediff("day", "d0").cast("long").alias("d"), "c")
    a = days.select(F.col("d").alias("d1"), F.col("c").alias("c1"))
    b = days.select(F.col("d").alias("d2"), F.col("c").alias("c2"))
    pairs = a.join(F.broadcast(b), F.col("d1") < F.col("d2")).select(
        "d1", "d2",
        ((F.col("c2") - F.col("c1")).cast("double")
         / (F.col("d2") - F.col("d1"))).alias("slope"),
    )
    w = Window.orderBy("slope", "d1", "d2")
    ranked = pairs.select(
        "slope",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count("*").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing))
        .cast("long").alias("m"),
    )
    sel = ranked.filter(
        (F.col("rn") == F.floor((F.col("m") + 1) / F.lit(2.0)))
        | (F.col("rn") == F.floor((F.col("m") + 2) / F.lit(2.0))))
    nd = raw.agg(F.count("*").cast("long").alias("n_days"))
    return (
        sel.agg(F.max("m").cast("long").alias("n_pairs"),
                (F.round(F.avg("slope"), 6) + F.lit(0.0)).alias("ts_slope"))
        .crossJoin(F.broadcast(nd))
        .select("n_days", "n_pairs", "ts_slope")
    )


# -- exact average precision + 11-point interpolated AP ----------------------
def _ap_oracle() -> str:
    from nonconsumptive_spark.operators.evaluation import (
        AP_LEVELS, AP_SCALE, AUC_SCALE)

    return f"""
    WITH base AS (
      SELECT vec_id AS rid,
             CASE WHEN label = 0 THEN 1 ELSE 0 END AS y,
             CAST(floor(CAST(embedding[1] AS DOUBLE) * {AUC_SCALE} + 0.5)
                  AS BIGINT) AS sq
      FROM embeddings),
    pts AS (
      SELECT y, rn, cum_rel,
             CAST(floor({AP_SCALE}.0 * cum_rel / rn) AS BIGINT) AS prec_q
      FROM (
        SELECT y,
               CAST(row_number() OVER (ORDER BY sq DESC, rid ASC)
                    AS BIGINT) AS rn,
               CAST(sum(y) OVER (ORDER BY sq DESC, rid ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_rel
        FROM base) z),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS n_pos FROM pts),
    apq AS (SELECT CAST(sum(prec_q) AS BIGINT) AS ap_sum_q
            FROM pts WHERE y = 1),
    lv AS (SELECT unnest(range(0, {AP_LEVELS})) AS lvl),
    interp AS (
      SELECT CAST(sum(mx) AS BIGINT) AS interp_sum_q FROM (
        SELECT l.lvl, max(p.prec_q) AS mx
        FROM lv l JOIN pts p
          ON p.cum_rel * 10 >= l.lvl * (SELECT n_pos FROM tot)
        GROUP BY l.lvl) z)
    SELECT t.n, t.n_pos,
           CASE WHEN t.n_pos > 0 THEN
             round(a.ap_sum_q / ({AP_SCALE} * t.n_pos), 6) + 0.0
           END AS ap,
           CASE WHEN t.n_pos > 0 THEN
             round(i.interp_sum_q / CAST({AP_SCALE * AP_LEVELS} AS BIGINT),
                   6) + 0.0
           END AS ap11
    FROM tot t CROSS JOIN apq a CROSS JOIN interp i
    """


@_stage("q_avg_precision", _ap_oracle())
def q_avg_precision(spark, sf_dir):
    """Exact AP + 11-point interpolated AP of the first embedding
    coordinate against class-0 membership (operators/evaluation.
    average_precision) — the imbalance-robust ranking grade beside
    q_auc_eval's ROC AUC, sharing its score/label frame so the two
    metrics are directly comparable."""
    from nonconsumptive_spark.operators.evaluation import average_precision

    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("rid"),
        (F.col("label") == 0).cast("long").alias("y"),
        F.col("embedding").getItem(0).alias("score"),
    )
    return average_precision(emb, label_col="y", score_col="score",
                             id_col="rid")


# -- Benjamini-Hochberg FDR over per-type permutation tests ------------------
_BH_R = 99            # replicas; p denominators are R + 1 = 100
_BH_SCALE = 10**6     # |mean diff| quantization
_BH_A_NUM, _BH_A_DEN = 1, 10   # alpha = 0.1


def _bh_oracle() -> str:
    wd = ("(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3) % 7")
    # replica bits: 21 base-7 digits from EACH of ceil(R/21) 60-bit md5
    # values per event (one hash yields 21 replicas, a ~20x hash-cost cut
    # vs hashing per (event, replica)); digits of a uniform 60-bit int
    # are uniform mod 7 up to a 2^-57 bias, and the scheme is mirrored
    # digit-for-digit on both engines
    n_h = (_BH_R + 20) // 21
    hs = ", ".join(
        "CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':s"
        f"{i}'), 1, 15)) AS BIGINT)" for i in range(n_h))
    pows = ", ".join(f"{7 ** d}::BIGINT" for d in range(21))
    diffq = (lambda sa, na, sb, nb:
             f"CASE WHEN {na} > 0 AND {nb} > 0 THEN "
             f"CAST(floor(abs(CAST({sa} AS DOUBLE) / {na}"
             f" - CAST({sb} AS DOUBLE) / {nb}) * {_BH_SCALE}) AS BIGINT)"
             f" ELSE NULL END")
    return f"""
    WITH base AS (
      SELECT event_id, event_type,
             CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) AS xq,
             CASE WHEN {wd} >= 5 THEN 1 ELSE 0 END AS wk
      FROM events),
    obs AS (
      SELECT event_type,
             CAST(sum(wk) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN wk = 1 THEN xq ELSE 0 END) AS BIGINT) AS s_a,
             CAST(count(*) AS BIGINT) AS n_t,
             CAST(sum(xq) AS BIGINT) AS s_t
      FROM base GROUP BY event_type),
    obsq AS (
      SELECT event_type, n_a AS n_wk, n_t - n_a AS n_wd,
             {diffq('s_a', 'n_a', '(s_t - s_a)', '(n_t - n_a)')}
               AS diff_obs_q
      FROM obs),
    hashed AS (
      SELECT event_type, xq, [{hs}] AS hs FROM base),
    reps AS (
      SELECT event_type, r,
             CAST(sum(CASE WHEN bit >= 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN bit >= 5 THEN xq ELSE 0 END) AS BIGINT)
               AS s_a,
             CAST(count(*) AS BIGINT) AS n_t,
             CAST(sum(xq) AS BIGINT) AS s_t
      FROM (
        SELECT h.event_type, h.xq, t.r,
               ((h.hs[CAST(floor((t.r - 1) / 21.0) AS INT) + 1]
                 // [{pows}][CAST((t.r - 1) % 21 AS INT) + 1]) % 7) AS bit
        FROM hashed h, range(1, {_BH_R} + 1) t(r))
      GROUP BY event_type, r),
    repq AS (
      SELECT event_type,
             {diffq('s_a', 'n_a', '(s_t - s_a)', '(n_t - n_a)')} AS diff_q
      FROM reps),
    pv AS (
      SELECT o.event_type, o.n_wk, o.n_wd, o.diff_obs_q,
             CAST(1 + sum(CASE WHEN r.diff_q >= o.diff_obs_q
                               THEN 1 ELSE 0 END) AS BIGINT) AS p_num
      FROM obsq o JOIN repq r USING (event_type)
      WHERE o.diff_obs_q IS NOT NULL
      GROUP BY 1, 2, 3, 4),
    bh AS (
      SELECT *,
             CAST(row_number() OVER (ORDER BY p_num, event_type)
                  AS BIGINT) AS bh_rank,
             CAST(count(*) OVER () AS BIGINT) AS m
      FROM pv),
    dec AS (
      SELECT *,
             max(CASE WHEN p_num * m * {_BH_A_DEN}
                        <= bh_rank * {_BH_R + 1} * {_BH_A_NUM}
                      THEN bh_rank END) OVER () AS imax
      FROM bh)
    SELECT event_type, n_wk, n_wd, diff_obs_q, p_num,
           round(p_num / {_BH_R + 1}.0, 6) + 0.0 AS p_value,
           bh_rank,
           CAST(CASE WHEN bh_rank <= coalesce(imax, 0)
                     THEN 1 ELSE 0 END AS BIGINT) AS rejected
    FROM dec
    """


@_stage("q_bh_fdr", _bh_oracle())
def q_bh_fdr(spark, sf_dir):
    """Benjamini-Hochberg FDR control over a FAMILY of per-event-type
    randomization tests (weekend-vs-weekday mean value), with
    EXACT-INTEGER p-values: each test's p is (1 + #{replica diff >=
    observed diff}) / (R+1) from the portable md5 pseudo-assignment
    (marginal 2/7, matching the weekend share), so both the p-values
    and the BH step-up comparisons p_(i) <= i*alpha/m are pure integer
    arithmetic — no CDF approximation enters either engine.  The
    multiple-testing gate every per-stratum test battery (Welch / MW /
    KS families) feeds at scale.  Plan: events x R rows collapse in ONE
    map-side-combined (type, r) agg; everything after is #types-bounded
    windows."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_id", "event_type",
        F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100
                + F.lit(0.5)).cast("long").alias("xq"),
        F.when(
            (F.datediff(F.to_date("ts"),
                        F.to_date(F.lit("1970-01-01"))) + 3) % 7 >= 5,
            F.lit(1)).otherwise(F.lit(0)).alias("wk"),
    )

    def diffq(sa, na, sb, nb):
        return F.when(
            (na > 0) & (nb > 0),
            F.floor(F.abs(sa.cast("double") / na - sb.cast("double") / nb)
                    * _BH_SCALE).cast("long"),
        ).otherwise(F.lit(None).cast("long"))

    obs = base.groupBy("event_type").agg(
        F.sum("wk").cast("long").alias("n_a"),
        F.sum(F.when(F.col("wk") == 1, F.col("xq")).otherwise(0))
        .cast("long").alias("s_a"),
        F.count("*").cast("long").alias("n_t"),
        F.sum("xq").cast("long").alias("s_t"),
    )
    obsq = obs.select(
        "event_type", F.col("n_a").alias("n_wk"),
        (F.col("n_t") - F.col("n_a")).alias("n_wd"),
        diffq(F.col("s_a"), F.col("n_a"),
              F.col("s_t") - F.col("s_a"),
              F.col("n_t") - F.col("n_a")).alias("diff_obs_q"),
    ).filter(F.col("diff_obs_q").isNotNull())
    n_h = (_BH_R + 20) // 21
    hs = F.array(*[
        F.conv(F.substring(F.md5(F.concat(
            F.col("event_id").cast("string"), F.lit(f":s{i}"))), 1, 15),
            16, 10).cast("long")
        for i in range(n_h)])
    pow7 = F.array(*[F.lit(7 ** d).cast("long") for d in range(21)])
    hashed = base.select("event_type", "xq", hs.alias("hs"))
    picked = (
        hashed.select("event_type", "xq",
                      F.explode(F.sequence(F.lit(1), F.lit(_BH_R)))
                      .alias("r"), "hs")
        .select(
            "event_type", "xq", "r",
            F.element_at("hs", (F.floor((F.col("r") - 1) / F.lit(21.0))
                                .cast("int") + 1)).alias("h"),
            F.element_at(pow7, ((F.col("r") - 1) % 21).cast("int") + 1)
            .alias("p"),
        )
    )
    reps = (
        picked.select("event_type", "xq", "r",
                      F.expr("(h div p) % 7").alias("bit"))
        .groupBy("event_type", "r")
        .agg(
            F.sum(F.when(F.col("bit") >= 5, 1).otherwise(0))
            .cast("long").alias("n_a"),
            F.sum(F.when(F.col("bit") >= 5, F.col("xq")).otherwise(0))
            .cast("long").alias("s_a"),
            F.count("*").cast("long").alias("n_t"),
            F.sum("xq").cast("long").alias("s_t"),
        )
    )
    repq = reps.select(
        "event_type",
        diffq(F.col("s_a"), F.col("n_a"),
              F.col("s_t") - F.col("s_a"),
              F.col("n_t") - F.col("n_a")).alias("diff_q"),
    )
    pv = (
        obsq.join(repq, "event_type")
        .groupBy("event_type", "n_wk", "n_wd", "diff_obs_q")
        .agg((F.lit(1) + F.sum(
            F.when(F.col("diff_q") >= F.col("diff_obs_q"), 1).otherwise(0)))
            .cast("long").alias("p_num"))
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    bh = pv.select(
        "*",
        F.row_number().over(Window.orderBy("p_num", "event_type"))
        .cast("long").alias("bh_rank"),
        F.count("*").over(w_all).cast("long").alias("m"),
    )
    dec = bh.withColumn(
        "imax",
        F.max(F.when(
            F.col("p_num") * F.col("m") * _BH_A_DEN
            <= F.col("bh_rank") * (_BH_R + 1) * _BH_A_NUM,
            F.col("bh_rank"))).over(w_all),
    )
    return dec.select(
        "event_type", "n_wk", "n_wd", "diff_obs_q", "p_num",
        (F.round(F.col("p_num") / F.lit(float(_BH_R + 1)), 6)
         + F.lit(0.0)).alias("p_value"),
        "bh_rank",
        F.when(F.col("bh_rank") <= F.coalesce(F.col("imax"), F.lit(0)),
               F.lit(1)).otherwise(F.lit(0)).cast("long").alias("rejected"),
    )


# -- Expected Reciprocal Rank of the lexical ranker ---------------------------
def _err_oracle() -> str:
    from nonconsumptive_spark.operators import hybrid as hy
    from nonconsumptive_spark.queries.hybrid import _LEX_CTES, _SEM_CTES

    dens = ", ".join(f"({i + 1}, {d}::BIGINT)"
                     for i, d in enumerate(hy.err_denoms()))
    return f"""
    WITH {_LEX_CTES},
    {_SEM_CTES},
    rel AS (
      SELECT query_id, cand_id,
             CASE WHEN sem_rank <= {hy.NDCG_HI_CUT} THEN 3 ELSE 1 END AS num
      FROM semt),
    den(r, d) AS (VALUES {dens}),
    base AS (
      SELECT l.query_id, l.lex_rank,
             CAST(COALESCE(rl.num, 0) AS BIGINT) AS num
      FROM lext l LEFT JOIN rel rl
        ON rl.query_id = l.query_id AND rl.cand_id = l.cand_id
      WHERE l.lex_rank <= {hy.NDCG_K}),
    terms AS (
      SELECT b.query_id,
             CAST(floor({hy.ERR_SCALE}.0 * (b.num * COALESCE(
                 product(CAST({hy.ERR_DEN} - b.num AS DOUBLE)) OVER (
                   PARTITION BY b.query_id ORDER BY b.lex_rank
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 1.0)) / d.d) AS BIGINT) AS tq
      FROM base b JOIN den d ON d.r = b.lex_rank),
    perq AS (
      SELECT query_id, CAST(sum(tq) AS BIGINT) AS err_q
      FROM terms GROUP BY 1),
    nrel AS (
      SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel FROM rel GROUP BY 1)
    SELECT n.query_id, n.n_rel,
           CAST(COALESCE(p.err_q, 0) AS BIGINT) AS err_q,
           round(COALESCE(p.err_q, 0) / {hy.ERR_SCALE}.0, 6) + 0.0 AS err
    FROM nrel n LEFT JOIN perq p USING (query_id)
    """


@_stage("q_err_eval", _err_oracle())
def q_err_eval(spark, sf_dir):
    """Expected Reciprocal Rank (cascade-model metric) of the lexical
    ranker against semantic pseudo-relevance (operators/hybrid.
    err_eval) — completes the IR-eval battery beside nDCG / MRR-MAP /
    RBP with the one metric that models a user STOPPING at a satisfying
    hit; the stop-probability products stay exact via dyadic integer
    numerators in a window ``product``."""
    from nonconsumptive_spark.operators.hybrid import err_eval
    from nonconsumptive_spark.queries.hybrid import _N_Q

    return err_eval(load(spark, sf_dir, "documents"),
                    load(spark, sf_dir, "embeddings"), n_queries=_N_Q)


# -- Bradley-Terry preference strengths over sources -------------------------
def _bt_oracle() -> str:
    from nonconsumptive_spark.operators.evaluation import (
        BT_P_FLOOR, BT_Q, BT_ROUNDS)

    rounds = []
    prev = "p0"
    for t in range(1, BT_ROUNDS + 1):
        rounds.append(f"""
    s{t} AS MATERIALIZED (
      SELECT g.i, CAST(sum(CAST(floor({BT_Q}.0
                 * (CAST(g.nij AS DOUBLE) / g.n_tot)
                 / (a.p + b.p)) AS BIGINT)) AS BIGINT) AS s_q
      FROM games g JOIN {prev} a ON a.i = g.i JOIN {prev} b ON b.i = g.j
      GROUP BY g.i),
    r{t} AS MATERIALIZED (
      SELECT s.i, CAST(floor({BT_Q}.0
                 * ((CAST(w.w_tot AS DOUBLE) / w.n_tot)
                    / (s.s_q / {BT_Q}.0))) AS BIGINT) AS praw_q
      FROM s{t} s JOIN wtot w ON w.i = s.i),
    z{t} AS MATERIALIZED (SELECT CAST(sum(praw_q) AS BIGINT) AS z_q
      FROM r{t}),
    p{t} AS MATERIALIZED (
      SELECT i, praw_q, greatest(praw_q / z_q, {BT_P_FLOOR}) AS p
      FROM r{t} CROSS JOIN z{t})""")
        prev = f"p{t}"
    return f"""
    WITH hist AS (
      SELECT source, CAST(floor(n_chars / 100.0) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2),
    per_dir AS (
      SELECT a.source AS i, b.source AS j,
             CAST(sum(a.c * b.c) AS BIGINT) AS w
      FROM hist a JOIN hist b ON a.b > b.b AND a.source <> b.source
      GROUP BY 1, 2),
    und AS (
      SELECT least(i, j) AS lo, greatest(i, j) AS hi,
             CAST(sum(CASE WHEN i < j THEN w ELSE 0 END) AS BIGINT) AS w_lh,
             CAST(sum(CASE WHEN i > j THEN w ELSE 0 END) AS BIGINT) AS w_hl
      FROM per_dir GROUP BY 1, 2),
    ntot AS (SELECT CAST(sum(w_lh + w_hl) AS BIGINT) AS n_tot FROM und),
    games AS MATERIALIZED (
      SELECT lo AS i, hi AS j, w_lh AS wij,
             w_lh + w_hl AS nij, n_tot
      FROM und CROSS JOIN ntot
      UNION ALL
      SELECT hi, lo, w_hl, w_lh + w_hl, n_tot FROM und CROSS JOIN ntot),
    wtot AS MATERIALIZED (
      SELECT i, CAST(sum(wij) AS BIGINT) AS w_tot,
             CAST(sum(nij) AS BIGINT) AS n_games,
             CAST(max(n_tot) AS BIGINT) AS n_tot
      FROM games GROUP BY i),
    mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM wtot),
    p0 AS MATERIALIZED (SELECT i, 1.0 / m AS p
      FROM wtot CROSS JOIN mm),{','.join(rounds)}
    SELECT p.i AS item, w.w_tot AS n_wins, w.n_games,
           round(p.p, 6) + 0.0 AS strength,
           CAST(row_number() OVER (ORDER BY p.praw_q DESC, p.i ASC)
                AS BIGINT) AS bt_rank
    FROM {prev} p JOIN wtot w ON w.i = p.i
    """


@_stage("q_bradley_terry", _bt_oracle())
def q_bradley_terry(spark, sf_dir):
    """Bradley-Terry strengths over sources from exact pairwise
    length-dominance wins (operators/evaluation.bradley_terry) — the
    preference-aggregation primitive of RLHF data pipelines.  Win counts
    come from a per-source LENGTH-BUCKET histogram join (sum over bucket
    pairs b_a > b_b of c_a*c_b = exact #cross-pairs where a's doc is
    longer), so the corpus collapses to #sources x #buckets rows before
    any pairing; the MM fixpoint then runs on the #sources^2 spine with
    BIGINT-quantized sums per round."""
    docs = load(spark, sf_dir, "documents")
    hist = docs.groupBy(
        "source",
        F.floor(F.col("n_chars") / F.lit(100.0)).cast("long").alias("b"),
    ).agg(F.count("*").cast("long").alias("c"))
    ha = hist.select(F.col("source").alias("i"), F.col("b").alias("ba"),
                     F.col("c").alias("ca"))
    hb = hist.select(F.col("source").alias("j"), F.col("b").alias("bb"),
                     F.col("c").alias("cb"))
    per_dir = (
        ha.join(F.broadcast(hb),
                (F.col("ba") > F.col("bb")) & (F.col("i") != F.col("j")))
        .groupBy("i", "j")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("w"))
    )
    from nonconsumptive_spark.operators.evaluation import bradley_terry

    return bradley_terry(per_dir, item_col="i", opp_col="j", wins_col="w")


# -- Jelinek-Mercer query likelihood ----------------------------------------
_JM_TERMS = ["table", "merge", "window"]
_JM_K = 10


def _jm_oracle() -> str:
    from nonconsumptive_spark.operators.retrieval import JM_LAMBDA as lam

    toks = ("list_filter(regexp_split_to_array(lower(text), '[^\\pL]+'),"
            " x -> x <> '')")
    terms_in = "(" + ", ".join(f"'{t}'" for t in sorted(_JM_TERMS)) + ")"
    return f"""
    WITH base AS (SELECT doc_id, {toks} AS t FROM documents),
    lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM base),
    cc AS (SELECT CAST(sum(dl) AS BIGINT) AS cc FROM lens),
    tf AS (
      SELECT z.doc_id, l.dl, z.token, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(t) AS token FROM base) z
      JOIN lens l ON l.doc_id = z.doc_id
      WHERE z.token IN {terms_in}
      GROUP BY 1, 2, 3),
    cfq AS (
      SELECT token, cf, cc,
             CAST(floor(1000000000.0 * ln({lam} * cf / cc)) AS BIGINT)
               AS bg_q
      FROM (SELECT token, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1)
      CROSS JOIN cc),
    konst AS (SELECT CAST(sum(bg_q) AS BIGINT) AS k_q FROM cfq),
    per_doc AS (
      SELECT f.doc_id,
             CAST(sum(CAST(floor(1000000000.0
                    * ln({1.0 - lam} * f.tf / f.dl + {lam} * c.cf / c.cc))
                  AS BIGINT) - c.bg_q) AS BIGINT) AS dq,
             CAST(count(*) AS BIGINT) AS n_terms_matched
      FROM tf f JOIN cfq c USING (token) GROUP BY f.doc_id),
    scored AS (
      SELECT l.doc_id,
             CAST(COALESCE(p.n_terms_matched, 0) AS BIGINT)
               AS n_terms_matched,
             k.k_q + COALESCE(p.dq, 0) AS score_q
      FROM lens l LEFT JOIN per_doc p USING (doc_id) CROSS JOIN konst k)
    SELECT doc_id, n_terms_matched,
           round(score_q / 1000000000.0, 4) + 0.0 AS score
    FROM scored ORDER BY score_q DESC, doc_id ASC LIMIT {_JM_K}
    """


@_stage("q_lm_jm_topk", _jm_oracle())
def q_lm_jm_topk(spark, sf_dir):
    """Jelinek-Mercer query-likelihood top-k (operators/retrieval.
    query_likelihood_jm_topk) — completes the classic sparse-ranker
    trio beside BM25 and Dirichlet QL; fixed-mixture smoothing, no
    per-doc length penalty, same quantized-ln exactness and
    TakeOrderedAndProject cut."""
    from nonconsumptive_spark.operators.retrieval import (
        query_likelihood_jm_topk)

    return query_likelihood_jm_topk(load(spark, sf_dir, "documents"),
                                    _JM_TERMS, k=_JM_K)


# -- exact Shapley-value conversion attribution ------------------------------
_SHAP_CONV = "purchase"
_SHAP_CHANNELS = ["click", "error", "signup", "view"]  # sorted; idx = pos


def _shap_consts():
    import math

    n = len(_SHAP_CHANNELS)
    spine = [(c, i, 1 << i) for i, c in enumerate(_SHAP_CHANNELS)]
    weights = [(s, math.factorial(s) * math.factorial(n - 1 - s))
               for s in range(n)]
    return n, spine, weights, math.factorial(n), 1 << n


def _shap_oracle() -> str:
    n, spine, weights, nfact, ns = _shap_consts()
    sp = ", ".join(f"('{c}', {i}, {b})" for c, i, b in spine)
    wt = ", ".join(f"({s}, {w})" for s, w in weights)
    return f"""
    WITH ch(channel, idx, bit) AS (VALUES {sp}),
    wt(sz, w) AS (VALUES {wt}),
    conv AS (
      SELECT user_id, min(ts) AS fp_ts FROM events
      WHERE event_type = '{_SHAP_CONV}' GROUP BY user_id),
    touched AS (
      SELECT DISTINCT e.user_id, c.bit
      FROM events e JOIN conv v ON v.user_id = e.user_id
      JOIN ch c ON c.channel = e.event_type
      WHERE e.ts < v.fp_ts),
    masks AS (
      SELECT v.user_id,
             CAST(coalesce(t.m, 0) AS BIGINT) AS m
      FROM conv v LEFT JOIN (
        SELECT user_id, CAST(sum(bit) AS BIGINT) AS m
        FROM touched GROUP BY user_id) t ON t.user_id = v.user_id),
    cnt AS (SELECT m, CAST(count(*) AS BIGINT) AS c FROM masks GROUP BY m),
    subs AS (SELECT unnest(range(0, {ns})) AS sm),
    v AS (
      SELECT s.sm, CAST(coalesce(sum(c.c), 0) AS BIGINT) AS val
      FROM subs s LEFT JOIN cnt c ON (c.m & s.sm) = c.m
      GROUP BY s.sm),
    phi AS (
      SELECT h.channel,
             CAST(sum(w.w * (v1.val - v0.val)) AS BIGINT) AS phi_num
      FROM ch h
      JOIN subs s ON (s.sm & h.bit) = 0
      JOIN wt w ON w.sz = bit_count(CAST(s.sm AS BIT))
      JOIN v v0 ON v0.sm = s.sm
      JOIN v v1 ON v1.sm = s.sm + h.bit
      GROUP BY h.channel)
    SELECT channel, phi_num,
           round(phi_num / {nfact}.0, 6) + 0.0 AS phi
    FROM phi
    """


@_stage("q_shapley_attribution", _shap_oracle())
def q_shapley_attribution(spark, sf_dir):
    """EXACT Shapley-value attribution of conversions to touch channels
    — the game-theoretic gold standard last/first-touch heuristics
    approximate.  Coalition value v(S) = #converting users whose
    pre-conversion touched-channel set is within S (monotone by
    construction); with #channels = 4 the 2^4 coalition lattice is an
    enumerable spine, and phi_c * n! = sum over subsets of
    |S|!(n-1-|S|)! * [v(S+c) - v(S)] is pure BIGINT arithmetic with
    factorial weights entering as shared literals.  Scale: the corpus
    collapses to per-user touch masks in one distinct+sum agg; every
    frame after ``cnt`` is 2^n-bounded."""
    n, spine, weights, nfact, ns = _shap_consts()
    ch = F.broadcast(spark.createDataFrame(
        spine, "channel string, idx int, bit long"))
    wt = F.broadcast(spark.createDataFrame(weights, "sz int, w long"))
    ev = load(spark, sf_dir, "events")
    conv = (ev.filter(F.col("event_type") == _SHAP_CONV)
            .groupBy("user_id").agg(F.min("ts").alias("fp_ts")))
    touched = (
        ev.join(conv, "user_id")
        .join(ch, ev["event_type"] == ch["channel"])
        .filter(F.col("ts") < F.col("fp_ts"))
        .select("user_id", "bit").distinct()
    )
    masks = (
        conv.join(touched.groupBy("user_id")
                  .agg(F.sum("bit").cast("long").alias("m")),
                  "user_id", "left")
        .select("user_id", F.coalesce("m", F.lit(0)).cast("long").alias("m"))
    )
    cnt = masks.groupBy("m").agg(F.count("*").cast("long").alias("c"))
    subs = spark.range(0, ns).select(F.col("id").cast("long").alias("sm"))
    v = (
        subs.join(F.broadcast(cnt),
                  F.col("m").bitwiseAND(F.col("sm")) == F.col("m"), "left")
        .groupBy("sm")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("val"))
    )
    from nonconsumptive_spark.plans.checkpoint import materialize_once
    v = materialize_once(v, "shap_v")  # joined twice below
    v0 = v.select(F.col("sm").alias("sm0"), F.col("val").alias("val0"))
    v1 = v.select(F.col("sm").alias("sm1"), F.col("val").alias("val1"))
    phi = (
        ch.join(F.broadcast(subs),
                F.col("sm").bitwiseAND(F.col("bit")) == 0)
        .join(F.broadcast(wt), F.bit_count("sm") == F.col("sz"))
        .join(F.broadcast(v0), F.col("sm0") == F.col("sm"))
        .join(F.broadcast(v1), F.col("sm1") == F.col("sm") + F.col("bit"))
        .groupBy("channel")
        .agg(F.sum(F.col("w") * (F.col("val1") - F.col("val0")))
             .cast("long").alias("phi_num"))
    )
    return phi.select(
        "channel", "phi_num",
        (F.round(F.col("phi_num") / F.lit(float(nfact)), 6)
         + F.lit(0.0)).alias("phi"),
    )


# -- Nelson-Aalen cumulative hazard (companion to Kaplan-Meier) --------------
_NA_CENS_DAYS = 7  # same censoring convention as q_kaplan_meier


@_stage(
    "q_nelson_aalen",
    f"""
    WITH pu AS (
      SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
      FROM events GROUP BY user_id),
    obs AS (SELECT max(ts) AS end_ts FROM events),
    durs AS (
      SELECT CAST(date_diff('day', CAST(first_ts AS DATE),
                            CAST(last_ts AS DATE)) AS BIGINT) AS dur,
             (last_ts < end_ts - INTERVAL {_NA_CENS_DAYS} DAY) AS observed
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
      SELECT dur, n_risk, n_event,
             CAST(floor(1000000000.0 * CAST(n_event AS DOUBLE) / n_risk)
                  AS BIGINT) AS term
      FROM risk),
    haz AS (
      SELECT dur, n_risk, n_event,
             CAST(sum(term) OVER (ORDER BY dur) AS BIGINT) AS na_q
      FROM terms)
    SELECT dur, n_risk, n_event, na_q,
           round(na_q / 1000000000.0, 6) + 0.0 AS cum_hazard,
           round(exp(-(na_q / 1000000000.0)), 6) + 0.0 AS na_survival
    FROM haz
    """,
)
def q_nelson_aalen(spark, sf_dir):
    """Nelson-Aalen cumulative hazard over user lifetimes (same
    censoring convention as q_kaplan_meier): H(t) = sum d_i/n_i with
    each increment floor-quantized to a 1e-9 BIGINT before the
    cumulative window sum, plus the Breslow survival exp(-H) — the
    hazard-scale companion the KM product-limit can't give (H is
    additive, so per-cohort hazards subtract cleanly).  Plan: one user
    agg, a 1-row end-of-observation attach, and windows over the
    #distinct-durations spine."""
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
         < F.col("end_ts") - F.expr(f"INTERVAL {_NA_CENS_DAYS} DAYS"))
        .alias("observed"),
    )
    durs = materialize_once(durs, "na_durs")  # feeds the table AND the total
    tot = durs.agg(F.count("*").cast("long").alias("n_users"))
    tbl = durs.groupBy("dur").agg(
        F.count("*").cast("long").alias("n_all"),
        F.sum(F.col("observed").cast("long")).cast("long").alias("n_event"),
    )
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
        F.floor(F.lit(1e9) * F.col("n_event").cast("double")
                / F.col("n_risk")).cast("long").alias("term"),
    )
    haz = terms.select(
        "dur", "n_risk", "n_event",
        F.sum("term").over(w_cum).cast("long").alias("na_q"),
    )
    return haz.select(
        "dur", "n_risk", "n_event", "na_q",
        (F.round(F.col("na_q") / F.lit(1e9), 6) + F.lit(0.0))
        .alias("cum_hazard"),
        (F.round(F.exp(-(F.col("na_q") / F.lit(1e9))), 6) + F.lit(0.0))
        .alias("na_survival"),
    )


# -- difference-in-differences readout ---------------------------------------
def _did_cell(tag: str, cond: str) -> str:
    return (f"CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_{tag},\n"
            f"             CAST(sum(CASE WHEN {cond} THEN xq ELSE 0 END)"
            f" AS BIGINT) AS s_{tag},\n"
            f"             CAST(sum(CASE WHEN {cond} THEN xq * xq ELSE 0 END)"
            f" AS BIGINT) AS ss_{tag}")


_DID_M = {t: f"(CAST(s_{t} AS DOUBLE) / n_{t})"
          for t in ("tp", "t0", "cp", "c0")}
_DID_V = {t: f"((CAST(ss_{t} AS DOUBLE)"
             f" - CAST(s_{t} AS DOUBLE) * s_{t} / n_{t}) / (n_{t} - 1))"
          for t in ("tp", "t0", "cp", "c0")}
_DID_EST = (f"(({_DID_M['tp']} - {_DID_M['t0']})"
            f" - ({_DID_M['cp']} - {_DID_M['c0']}))")
_DID_SE = ("sqrt(((({v_tp} / n_tp + {v_t0} / n_t0) + {v_cp} / n_cp)"
           " + {v_c0} / n_c0))".format(
               v_tp=_DID_V["tp"], v_t0=_DID_V["t0"],
               v_cp=_DID_V["cp"], v_c0=_DID_V["c0"]))


@_stage(
    "q_did_readout",
    f"""
    WITH span AS (
      SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      FROM events),
    base AS (
      SELECT CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) AS xq,
             CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treat,
             CASE WHEN 2 * date_diff('day', d0, CAST(ts AS DATE))
                       >= date_diff('day', d0, d1) + 1
                  THEN 1 ELSE 0 END AS post
      FROM events CROSS JOIN span),
    cells AS (
      SELECT {_did_cell('tp', 'treat = 1 AND post = 1')},
             {_did_cell('t0', 'treat = 1 AND post = 0')},
             {_did_cell('cp', 'treat = 0 AND post = 1')},
             {_did_cell('c0', 'treat = 0 AND post = 0')}
      FROM base)
    SELECT n_tp, n_t0, n_cp, n_c0,
           round({_DID_EST} / 100.0, 6) + 0.0 AS did,
           round({_DID_SE} / 100.0, 6) + 0.0 AS se,
           round({_DID_EST} / {_DID_SE}, 6) + 0.0 AS t_stat
    FROM cells
    """,
)
def q_did_readout(spark, sf_dir):
    """Difference-in-differences readout over the events table:
    treatment = odd user_id, post = second half of the observation
    window (integer date arithmetic on both engines), outcome = event
    value in exact cents.  The 2x2 cell moments are ONE conditional
    BIGINT agg; the DiD point estimate, its Welch-style pooled SE
    sqrt(sum v_i/n_i), and the t-statistic are mirrored float chains
    over those integers — the quasi-experimental companion to
    q_cuped_abtest (which removes pre-period variance; DiD removes
    group-level level differences).  Plan: one scan, one 1-row agg."""
    ev = load(spark, sf_dir, "events")
    span = ev.agg(F.min(F.to_date("ts")).alias("d0"),
                  F.max(F.to_date("ts")).alias("d1"))
    base = ev.crossJoin(F.broadcast(span)).select(
        F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100
                + F.lit(0.5)).cast("long").alias("xq"),
        F.when(F.col("user_id") % 2 == 1, F.lit(1)).otherwise(F.lit(0))
        .alias("treat"),
        F.when(
            F.lit(2) * F.datediff(F.to_date("ts"), F.col("d0"))
            >= F.datediff(F.col("d1"), F.col("d0")) + F.lit(1),
            F.lit(1)).otherwise(F.lit(0)).alias("post"),
    )

    def cell(tag, t, p):
        c = (F.col("treat") == t) & (F.col("post") == p)
        return [
            F.sum(F.when(c, 1).otherwise(0)).cast("long").alias(f"n_{tag}"),
            F.sum(F.when(c, F.col("xq")).otherwise(0)).cast("long")
            .alias(f"s_{tag}"),
            F.sum(F.when(c, F.col("xq") * F.col("xq")).otherwise(0))
            .cast("long").alias(f"ss_{tag}"),
        ]

    cells = base.agg(*(cell("tp", 1, 1) + cell("t0", 1, 0)
                       + cell("cp", 0, 1) + cell("c0", 0, 0)))
    return cells.selectExpr(
        "n_tp", "n_t0", "n_cp", "n_c0",
        f"round({_DID_EST} / 100.0, 6) + 0.0 AS did",
        f"round({_DID_SE} / 100.0, 6) + 0.0 AS se",
        f"round({_DID_EST} / {_DID_SE}, 6) + 0.0 AS t_stat",
    )


# -- link-prediction panel: common neighbors / RA index / Jaccard ------------
def _lp_oracle() -> str:
    from nonconsumptive_spark.operators.graph import AA_MAX_MIDDLE_DEG, RA_SCALE
    from nonconsumptive_spark.queries.promoted import _DUCK_UND

    return f"""
    WITH {_DUCK_UND},
    deg AS MATERIALIZED (
      SELECT src AS mid, CAST(count(*) AS BIGINT) AS deg
      FROM und GROUP BY src),
    mids AS (
      SELECT mid, CAST(floor({RA_SCALE}.0 / deg) AS BIGINT) AS w
      FROM deg WHERE deg >= 2 AND deg <= {AA_MAX_MIDDLE_DEG}),
    adj AS MATERIALIZED (
      SELECT u.src AS mid, u.dst AS leaf, m.w
      FROM und u JOIN mids m ON u.src = m.mid),
    p AS (
      SELECT a.leaf AS node_a, b.leaf AS node_b,
             CAST(count(*) AS BIGINT) AS common_neighbors,
             CAST(sum(a.w) AS BIGINT) AS ws
      FROM adj a JOIN adj b ON a.mid = b.mid AND a.leaf < b.leaf
      GROUP BY 1, 2
      HAVING count(*) >= 2)
    SELECT p.node_a, p.node_b, p.common_neighbors,
           round(CAST(p.ws AS DOUBLE) / {RA_SCALE}, 6) + 0.0 AS ra_score,
           round(CAST(p.common_neighbors AS DOUBLE)
                 / (da.deg + db.deg - p.common_neighbors), 6) + 0.0
             AS jaccard
    FROM p
    JOIN deg da ON da.mid = p.node_a
    JOIN deg db ON db.mid = p.node_b
    WHERE NOT EXISTS (SELECT 1 FROM und u
                      WHERE u.src = p.node_a AND u.dst = p.node_b)
    """


@_stage("q_link_prediction", _lp_oracle())
def q_link_prediction(spark, sf_dir):
    """Common-neighbors / Resource-Allocation / degree-capped-wedge
    Jaccard link-prediction panel over the token graph (operators/graph.
    link_prediction_panel) — the two classic predictors q_adamic_adar
    leaves out, on its exact candidate discipline (degree-capped wedge
    join, non-edge anti-join); RA weights are floor-quantized single
    divisions.  The Jaccard numerator counts only wedge-reachable common
    neighbors (middles with deg <= cap) over full-degree denominators —
    an underestimate for hub-sharing pairs, documented in the operator."""
    from nonconsumptive_spark.operators.graph import (
        bigram_edges, link_prediction_panel)

    return link_prediction_panel(bigram_edges(load(spark, sf_dir,
                                                   "documents")))


# -- ARI + Coleman-Liau readability panel ------------------------------------
def _ari_oracle() -> str:
    from nonconsumptive_spark.queries.promoted import _runs_duck

    toks = ("len(list_filter(regexp_split_to_array(coalesce(text, ''),"
            " '[^\\pL]+'), x -> x <> ''))")
    return f"""
    WITH base AS (
      SELECT doc_id,
             CAST(length(regexp_replace(coalesce(text, ''),
                  '[^\\pL\\pN]', '', 'g')) AS BIGINT) AS n_an,
             CAST({toks} AS BIGINT) AS n_words,
             CAST(greatest(1, {_runs_duck("coalesce(text, '')",
                                          "[.!?]+", ".")})
                  AS BIGINT) AS n_sentences
      FROM documents)
    SELECT doc_id, n_an, n_words, n_sentences,
           CASE WHEN n_words > 0
                THEN round((4.71 * CAST(n_an AS DOUBLE) / n_words
                            + 0.5 * CAST(n_words AS DOUBLE) / n_sentences)
                           - 21.43, 3) + 0.0 END AS ari,
           CASE WHEN n_words > 0
                THEN round((0.0588 * (100.0 * CAST(n_an AS DOUBLE) / n_words)
                            - 0.296 * (100.0 * CAST(n_sentences AS DOUBLE)
                                       / n_words))
                           - 15.8, 3) + 0.0 END AS cli
    FROM base
    """


@_stage("q_readability_panel", _ari_oracle())
def q_readability_panel(spark, sf_dir):
    """Automated Readability Index + Coleman-Liau per document — the two
    SYLLABLE-FREE readability formulas (char/word/sentence counts only),
    completing the panel beside Flesch/FK (vowel-run syllables) and
    Gunning fog: ARI and CLI are the formulas of choice where syllable
    approximation is unreliable (code-mixed or non-English text).  All
    three counts are exact integers; both scores are single mirrored
    float chains.  Plan: zero-shuffle per-row scan."""
    from nonconsumptive_spark.functions.text import tokenize

    def runs(col, cls, marker):
        return F.length(F.regexp_replace(
            F.regexp_replace(col, cls, marker), "[^" + marker + "]", ""))

    txt = F.coalesce(F.col("text"), F.lit(""))
    base = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.length(F.regexp_replace(txt, "[^\\p{L}\\p{N}]", ""))
        .cast("long").alias("n_an"),
        F.size(tokenize(txt)).cast("long").alias("n_words"),
        F.greatest(F.lit(1), runs(txt, "[.!?]+", ".")).cast("long")
        .alias("n_sentences"),
    )
    nw = F.col("n_words").cast("double")
    return base.select(
        "doc_id", "n_an", "n_words", "n_sentences",
        F.when(F.col("n_words") > 0, F.round(
            (F.lit(4.71) * F.col("n_an").cast("double") / F.col("n_words")
             + F.lit(0.5) * nw / F.col("n_sentences"))
            - F.lit(21.43), 3) + F.lit(0.0)).alias("ari"),
        F.when(F.col("n_words") > 0, F.round(
            (F.lit(0.0588)
             * (F.lit(100.0) * F.col("n_an").cast("double")
                / F.col("n_words"))
             - F.lit(0.296)
             * (F.lit(100.0) * F.col("n_sentences").cast("double")
                / F.col("n_words")))
            - F.lit(15.8), 3) + F.lit(0.0)).alias("cli"),
    )


# -- Gries' DP (deviation of proportions) dispersion -------------------------
_DP_TOP = 20
_DP_SCALE = 10**9


@_stage(
    "q_gries_dp",
    f"""
    WITH counts AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS v
      FROM (SELECT source, unnest({_DUCK_TOKS}) AS token FROM documents) z
      GROUP BY 1, 2),
    f AS (SELECT token, CAST(sum(v) AS BIGINT) AS f FROM counts
          GROUP BY token),
    top AS (
      SELECT token, f FROM (
        SELECT token, f,
               row_number() OVER (ORDER BY f DESC, token ASC) AS rn
        FROM f) z WHERE rn <= {_DP_TOP}),
    parts AS (SELECT source, CAST(sum(v) AS BIGINT) AS p_toks
              FROM counts GROUP BY source),
    tot AS (SELECT CAST(sum(p_toks) AS BIGINT) AS t_toks,
                   CAST(min(p_toks) AS BIGINT) AS min_toks FROM parts),
    grid AS (
      SELECT t.token, t.f, p.source, p.p_toks,
             CAST(coalesce(c.v, 0) AS BIGINT) AS v
      FROM top t CROSS JOIN parts p
      LEFT JOIN counts c ON c.token = t.token AND c.source = p.source),
    terms AS (
      SELECT g.token, g.f, o.t_toks, o.min_toks,
             CAST(floor({_DP_SCALE}.0
                  * abs(CAST(g.v AS DOUBLE) / g.f
                        - CAST(g.p_toks AS DOUBLE) / o.t_toks))
                  AS BIGINT) AS tq
      FROM grid g CROSS JOIN tot o),
    agg AS (
      SELECT token, f, t_toks, min_toks,
             CAST(sum(tq) AS BIGINT) AS s_q
      FROM terms GROUP BY 1, 2, 3, 4)
    SELECT token, f,
           round(s_q / {2 * _DP_SCALE}.0, 6) + 0.0 AS dp,
           round((s_q / {2 * _DP_SCALE}.0)
                 / (1.0 - CAST(min_toks AS DOUBLE) / t_toks), 6) + 0.0
             AS dp_norm
    FROM agg
    """,
)
def q_gries_dp(spark, sf_dir):
    """Gries' DP corpus dispersion for the top-{_DP_TOP} terms: DP =
    0.5 * sum over parts |share-of-term-in-part - share-of-part-size|,
    with the min-part normalization DPnorm — the modern standard beside
    Juilland's D (q_juilland_dispersion): DP handles UNEQUAL part sizes
    exactly, where Juilland assumes near-equal chunks.  Parts are
    sources; every share is a single division over exact BIGINT counts
    and the per-part deviations floor-quantize before the sum.  Plan:
    one (source, token) agg feeds term totals, part totals AND the
    grid; the grid itself is top-K x #sources — spine-bounded."""
    from pyspark.sql import Window

    from nonconsumptive_spark.functions.text import tokenize
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.select("source", F.explode(tokenize(F.col("text")))
                    .alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").cast("long").alias("v"))
    )
    counts = materialize_once(counts, "dp_counts")  # f, parts AND grid
    f = counts.groupBy("token").agg(F.sum("v").cast("long").alias("f"))
    # head cut as orderBy + limit (r8): the rank was dropped right after
    # the filter, so TakeOrderedAndProject replaces a single-partition
    # row_number window over the full vocabulary (ties are impossible —
    # token is unique — so the cut is the same deterministic set)
    top = (f.orderBy(F.desc("f"), F.asc("token")).limit(_DP_TOP)
           .select("token", "f"))
    parts = counts.groupBy("source").agg(
        F.sum("v").cast("long").alias("p_toks"))
    tot = parts.agg(F.sum("p_toks").cast("long").alias("t_toks"),
                    F.min("p_toks").cast("long").alias("min_toks"))
    grid = (
        top.crossJoin(F.broadcast(parts))
        .join(counts, ["token", "source"], "left")
        .select("token", "f", "p_toks",
                F.coalesce("v", F.lit(0)).cast("long").alias("v"))
        .crossJoin(F.broadcast(tot))
    )
    terms = grid.select(
        "token", "f", "t_toks", "min_toks",
        F.floor(F.lit(float(_DP_SCALE)) * F.abs(
            F.col("v").cast("double") / F.col("f")
            - F.col("p_toks").cast("double") / F.col("t_toks")))
        .cast("long").alias("tq"),
    )
    agg = terms.groupBy("token", "f", "t_toks", "min_toks").agg(
        F.sum("tq").cast("long").alias("s_q"))
    return agg.select(
        "token", "f",
        (F.round(F.col("s_q") / F.lit(float(2 * _DP_SCALE)), 6)
         + F.lit(0.0)).alias("dp"),
        (F.round((F.col("s_q") / F.lit(float(2 * _DP_SCALE)))
                 / (F.lit(1.0) - F.col("min_toks").cast("double")
                    / F.col("t_toks")), 6) + F.lit(0.0)).alias("dp_norm"),
    )


# -- empirical-Bayes beta-binomial shrinkage of per-user rates ---------------
_EB_SCALE = 10**6  # rate quantization; rq^2 sums stay far below 2^63


@_stage(
    "q_eb_shrinkage",
    f"""
    WITH pu AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM events GROUP BY user_id),
    q AS (SELECT user_id, n, x,
                 CAST(floor({_EB_SCALE}.0 * x / n) AS BIGINT) AS rq
          FROM pu),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(rq) AS BIGINT) AS s,
             CAST(sum(rq * rq) AS BIGINT) AS ss
      FROM q),
    prior AS (
      SELECT m,
             (CAST(s AS DOUBLE) / m) / {_EB_SCALE}.0 AS mbar,
             ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / m) / (m - 1))
               / {_EB_SCALE * _EB_SCALE}.0 AS varr
      FROM mom),
    k AS (
      SELECT m, mbar, varr,
             CASE WHEN varr > 0
                       AND mbar * (1.0 - mbar) / varr - 1.0 > 0
                  THEN mbar * (1.0 - mbar) / varr - 1.0
                  ELSE 1.0 END AS kap
      FROM prior)
    SELECT q.user_id, q.x, q.n,
           round(CAST(q.x AS DOUBLE) / q.n, 6) + 0.0 AS raw_rate,
           round((q.x + k.mbar * k.kap) / (q.n + k.kap), 6) + 0.0
             AS shrunk_rate
    FROM q CROSS JOIN k
    """,
)
def q_eb_shrinkage(spark, sf_dir):
    """Empirical-Bayes beta-binomial shrinkage of per-user purchase
    rates: the method-of-moments prior (alpha = mbar*kappa, kappa from
    the mean/variance of quantized user rates) pulls small-sample user
    rates toward the population mean — the estimator that makes
    per-entity rate rankings usable (raw rates make 1/1 beat 95/100).
    Rates quantize to 1e6 BIGINTs so the cross-user moment sums are
    exact; every float after is a mirrored chain over the 1-row prior
    attach.  Plan: one user agg, one 1-row moment agg, broadcast."""
    ev = load(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long").alias("x"),
    )
    q = pu.select(
        "user_id", "n", "x",
        F.floor(F.lit(float(_EB_SCALE)) * F.col("x") / F.col("n"))
        .cast("long").alias("rq"),
    )
    from nonconsumptive_spark.plans.checkpoint import materialize_once
    q = materialize_once(q, "eb_q")  # feeds the moments AND the output
    mom = q.agg(F.count("*").cast("long").alias("m"),
                F.sum("rq").cast("long").alias("s"),
                F.sum(F.col("rq") * F.col("rq")).cast("long").alias("ss"))
    prior = mom.select(
        "m",
        ((F.col("s").cast("double") / F.col("m")) / F.lit(float(_EB_SCALE)))
        .alias("mbar"),
        (((F.col("ss").cast("double")
           - F.col("s").cast("double") * F.col("s") / F.col("m"))
          / (F.col("m") - 1)) / F.lit(float(_EB_SCALE * _EB_SCALE)))
        .alias("varr"),
    )
    kraw = F.col("mbar") * (F.lit(1.0) - F.col("mbar")) / F.col("varr") \
        - F.lit(1.0)
    k = prior.select(
        "mbar",
        F.when((F.col("varr") > 0) & (kraw > 0), kraw)
        .otherwise(F.lit(1.0)).alias("kap"),
    )
    return q.crossJoin(F.broadcast(k)).select(
        "user_id", "x", "n",
        (F.round(F.col("x").cast("double") / F.col("n"), 6)
         + F.lit(0.0)).alias("raw_rate"),
        (F.round((F.col("x") + F.col("mbar") * F.col("kap"))
                 / (F.col("n") + F.col("kap")), 6)
         + F.lit(0.0)).alias("shrunk_rate"),
    )


# -- covariate balance (standardized mean differences) -----------------------
_CB_COVS = ("n_events", "total_value_c", "n_active_days", "n_types")


@_stage(
    "q_covariate_balance",
    f"""
    WITH pu AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treat,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(floor(coalesce(value, 0) * 100 + 0.5)
                  AS BIGINT)) AS BIGINT) AS total_value_c,
             CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
               AS n_active_days,
             CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
      FROM events GROUP BY user_id),
    long AS (
      SELECT treat, 'n_events' AS covariate, n_events AS xq FROM pu
      UNION ALL
      SELECT treat, 'total_value_c', total_value_c FROM pu
      UNION ALL
      SELECT treat, 'n_active_days', n_active_days FROM pu
      UNION ALL
      SELECT treat, 'n_types', n_types FROM pu),
    mom AS (
      SELECT covariate,
             CAST(sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_t,
             CAST(sum(CASE WHEN treat = 1 THEN xq ELSE 0 END) AS BIGINT)
               AS s_t,
             CAST(sum(CASE WHEN treat = 1 THEN xq * xq ELSE 0 END)
                  AS BIGINT) AS ss_t,
             CAST(sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_c,
             CAST(sum(CASE WHEN treat = 0 THEN xq ELSE 0 END) AS BIGINT)
               AS s_c,
             CAST(sum(CASE WHEN treat = 0 THEN xq * xq ELSE 0 END)
                  AS BIGINT) AS ss_c
      FROM long GROUP BY covariate)
    SELECT covariate, n_t, n_c,
           round(CAST(s_t AS DOUBLE) / n_t, 6) + 0.0 AS mean_t,
           round(CAST(s_c AS DOUBLE) / n_c, 6) + 0.0 AS mean_c,
           CASE WHEN (((CAST(ss_t AS DOUBLE)
                        - CAST(s_t AS DOUBLE) * s_t / n_t) / (n_t - 1))
                      + ((CAST(ss_c AS DOUBLE)
                          - CAST(s_c AS DOUBLE) * s_c / n_c)
                         / (n_c - 1))) > 0 THEN
             round((CAST(s_t AS DOUBLE) / n_t - CAST(s_c AS DOUBLE) / n_c)
                   / sqrt((((CAST(ss_t AS DOUBLE)
                             - CAST(s_t AS DOUBLE) * s_t / n_t) / (n_t - 1))
                           + ((CAST(ss_c AS DOUBLE)
                               - CAST(s_c AS DOUBLE) * s_c / n_c)
                              / (n_c - 1))) / 2.0), 6) + 0.0
           END AS smd
    FROM mom
    """,
)
def q_covariate_balance(spark, sf_dir):
    """Covariate balance audit for the synthetic A/B assignment
    (treat = odd user_id): standardized mean difference (m_t - m_c) /
    sqrt((v_t + v_c)/2) for four user-level covariates — the |SMD| <
    0.1 randomization health check run before reading ANY experiment
    (a broken bucketing hash shows up here first, not in the outcome).
    Covariates are exact BIGINTs per user; one conditional moment agg
    per covariate row; every float is a mirrored chain.  Plan: one
    user agg, a 4-way unpivot union, one #covariates-row agg."""
    ev = load(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100
                      + F.lit(0.5)).cast("long"))
        .cast("long").alias("total_value_c"),
        F.countDistinct(F.to_date("ts")).cast("long").alias("n_active_days"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    ).withColumn(
        "treat",
        F.when(F.col("user_id") % 2 == 1, F.lit(1)).otherwise(F.lit(0)),
    )
    from nonconsumptive_spark.plans.checkpoint import materialize_once
    pu = materialize_once(pu, "cb_pu")  # feeds all four unpivot branches
    longf = None
    for cov in _CB_COVS:
        part = pu.select("treat", F.lit(cov).alias("covariate"),
                         F.col(cov).cast("long").alias("xq"))
        longf = part if longf is None else longf.unionByName(part)
    mom = longf.groupBy("covariate").agg(
        F.sum(F.when(F.col("treat") == 1, 1).otherwise(0)).cast("long")
        .alias("n_t"),
        F.sum(F.when(F.col("treat") == 1, F.col("xq")).otherwise(0))
        .cast("long").alias("s_t"),
        F.sum(F.when(F.col("treat") == 1, F.col("xq") * F.col("xq"))
              .otherwise(0)).cast("long").alias("ss_t"),
        F.sum(F.when(F.col("treat") == 0, 1).otherwise(0)).cast("long")
        .alias("n_c"),
        F.sum(F.when(F.col("treat") == 0, F.col("xq")).otherwise(0))
        .cast("long").alias("s_c"),
        F.sum(F.when(F.col("treat") == 0, F.col("xq") * F.col("xq"))
              .otherwise(0)).cast("long").alias("ss_c"),
    )
    vt = ((F.col("ss_t").cast("double")
           - F.col("s_t").cast("double") * F.col("s_t") / F.col("n_t"))
          / (F.col("n_t") - 1))
    vc = ((F.col("ss_c").cast("double")
           - F.col("s_c").cast("double") * F.col("s_c") / F.col("n_c"))
          / (F.col("n_c") - 1))
    return mom.select(
        "covariate", "n_t", "n_c",
        (F.round(F.col("s_t").cast("double") / F.col("n_t"), 6)
         + F.lit(0.0)).alias("mean_t"),
        (F.round(F.col("s_c").cast("double") / F.col("n_c"), 6)
         + F.lit(0.0)).alias("mean_c"),
        # zero pooled variance (a constant covariate) has no SMD scale —
        # explicit NULL on both engines instead of an implicit 0/0
        F.when((vt + vc) > 0, F.round(
            (F.col("s_t").cast("double") / F.col("n_t")
             - F.col("s_c").cast("double") / F.col("n_c"))
            / F.sqrt((vt + vc) / F.lit(2.0)), 6) + F.lit(0.0))
        .alias("smd"),
    )


# -- Qini uplift curve by targeting-score decile ------------------------------
@_stage(
    "q_qini_curve",
    """
    WITH pu AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treat,
             CAST(count(*) AS BIGINT) AS score,
             CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS conv
      FROM events GROUP BY user_id),
    ranked AS (
      SELECT treat, conv,
             CAST(row_number() OVER (ORDER BY score DESC, user_id ASC)
                  AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS m
      FROM pu),
    dec AS (
      SELECT CAST(floor(((rn - 1) * 10.0) / m) AS BIGINT) + 1 AS decile,
             CAST(sum(treat) AS BIGINT) AS n_t,
             CAST(sum(CASE WHEN treat = 1 THEN conv ELSE 0 END) AS BIGINT)
               AS conv_t,
             CAST(sum(1 - treat) AS BIGINT) AS n_c,
             CAST(sum(CASE WHEN treat = 0 THEN conv ELSE 0 END) AS BIGINT)
               AS conv_c
      FROM ranked GROUP BY 1),
    cum AS (
      SELECT decile,
             CAST(sum(n_t) OVER w AS BIGINT) AS n_t_cum,
             CAST(sum(conv_t) OVER w AS BIGINT) AS conv_t_cum,
             CAST(sum(n_c) OVER w AS BIGINT) AS n_c_cum,
             CAST(sum(conv_c) OVER w AS BIGINT) AS conv_c_cum
      FROM dec
      WINDOW w AS (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT decile, n_t_cum, conv_t_cum, n_c_cum, conv_c_cum,
           CASE WHEN n_c_cum > 0 THEN
             round(conv_t_cum
                   - CAST(conv_c_cum AS DOUBLE) * n_t_cum / n_c_cum, 6)
             + 0.0 END AS qini
    FROM cum
    """,
)
def q_qini_curve(spark, sf_dir):
    """Qini uplift curve: cumulative incremental conversions
    conv_t - conv_c * n_t/n_c by targeting-score decile (score =
    user activity, treat = odd user_id) — the standard read of WHO to
    target, completing the experiment battery beside q_cuped_abtest
    (average effect) and q_gain_chart (response ranking).  Deciles come
    from an integer rank formula (not engine ntile), cumulative counts
    are BIGINT window sums over the 10-row decile spine, and qini is
    one mirrored float chain.  Plan: one user agg, one global rank of
    the user frame (eval-sized), 10-row windows."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("score"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long").alias("conv"),
    ).withColumn(
        "treat",
        F.when(F.col("user_id") % 2 == 1, F.lit(1)).otherwise(F.lit(0)),
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = pu.select(
        "treat", "conv",
        F.row_number().over(Window.orderBy(F.desc("score"),
                                           F.asc("user_id")))
        .cast("long").alias("rn"),
        F.count("*").over(w_all).cast("long").alias("m"),
    )
    dec = ranked.groupBy(
        (F.floor(((F.col("rn") - 1) * F.lit(10.0)) / F.col("m"))
         .cast("long") + 1).alias("decile")
    ).agg(
        F.sum("treat").cast("long").alias("n_t"),
        F.sum(F.when(F.col("treat") == 1, F.col("conv")).otherwise(0))
        .cast("long").alias("conv_t"),
        F.sum(F.lit(1) - F.col("treat")).cast("long").alias("n_c"),
        F.sum(F.when(F.col("treat") == 0, F.col("conv")).otherwise(0))
        .cast("long").alias("conv_c"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding,
                                             Window.currentRow)
    cum = dec.select(
        "decile",
        F.sum("n_t").over(w).cast("long").alias("n_t_cum"),
        F.sum("conv_t").over(w).cast("long").alias("conv_t_cum"),
        F.sum("n_c").over(w).cast("long").alias("n_c_cum"),
        F.sum("conv_c").over(w).cast("long").alias("conv_c_cum"),
    )
    return cum.select(
        "decile", "n_t_cum", "conv_t_cum", "n_c_cum", "conv_c_cum",
        F.when(F.col("n_c_cum") > 0, F.round(
            F.col("conv_t_cum")
            - F.col("conv_c_cum").cast("double") * F.col("n_t_cum")
            / F.col("n_c_cum"), 6) + F.lit(0.0)).alias("qini"),
    )


# -- truncated harmonic centrality of top-degree tokens ----------------------
def _hc_oracle() -> str:
    from nonconsumptive_spark.operators.graph import (
        HC_MAX_DIST, HC_SCALE, HC_SEEDS)

    return f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_id, token AS src,
             lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS dst
      FROM (SELECT doc_id, generate_subscripts({_DUCK_TOKS}, 1) AS pos,
                   unnest({_DUCK_TOKS}) AS token FROM documents)),
    dedges AS (SELECT DISTINCT src, dst FROM pairs WHERE dst IS NOT NULL),
    und AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM dedges
        UNION ALL
        SELECT dst, src FROM dedges)
      WHERE src <> dst),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
            FROM und GROUP BY src),
    seeds AS MATERIALIZED (
      SELECT src AS seed, deg FROM (
        SELECT src, deg,
               row_number() OVER (ORDER BY deg DESC, src ASC) AS rn
        FROM deg) z WHERE rn <= {HC_SEEDS}),
    bfs(seed, node, dist) AS (
      SELECT seed, seed AS node, 0 AS dist FROM seeds
      UNION
      SELECT b.seed, e.dst, b.dist + 1
      FROM bfs b JOIN und e ON e.src = b.node
      WHERE b.dist < {HC_MAX_DIST}),
    md AS (
      SELECT seed, node, CAST(min(dist) AS BIGINT) AS dist
      FROM bfs GROUP BY 1, 2),
    harm AS (
      SELECT seed, CAST(count(*) AS BIGINT) AS n_reached,
             CAST(sum(CAST(floor({HC_SCALE}.0 / dist) AS BIGINT))
                  AS BIGINT) AS harm_q
      FROM md WHERE dist > 0 GROUP BY seed)
    SELECT s.seed, s.deg,
           CAST(coalesce(h.n_reached, 0) AS BIGINT) AS n_reached,
           CAST(coalesce(h.harm_q, 0) AS BIGINT) AS harm_q,
           round(coalesce(h.harm_q, 0) / {HC_SCALE}.0, 6) + 0.0 AS harmonic
    FROM seeds s LEFT JOIN harm h ON h.seed = s.seed
    """


@_stage("q_harmonic_centrality", _hc_oracle())
def q_harmonic_centrality(spark, sf_dir):
    """Hop-bounded harmonic centrality of the five highest-degree tokens
    (operators/graph.harmonic_centrality) — the disconnected-graph-safe
    closeness variant, via ONE multi-source BFS whose frontier carries
    the seed key (per round: one equi-join + one (seed, node) anti-join,
    lineage cut each round); contributions floor(1e9/d) sum as exact
    BIGINTs.  Oracle: DuckDB WITH RECURSIVE with the same hop bound."""
    from nonconsumptive_spark.operators.graph import (
        bigram_edges, harmonic_centrality)

    return harmonic_centrality(bigram_edges(load(spark, sf_dir,
                                                 "documents")))


# -- expected steps to conversion (absorbing Markov chain) -------------------
_ABS_TARGET = "purchase"
_ABS_ROUNDS = 8
_ABS_Q = 10**9


def _absorb_oracle() -> str:
    rounds = []
    prev = "v0"
    for t in range(1, _ABS_ROUNDS + 1):
        rounds.append(f"""
    v{t} AS MATERIALIZED (
      SELECT t.s,
             1.0 + CAST(sum(CAST(floor({_ABS_Q}.0
                      * ((CAST(t.c AS DOUBLE) / t.n_s)
                         * coalesce(p.v, 0.0))) AS BIGINT)) AS BIGINT)
                   / {_ABS_Q}.0 AS v
      FROM trn t LEFT JOIN {prev} p ON p.s = t.s2
      GROUP BY t.s)""")
        prev = f"v{t}"
    return f"""
    WITH ordered AS (
      SELECT user_id, event_type AS t1,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS t2
      FROM events),
    tr AS MATERIALIZED (
      SELECT t1 AS s, t2 AS s2, CAST(count(*) AS BIGINT) AS c
      FROM ordered
      WHERE t2 IS NOT NULL AND t1 <> '{_ABS_TARGET}'
      GROUP BY 1, 2),
    ns AS MATERIALIZED (
      SELECT s, CAST(sum(c) AS BIGINT) AS n_s FROM tr GROUP BY s),
    trn AS MATERIALIZED (
      SELECT t.s, t.s2, t.c, n.n_s FROM tr t JOIN ns n ON n.s = t.s),
    v0 AS (SELECT s, 0.0 AS v FROM ns),{','.join(rounds)}
    SELECT n.s AS state, n.n_s AS n_out,
           round(coalesce(pd.c, 0) / CAST(n.n_s AS DOUBLE), 6) + 0.0
             AS p_direct,
           round(vf.v, 6) + 0.0 AS exp_steps
    FROM ns n
    JOIN {prev} vf ON vf.s = n.s
    LEFT JOIN (SELECT s, c FROM tr WHERE s2 = '{_ABS_TARGET}') pd
      ON pd.s = n.s
    """


@_stage("q_markov_absorption", _absorb_oracle())
def q_markov_absorption(spark, sf_dir):
    """Expected steps to 'purchase' (_ABS_TARGET) from each event-type
    state under the empirical Markov chain (value iteration v <- 1 + P v,
    _ABS_ROUNDS=8 unrolled rounds, purchase absorbing at 0) — the
    funnel-depth read q_markov_stationary's long-run mix can't give: HOW
    FAR each state sits from conversion, conditional on chains that
    continue.  Each round's expectation terms floor-quantize to 1e-9
    BIGINTs before the per-state sum, so the fixpoint replays
    bit-identically; all frames after the transition agg are
    #states-bounded with a lineage cut per round."""
    from pyspark.sql import Window

    from nonconsumptive_spark.plans.checkpoint import materialize_once

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select("user_id", F.col("event_type").alias("t1"),
                        F.lead("event_type").over(w).alias("t2"))
    tr = (ordered.filter(F.col("t2").isNotNull()
                         & (F.col("t1") != _ABS_TARGET))
          .groupBy(F.col("t1").alias("s"), F.col("t2").alias("s2"))
          .agg(F.count("*").cast("long").alias("c")))
    tr = materialize_once(tr, "abs_tr")  # feeds ns, trn AND p_direct
    ns = tr.groupBy("s").agg(F.sum("c").cast("long").alias("n_s"))
    ns = materialize_once(ns, "abs_ns")
    trn = materialize_once(tr.join(ns, "s"), "abs_trn")
    v = ns.select("s", F.lit(0.0).alias("v"))
    for t in range(_ABS_ROUNDS):
        pv = v.select(F.col("s").alias("ps"), F.col("v").alias("pv"))
        v = (
            trn.join(F.broadcast(pv), trn["s2"] == pv["ps"], "left")
            .groupBy("s")
            .agg((F.lit(1.0) + F.sum(
                F.floor(F.lit(float(_ABS_Q))
                        * ((F.col("c").cast("double") / F.col("n_s"))
                           * F.coalesce(F.col("pv"), F.lit(0.0))))
                .cast("long")).cast("long") / F.lit(float(_ABS_Q)))
                .alias("v"))
        )
        v = materialize_once(v, f"abs_v{t}")
    pd = tr.filter(F.col("s2") == _ABS_TARGET).select("s", "c")
    return (
        ns.join(v, "s")
        .join(F.broadcast(pd), "s", "left")
        .select(
            F.col("s").alias("state"),
            F.col("n_s").alias("n_out"),
            (F.round(F.coalesce("c", F.lit(0))
                     / F.col("n_s").cast("double"), 6)
             + F.lit(0.0)).alias("p_direct"),
            (F.round(F.col("v"), 6) + F.lit(0.0)).alias("exp_steps"),
        )
    )


# -- nearest-centroid classifier evaluation ----------------------------------
_NC_SCALE = 10**6


@_stage(
    "q_nearest_centroid_eval",
    f"""
    WITH dims AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
             unnest(embedding) AS x
      FROM embeddings),
    q AS MATERIALIZED (
      SELECT vec_id, label, dim,
             CAST(floor(CAST(x AS DOUBLE) * {_NC_SCALE} + 0.5) AS BIGINT)
               AS xq
      FROM dims),
    cent AS MATERIALIZED (
      SELECT label AS clabel, dim, CAST(sum(xq) AS BIGINT) AS sq,
             CAST(count(*) AS BIGINT) AS n
      FROM q GROUP BY 1, 2),
    dist AS (
      SELECT a.vec_id, a.label, c.clabel,
             CAST(sum(CAST(floor(
                 (a.xq - CAST(c.sq AS DOUBLE) / c.n)
                 * (a.xq - CAST(c.sq AS DOUBLE) / c.n)) AS BIGINT))
                  AS BIGINT) AS distq
      FROM q a JOIN cent c ON c.dim = a.dim
      GROUP BY 1, 2, 3),
    asg AS (
      SELECT vec_id, label, clabel,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY distq, clabel) AS rn
      FROM dist),
    ev AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN clabel = label THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_correct
      FROM asg WHERE rn = 1 GROUP BY label)
    SELECT label, n, n_correct,
           round(CAST(n_correct AS DOUBLE) / n, 6) + 0.0 AS acc
    FROM ev
    """,
)
def q_nearest_centroid_eval(spark, sf_dir):
    """Nearest-centroid (Rocchio) classifier accuracy per label over the
    embedding table — the 5-line supervised baseline every embedding
    space should beat chance on, and the quickest label-quality smoke
    test for a curated dataset.  Coordinates quantize to 1e6 BIGINTs so
    centroid sums are exact; per-dimension squared deviations floor to
    BIGINTs before the 64-dim sum, making the argmin assignment (ties
    broken by label) bit-stable.  Scale shape: one posexplode agg for
    centroids (#labels x dims rows, broadcast back), distance terms
    collapse in a map-side-combined (vec, label) agg, one bounded
    window per vector."""
    from pyspark.sql import Window

    from nonconsumptive_spark.plans.checkpoint import materialize_once

    emb = load(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", "label",
        F.posexplode("embedding").alias("dim", "x"),
    ).select(
        "vec_id", "label", "dim",
        F.floor(F.col("x").cast("double") * _NC_SCALE + F.lit(0.5))
        .cast("long").alias("xq"),
    )
    q = materialize_once(q, "nc_q")  # feeds centroids AND distances
    cent = q.groupBy(F.col("label").alias("clabel"), "dim").agg(
        F.sum("xq").cast("long").alias("sq"),
        F.count("*").cast("long").alias("n"),
    )
    d = F.col("xq") - F.col("sq").cast("double") / F.col("n")
    dist = (
        q.join(F.broadcast(cent), "dim")
        .select("vec_id", "label", "clabel",
                F.floor(d * d).cast("long").alias("tq"))
        .groupBy("vec_id", "label", "clabel")
        .agg(F.sum("tq").cast("long").alias("distq"))
    )
    w = Window.partitionBy("vec_id").orderBy("distq", "clabel")
    asg = dist.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1)
    evl = asg.groupBy("label").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("clabel") == F.col("label"), 1).otherwise(0))
        .cast("long").alias("n_correct"),
    )
    return evl.select(
        "label", "n", "n_correct",
        (F.round(F.col("n_correct").cast("double") / F.col("n"), 6)
         + F.lit(0.0)).alias("acc"),
    )


# -- C-value multiword termhood ----------------------------------------------
_CV_MIN_F = 3
_CV_TOP = 20
_CV_Q = 10**6
_CV_LOG2_3 = 1.584963  # log2(3), shared literal (rounded once in Python)


def _cvalue_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    bi AS MATERIALIZED (
      SELECT w0, w1, CAST(count(*) AS BIGINT) AS f FROM (
        SELECT doc_id, t[i] AS w0, t[i + 1] AS w1
        FROM toks, unnest(range(1, len(t))) u(i)) z
      GROUP BY 1, 2 HAVING count(*) >= {_CV_MIN_F}),
    tri AS MATERIALIZED (
      SELECT w0, w1, w2, CAST(count(*) AS BIGINT) AS f FROM (
        SELECT doc_id, t[i] AS w0, t[i + 1] AS w1, t[i + 2] AS w2
        FROM toks, unnest(range(1, len(t) - 1)) u(i)) z
      GROUP BY 1, 2, 3 HAVING count(*) >= {_CV_MIN_F}),
    nests AS (
      SELECT b.w0, b.w1,
             CAST(sum(t.f) AS BIGINT) AS s_nest,
             CAST(count(*) AS BIGINT) AS n_nest
      FROM bi b JOIN tri t
        ON (t.w0 = b.w0 AND t.w1 = b.w1) OR (t.w1 = b.w0 AND t.w2 = b.w1)
      GROUP BY 1, 2),
    cand AS (
      SELECT b.w0 || ' ' || b.w1 AS term, CAST(2 AS BIGINT) AS n_words,
             b.f,
             CASE WHEN n.n_nest IS NULL THEN CAST(b.f * {_CV_Q} AS BIGINT)
                  ELSE CAST(floor({_CV_Q}.0
                       * (b.f - CAST(n.s_nest AS DOUBLE) / n.n_nest))
                       AS BIGINT) END AS cq
      FROM bi b LEFT JOIN nests n ON n.w0 = b.w0 AND n.w1 = b.w1
      UNION ALL
      SELECT w0 || ' ' || w1 || ' ' || w2, CAST(3 AS BIGINT), f,
             -- CAST the literal: DuckDB parses 1.584963 as DECIMAL and
             -- would multiply exactly where Spark rounds in binary
             CAST(floor({_CV_Q}.0 * (CAST({_CV_LOG2_3} AS DOUBLE) * f))
                  AS BIGINT)
      FROM tri),
    ranked AS (
      SELECT term, n_words, f, cq,
             row_number() OVER (ORDER BY cq DESC, term ASC) AS rn
      FROM cand)
    SELECT term, n_words, f AS freq,
           round(cq / {_CV_Q}.0, 6) + 0.0 AS cvalue
    FROM ranked WHERE rn <= {_CV_TOP}
    """


@_stage("q_keyphrase_cvalue", _cvalue_oracle())
def q_keyphrase_cvalue(spark, sf_dir):
    """C-value multiword termhood (Frantzi et al. 2000) over bigram and
    trigram candidates: nested bigrams are discounted by the mean
    frequency of the trigrams containing them, so 'machine learning'
    scores above 'of the' fragments that only occur inside longer
    phrases — the statistical keyphrase extractor beside RAKE's
    stopword-delimited one.  log2(n) enters as a shared literal;
    nested-frequency means are single divisions floor-quantized before
    the rank.  Plan: two n-gram count aggs, one bigram-in-trigram
    containment join (n-gram-frame-sized, both sides frequency-pruned),
    TakeOrderedAndProject cut."""
    from nonconsumptive_spark.functions.text import ngram_structs, tokenize
    from nonconsumptive_spark.plans.checkpoint import materialize_once
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    bi = (docs.select(F.explode(ngram_structs(toks, 2)).alias("g"))
          .groupBy(F.col("g.w0").alias("w0"), F.col("g.w1").alias("w1"))
          .agg(F.count("*").cast("long").alias("f"))
          .filter(F.col("f") >= _CV_MIN_F))
    bi = materialize_once(bi, "cv_bi")
    tri = (docs.select(F.explode(ngram_structs(toks, 3)).alias("g"))
           .groupBy(F.col("g.w0").alias("w0"), F.col("g.w1").alias("w1"),
                    F.col("g.w2").alias("w2"))
           .agg(F.count("*").cast("long").alias("f"))
           .filter(F.col("f") >= _CV_MIN_F))
    tri = materialize_once(tri, "cv_tri")
    t = tri.select(F.col("w0").alias("t0"), F.col("w1").alias("t1"),
                   F.col("w2").alias("t2"), F.col("f").alias("tf"))
    # Containment as a UNION of two EQUI-joins (r8, guide §3): the
    # original single join on (A | B) with A = (t0=w0 & t1=w1),
    # B = (t1=w0 & t2=w1) has no equi keys, so Spark planned a
    # BroadcastNestedLoopJoin — |bi| x |tri| comparisons, the one
    # quadratic join in the census.  Splitting on the position keeps
    # both joins hashable; a pair matching BOTH arms (an all-equal
    # trigram like "x x x" nesting the bigram "x x") must count ONCE,
    # exactly as the OR did, so the B-arm excludes A-matches in-row.
    j1 = bi.join(t, (F.col("t0") == F.col("w0"))
                 & (F.col("t1") == F.col("w1"))).select("w0", "w1", "tf")
    j2 = (
        bi.join(t, (F.col("t1") == F.col("w0"))
                & (F.col("t2") == F.col("w1")))
        .filter(~((F.col("t0") == F.col("w0"))
                  & (F.col("t1") == F.col("w1"))))
        .select("w0", "w1", "tf")
    )
    nests = (
        j1.unionByName(j2)
        .groupBy("w0", "w1")
        .agg(F.sum("tf").cast("long").alias("s_nest"),
             F.count("*").cast("long").alias("n_nest"))
    )
    cand_bi = (
        bi.join(nests, ["w0", "w1"], "left")
        .select(
            F.concat_ws(" ", "w0", "w1").alias("term"),
            F.lit(2).cast("long").alias("n_words"), "f",
            F.when(F.col("n_nest").isNull(),
                   (F.col("f") * _CV_Q).cast("long"))
            .otherwise(F.floor(F.lit(float(_CV_Q))
                               * (F.col("f") - F.col("s_nest")
                                  .cast("double") / F.col("n_nest")))
                       .cast("long")).alias("cq"),
        )
    )
    cand_tri = tri.select(
        F.concat_ws(" ", "w0", "w1", "w2").alias("term"),
        F.lit(3).cast("long").alias("n_words"), "f",
        F.floor(F.lit(float(_CV_Q)) * (F.lit(_CV_LOG2_3) * F.col("f")))
        .cast("long").alias("cq"),
    )
    cand = cand_bi.unionByName(cand_tri)
    # top cut as orderBy + limit (r8): the rank never reached the output,
    # so TakeOrderedAndProject replaces a single-partition row_number
    # window over the whole candidate gram frame (terms are unique —
    # bigram and trigram strings differ in word count — so the
    # (cq desc, term asc) order is total and the cut identical)
    return (
        cand.orderBy(F.desc("cq"), F.asc("term"))
        .limit(_CV_TOP)
        .select("term", "n_words", F.col("f").alias("freq"),
                (F.round(F.col("cq") / F.lit(float(_CV_Q)), 6)
                 + F.lit(0.0)).alias("cvalue"))
    )


# -- split-conformal prediction interval for event values --------------------
_CONF_ALPHA_NUM, _CONF_ALPHA_DEN = 9, 10  # 1 - alpha = 0.9


@_stage(
    "q_conformal_interval",
    f"""
    WITH base AS (
      SELECT event_id, event_type,
             CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) AS xq,
             event_id % 2 AS half
      FROM events),
    mt AS (
      SELECT event_type, CAST(sum(xq) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM base WHERE half = 0 GROUP BY event_type),
    calib AS (
      SELECT b.event_id,
             CAST(floor(abs(b.xq - CAST(m.s AS DOUBLE) / m.n) * 1000)
                  AS BIGINT) AS rq
      FROM base b JOIN mt m ON m.event_type = b.event_type
      WHERE b.half = 0),
    nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM calib),
    kq AS (
      SELECT n_cal,
             CAST(floor(((n_cal + 1) * {_CONF_ALPHA_NUM} + {_CONF_ALPHA_DEN}
                         - 1) / {_CONF_ALPHA_DEN}.0) AS BIGINT) AS k
      FROM nc),
    ranked AS (
      SELECT rq, row_number() OVER (ORDER BY rq, event_id) AS rn
      FROM calib),
    qhat AS (
      SELECT k.n_cal, r.rq AS q_hat_q
      FROM kq k JOIN ranked r ON r.rn = least(k.k, k.n_cal)),
    test AS (
      SELECT CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN CAST(floor(abs(b.xq
                        - CAST(m.s AS DOUBLE) / m.n) * 1000) AS BIGINT)
                        <= q.q_hat_q THEN 1 ELSE 0 END) AS BIGINT)
               AS n_covered
      FROM base b
      JOIN mt m ON m.event_type = b.event_type
      CROSS JOIN qhat q
      WHERE b.half = 1)
    SELECT q.n_cal, t.n_test, t.n_covered,
           round(q.q_hat_q / 100000.0, 6) + 0.0 AS q_hat,
           round(CAST(t.n_covered AS DOUBLE) / t.n_test, 6) + 0.0
             AS coverage
    FROM qhat q CROSS JOIN test t
    """,
)
def q_conformal_interval(spark, sf_dir):
    """Split-conformal prediction interval around the per-type mean
    predictor: the calibration half's residual order statistic at
    ceil((n+1)(1-alpha)) gives a q_hat targeting ~90% coverage, which
    the test half then verifies empirically — the distribution-free
    uncertainty primitive for ANY scorer in the pipeline.  (Coverage is
    approximate, not the strict finite-sample guarantee: the mean
    predictor is fit on the same calibration half that supplies the
    quantile, which breaks exchangeability; split the half into
    fit/calibration thirds if the exact guarantee matters.)  Residuals quantize to exact millicent BIGINTs, the rank
    index is a pure integer ceil, coverage is one conditional sum.
    Plan: one calib agg, one global rank of the calibration residuals
    (eval-sized), broadcast 1-row q_hat attach onto the test scan."""
    from pyspark.sql import Window

    from nonconsumptive_spark.plans.checkpoint import materialize_once

    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_id", "event_type",
        F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100
                + F.lit(0.5)).cast("long").alias("xq"),
        (F.col("event_id") % 2).alias("half"),
    )
    base = materialize_once(base, "conf_base")  # calib AND test halves
    mt = (base.filter(F.col("half") == 0).groupBy("event_type")
          .agg(F.sum("xq").cast("long").alias("s"),
               F.count("*").cast("long").alias("n")))
    resid = F.floor(F.abs(F.col("xq")
                          - F.col("s").cast("double") / F.col("n"))
                    * 1000).cast("long")
    calib = (base.filter(F.col("half") == 0)
             .join(F.broadcast(mt), "event_type")
             .select("event_id", resid.alias("rq")))
    nc = calib.agg(F.count("*").cast("long").alias("n_cal"))
    kq = nc.select(
        "n_cal",
        F.floor(((F.col("n_cal") + 1) * _CONF_ALPHA_NUM
                 + _CONF_ALPHA_DEN - 1) / F.lit(float(_CONF_ALPHA_DEN)))
        .cast("long").alias("k"),
    )
    ranked = calib.select(
        "rq", F.row_number().over(Window.orderBy("rq", "event_id"))
        .cast("long").alias("rn"))
    qhat = (kq.join(ranked,
                    F.col("rn") == F.least(F.col("k"), F.col("n_cal")))
            .select("n_cal", F.col("rq").alias("q_hat_q")))
    test = (
        base.filter(F.col("half") == 1)
        .join(F.broadcast(mt), "event_type")
        .crossJoin(F.broadcast(qhat.select("q_hat_q")))
        .agg(F.count("*").cast("long").alias("n_test"),
             F.sum(F.when(resid <= F.col("q_hat_q"), 1).otherwise(0))
             .cast("long").alias("n_covered"))
    )
    return (
        qhat.crossJoin(F.broadcast(test))
        .select(
            "n_cal", "n_test", "n_covered",
            (F.round(F.col("q_hat_q") / F.lit(100000.0), 6)
             + F.lit(0.0)).alias("q_hat"),
            (F.round(F.col("n_covered").cast("double") / F.col("n_test"), 6)
             + F.lit(0.0)).alias("coverage"),
        )
    )


# -- Weibull survival fit from the KM product-limit table --------------------
_WB_CENS_DAYS = 7       # same censoring convention as q_kaplan_meier
_WB_Q = 10**6           # ln-point quantization: keeps OLS cross-products
                        # far below 2^63 at any realistic spine size


@_stage(
    "q_weibull_fit",
    f"""
    WITH pu AS (
      SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
      FROM events GROUP BY user_id),
    obs AS (SELECT max(ts) AS end_ts FROM events),
    durs AS (
      SELECT CAST(date_diff('day', CAST(first_ts AS DATE),
                            CAST(last_ts AS DATE)) AS BIGINT) AS dur,
             (last_ts < end_ts - INTERVAL {_WB_CENS_DAYS} DAY) AS observed
      FROM pu CROSS JOIN obs),
    tbl AS (
      SELECT dur, CAST(count(*) AS BIGINT) AS n_all,
             CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_event
      FROM durs GROUP BY dur),
    risk AS (
      SELECT dur, n_event,
             CAST((SELECT count(*) FROM durs)
                  - COALESCE(sum(n_all) OVER (
                      ORDER BY dur
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM tbl),
    terms AS (
      SELECT dur,
             CASE WHEN n_event = 0 THEN CAST(0 AS BIGINT)
                  WHEN n_event < n_risk THEN
                    CAST(floor(1000000000.0
                         * ln(CAST(n_risk - n_event AS DOUBLE) / n_risk))
                         AS BIGINT)
                  ELSE CAST(-1000000000000000 AS BIGINT) END AS term
      FROM risk),
    surv AS (
      SELECT dur, CAST(sum(term) OVER (ORDER BY dur) AS BIGINT)
               AS log_surv_q
      FROM terms),
    pts AS (
      SELECT CAST(floor({_WB_Q}.0 * ln(CAST(dur AS DOUBLE))) AS BIGINT)
               AS xq,
             CAST(floor({_WB_Q}.0 * ln(-(log_surv_q / 1000000000.0)))
                  AS BIGINT) AS yq
      FROM surv
      WHERE dur > 0 AND log_surv_q < 0 AND log_surv_q > -100000000000000),
    ols AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xq) AS BIGINT) AS sx,
             CAST(sum(yq) AS BIGINT) AS sy,
             CAST(sum(xq * yq) AS BIGINT) AS sxy,
             CAST(sum(xq * xq) AS BIGINT) AS sxx
      FROM pts),
    fit AS (
      SELECT n,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / (n * sxx - sx * sx) AS shape
      FROM ols),
    out AS (
      SELECT f.n, f.shape,
             ((CAST(o.sy AS DOUBLE) - f.shape * o.sx) / o.n)
               / {_WB_Q}.0 AS b
      FROM fit f CROSS JOIN ols o)
    SELECT n AS n_points,
           round(shape, 6) + 0.0 AS shape,
           round(exp(-(b / shape)), 6) + 0.0 AS scale_days
    FROM out
    """,
)
def q_weibull_fit(spark, sf_dir):
    """Weibull (shape, scale) fitted to the Kaplan-Meier survival curve
    by the classic log-log linearization ln(-ln S) = k ln t - k ln
    lambda: shape < 1 reads as decreasing churn hazard, the single most
    actionable retention number the raw KM table hides.  The KM fold is
    the exact q_kaplan_meier recurrence (ln S is ALREADY the quantized
    log_surv_q sum, so -ln S is exact); the ln-ln points quantize to
    1e6 BIGINTs and the OLS runs on pure integer cross-products with
    TWO float divisions (slope, intercept).  Plan: the KM spine
    windows + one 1-row OLS agg."""
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
         < F.col("end_ts") - F.expr(f"INTERVAL {_WB_CENS_DAYS} DAYS"))
        .alias("observed"),
    )
    durs = materialize_once(durs, "wb_durs")
    tot = durs.agg(F.count("*").cast("long").alias("n_users"))
    tbl = durs.groupBy("dur").agg(
        F.count("*").cast("long").alias("n_all"),
        F.sum(F.col("observed").cast("long")).cast("long").alias("n_event"),
    )
    w_prev = (Window.orderBy("dur")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_cum = (Window.orderBy("dur")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    risk = tbl.crossJoin(F.broadcast(tot)).select(
        "dur", "n_event",
        (F.col("n_users")
         - F.coalesce(F.sum("n_all").over(w_prev), F.lit(0)))
        .cast("long").alias("n_risk"),
    )
    terms = risk.select(
        "dur",
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
        "dur", F.sum("term").over(w_cum).cast("long").alias("log_surv_q"))
    pts = surv.filter(
        (F.col("dur") > 0) & (F.col("log_surv_q") < 0)
        & (F.col("log_surv_q") > -(10 ** 14))
    ).select(
        F.floor(F.lit(float(_WB_Q)) * F.log(F.col("dur").cast("double")))
        .cast("long").alias("xq"),
        F.floor(F.lit(float(_WB_Q))
                * F.log(-(F.col("log_surv_q") / F.lit(1e9))))
        .cast("long").alias("yq"),
    )
    ols = pts.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("long").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxx"),
    )
    fit = ols.select(
        "n", "sx", "sy",
        ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
         .cast("double")
         / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
        .alias("shape"),
    )
    out = fit.select(
        "n", "shape",
        (((F.col("sy").cast("double") - F.col("shape") * F.col("sx"))
          / F.col("n")) / F.lit(float(_WB_Q))).alias("b"),
    )
    return out.select(
        F.col("n").alias("n_points"),
        (F.round(F.col("shape"), 6) + F.lit(0.0)).alias("shape"),
        (F.round(F.exp(-(F.col("b") / F.col("shape"))), 6)
         + F.lit(0.0)).alias("scale_days"),
    )


# -- capture-recapture population estimate -----------------------------------
@_stage(
    "q_capture_recapture",
    """
    WITH span AS (
      SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      FROM events),
    occ AS (
      SELECT user_id,
             max(CASE WHEN 2 * date_diff('day', d0, CAST(ts AS DATE))
                      < date_diff('day', d0, d1) + 1 THEN 1 ELSE 0 END)
               AS in_a,
             max(CASE WHEN 2 * date_diff('day', d0, CAST(ts AS DATE))
                      >= date_diff('day', d0, d1) + 1 THEN 1 ELSE 0 END)
               AS in_b
      FROM events CROSS JOIN span GROUP BY user_id),
    counts AS (
      SELECT CAST(sum(in_a) AS BIGINT) AS n1,
             CAST(sum(in_b) AS BIGINT) AS n2,
             CAST(sum(in_a * in_b) AS BIGINT) AS m,
             CAST(count(*) AS BIGINT) AS n_seen
      FROM occ)
    SELECT n1, n2, m, n_seen,
           round((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m + 1) - 1.0, 6)
             + 0.0 AS n_chapman,
           round(sqrt((CAST(n1 + 1 AS DOUBLE) * (n2 + 1) * (n1 - m)
                       * (n2 - m))
                      / ((CAST(m + 1 AS DOUBLE) * (m + 1)) * (m + 2))), 6)
             + 0.0 AS se_chapman,
           CASE WHEN m > 0 THEN
             round(CAST(n1 AS DOUBLE) * n2 / m, 6) + 0.0 END
             AS n_lincoln_petersen
    FROM counts
    """,
)
def q_capture_recapture(spark, sf_dir):
    """Chapman capture-recapture estimate of the TOTAL user population
    from two overlapping observation windows (first/second half of the
    time span) — the mark-recapture estimator a data pipeline uses to
    size an unseen population from overlapping crawls or dedup samples:
    N_hat = (n1+1)(n2+1)/(m+1) - 1 with its closed-form SE, plus the
    classic Lincoln-Petersen n1*n2/m for reference.  Occurrence flags
    are one user agg over integer date arithmetic; every float is a
    mirrored chain over four exact counts.  Plan: one 1-row span
    attach, one user agg, one 1-row count agg."""
    ev = load(spark, sf_dir, "events")
    span = ev.agg(F.min(F.to_date("ts")).alias("d0"),
                  F.max(F.to_date("ts")).alias("d1"))
    half = (F.lit(2) * F.datediff(F.to_date("ts"), F.col("d0"))
            >= F.datediff(F.col("d1"), F.col("d0")) + F.lit(1))
    occ = (
        ev.crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(F.max(F.when(~half, 1).otherwise(0)).alias("in_a"),
             F.max(F.when(half, 1).otherwise(0)).alias("in_b"))
    )
    counts = occ.agg(
        F.sum("in_a").cast("long").alias("n1"),
        F.sum("in_b").cast("long").alias("n2"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("m"),
        F.count("*").cast("long").alias("n_seen"),
    )
    n1, n2, m = F.col("n1"), F.col("n2"), F.col("m")
    return counts.select(
        "n1", "n2", "m", "n_seen",
        (F.round((n1 + 1).cast("double") * (n2 + 1) / (m + 1) - F.lit(1.0),
                 6) + F.lit(0.0)).alias("n_chapman"),
        (F.round(F.sqrt(
            ((n1 + 1).cast("double") * (n2 + 1) * (n1 - m) * (n2 - m))
            / (((m + 1).cast("double") * (m + 1)) * (m + 2))), 6)
         + F.lit(0.0)).alias("se_chapman"),
        F.when(m > 0, F.round(n1.cast("double") * n2 / m, 6)
               + F.lit(0.0)).alias("n_lincoln_petersen"),
    )


# -- ABC (Pareto) inventory classification -----------------------------------
@_stage(
    "q_abc_parts",
    """
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum(CAST(floor(100 * l_extendedprice
                                 * (1 - l_discount) + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS t FROM rev),
    ranked AS (
      SELECT l_partkey, rev_c,
             CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_c
      FROM rev),
    classed AS (
      SELECT l_partkey, rev_c,
             CASE WHEN cum_c * 100 <= t * 80 THEN 'A'
                  WHEN cum_c * 100 <= t * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked CROSS JOIN tot)
    SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev_c) AS BIGINT) AS revenue_c,
           round(CAST(sum(rev_c) AS BIGINT)
                 / CAST((SELECT t FROM tot) AS DOUBLE), 6) + 0.0
             AS revenue_share
    FROM classed GROUP BY abc
    """,
)
def q_abc_parts(spark, sf_dir):
    """ABC (Pareto) classification of parts by discounted revenue:
    A = parts inside the first 80% of cumulative revenue, B to 95%,
    C the tail — the inventory-analytics read of 'which 20% of SKUs
    carry the business', here over the TPC-H star.  Revenue quantizes
    to exact cents per row BEFORE any sum, the cumulative class test is
    an integer cross-multiplication (cum*100 <= tot*80), and the only
    float is the final share division.  Plan: one part-keyed agg, one
    window over the #parts spine, a 1-row total attach."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.floor(100 * F.col("l_extendedprice")
                      * (1 - F.col("l_discount")) + F.lit(0.5))
              .cast("long")).cast("long").alias("rev_c"))
    tot = rev.agg(F.sum("rev_c").cast("long").alias("t"))
    w = (Window.orderBy(F.desc("rev_c"), F.asc("l_partkey"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = rev.select(
        "l_partkey", "rev_c",
        F.sum("rev_c").over(w).cast("long").alias("cum_c"))
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "rev_c", "t",
        F.when(F.col("cum_c") * 100 <= F.col("t") * 80, F.lit("A"))
        .when(F.col("cum_c") * 100 <= F.col("t") * 95, F.lit("B"))
        .otherwise(F.lit("C")).alias("abc"),
    )
    return (
        classed.groupBy("abc")
        .agg(F.count("*").cast("long").alias("n_parts"),
             F.sum("rev_c").cast("long").alias("revenue_c"),
             F.max("t").alias("t"))
        .select("abc", "n_parts", "revenue_c",
                (F.round(F.col("revenue_c") / F.col("t").cast("double"), 6)
                 + F.lit(0.0)).alias("revenue_share"))
    )


# -- market-basket association rules over brand baskets ----------------------
_MB_MIN_SUPP = 10
_MB_TOP = 20


@_stage(
    "q_basket_rules",
    f"""
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
           FROM baskets),
    supp1 AS (
      SELECT p_brand, CAST(count(*) AS BIGINT) AS s
      FROM baskets GROUP BY p_brand),
    pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             CAST(count(*) AS BIGINT) AS supp_ab
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
      HAVING count(*) >= {_MB_MIN_SUPP}),
    scored AS (
      SELECT p.brand_a, p.brand_b, p.supp_ab,
             sa.s AS supp_a, sb.s AS supp_b,
             CAST(floor(1000000.0 * ((CAST(p.supp_ab AS DOUBLE) * n.n_orders)
                  / (CAST(sa.s AS DOUBLE) * sb.s))) AS BIGINT) AS lift_q
      FROM pairs p
      JOIN supp1 sa ON sa.p_brand = p.brand_a
      JOIN supp1 sb ON sb.p_brand = p.brand_b
      CROSS JOIN nb n),
    ranked AS (
      SELECT *, row_number() OVER (
               ORDER BY lift_q DESC, brand_a ASC, brand_b ASC) AS rn
      FROM scored)
    SELECT brand_a, brand_b, supp_ab, supp_a, supp_b,
           round(CAST(supp_ab AS DOUBLE) / supp_a, 6) + 0.0 AS confidence,
           round(lift_q / 1000000.0, 6) + 0.0 AS lift
    FROM ranked WHERE rn <= {_MB_TOP}
    """,
)
def q_basket_rules(spark, sf_dir):
    """Market-basket association rules over order->brand baskets:
    support / confidence / lift for the top-{top} brand pairs by lift —
    the q_event_type_lift pattern applied to the TPC-H star (a brand
    dimension join builds the baskets).  Lift floor-quantizes to 1e6
    before the rank so the cut is deterministic; supports are exact
    order counts.  Scale shape: baskets are one distinct projection;
    the pair join keys on l_orderkey with fan-out bounded by basket
    width (<= distinct brands per order); supports broadcast."""
    from pyspark.sql import Window

    from nonconsumptive_spark.plans.checkpoint import materialize_once

    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    baskets = (li.join(part, li["l_partkey"] == part["p_partkey"])
               .select("l_orderkey", "p_brand").distinct())
    baskets = materialize_once(baskets, "mb_baskets")  # pairs + supports
    nb = baskets.agg(F.countDistinct("l_orderkey").cast("long")
                     .alias("n_orders"))
    supp1 = baskets.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("s"))
    a = baskets.select("l_orderkey", F.col("p_brand").alias("brand_a"))
    b = baskets.select("l_orderkey", F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("long").alias("supp_ab"))
        .filter(F.col("supp_ab") >= _MB_MIN_SUPP)
    )
    sa = supp1.select(F.col("p_brand").alias("brand_a"),
                      F.col("s").alias("supp_a"))
    sb = supp1.select(F.col("p_brand").alias("brand_b"),
                      F.col("s").alias("supp_b"))
    scored = (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "brand_a", "brand_b", "supp_ab", "supp_a", "supp_b",
            F.floor(F.lit(1e6) * ((F.col("supp_ab").cast("double")
                                   * F.col("n_orders"))
                                  / (F.col("supp_a").cast("double")
                                     * F.col("supp_b"))))
            .cast("long").alias("lift_q"),
        )
    )
    w = Window.orderBy(F.desc("lift_q"), F.asc("brand_a"), F.asc("brand_b"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MB_TOP)
        .select("brand_a", "brand_b", "supp_ab", "supp_a", "supp_b",
                (F.round(F.col("supp_ab").cast("double")
                         / F.col("supp_a"), 6) + F.lit(0.0))
                .alias("confidence"),
                (F.round(F.col("lift_q") / F.lit(1e6), 6) + F.lit(0.0))
                .alias("lift"))
    )


# -- log-log price elasticity per return flag --------------------------------
@_stage(
    "q_price_elasticity",
    """
    WITH base AS (
      SELECT l_returnflag,
             CAST(floor(100 * l_extendedprice + 0.5) AS BIGINT) AS pc,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS qq
      FROM lineitem
      WHERE l_quantity > 0 AND l_extendedprice > 0),
    pts AS (
      SELECT l_returnflag,
             CAST(floor(10000.0 * ln(CAST(pc AS DOUBLE) / qq)) AS BIGINT)
               AS xq,
             CAST(floor(10000.0 * ln(CAST(qq AS DOUBLE))) AS BIGINT)
               AS yq
      FROM base),
    ols AS (
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xq) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
             CAST(sum(xq * yq) AS BIGINT) AS sxy,
             CAST(sum(xq * xq) AS BIGINT) AS sxx
      FROM pts GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx),
                 6) + 0.0 AS elasticity
    FROM ols
    """,
)
def q_price_elasticity(spark, sf_dir):
    """Log-log OLS price elasticity of demand per return flag:
    d ln(qty) / d ln(unit price) — the demand-curve slope read straight
    off the lineitem fact table (elasticity ~ -1 means revenue-neutral
    pricing).  ln-points floor-quantize to 1e4 BIGINTs — not the weibull
    OLS's 1e6, so the xq^2 sums stay below 2^63 at 100x sf0.1 rows (see
    the inline comment) — same discipline otherwise: integer
    cross-products, ONE float division; rows with
    zero quantity or price are excluded identically on both engines.
    Plan: one zero-shuffle scan into a flag-keyed 1-agg."""
    li = load(spark, sf_dir, "lineitem")
    base = li.filter((F.col("l_quantity") > 0)
                     & (F.col("l_extendedprice") > 0)).select(
        "l_returnflag",
        F.floor(100 * F.col("l_extendedprice") + F.lit(0.5)).cast("long")
        .alias("pc"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qq"),
    )
    # 1e4 ln-quantization: xq^2 sums stay below 2^63 even at 100x the
    # sf0.1 row count; the Cramer products then run in mirrored doubles
    pts = base.select(
        "l_returnflag",
        F.floor(F.lit(1e4) * F.log(F.col("pc").cast("double")
                                   / F.col("qq"))).cast("long").alias("xq"),
        F.floor(F.lit(1e4) * F.log(F.col("qq").cast("double")))
        .cast("long").alias("yq"),
    )
    ols = pts.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("long").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxx"),
    )
    return ols.select(
        "l_returnflag", "n",
        (F.round((F.col("n").cast("double") * F.col("sxy")
                  - F.col("sx").cast("double") * F.col("sy"))
                 / (F.col("n").cast("double") * F.col("sxx")
                    - F.col("sx").cast("double") * F.col("sx")), 6)
         + F.lit(0.0)).alias("elasticity"),
    )


# -- log-rank test between user cohorts --------------------------------------
_LR_CENS_DAYS = 7   # the q_kaplan_meier censoring convention
_LR_Q = 10**9


@_stage(
    "q_logrank_test",
    f"""
    WITH pu AS (
      SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
      FROM events GROUP BY user_id),
    obs AS (SELECT max(ts) AS end_ts FROM events),
    durs AS (
      SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS g,
             CAST(date_diff('day', CAST(first_ts AS DATE),
                            CAST(last_ts AS DATE)) AS BIGINT) AS dur,
             CASE WHEN last_ts < end_ts - INTERVAL {_LR_CENS_DAYS} DAY
                  THEN 1 ELSE 0 END AS ev
      FROM pu CROSS JOIN obs),
    gt AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_users FROM durs GROUP BY g),
    tbl AS (
      SELECT g, dur, CAST(count(*) AS BIGINT) AS n_all,
             CAST(sum(ev) AS BIGINT) AS d
      FROM durs GROUP BY g, dur),
    grid AS (
      SELECT gg.g, dd.dur,
             CAST(coalesce(t.n_all, 0) AS BIGINT) AS n_all,
             CAST(coalesce(t.d, 0) AS BIGINT) AS d
      FROM (SELECT DISTINCT dur FROM tbl) dd
      CROSS JOIN (SELECT DISTINCT g FROM gt) gg
      LEFT JOIN tbl t ON t.g = gg.g AND t.dur = dd.dur),
    risk AS (
      SELECT g, dur, d,
             CAST((SELECT n_users FROM gt WHERE gt.g = grid.g)
                  - COALESCE(sum(n_all) OVER (
                      PARTITION BY g ORDER BY dur
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM grid),
    wide AS (
      SELECT dur,
             CAST(sum(CASE WHEN g = 1 THEN d ELSE 0 END) AS BIGINT) AS d_a,
             CAST(sum(CASE WHEN g = 0 THEN d ELSE 0 END) AS BIGINT) AS d_b,
             CAST(sum(CASE WHEN g = 1 THEN n_risk ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN g = 0 THEN n_risk ELSE 0 END) AS BIGINT)
               AS n_b
      FROM risk GROUP BY dur),
    terms AS (
      SELECT CAST(floor({_LR_Q}.0 * (d_a - (d_a + d_b)
                   * (CAST(n_a AS DOUBLE) / (n_a + n_b)))) AS BIGINT)
               AS oe_q,
             CAST(floor({_LR_Q}.0 * (((d_a + d_b)
                   * (CAST(n_a AS DOUBLE) / (n_a + n_b))
                   * (CAST(n_b AS DOUBLE) / (n_a + n_b))
                   * (n_a + n_b - d_a - d_b)) / (n_a + n_b - 1)))
               AS BIGINT) AS v_q
      FROM wide
      WHERE d_a + d_b > 0 AND n_a + n_b > 1),
    agg AS (
      SELECT CAST(coalesce(sum(oe_q), 0) AS BIGINT) AS oe_s,
             CAST(coalesce(sum(v_q), 0) AS BIGINT) AS v_s
      FROM terms)
    SELECT (SELECT n_users FROM gt WHERE g = 1) AS n_treat,
           (SELECT n_users FROM gt WHERE g = 0) AS n_control,
           oe_s, v_s,
           CASE WHEN v_s > 0 THEN
             round(((oe_s / {_LR_Q}.0) * (oe_s / {_LR_Q}.0))
                   / (v_s / {_LR_Q}.0), 6) + 0.0
           END AS chi2
    FROM agg
    """,
)
def q_logrank_test(spark, sf_dir):
    """Log-rank (Mantel-Cox) test of survival-curve equality between the
    odd/even user cohorts — the hypothesis test the KM / Nelson-Aalen /
    Weibull descriptive battery was missing: at each event time the
    observed-minus-expected treatment events and the hypergeometric
    variance accumulate; chi2 = (sum O-E)^2 / sum V on 1 df.  Per-time
    terms floor-quantize to 1e-9 BIGINTs (each is a mirrored chain over
    exact risk-set integers), so the sums are order-free.  Plan: one
    user agg, the KM duration-spine windows PARTITIONED BY cohort, one
    1-row agg."""
    from pyspark.sql import Window

    from nonconsumptive_spark.plans.checkpoint import materialize_once

    ev = load(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"),
                                   F.max("ts").alias("last_ts"))
    obs = ev.agg(F.max("ts").alias("end_ts"))
    durs = pu.crossJoin(F.broadcast(obs)).select(
        F.when(F.col("user_id") % 2 == 1, F.lit(1)).otherwise(F.lit(0))
        .alias("g"),
        F.datediff(F.to_date("last_ts"), F.to_date("first_ts"))
        .cast("long").alias("dur"),
        F.when(F.col("last_ts") < F.col("end_ts")
               - F.expr(f"INTERVAL {_LR_CENS_DAYS} DAYS"), F.lit(1))
        .otherwise(F.lit(0)).alias("ev"),
    )
    durs = materialize_once(durs, "lr_durs")  # totals AND the table
    gt = durs.groupBy("g").agg(F.count("*").cast("long").alias("n_users"))
    tbl = durs.groupBy("g", "dur").agg(
        F.count("*").cast("long").alias("n_all"),
        F.sum("ev").cast("long").alias("d"))
    tbl = materialize_once(tbl, "lr_tbl")  # grid spine AND values
    grid = (
        tbl.select("dur").distinct()
        .crossJoin(F.broadcast(gt.select("g")))
        .join(tbl, ["g", "dur"], "left")
        .select("g", "dur",
                F.coalesce("n_all", F.lit(0)).cast("long").alias("n_all"),
                F.coalesce("d", F.lit(0)).cast("long").alias("d"))
    )
    w_prev = (Window.partitionBy("g").orderBy("dur")
              .rowsBetween(Window.unboundedPreceding, -1))
    risk = (
        grid.join(F.broadcast(gt), "g")
        .select("g", "dur", "d",
                (F.col("n_users")
                 - F.coalesce(F.sum("n_all").over(w_prev), F.lit(0)))
                .cast("long").alias("n_risk"))
    )
    wide = risk.groupBy("dur").agg(
        F.sum(F.when(F.col("g") == 1, F.col("d")).otherwise(0))
        .cast("long").alias("d_a"),
        F.sum(F.when(F.col("g") == 0, F.col("d")).otherwise(0))
        .cast("long").alias("d_b"),
        F.sum(F.when(F.col("g") == 1, F.col("n_risk")).otherwise(0))
        .cast("long").alias("n_a"),
        F.sum(F.when(F.col("g") == 0, F.col("n_risk")).otherwise(0))
        .cast("long").alias("n_b"),
    )
    n = F.col("n_a") + F.col("n_b")
    d = F.col("d_a") + F.col("d_b")
    terms = wide.filter((d > 0) & (n > 1)).select(
        F.floor(F.lit(float(_LR_Q))
                * (F.col("d_a")
                   - d * (F.col("n_a").cast("double") / n)))
        .cast("long").alias("oe_q"),
        F.floor(F.lit(float(_LR_Q))
                * ((d * (F.col("n_a").cast("double") / n)
                    * (F.col("n_b").cast("double") / n)
                    * (n - d)) / (n - 1)))
        .cast("long").alias("v_q"),
    )
    # fully-censored spines (no observed events) leave terms empty:
    # coalesce to 0 and guard chi2 with an explicit mirrored NULL
    agg = terms.agg(
        F.coalesce(F.sum("oe_q"), F.lit(0)).cast("long").alias("oe_s"),
        F.coalesce(F.sum("v_q"), F.lit(0)).cast("long").alias("v_s"))
    nt = gt.filter(F.col("g") == 1).select(
        F.col("n_users").alias("n_treat"))
    nc = gt.filter(F.col("g") == 0).select(
        F.col("n_users").alias("n_control"))
    return (
        agg.crossJoin(F.broadcast(nt)).crossJoin(F.broadcast(nc))
        .select(
            "n_treat", "n_control", "oe_s", "v_s",
            F.when(F.col("v_s") > 0, F.round(
                ((F.col("oe_s") / F.lit(float(_LR_Q)))
                 * (F.col("oe_s") / F.lit(float(_LR_Q))))
                / (F.col("v_s") / F.lit(float(_LR_Q))), 6)
                + F.lit(0.0)).alias("chi2"),
        )
    )


# -- Friedman blocked rank test over the daily type mix ----------------------
@_stage(
    "q_friedman_daily",
    """
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    cnt AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    grid AS (
      SELECT d.day, t.event_type, CAST(coalesce(c.c, 0) AS BIGINT) AS c
      FROM days d CROSS JOIN types t
      LEFT JOIN cnt c ON c.day = d.day AND c.event_type = t.event_type),
    rn AS (
      SELECT day, event_type, c,
             CAST(row_number() OVER (
               PARTITION BY day ORDER BY c, event_type) AS BIGINT) AS r
      FROM grid),
    mid AS (
      SELECT day, c, CAST(min(r) + max(r) AS BIGINT) AS mr2
      FROM rn GROUP BY day, c),
    ranked AS (
      SELECT r.event_type, m.mr2
      FROM rn r JOIN mid m ON m.day = r.day AND m.c = r.c),
    rsum AS (
      SELECT event_type, CAST(sum(mr2) AS BIGINT) AS r2
      FROM ranked GROUP BY event_type),
    dims AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM days) AS n,
             (SELECT CAST(count(*) AS BIGINT) FROM types) AS k),
    agg AS (
      SELECT CAST(sum(r2 * r2) AS BIGINT) AS ss,
             CAST(count(*) AS BIGINT) AS k_chk
      FROM rsum)
    SELECT d.n AS n_days, d.k AS k_types,
           round(3.0 * a.ss / (d.n * d.k * (d.k + 1))
                 - 3.0 * d.n * (d.k + 1), 6) + 0.0 AS q_stat
    FROM agg a CROSS JOIN dims d
    """,
)
def q_friedman_daily(spark, sf_dir):
    """Friedman blocked rank test: do the event types keep the SAME
    volume ordering across days?  Blocks = days, treatments = types,
    within-day MIDRANKS carried doubled (min_rank + max_rank per tied
    count — exact integers), so the rank sums and the statistic
    Q = 3*sum(R2_j^2)/(n k (k+1)) - 3 n (k+1) (the R = R2/2
    substitution, no tie-correction denominator — documented) are pure
    integer arithmetic with one mirrored float chain.  The blocked
    companion to q_kruskal_wallis's one-way test.  Plan: one (day,
    type) agg, day-partitioned windows over the #days x #types grid,
    two 1-row attaches."""
    from pyspark.sql import Window

    from nonconsumptive_spark.plans.checkpoint import materialize_once

    ev = load(spark, sf_dir, "events")
    cnt = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count("*").cast("long").alias("c"))
    cnt = materialize_once(cnt, "fr_cnt")  # spine dims AND values
    days = cnt.select("day").distinct()
    types = cnt.select("event_type").distinct()
    grid = (days.crossJoin(F.broadcast(types))
            .join(cnt, ["day", "event_type"], "left")
            .select("day", "event_type",
                    F.coalesce("c", F.lit(0)).cast("long").alias("c")))
    w = Window.partitionBy("day").orderBy("c", "event_type")
    rn = grid.select("day", "event_type", "c",
                     F.row_number().over(w).cast("long").alias("r"))
    rn = materialize_once(rn, "fr_rn")  # midranks AND the join back
    mid = rn.groupBy("day", "c").agg(
        (F.min("r") + F.max("r")).cast("long").alias("mr2"))
    ranked = rn.join(mid, ["day", "c"])
    rsum = ranked.groupBy("event_type").agg(
        F.sum("mr2").cast("long").alias("r2"))
    nd = days.agg(F.count("*").cast("long").alias("n"))
    kt = types.agg(F.count("*").cast("long").alias("k"))
    agg = rsum.agg(F.sum(F.col("r2") * F.col("r2")).cast("long")
                   .alias("ss"))
    return (
        agg.crossJoin(F.broadcast(nd)).crossJoin(F.broadcast(kt))
        .select(
            F.col("n").alias("n_days"), F.col("k").alias("k_types"),
            (F.round(F.lit(3.0) * F.col("ss")
                     / (F.col("n") * F.col("k") * (F.col("k") + 1))
                     - F.lit(3.0) * F.col("n") * (F.col("k") + 1), 6)
             + F.lit(0.0)).alias("q_stat"),
        )
    )
