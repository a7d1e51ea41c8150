"""Model- and data-quality EVALUATION operators: rank-based ROC AUC,
Benford first-digit deviation, and BLEU-lite pair scoring.

A training-data pipeline doesn't just transform data — it has to grade
the classifiers and heuristics steering it (quality filters, language
ID, dedup scorers) and audit numeric columns for fabrication.  These
are the distributed, oracle-checkable versions of those gradings.

Shared exactness discipline (same as textstats/graph): every cross-row
float SUM is replaced by an exact BIGINT sum of pre-quantized terms, and
transcendental constants (log10, ln) enter as Python-computed LITERALS
identical on both engines — so the 6-decimal output rounding is safe
under any aggregation order.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

AUC_SCALE = 10**6
CHI2_SCALE = 10**6

# Benford's first-digit law, as shared literals: P(d) = log10(1 + 1/d),
# rounded once in Python so Spark and the DuckDB oracle multiply the
# *identical* double (java Math.log10 vs libm log10 differ in the last
# ulp — never let either engine compute the constant).
BENFORD_P = {d: round(math.log10(1.0 + 1.0 / d), 6) for d in range(1, 10)}


def auc_one_vs_rest(df: DataFrame, label_col: str = "label",
                    score_col: str = "score",
                    scale: int = AUC_SCALE) -> DataFrame:
    """(label, n_pos, n_neg, auc) — one-vs-rest ROC AUC of ``score_col``
    for every distinct class, via the Mann–Whitney rank identity
    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg) with midrank tie
    handling (ties are the normal case once scores are quantized).

    Exact-integer formulation: scores quantize to ``floor(s*scale+0.5)``
    BIGINT keys; per (class, score-bucket) the doubled rank-sum
    contribution  n_pos_b * (2*cum_before + cnt + 1)  is an exact BIGINT,
    so AUC = (S2 - n_pos*(n_pos+1)) / (2*n_pos*n_neg) involves exactly
    ONE float op (the final division) — bit-stable across engines and
    aggregation orders.

    Scale shape: rows collapse to a (label, score-bucket) histogram
    FIRST (one agg keyed on short pairs); the class spine (#distinct
    labels, tiny) is broadcast onto the histogram; the cumulative count
    runs in a window PARTITIONED BY class over score buckets — bounded
    by the quantization range (scale * score span), never by row count.
    Nothing row-sized crosses the network after the first agg."""
    sq = F.floor(F.col(score_col).cast("double") * scale + F.lit(0.5)) \
        .cast("long")
    hist = (
        df.select(F.col(label_col).alias("lbl"), sq.alias("sq"))
        .groupBy("lbl", "sq")
        .agg(F.count("*").cast("long").alias("c"))
    )
    spine = hist.select(F.col("lbl").alias(label_col)).distinct()
    per_bucket = (
        hist.join(F.broadcast(spine),
                  F.lit(True))  # histogram x tiny class spine
        .groupBy(label_col, "sq")
        .agg(
            F.sum("c").cast("long").alias("cnt"),
            F.sum(F.when(F.col("lbl") == F.col(label_col), F.col("c"))
                  .otherwise(F.lit(0))).cast("long").alias("np_b"),
        )
    )
    w = (
        Window.partitionBy(label_col).orderBy("sq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_bucket.withColumn(
        "cum_before", F.sum("cnt").over(w) - F.col("cnt"))
    agg = ranked.groupBy(label_col).agg(
        F.sum(F.col("np_b")
              * (F.lit(2) * F.col("cum_before") + F.col("cnt") + F.lit(1)))
        .cast("long").alias("s2"),
        F.sum("np_b").cast("long").alias("n_pos"),
        F.sum("cnt").cast("long").alias("n"),
    )
    nn = F.col("n") - F.col("n_pos")
    auc = (
        (F.col("s2") - F.col("n_pos") * (F.col("n_pos") + F.lit(1)))
        .cast("double")
        / (F.lit(2.0) * F.col("n_pos") * nn)
    )
    return agg.select(
        label_col,
        "n_pos",
        nn.alias("n_neg"),
        F.when((F.col("n_pos") > 0) & (nn > 0),
               F.round(auc, 6) + F.lit(0.0)).alias("auc"),
    )


def benford_deviation(df: DataFrame, group_col: str,
                      value_col: str = "value") -> DataFrame:
    """(group, n, chi2) — chi-squared deviation of the first significant
    digit of ``value_col`` from Benford's law, per group (the classic
    fabricated-numbers audit: organically grown magnitudes follow
    log10(1+1/d); invented ones don't).

    Digit extraction is integer-exact: values quantize to cents
    (floor(v*100+0.5)), rows with a non-positive quantized value drop,
    and the leading digit is the first character of the BIGINT's decimal
    string — integer-to-string is portable where double log10/formatting
    is not.  Expected counts multiply the shared BENFORD_P literals; each
    digit's (o-e)^2/e term quantizes to a BIGINT before the 9-term sum.

    Scale shape: one (group, digit) count agg, one group count agg, a
    broadcast 9-row digit spine, one final group agg."""
    spark = df.sparkSession
    spine = F.broadcast(spark.createDataFrame(
        sorted(BENFORD_P.items()), "digit long, p double"))
    vq = F.floor(F.col(value_col).cast("double") * 100 + F.lit(0.5)) \
        .cast("long")
    base = (
        df.select(F.col(group_col).alias("g"), vq.alias("vq"))
        .filter(F.col("vq") >= 1)
        .select("g", F.substring(F.col("vq").cast("string"), 1, 1)
                .cast("long").alias("digit"))
    )
    obs = base.groupBy("g", "digit").agg(
        F.count("*").cast("long").alias("o"))
    totals = base.groupBy("g").agg(F.count("*").cast("long").alias("n"))
    full = (
        totals.join(spine, F.lit(True))  # 9-row broadcast spine
        .join(obs, ["g", "digit"], "left")
        .withColumn("o", F.coalesce("o", F.lit(0)).cast("long"))
    )
    e = F.col("n").cast("double") * F.col("p")
    term = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    tq = F.floor(term * CHI2_SCALE + F.lit(0.5)).cast("long")
    return (
        full.select("g", "n", tq.alias("tq"))
        .groupBy(F.col("g").alias(group_col))
        .agg(
            F.max("n").alias("n"),
            (F.round(F.sum("tq").cast("double") / CHI2_SCALE, 6)
             + F.lit(0.0)).alias("chi2"),
        )
    )


BLEU_BLOCK_MOD = 37


def bleu_pairs(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", lang_col: str = "lang",
               block_mod: int = BLEU_BLOCK_MOD) -> DataFrame:
    """(doc_a, doc_b, p1, p2, bleu2) — BLEU-lite between blocked document
    pairs: clipped unigram/bigram precision of the higher-id doc (the
    "candidate") against the lower-id doc (the "reference"), combined as
    bp * sqrt(p1*p2) with a LINEAR brevity penalty min(1, len_b/len_a).

    Why linear bp and a sqrt mean: exp() and fractional pow() are not
    bit-reproducible across engines; every float op here (two precision
    divisions, one product, one sqrt, one bp division, one final product)
    is a single correctly-rounded IEEE op over exact integer inputs, so
    the result is engine-independent before the 6-decimal rounding.
    Clipped counts are the standard modified-precision: per n-gram,
    min(count_in_candidate, count_in_reference), summed exactly.

    Scale shape: pair generation is an equi-join on the (lang, id mod
    ``block_mod``) block key — never all-pairs; clipped-overlap joins key
    the two per-doc count tables directly on (lang, blk, gram), so only
    grams SHARED within a block ever join (grams the reference lacks
    contribute min(ca, 0) = 0 and are never materialized), and the wide
    text column never joins anything."""
    from nonconsumptive_spark.functions.text import tokenize
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    # The token arrays feed THREE consumers (unigram counts, bigram
    # counts, lengths/pairs); materializing them once replaces three
    # tokenize passes over the corpus with one (guide §1.2 step 1: don't
    # compute things twice).  r8 A/B warm at sf0.1: 3.0 -> 1.7 s.
    toks = materialize_once(
        docs.select(
            F.col(id_col).alias("doc"),
            F.col(lang_col).alias("lang"),
            (F.col(id_col) % block_mod).alias("blk"),
            tokenize(F.col(text_col)).alias("t"),
        ),
        "bleu_toks",
    )
    # Count tables carry the doc-functional (lang, blk) block key in
    # their groupBy (free: same shuffle rows, two narrow extra columns)
    # so the clip joins below can key on the block directly.
    uni = materialize_once(
        toks.select("doc", "lang", "blk", F.explode("t").alias("g"))
        .groupBy("doc", "lang", "blk", "g")
        .agg(F.count("*").cast("long").alias("c")),
        "bleu_uni",
    )
    big = materialize_once(
        toks.select(
            "doc", "lang", "blk",
            F.explode(F.zip_with(
                F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )).alias("g"),
        )
        .groupBy("doc", "lang", "blk", "g")
        .agg(F.count("*").cast("long").alias("c")),
        "bleu_big",
    )
    lens = toks.select(
        "doc", "lang", "blk",
        F.size("t").cast("long").alias("l1"),
        F.greatest(F.size("t") - 1, F.lit(0)).cast("long").alias("l2"),
    )
    a = lens.select(F.col("doc").alias("doc_a"), "lang", "blk",
                    F.col("l1").alias("l1_a"))
    b = lens.select(F.col("doc").alias("doc_b"), "lang", "blk",
                    F.col("l1").alias("l1_b"), F.col("l2").alias("l2_b"))
    pairs = materialize_once(
        a.join(b, ["lang", "blk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "l1_a", "l1_b", "l2_b"),
        "bleu_pairs",
    )

    def _clip(cnt: DataFrame, name: str) -> DataFrame:
        # Σ_{g∈candidate} min(ca, cb) has nonzero terms only for grams
        # PRESENT ON BOTH SIDES, so the clip is one equi-join of the
        # count table against itself on (lang, blk, g) + the pair agg —
        # the old pairs⋈counts⋈counts form fanned every pair out to ALL
        # candidate grams first (pairs x |grams(A)| intermediate rows vs
        # shared grams only) and Catalyst built broadcasts of the
        # corpus-sized count table for both joins (guide §3.1:
        # broadcast the small side, never the corpus).  Zero-overlap
        # pairs re-enter via the left join + coalesce(0) below.
        xa = cnt.select(F.col("doc").alias("doc_a"), "lang", "blk", "g",
                        F.col("c").alias("ca"))
        xb = cnt.select(F.col("doc").alias("doc_b"), "lang", "blk", "g",
                        F.col("c").alias("cb"))
        return (
            xa.join(xb, ["lang", "blk", "g"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.least("ca", "cb")).cast("long").alias(name))
        )
    out = (
        pairs
        .join(_clip(uni, "clip1"), ["doc_a", "doc_b"], "left")
        .join(_clip(big, "clip2"), ["doc_a", "doc_b"], "left")
        .withColumn("clip1", F.coalesce("clip1", F.lit(0)).cast("long"))
        .withColumn("clip2", F.coalesce("clip2", F.lit(0)).cast("long"))
    )
    p1 = F.col("clip1").cast("double") / F.col("l1_b")
    p2 = F.col("clip2").cast("double") / F.col("l2_b")
    bp = F.least(F.lit(1.0), F.col("l1_b").cast("double") / F.col("l1_a"))
    ok = (F.col("l1_b") > 0) & (F.col("l2_b") > 0) & (F.col("l1_a") > 0)
    scored = (F.col("clip1") > 0) & (F.col("clip2") > 0)
    return out.select(
        "doc_a", "doc_b",
        F.when(F.col("l1_b") > 0, F.round(p1, 6) + F.lit(0.0))
        .otherwise(F.lit(0.0)).alias("p1"),
        F.when(F.col("l2_b") > 0, F.round(p2, 6) + F.lit(0.0))
        .otherwise(F.lit(0.0)).alias("p2"),
        F.when(ok & scored,
               F.round(bp * F.sqrt(p1 * p2), 6) + F.lit(0.0))
        .otherwise(F.lit(0.0)).alias("bleu2"),
    )


CAL_SCALE = 10**6
CAL_BINS = 10


def calibration_bins(df: DataFrame, label_col: str = "label",
                     score_col: str = "score", pos_value: int = 1,
                     n_bins: int = CAL_BINS) -> DataFrame:
    """(bin, n, n_pos, avg_conf, pos_rate, gap) — the reliability-diagram
    table behind Expected Calibration Error: scores map to a pseudo-
    probability (clip to [-1,1], shift to [0,1]), bin into ``n_bins``
    equal-width bins, and each bin reports its mean confidence vs its
    empirical positive rate; gap = |avg_conf - pos_rate| is the per-bin
    ECE contribution (weight n/N left to the reader so the table stays
    re-aggregatable).

    Convention: a row is POSITIVE iff ``label_col == pos_value``;
    the default follows the usual label=1-is-positive convention — pass
    ``pos_value`` explicitly when the positive class is encoded
    otherwise (the registry's q_calibration_bins uses pos_value=0
    because the synthetic embeddings table marks its positives that
    way).

    Exactness: per-row confidence quantizes to a CAL_SCALE BIGINT before
    the per-bin sum, so avg_conf is exact-integer-sum / (n * CAL_SCALE)
    — one float division; pos_rate and gap are one division and one
    subtraction.  Scale: one n_bins-group agg; nothing after it scales
    with rows."""
    clipped = F.greatest(F.lit(-1.0),
                         F.least(F.lit(1.0),
                                 F.col(score_col).cast("double")))
    p_hat = (clipped + F.lit(1.0)) / F.lit(2.0)
    b = F.least(F.floor(p_hat * n_bins).cast("long"), F.lit(n_bins - 1))
    pq = F.floor(p_hat * CAL_SCALE + F.lit(0.5)).cast("long")
    base = df.select(
        b.alias("bin"), pq.alias("pq"),
        (F.col(label_col) == pos_value).cast("long").alias("pos"),
    )
    agg = base.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("pq").cast("long").alias("spq"),
    )
    avg_conf = F.col("spq").cast("double") / (F.col("n") * CAL_SCALE)
    pos_rate = F.col("n_pos").cast("double") / F.col("n")
    return agg.select(
        "bin", "n", "n_pos",
        (F.round(avg_conf, 6) + F.lit(0.0)).alias("avg_conf"),
        (F.round(pos_rate, 6) + F.lit(0.0)).alias("pos_rate"),
        (F.round(F.abs(avg_conf - pos_rate), 6) + F.lit(0.0)).alias("gap"),
    )


def rouge2_pairs(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", lang_col: str = "lang",
                 block_mod: int = BLEU_BLOCK_MOD) -> DataFrame:
    """(doc_a, doc_b, clip2, rouge2_p, rouge2_r, rouge2_f1) — ROUGE-2
    between blocked document pairs: clipped bigram overlap scored as
    recall against the lower-id doc (the "reference"), the summary-eval
    complement to ``bleu_pairs``'s precision view.

    The harmonic mean needs no intermediate floats: with both precision
    and recall sharing the clip2 numerator, F1 = 2*clip2/(l2_a + l2_b)
    — ONE division of exact BIGINTs, like P and R themselves, so every
    score replays bit-for-bit cross-engine before the 6-decimal round.

    Scale shape: identical to bleu_pairs — (lang, id mod ``block_mod``)
    block equi-join for pairs; the clipped overlap is ONE self-join of
    the per-doc bigram count table on (lang, blk, gram) (only grams
    shared within a block join; see bleu_pairs._clip for why this
    replaces the pair×gram fan-out); the text column never reaches a
    join."""
    from nonconsumptive_spark.functions.text import tokenize
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    # One tokenize pass feeds both the bigram counts and the length
    # frame (r8: same discipline as bleu_pairs).
    toks = materialize_once(
        docs.select(
            F.col(id_col).alias("doc"),
            F.col(lang_col).alias("lang"),
            (F.col(id_col) % block_mod).alias("blk"),
            tokenize(F.col(text_col)).alias("t"),
        ),
        "rouge_toks",
    )
    big = materialize_once(
        toks.select(
            "doc", "lang", "blk",
            F.explode(F.zip_with(
                F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )).alias("g"),
        )
        .groupBy("doc", "lang", "blk", "g")
        .agg(F.count("*").cast("long").alias("c")),
        "rouge_big",
    )
    lens = toks.select(
        "doc", "lang", "blk",
        F.greatest(F.size("t") - 1, F.lit(0)).cast("long").alias("l2"),
    )
    a = lens.select(F.col("doc").alias("doc_a"), "lang", "blk",
                    F.col("l2").alias("l2_a"))
    b = lens.select(F.col("doc").alias("doc_b"), "lang", "blk",
                    F.col("l2").alias("l2_b"))
    pairs = materialize_once(
        a.join(b, ["lang", "blk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "l2_a", "l2_b"),
        "rouge_pairs",
    )
    xa = big.select(F.col("doc").alias("doc_a"), "lang", "blk", "g",
                    F.col("c").alias("ca"))
    xb = big.select(F.col("doc").alias("doc_b"), "lang", "blk", "g",
                    F.col("c").alias("cb"))
    clip = (
        xa.join(xb, ["lang", "blk", "g"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least("ca", "cb")).cast("long").alias("clip2"))
    )
    out = (
        pairs.join(clip, ["doc_a", "doc_b"], "left")
        .withColumn("clip2", F.coalesce("clip2", F.lit(0)).cast("long"))
    )
    return out.select(
        "doc_a", "doc_b", "clip2",
        F.when(F.col("l2_b") > 0,
               F.round(F.col("clip2").cast("double") / F.col("l2_b"), 6)
               + F.lit(0.0)).otherwise(F.lit(0.0)).alias("rouge2_p"),
        F.when(F.col("l2_a") > 0,
               F.round(F.col("clip2").cast("double") / F.col("l2_a"), 6)
               + F.lit(0.0)).otherwise(F.lit(0.0)).alias("rouge2_r"),
        F.when(F.col("l2_a") + F.col("l2_b") > 0,
               F.round((2 * F.col("clip2")).cast("double")
                       / (F.col("l2_a") + F.col("l2_b")), 6)
               + F.lit(0.0)).otherwise(F.lit(0.0)).alias("rouge2_f1"),
    )


AP_SCALE = 10**9
AP_LEVELS = 11  # 11-point interpolated AP recall levels 0.0, 0.1 .. 1.0


def average_precision(df: DataFrame, label_col: str = "y",
                      score_col: str = "score", id_col: str = "rid",
                      scale: int = AP_SCALE) -> DataFrame:
    """1-row (n, n_pos, ap, ap11) — exact average precision of
    ``score_col`` against a BINARY 0/1 ``label_col``, plus the classic
    PASCAL 11-point interpolated AP.  AP is THE ranking-quality summary
    for heavily imbalanced gradings (dedup scorers, quality filters)
    where ROC AUC saturates.

    Ranking order is total and engine-portable: (quantized score DESC,
    id ASC).  AP = mean over relevant ranks k of precision@k; each
    precision@k = cum_rel/k floor-quantizes to ``scale`` units (ONE
    division per row over exact integers), the sum is an exact BIGINT,
    and the two output divisions are single float ops.  ap11 takes, for
    each recall level L/10, the MAX quantized precision at any rank with
    recall >= L/10 — the recall test ``cum_rel*10 >= L*n_pos`` is pure
    integer arithmetic.

    Scale shape: the global rank is one sort of (score, label, id)
    triples — an eval operator runs over a scored sample, not the raw
    corpus, so the single exchange is the honest cost of an
    order-statistics metric; everything after it is the 11-row level
    spine and 1-row aggregates."""
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    spark = df.sparkSession
    sq = F.floor(F.col(score_col).cast("double") * AUC_SCALE
                 + F.lit(0.5)).cast("long")
    base = df.select(F.col(id_col).alias("rid"),
                     F.col(label_col).cast("long").alias("y"),
                     sq.alias("sq"))
    w_rank = Window.orderBy(F.desc("sq"), F.asc("rid"))
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts = base.select(
        "y",
        F.row_number().over(w_rank).cast("long").alias("rn"),
        F.sum("y").over(w_cum).cast("long").alias("cum_rel"),
    ).select(
        "y", "rn", "cum_rel",
        F.floor(F.lit(float(scale)) * F.col("cum_rel") / F.col("rn"))
        .cast("long").alias("prec_q"),
    )
    pts = materialize_once(pts, "ap_points")  # feeds tot, ap AND interp
    tot = pts.agg(F.count("*").cast("long").alias("n"),
                  F.sum("y").cast("long").alias("n_pos"))
    apq = pts.filter(F.col("y") == 1).agg(
        F.sum("prec_q").cast("long").alias("ap_sum_q"))
    levels = spark.range(0, AP_LEVELS).select(F.col("id").alias("lvl"))
    interp = (
        pts.crossJoin(F.broadcast(tot.select("n_pos")))
        .join(F.broadcast(levels),
              F.col("cum_rel") * 10 >= F.col("lvl") * F.col("n_pos"))
        .groupBy("lvl")
        .agg(F.max("prec_q").alias("mx"))
        .agg(F.sum("mx").cast("long").alias("interp_sum_q"))
    )
    return (
        tot.crossJoin(F.broadcast(apq)).crossJoin(F.broadcast(interp))
        .select(
            "n", "n_pos",
            F.when(F.col("n_pos") > 0,
                   F.round(F.col("ap_sum_q")
                           / (F.lit(scale) * F.col("n_pos")), 6)
                   + F.lit(0.0)).alias("ap"),
            F.when(F.col("n_pos") > 0,
                   F.round(F.col("interp_sum_q")
                           / F.lit(scale * AP_LEVELS), 6)
                   + F.lit(0.0)).alias("ap11"),
        )
    )


BT_Q = 10**12       # per-round quantization of MM terms and strengths
BT_ROUNDS = 5       # fixed unrolled minorize-maximize iterations
BT_P_FLOOR = 1e-6   # strength floor: keeps 1/(p_i+p_j) bounded


def bradley_terry(per_dir: DataFrame, item_col: str = "i",
                  opp_col: str = "j", wins_col: str = "w",
                  rounds: int = BT_ROUNDS) -> DataFrame:
    """(item, n_wins, n_games, strength, bt_rank) — Bradley-Terry
    strengths from directed pairwise win counts via ``rounds`` unrolled
    MM iterations (Hunter 2004):

        p_i <- W_i / sum_j n_ij / (p_i + p_j),  then normalize.

    The preference-aggregation primitive of RLHF-style data work:
    turns noisy pairwise comparisons into a global item ranking.

    Exactness discipline: every cross-row float SUM is replaced by an
    exact BIGINT sum of BT_Q-floored terms — per round, the MM
    denominator sums floor(Q * (n_ij/N) / (p_i+p_j)) and the
    normalizer sums floor(Q * p_raw) — so each round's strengths are
    a SINGLE float division over two exact integers and the fixpoint
    is bit-identical across engines and aggregation orders.  The
    ``BT_P_FLOOR`` guard (mirrored greatest()) bounds every term.

    Scale shape: the games frame is #items^2 and the per-round work is
    two broadcast joins + one agg on it — spine-bounded; the corpus
    appears only in whatever upstream agg built ``per_dir``."""
    und = (
        per_dir.select(
            F.least(F.col(item_col), F.col(opp_col)).alias("lo"),
            F.greatest(F.col(item_col), F.col(opp_col)).alias("hi"),
            F.when(F.col(item_col) < F.col(opp_col), F.col(wins_col))
            .otherwise(F.lit(0)).cast("long").alias("w_lh"),
            F.when(F.col(item_col) > F.col(opp_col), F.col(wins_col))
            .otherwise(F.lit(0)).cast("long").alias("w_hl"),
        )
        .groupBy("lo", "hi")
        .agg(F.sum("w_lh").cast("long").alias("w_lh"),
             F.sum("w_hl").cast("long").alias("w_hl"))
    )
    games = (
        und.select(F.col("lo").alias("i"), F.col("hi").alias("j"),
                   F.col("w_lh").alias("wij"),
                   (F.col("w_lh") + F.col("w_hl")).alias("nij"))
        .unionByName(
            und.select(F.col("hi").alias("i"), F.col("lo").alias("j"),
                       F.col("w_hl").alias("wij"),
                       (F.col("w_lh") + F.col("w_hl")).alias("nij")))
    )
    ntot = und.agg(
        F.sum(F.col("w_lh") + F.col("w_hl")).cast("long").alias("n_tot"))
    games = games.crossJoin(F.broadcast(ntot))
    from nonconsumptive_spark.plans.checkpoint import materialize_once
    games = materialize_once(games, "bt_games")  # feeds every MM round
    wtot = games.groupBy("i").agg(
        F.sum("wij").cast("long").alias("w_tot"),
        F.sum("nij").cast("long").alias("n_games"),
        F.max("n_tot").cast("long").alias("n_tot"),
    )
    items = wtot.select("i")
    m = items.agg(F.count("*").cast("long").alias("m"))
    p = items.crossJoin(F.broadcast(m)).select(
        "i", (F.lit(1.0) / F.col("m")).alias("p"))
    for rnd in range(rounds):
        pi = p.select(F.col("i").alias("gi"), F.col("p").alias("p_i"))
        pj = p.select(F.col("i").alias("gj"), F.col("p").alias("p_j"))
        s = (
            games.join(F.broadcast(pi), games["i"] == pi["gi"])
            .join(F.broadcast(pj), games["j"] == pj["gj"])
            .groupBy("i")
            .agg(F.sum(
                F.floor(F.lit(float(BT_Q))
                        * (F.col("nij").cast("double") / F.col("n_tot"))
                        / (F.col("p_i") + F.col("p_j"))).cast("long"))
                .cast("long").alias("s_q"))
        )
        praw = s.join(F.broadcast(wtot.select("i", "w_tot", "n_tot")), "i") \
            .select(
                "i",
                F.floor(F.lit(float(BT_Q))
                        * ((F.col("w_tot").cast("double") / F.col("n_tot"))
                           / (F.col("s_q") / F.lit(float(BT_Q)))))
                .cast("long").alias("praw_q"),
        )
        z = praw.agg(F.sum("praw_q").cast("long").alias("z_q"))
        p = praw.crossJoin(F.broadcast(z)).select(
            "i", "praw_q",
            F.greatest(F.col("praw_q") / F.col("z_q"),
                       F.lit(BT_P_FLOOR)).alias("p"),
        )
        # lineage cut per MM round: p is referenced TWICE next round, so
        # an uncut plan doubles per iteration (the Lloyd-loop playbook)
        p = materialize_once(p, f"bt_p{rnd}")
    rank_w = Window.orderBy(F.desc("praw_q"), F.asc("i"))
    return (
        p.join(F.broadcast(wtot.select("i", "w_tot", "n_games")), "i")
        .select(
            F.col("i").alias("item"),
            F.col("w_tot").alias("n_wins"),
            "n_games",
            (F.round(F.col("p"), 6) + F.lit(0.0)).alias("strength"),
            F.row_number().over(rank_w).cast("long").alias("bt_rank"),
        )
    )
