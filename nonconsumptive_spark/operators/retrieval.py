"""Full-text retrieval scoring — BM25 over the tokenized corpus.

The capability a training-data pipeline needs when curating by *relevance
to a topic* (e.g. "collect documents about X for a domain mixture") rather
than by similarity to an embedding: classic sparse lexical ranking.

Reference anchor: the reference exposes per-document token counts and a
global vocabulary (nonconsumptive/corpus.py:186-253) — exactly the tf and
df statistics BM25 consumes; it never composes them into a ranker.  This
module is that composition, Spark-first.

Scale shape (the whole point):
  * ONE narrow map computes, per document, the token-array length and the
    query-term sub-array — tokenization runs once per row (let-bound),
    nothing corpus-sized is exploded.  Only tokens that match a query
    term leave the row, so the exploded frame is O(matches), not
    O(corpus tokens).
  * Document frequencies and corpus stats (N, avgdl) are tiny aggregates
    over that frame — broadcast back in; the fact table never shuffles
    on anything wider than doc_id.
  * Top-k is TakeOrderedAndProject (sort+limit), never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nonconsumptive_spark.functions.text import let, tokenize
from nonconsumptive_spark.plans.checkpoint import materialize_once

K1 = 1.2
B = 0.75


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = K1, b: float = B,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25
    (Robertson/Sparck-Jones weights, the Lucene ``+1`` idf variant so
    weights never go negative):

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        s(d, t) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

    Matching is case-insensitive (both sides lowercase before
    tokenizing).  Returns (doc_id, n_terms_matched, score) with the score
    rounded to 4 decimals; ordering ties break on doc_id so the cut is
    deterministic and engine-portable.
    """
    terms = sorted({t.lower() for t in query_terms})
    qset = F.array(*[F.lit(t) for t in terms])

    # one tokenize per row: dl + the query-term sub-array in a single
    # let-bound projection
    base = docs.select(
        id_col,
        let(
            tokenize(F.lower(F.col(text_col))),
            lambda toks: F.struct(
                F.size(toks).alias("dl"),
                F.filter(toks, lambda x: F.array_contains(qset, x)).alias("qt"),
            ),
        ).alias("s"),
    ).select(id_col, "s.dl", "s.qt")
    base = materialize_once(base, "bm25_base")  # dl feeds stats AND scoring

    stats = base.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    tf = (
        base.select(id_col, "dl", F.explode("qt").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))

    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    per_term = idf * F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_terms_matched"),
            F.sum(per_term).alias("raw"),
        )
    )
    # sort on a 6-decimal quantization (ulp-stable across engines), break
    # residual ties on doc_id; emit 4 decimals
    return (
        scored.select(
            id_col,
            "n_terms_matched",
            F.round("raw", 6).alias("_sk"),
            F.round("raw", 4).alias("score"),
        )
        .orderBy(F.desc("_sk"), F.asc(id_col))
        .limit(k)
        .drop("_sk")
    )



def phrase_anchor_positions(toks, phrase: list[str]):
    """1-based positions p with toks[p+i-1] == phrase[i] for all i — the
    in-row anchor scan shared by ``phrase_search`` and the streaming
    blocklist gate.  ``toks`` must already be a bound Column (callers
    wrap with ``let`` so tokenize runs once per row)."""
    k = len(phrase)
    # sequence(1, n) DESCENDS for n < 1 (never empty) and ANSI
    # element_at throws out-of-bounds, so short docs take the
    # empty-array branch up front.
    cand = F.when(
        F.size(toks) >= k,
        F.filter(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda p: F.element_at(toks, p) == F.lit(phrase[0]),
        ),
    ).otherwise(F.array().cast("array<int>"))
    if k == 1:
        return cand

    # single-parameter lambda: Spark infers HOF lambda arity from the
    # Python signature, so extra default args would be bound to the
    # (elem, index) pair — close over i via a factory instead
    def full_match(p):
        out = None
        for i in range(1, k):
            t = F.element_at(toks, p + i) == F.lit(phrase[i])
            out = t if out is None else out & t
        return out

    return F.filter(cand, full_match)


def phrase_search(docs: DataFrame, phrase: list[str],
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact phrase query: documents containing ``phrase`` as *adjacent*
    tokens, with occurrence count and first match position (1-based).

    The reference stops at bag-of-words statistics (per-doc counts,
    corpus.py:186-253); adjacency queries are the retrieval capability on
    top.  Two standard physical shapes exist:

      * positional-inverted-index join: posting lists (doc, term, pos),
        k-way equi-join on (doc, pos - slot) — right when an index is
        already materialized and the corpus is revisited per query;
      * in-row scan: the phrase lives inside one document, so matching
        never needs data from another row.

    This implements the in-row scan — ZERO shuffle, O(doc length) per
    row, trivially parallel at 100 TB (a pure narrow map over the scan;
    compare a pos-join that shuffles every matching posting).  The token
    array is let-bound so tokenize runs once per row, and candidate
    anchors are pre-filtered on the first term before the full k-term
    conjunction is checked.
    """
    if not phrase:
        raise ValueError("phrase must be non-empty")

    hits = docs.select(
        id_col,
        let(tokenize(F.col(text_col)),
            lambda toks: phrase_anchor_positions(toks, phrase)).alias("_a"),
    ).filter(F.size("_a") > 0)
    return hits.select(
        id_col,
        F.size("_a").cast("long").alias("n_hits"),
        F.element_at("_a", 1).cast("int").alias("first_pos"),
    )


def build_positional_index(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Positional posting triples (term, doc, pos), 1-based positions —
    the materialized form of the corpus for repeated retrieval queries.
    At scale, persist this bucketed/partitioned BY TERM so a query reads
    only its own terms' postings (partition pruning on term)."""
    from nonconsumptive_spark.functions.text import tokens_with_pos

    return tokens_with_pos(docs, id_col, text_col).select(
        F.col("token").alias("term"), id_col, "pos"
    )


def phrase_search_indexed(postings: DataFrame, phrase: list[str],
                          id_col: str = "doc_id") -> DataFrame:
    """Phrase query over a materialized positional index — the scale
    path when the corpus is indexed once and queried many times (the
    in-row ``phrase_search`` re-tokenizes every document per query).

    Each posting of a phrase term proposes an anchor ``pos - slot`` (the
    phrase start it would belong to); a true occurrence is an anchor all
    ``k`` slots voted for.  One broadcast join against the k-row slot
    table plus one (doc, anchor) aggregation — postings of non-phrase
    terms never leave the scan, and with the index partitioned by term
    they are never even read.  Output schema matches ``phrase_search``.
    """
    if not phrase:
        raise ValueError("phrase must be non-empty")
    k = len(phrase)
    spark = postings.sparkSession
    slots = spark.createDataFrame(
        [(i, w) for i, w in enumerate(phrase)], "slot int, w string"
    )
    anchors = (
        postings.join(F.broadcast(slots), postings["term"] == slots["w"])
        .select(id_col, (F.col("pos") - F.col("slot")).alias("anchor"), "slot")
        .groupBy(id_col, "anchor")
        .agg(F.countDistinct("slot").alias("n_slots"))
        .filter(F.col("n_slots") == k)
    )
    return anchors.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_hits"),
        F.min("anchor").cast("int").alias("first_pos"),
    )


_SPAN_INF = 2147483647


def _span_fold(k: int):
    """(init, step) for the minimal-span sweep over position-ordered
    (pos, slot) structs: the accumulator holds the last-seen position
    per term slot plus the best span so far, with the k slots unrolled
    at plan time.  Shared by the in-row and the indexed physical forms
    so both compute byte-identical spans."""
    init = F.struct(
        *[F.lit(0).alias(f"l{i}") for i in range(k)],
        F.lit(_SPAN_INF).alias("best"),
    )

    def step(acc, x):
        lasts = [
            F.when(x["slot"] == i, x["pos"]).otherwise(acc[f"l{i}"])
            for i in range(k)
        ]
        all_set = F.least(*lasts) > 0 if k > 1 else lasts[0] > 0
        span = x["pos"] - (F.least(*lasts) if k > 1 else lasts[0]) + 1
        best = F.when(all_set, F.least(acc["best"], span)).otherwise(acc["best"])
        return F.struct(*[c.alias(f"l{i}") for i, c in enumerate(lasts)],
                        best.alias("best"))

    return init, step


def min_span_proximity(docs: DataFrame, terms: list[str],
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Minimal window span containing ALL ``terms`` per document — the
    classic proximity-ranking primitive (smaller span = tighter topical
    association; span == k means the terms are adjacent in some order).

    In-row algorithm (zero shuffle, O(doc length) per row): the matching
    (pos, slot) pairs stream in position order through one ``aggregate``
    fold whose accumulator tracks the last-seen position per term slot
    and the best span so far — the standard sweep, with the k-field
    accumulator unrolled at plan time (k is a constant).  Only documents
    containing every term emit a row: (id, span, n_matches).
    """
    seen = set()
    uniq = [t for t in terms if not (t in seen or seen.add(t))]
    if not uniq:
        raise ValueError("terms must be non-empty")
    k = len(uniq)

    def slot_of(tok):
        out = F.lit(-1)
        for i, t in enumerate(uniq):
            out = F.when(tok == F.lit(t), F.lit(i)).otherwise(out)
        return out

    def matches(toks):
        return F.filter(
            F.transform(
                toks,
                lambda tok, i: F.struct((i + 1).alias("pos"),
                                        slot_of(tok).alias("slot")),
            ),
            lambda s: s["slot"] >= 0,
        )

    init, step = _span_fold(k)

    folded = docs.select(
        id_col,
        let(
            tokenize(F.col(text_col)),
            lambda toks: F.aggregate(matches(toks), init, step),
        ).alias("_a"),
        let(tokenize(F.col(text_col)),
            lambda toks: F.size(F.filter(toks, lambda t: slot_of(t) >= 0))
            ).alias("n_matches"),
    )
    return (
        folded.filter(F.col("_a.best") < _SPAN_INF)
        .select(id_col,
                F.col("_a.best").cast("int").alias("span"),
                F.col("n_matches").cast("long").alias("n_matches"))
    )


def min_span_proximity_indexed(postings: DataFrame, terms: list[str],
                               id_col: str = "doc_id") -> DataFrame:
    """Minimal-span proximity over the MATERIALIZED positional index —
    the query-many scale path (the in-row form re-tokenizes every
    document per query).  Postings of the k query terms are selected by
    a k-row broadcast slot join (term-partitioned index: other terms
    never read), gathered per document as sorted (pos, slot) structs —
    bounded by that document's matches, not its length — and swept by
    the SAME plan-time-unrolled fold as the in-row form, so both
    physical forms return identical rows.  One shuffle on doc id, state
    per doc = its match count."""
    seen = set()
    uniq = [t for t in terms if not (t in seen or seen.add(t))]
    if not uniq:
        raise ValueError("terms must be non-empty")
    k = len(uniq)
    spark = postings.sparkSession
    slots = spark.createDataFrame(
        [(i, w) for i, w in enumerate(uniq)], "slot int, w string")
    m = (
        postings.join(F.broadcast(slots), postings["term"] == slots["w"])
        .select(id_col, F.col("pos").cast("int").alias("pos"), "slot")
    )
    per_doc = m.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("pos", "slot"))).alias("ms"),
        F.count("*").cast("long").alias("n_matches"),
    )
    init, step = _span_fold(k)
    folded = per_doc.select(
        id_col, F.aggregate("ms", init, step)["best"].alias("best"),
        "n_matches")
    return (
        folded.filter(F.col("best") < _SPAN_INF)
        .select(id_col, F.col("best").cast("int").alias("span"), "n_matches")
    )


def blocklist_match(postings: DataFrame, phrases: list[list[str]],
                    id_col: str = "doc_id") -> DataFrame:
    """Match EVERY phrase of a blocklist against the corpus in ONE pass
    over the positional index — the scale form of "drop/flag documents
    containing any of these N phrases" (benchmark decontamination,
    policy blocklists, quote tracking).  Generalizes the
    ``phrase_search_indexed`` anchor-vote join from one phrase to N:
    the slot table gains a ``phrase_id`` and per-phrase length, so ONE
    broadcast join + ONE (doc, phrase, anchor) aggregation answers the
    whole list; postings of terms in no phrase never leave the scan
    (term-partitioned index: never read).

    Returns (id, phrase_id, n_hits, first_pos) — one row per document
    per matched phrase.  Fan-out per posting is the number of (phrase,
    slot) pairs its term appears in — bounded by the blocklist, not the
    corpus.
    """
    if not phrases or any(not p for p in phrases):
        raise ValueError("phrases must be non-empty and have no empty entry")
    rows = [
        (pid, slot, w, len(p))
        for pid, p in enumerate(phrases)
        for slot, w in enumerate(p)
    ]
    spark = postings.sparkSession
    slots = spark.createDataFrame(
        rows, "phrase_id int, slot int, w string, k int")
    anchors = (
        postings.join(F.broadcast(slots), postings["term"] == slots["w"])
        .select(id_col, "phrase_id",
                (F.col("pos") - F.col("slot")).alias("anchor"), "slot", "k")
        .groupBy(id_col, "phrase_id", "anchor")
        .agg(F.countDistinct("slot").alias("n_slots"), F.max("k").alias("k"))
        .filter(F.col("n_slots") == F.col("k"))
    )
    return anchors.groupBy(id_col, "phrase_id").agg(
        F.count("*").cast("long").alias("n_hits"),
        F.min("anchor").cast("int").alias("first_pos"),
    )


def postings_size_stats(postings: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """Per-term storage accounting for a delta+varint encoded positional
    index — the planning metric for index layout at scale (which terms
    dominate storage, what compression buys vs fixed 4-byte positions).

    Per (term, doc) the position list is sorted and folded in-row:
    deltas of consecutive positions, each costing ``((bitlen-1) div 7)
    + 1`` varint bytes.  One (term, doc) agg + one term agg; nothing is
    ever collected and no state exceeds a single document's postings.

    Returns (term, n_docs, n_postings, varint_bytes, fixed_bytes,
    ratio) with ratio = varint/fixed rounded to 4 decimals.
    """
    per_doc = postings.groupBy("term", id_col).agg(
        F.sort_array(F.collect_list(F.col("pos").cast("long"))).alias("ps"))
    init = F.struct(F.lit(0).cast("long").alias("prev"),
                    F.lit(0).cast("long").alias("b"))
    vbytes = (
        F.aggregate(
            "ps", init,
            lambda acc, p: F.struct(
                p.alias("prev"),
                (acc["b"]
                 + ((F.length(F.bin(p - acc["prev"])) - 1) / 7)
                 .cast("long") + 1).alias("b"),
            ),
        )["b"]
    )
    sized = per_doc.select(
        "term", F.size("ps").cast("long").alias("n"), vbytes.alias("vb"))
    return (
        sized.groupBy("term")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.sum("n").cast("long").alias("n_postings"),
             F.sum("vb").cast("long").alias("varint_bytes"))
        .select(
            "term", "n_docs", "n_postings", "varint_bytes",
            (F.col("n_postings") * 4).cast("long").alias("fixed_bytes"),
            (F.round(F.col("varint_bytes")
                     / (F.col("n_postings") * 4.0), 4) + 0.0).alias("ratio"),
        )
    )


def query_likelihood_topk(docs: DataFrame, query_terms: list[str],
                          k: int = 10, mu: float = 100.0,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Top-``k`` documents under the Dirichlet-smoothed query-likelihood
    language model (Zhai & Lafferty 2001) — the other classic sparse
    ranker next to BM25 (reference anchor: the tf/cf statistics are the
    reference's per-document counts + global wordcount,
    nonconsumptive/corpus.py:186-253; it never composes a ranker):

        score(d) = sum_t ln( (tf_{t,d} + mu * cf_t / C) / (dl_d + mu) )

    over the query terms present in the corpus (a term with cf=0 would
    send every document to -inf and carries no ranking signal, so both
    engines drop it).  Decomposed for exact cross-engine parity: each
    ln() is quantized to a 1e-9-scaled BIGINT *before* any cross-row sum
    (the hash-parity playbook used by burrows_delta / dsir_weights), so

        score_q(d) = K + sum_{matched t} [q(ln(tf + mu cf/C)) - q(ln(mu cf/C))]
                     - |Q| * q(ln(dl + mu))

    is exact integer arithmetic; summation order never reaches the
    output, and the top-k cut sorts on the BIGINT itself.

    Scale shape (same as bm25_topk): ONE let-bound tokenize per row
    yields (dl, matched-terms sub-array); only matching tokens explode,
    so the exploded frame is O(matches).  cf and the query constant are
    |Q|-row / 1-row broadcast aggregates; the per-doc frame joins them
    broadcast and never shuffles on anything wider than doc_id; the cut
    is TakeOrderedAndProject.
    """
    terms = sorted({t.lower() for t in query_terms})
    qset = F.array(*[F.lit(t) for t in terms])
    q9 = F.lit(1e9)

    base = docs.select(
        id_col,
        let(
            tokenize(F.lower(F.col(text_col))),
            lambda toks: F.struct(
                F.size(toks).alias("dl"),
                F.filter(toks, lambda x: F.array_contains(qset, x)).alias("qt"),
            ),
        ).alias("s"),
    ).select(id_col, "s.dl", "s.qt")
    base = materialize_once(base, "ql_base")  # dl feeds C AND scoring

    cc = base.agg(F.sum("dl").cast("long").alias("cc"))
    tf = (
        base.select(id_col, F.explode("qt").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    cfq = (
        tf.groupBy("term").agg(F.sum("tf").cast("long").alias("cf"))
        .crossJoin(F.broadcast(cc))
        .select(
            "term", "cf", "cc",
            F.floor(q9 * F.log(F.lit(mu) * F.col("cf") / F.col("cc")))
            .cast("long").alias("bg_q"),
        )
    )
    konst = cfq.agg(F.sum("bg_q").cast("long").alias("k_q"),
                    F.count("*").cast("long").alias("nq"))
    per_doc = (
        tf.join(F.broadcast(cfq), "term")
        .select(
            id_col,
            (F.floor(q9 * F.log(F.col("tf")
                                + F.lit(mu) * F.col("cf") / F.col("cc")))
             .cast("long") - F.col("bg_q")).alias("dq"),
        )
        .groupBy(id_col)
        .agg(F.sum("dq").cast("long").alias("dq"),
             F.count("*").cast("long").alias("n_terms_matched"))
    )
    scored = (
        base.select(id_col, "dl")
        .join(per_doc, id_col, "left")
        .crossJoin(F.broadcast(konst))
        .select(
            id_col,
            F.coalesce("n_terms_matched", F.lit(0)).cast("long")
            .alias("n_terms_matched"),
            (F.col("k_q") + F.coalesce("dq", F.lit(0))
             - F.col("nq")
             * F.floor(q9 * F.log(F.col("dl") + F.lit(mu))).cast("long"))
            .alias("score_q"),
        )
    )
    return (
        scored.orderBy(F.desc("score_q"), F.asc(id_col)).limit(k)
        .select(
            id_col, "n_terms_matched",
            (F.round(F.col("score_q") / q9, 4) + F.lit(0.0)).alias("score"),
        )
    )


RM3_SCALE = 10**9


def rm3_expansion(docs: DataFrame, query_terms: list[str], k: int = 10,
                  m: int = 15, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(term, n_docs, rm3_weight) — RM3 pseudo-relevance-feedback query
    expansion (Lavrenko & Croft 2001 relevance model, the Anserini/
    Galago default): take the BM25 top-``k`` documents, estimate the
    relevance model P(w|R) ∝ Σ_d P(w|d)·score_d over them, drop the
    original query terms, and emit the top-``m`` expansion terms with
    their normalized relevance-model weight.

    Cross-engine exactness: the top-k frame is the deterministic BM25
    cut (6-decimal sort key + id tiebreak) carrying the ROUNDED
    4-decimal score both engines share; each (term, doc) contribution
    tf/dl·score quantizes to an RM3_SCALE BIGINT the instant it is
    produced, so the per-term sum (≤ k addends) and the normalizing
    total are exact integers — one float division at emit.

    Scale shape: the k-row top frame broadcasts onto the corpus (BHJ on
    the id — only the k winning documents re-tokenize), one (term)
    agg bounded by the k docs' vocabulary, a 1-row total attach, and a
    TakeOrderedAndProject cut.  Nothing after the broadcast join scales
    with the corpus."""
    terms = sorted({t.lower() for t in query_terms})
    top = bm25_topk(docs, terms, k=k, id_col=id_col, text_col=text_col)
    rel = docs.join(
        F.broadcast(top.select(id_col, "score")), id_col
    ).select(
        id_col, "score",
        let(
            tokenize(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
            lambda toks: F.struct(
                F.size(toks).alias("dl"), toks.alias("toks")),
        ).alias("s"),
    ).select(id_col, "score", "s.dl", F.explode("s.toks").alias("term"))
    tf = (
        rel.groupBy(id_col, "term", "dl", "score")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    contrib = F.floor(
        F.col("tf").cast("double") / F.col("dl") * F.col("score")
        * RM3_SCALE
    ).cast("long")
    per_term = (
        tf.filter(F.col("dl") > 0)
        .select("term", id_col, contrib.alias("cq"))
        .groupBy("term")
        .agg(F.countDistinct(id_col).cast("long").alias("n_docs"),
             F.sum("cq").cast("long").alias("w"))
        .filter(~F.col("term").isin(terms))
    )
    total = per_term.agg(F.sum("w").cast("long").alias("wt"))
    return (
        per_term.crossJoin(F.broadcast(total))  # 1-row normalizer attach
        .select(
            "term", "n_docs",
            (F.round(F.col("w").cast("double") / F.col("wt"), 6)
             + F.lit(0.0)).alias("rm3_weight"),
            F.col("w").alias("_sk"),
        )
        .orderBy(F.desc("_sk"), F.asc("term"))
        .limit(m)
        .drop("_sk")
    )


JM_LAMBDA = 0.5


def query_likelihood_jm_topk(docs: DataFrame, query_terms: list[str],
                             k: int = 10, lam: float = JM_LAMBDA,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """Top-``k`` documents under the Jelinek-Mercer-smoothed query
    likelihood (Zhai & Lafferty 2001) — the interpolation sibling of
    the Dirichlet ranker (``query_likelihood_topk``); JM's fixed
    mixture weight makes it the standard choice for VERBOSE queries
    where Dirichlet's length-adaptive smoothing over-penalizes:

        score(d) = sum_t ln( (1-lam) tf_{t,d}/dl_d + lam cf_t/C )

    Same decomposition discipline as the Dirichlet form: corpus-absent
    terms drop on both engines; each ln() floor-quantizes to a 1e-9
    BIGINT before any cross-row sum, so

        score_q(d) = K + sum_{matched t}
                     [q(ln((1-lam) tf/dl + lam cf/C)) - q(ln(lam cf/C))]

    with K = sum_t q(ln(lam cf_t/C)) is exact integer arithmetic (note:
    unlike Dirichlet there is NO per-doc length term — unmatched docs
    score exactly K).  Scale shape identical to query_likelihood_topk:
    one let-bound tokenize, O(matches) explode, |Q|-row and 1-row
    broadcast attaches, TakeOrderedAndProject cut."""
    terms = sorted({t.lower() for t in query_terms})
    qset = F.array(*[F.lit(t) for t in terms])
    q9 = F.lit(1e9)

    base = docs.select(
        id_col,
        let(
            tokenize(F.lower(F.col(text_col))),
            lambda toks: F.struct(
                F.size(toks).alias("dl"),
                F.filter(toks, lambda x: F.array_contains(qset, x)).alias("qt"),
            ),
        ).alias("s"),
    ).select(id_col, "s.dl", "s.qt")
    base = materialize_once(base, "qljm_base")  # dl feeds C AND scoring

    cc = base.agg(F.sum("dl").cast("long").alias("cc"))
    tf = (
        base.select(id_col, "dl", F.explode("qt").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    cfq = (
        tf.groupBy("term").agg(F.sum("tf").cast("long").alias("cf"))
        .crossJoin(F.broadcast(cc))
        .select(
            "term", "cf", "cc",
            F.floor(q9 * F.log(F.lit(lam) * F.col("cf") / F.col("cc")))
            .cast("long").alias("bg_q"),
        )
    )
    konst = cfq.agg(F.sum("bg_q").cast("long").alias("k_q"))
    per_doc = (
        tf.join(F.broadcast(cfq), "term")
        .select(
            id_col,
            (F.floor(q9 * F.log(
                F.lit(1.0 - lam) * F.col("tf") / F.col("dl")
                + F.lit(lam) * F.col("cf") / F.col("cc")))
             .cast("long") - F.col("bg_q")).alias("dq"),
        )
        .groupBy(id_col)
        .agg(F.sum("dq").cast("long").alias("dq"),
             F.count("*").cast("long").alias("n_terms_matched"))
    )
    scored = (
        base.select(id_col)
        .join(per_doc, id_col, "left")
        .crossJoin(F.broadcast(konst))
        .select(
            id_col,
            F.coalesce("n_terms_matched", F.lit(0)).cast("long")
            .alias("n_terms_matched"),
            (F.col("k_q") + F.coalesce("dq", F.lit(0))).alias("score_q"),
        )
    )
    return (
        scored.orderBy(F.desc("score_q"), F.asc(id_col)).limit(k)
        .select(
            id_col, "n_terms_matched",
            (F.round(F.col("score_q") / q9, 4) + F.lit(0.0)).alias("score"),
        )
    )
