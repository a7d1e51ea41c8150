"""Distributed generalized suffix array over the tokenized corpus —
prefix doubling (Manber-Myers, the sort-based form used by every
MapReduce/MPI-scale suffix-array construction, e.g. Flick & Aluru 2015)
expressed as DataFrame rounds.

Why a suffix array at all: the fixed-length operators (repeated 5-token
spans, 8-token chunk dedup, 13-gram decontamination) answer "is this
EXACT n-gram repeated"; the suffix array answers "what is the LONGEST
repeated substring through every position" — the signal behind
exact-substring training-data dedup (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better"), which removes verbatim
boilerplate of ANY length without choosing n in advance.

Scale shape (the whole point):

  * ``ceil(log2 maxdoclen)`` ROUNDS, each a fixed pipeline of bounded
    shuffles over the (doc, pos, rank) frame: one self equi-join on
    (doc, pos+k) to fetch the partner rank, one distinct over rank
    pairs, one range-partitioned dense-id assignment (reusing
    ``assign_dense_ids`` — per-partition offsets, never a global
    single-partition sort), one join back.  Nothing is ever quadratic
    and no state exceeds one row per corpus token.
  * Suffixes are PER-DOCUMENT (a generalized SA): comparisons never
    cross a document boundary, missing partners rank as -1 (so a
    prefix sorts before its extensions — the implicit unique-sentinel
    convention), and identical suffixes in different documents share a
    rank (ties broken by (doc, pos) only at final ordering time).
  * Rounds stop early once every rank is unique; corpora with repeated
    full suffixes converge by rank-count fixpoint at k >= maxdoclen.
    When the longest document fits ``SEED_FULL_CAP`` the seed gram IS
    the full suffix and construction is ONE dense-rank pass, zero
    rounds (the adaptive fast path; long-doc corpora keep doubling).
  * LCPs come from the retained doubling tables (the standard
    O(log n)-per-query walk) — computed only for ADJACENT RANK GROUPS:
    same-rank suffixes are identical (LCP = full length, no walk), and
    the LCP between rank r and rank r+1 is a function of the ranks
    alone, so ONE representative pair per adjacent rank walks the
    tables (R-1 pairs) and the answer joins back by rank.  By the
    classic SA-adjacency result that max suffices for the
    longest-repeated-prefix of every suffix.  Each walk level is one
    equi-join of the bounded pair frame against that level's rank
    table; the sub-seed remainder is one in-row slice comparison.

Reference anchor: the reference has no substring machinery at all (its
dedup stops at bag-of-words hashes, nonconsumptive/corpus.py); this is
north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nonconsumptive_spark.functions.text import tokens_with_pos
from nonconsumptive_spark.plans.checkpoint import materialize_once
from nonconsumptive_spark.sources.readers import assign_dense_ids


# Below this many distinct keys, rank them with one small window and
# BROADCAST the key table back (the rank_vocab two-strategy pattern:
# same result, the physical plan picked by size).  A 1M-key table is a
# few MB broadcast; above it, the range-partitioned offsets path keeps
# the no-single-partition-window discipline for corpus scale.
DENSE_RANK_WINDOW_CAP = 1_000_000


def _dense_rank(df: DataFrame, key_cols: list[str], out: str,
                window_cap: int = DENSE_RANK_WINDOW_CAP,
                n_rows: int | None = None):
    """Dense rank of ``df`` rows by ``key_cols``: distinct keys get
    0..D-1 ids.  Three physical strategies, same result (the
    prefix-doubling rounds call this ~log(maxdoclen) times, so the
    per-round constant matters at test scale):

      * ``n_rows`` known and <= ``window_cap``: ONE ``dense_rank``
        window over the whole frame — zero joins, zero extra frames
        (r8 A/B at sf0.1, 270k positions: 2.2-3.0s -> 0.8-1.0s; the
        old small path still paid a distinct, a single-partition key
        window, and a broadcast join-back whose build side carries the
        full gram strings).
      * rows unbounded but D <= ``window_cap``: row_number over the
        DISTINCT-KEY frame (bounded by D, never corpus size) + a
        broadcast join back — zero extra shuffle of the big side.
      * D > window_cap: range-partitioned ``assign_dense_ids`` +
        shuffle join — the 100 TB path (a 100M-key table neither fits
        one window partition nor a broadcast).

    Returns (ranked df, number of distinct keys).  On the direct-window
    path the count is None — read it off the ranked frame as
    ``max(out) + 1`` (one agg over a frame the caller materializes
    anyway) only when actually needed."""
    from pyspark.sql import Window

    if n_rows is not None and n_rows <= window_cap:
        w = Window.orderBy(*key_cols)
        return df.withColumn(
            out, (F.dense_rank().over(w) - 1).cast("long")), None
    # materialize the distinct-key frame FIRST: the count, the ranking
    # and the join-back all read it — unmaterialized, each action would
    # recompute the upstream round join
    keys = materialize_once(df.select(*key_cols).distinct(), "sa_keys")
    n_distinct = keys.count()
    if n_distinct <= window_cap:
        w = Window.orderBy(*key_cols)
        keyed = keys.select(
            *key_cols,
            (F.row_number().over(w) - 1).cast("long").alias(out))
        return df.join(F.broadcast(keyed), key_cols), n_distinct
    keyed = assign_dense_ids(keys, key_cols, id_name=out)
    return df.join(keyed, key_cols), n_distinct


# Seed prefix length: round 1 ranks h-token grams built IN-ROW from the
# token arrays (the k-mer initial ranking of MPI-scale SA construction,
# Flick & Aluru 2015) instead of single tokens, so doubling starts at
# k = h and needs log2(maxdoclen / h) rounds instead of log2(maxdoclen)
# — each round is a barriered shuffle pipeline, so fewer rounds wins at
# EVERY scale.  The trade is the seed shuffle carrying h-token string
# keys (~h x avg-token bytes per position).  h = 16 is the measured
# knee of the sf0.1 warm sweep (8: 11.6s, 16: 9.5s, 24: 9.4s — box
# noise beyond that); the per-position key stays ~100 B, the same
# order as the (id, pos, rank) row it replaces for a round.  LCP
# remainders below the seed are resolved by one in-row token-slice
# comparison (see _lcp_refine), not by per-level tables.
SEED_H = 16

# Adaptive fast path: when the LONGEST document is at most this many
# tokens, the seed gram IS the full suffix — one dense rank finishes
# construction with ZERO doubling rounds, and every LCP (at most
# maxdoclen - 1 tokens, since distinct ranks mean distinct content)
# resolves in _lcp_refine's single in-row slice comparison.  The cap
# bounds the joined-gram shuffle key to ~cap x avg-token bytes (~1 KB);
# corpora with longer documents take the doubling rounds above with
# SEED_H.  At sf0.1 (maxdoclen 100) this replaces 4 doubling rounds
# (12 shuffles) with one ranking pass: 11.6s -> 4.2s warm.
SEED_FULL_CAP = 128
_GRAM_SEP = "\x01"  # sorts below every letter => joined-string order
#                       == token-sequence order (tokens are \p{L}+ only)


def _token_arrays(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from nonconsumptive_spark.functions.text import tokenize

    return docs.select(id_col, tokenize(text_col).alias("toks"))


def suffix_rank_tables(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", seed_h: int = SEED_H):
    """Run prefix doubling to convergence.  Returns
    ``(final, tables, total, arr)``: ``final`` is (id, pos, rank) with
    ranks comparing FULL suffixes (dense; identical suffixes share a
    rank), ``tables`` is the list of (prefix_len, (id, pos, rank))
    doubling tables for LCP walks (lowest level = the effective seed),
    ``total`` the corpus token count, ``arr`` the materialized (id,
    toks) token arrays (shared with ``_lcp_refine`` so the corpus is
    tokenized exactly once).  pos is 1-based.

    The effective seed is ``maxdoclen`` itself when that fits
    ``SEED_FULL_CAP`` (full suffixes rank in ONE pass, zero doubling
    rounds) and ``seed_h`` otherwise."""
    from nonconsumptive_spark.functions.text import let

    # materialized: the maxlen probe, the seed build and the LCP refine
    # all read the token arrays — unmaterialized each would re-tokenize
    arr = materialize_once(_token_arrays(docs, id_col, text_col), "sa_arr")
    maxlen = arr.agg(F.max(F.size("toks"))).collect()[0][0] or 0
    eff = maxlen if 0 < maxlen <= SEED_FULL_CAP else seed_h
    # the seed gram at pos covers tokens pos..pos+eff-1 (shorter at doc
    # end: a prefix, which the low separator makes sort BEFORE its
    # extensions — the same convention as the -1 rank sentinel below).
    grams = arr.select(
        id_col,
        F.posexplode(let(
            F.col("toks"),
            lambda toks: F.transform(
                toks,
                lambda t, i: F.concat_ws(
                    _GRAM_SEP, F.slice(toks, i + 1, eff)),
            ),
        )).alias("__p0", "gram"),
    ).select(id_col, (F.col("__p0") + 1).cast("int").alias("pos"), "gram")
    toks = materialize_once(grams, "sa_toks")
    # the row count both sizes the direct-window rank strategy (one
    # count over the materialized frame) and IS the corpus token total
    # the callers need — the ranked-frame count it replaces cost the
    # same action
    total = toks.count()
    t, n_distinct = _dense_rank(toks, ["gram"], "rank", n_rows=total)
    t = materialize_once(t.select(id_col, "pos", "rank"), f"sa_r{eff}")

    def _resolve(nd, frame):
        # direct-window _dense_rank returns no key count; dense ranks
        # are 0..D-1, so D = max(rank)+1 — one agg over the
        # already-materialized round frame, and only when the doubling
        # loop actually needs it (the adaptive full-suffix seed never
        # does: eff == maxlen ends the loop before the first test)
        if nd is not None:
            return nd
        mx = frame.agg(F.max("rank")).collect()[0][0]
        return (mx + 1) if mx is not None else 0

    tables = [(eff, t)]
    k = eff
    while k < maxlen:
        n_distinct = _resolve(n_distinct, t)
        if n_distinct >= total:
            break
        nxt = t.select(F.col(id_col), (F.col("pos") - k).alias("pos"),
                       F.col("rank").alias("_r2"))
        pairs = (
            t.join(nxt, [id_col, "pos"], "left")
            .select(id_col, "pos", "rank",
                    F.coalesce("_r2", F.lit(-1)).alias("_r2"))
        )
        t2, n2 = _dense_rank(pairs, ["rank", "_r2"], "_nr", n_rows=total)
        t = materialize_once(
            t2.select(id_col, "pos", F.col("_nr").alias("rank")),
            f"sa_r{2 * k}")
        k *= 2
        tables.append((k, t))
        n2 = _resolve(n2, t)
        if n2 == n_distinct:
            break  # fixpoint: repeated full suffixes, ranks are final
        n_distinct = n2
    return t, tables, total, arr


def suffix_array(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, pos, rank, sa): the generalized suffix array.  ``rank`` is
    dense over suffix CONTENT (ties = identical suffixes); ``sa`` is the
    0-based array position under the total order (rank, id, pos)."""
    final, _, _, _ = suffix_rank_tables(docs, id_col, text_col)
    return assign_dense_ids(final, ["rank", id_col, "pos"], id_name="sa")


def _lcp_walk(pairs: DataFrame, tables, id_col: str,
              total: int | None = None) -> DataFrame:
    """Append ``lcp`` to a frame of suffix pairs (ida, pa, idb, pb) via
    the doubling tables, highest level first: if the two suffixes'
    rank_k at their current walk offsets agree, the true LCP has at
    least k more tokens — advance both pointers by k.  Each level is
    one equi-join per side against that level's rank table; the pair
    frame never grows.  When the corpus token count is known and small
    (<= DENSE_RANK_WINDOW_CAP rows per table, a few MB) the level
    tables BROADCAST — 2 shuffles per level become map-side lookups;
    at corpus scale they shuffle-join as before."""
    bcast = total is not None and total <= DENSE_RANK_WINDOW_CAP
    wrap = F.broadcast if bcast else (lambda d: d)
    out = pairs.withColumn("lcp", F.lit(0).cast("long"))
    for k, tab in sorted(tables, key=lambda x: -x[0]):
        ra = wrap(tab.select(F.col(id_col).alias("ida"),
                             F.col("pos").alias("_pa"),
                             F.col("rank").alias("_ra")))
        rb = wrap(tab.select(F.col(id_col).alias("idb"),
                             F.col("pos").alias("_pb"),
                             F.col("rank").alias("_rb")))
        out = (
            out.withColumn("_pa", F.col("pa") + F.col("lcp"))
            .withColumn("_pb", F.col("pb") + F.col("lcp"))
            .join(ra, ["ida", "_pa"], "left")
            .join(rb, ["idb", "_pb"], "left")
            .withColumn(
                "lcp",
                F.when(
                    F.col("_ra").isNotNull() & F.col("_rb").isNotNull()
                    & (F.col("_ra") == F.col("_rb")),
                    F.col("lcp") + k,
                ).otherwise(F.col("lcp")),
            )
            .drop("_pa", "_pb", "_ra", "_rb")
        )
    return out


def _lcp_refine(walked: DataFrame, arr: DataFrame, id_col: str,
                seed_h: int) -> DataFrame:
    """Resolve the sub-``seed_h`` LCP remainder in-row: after the table
    walk the two suffixes are known to agree on ``lcp`` tokens and to
    DISAGREE within the next ``seed_h`` (their rank at offset lcp
    differed — under the adaptive full-suffix seed, distinct ranks mean
    the whole remaining LCP is below the seed), so one elementwise
    comparison of the next seed_h - 1 tokens from each document's token
    array finishes the job — two doc-keyed equi-joins and a bounded
    fold, no per-level tables below the seed.  ``arr`` is the (id,
    toks) frame suffix_rank_tables already materialized."""
    if seed_h <= 1:
        return walked
    ta = arr.select(F.col(id_col).alias("ida"), F.col("toks").alias("_ta"))
    tb = arr.select(F.col(id_col).alias("idb"), F.col("toks").alias("_tb"))
    win = seed_h - 1
    # leading-equal count of the two slices; zip_with pads the shorter
    # side with NULL and NULL == x is NULL -> fold stops there
    eqs = F.zip_with(
        F.expr(f"slice(_ta, CAST(pa + lcp AS INT), {win})"),
        F.expr(f"slice(_tb, CAST(pb + lcp AS INT), {win})"),
        lambda x, y: F.coalesce(x == y, F.lit(False)),
    )
    # leading-true count = index of the first false (array_position is
    # one native scan; the old struct-fold walked every element through
    # a higher-order lambda).  No false => every compared token agreed.
    first_false = F.array_position(eqs, F.lit(False))
    rem = F.when(first_false > 0, first_false - 1) \
        .otherwise(F.size(eqs)).cast("long")
    return (
        walked.join(ta, "ida").join(tb, "idb")
        .withColumn("lcp", F.col("lcp") + rem)
        .drop("_ta", "_tb")
    )


def longest_repeated_prefix(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """(id, pos, lrp): for every corpus position, the length of the
    longest prefix of its suffix that ALSO occurs somewhere else in the
    corpus (other position, any document).  Classic reduction: that
    longest match is always with an SA-adjacent suffix, so lrp =
    max(LCP with SA predecessor, LCP with SA successor) — n-1 pairs,
    never all pairs.

    Adjacency is computed at RANK-GROUP level, not suffix level: ranks
    are dense over suffix CONTENT, so same-rank suffixes are identical
    (LCP = full suffix length, no walk) and the LCP between any member
    of rank r and any member of rank r+1 is a function of (r, r+1)
    alone.  One representative pair per adjacent rank walks the tables
    — R-1 pairs instead of n-1 — and the per-suffix answer is
    max(full length if the rank repeats, L(r-1), L(r)) attached by one
    rank-keyed join.  This removes the former total-order
    ``assign_dense_ids`` (a range-partitioned global sort of all n
    positions), the SA self-join, and the final per-position groupBy:
    the order among equal-rank members never mattered, only group
    boundaries did."""
    final, tables, total, arr = suffix_rank_tables(docs, id_col, text_col)
    # per-rank multiplicity + one representative (min (id, pos)) member
    groups = final.groupBy("rank").agg(
        F.count("*").alias("_m"),
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_rep"),
    )
    groups = materialize_once(groups, "sa_groups")
    cur = groups.select(
        "rank",
        F.col(f"_rep.{id_col}").alias("ida"), F.col("_rep.pos").alias("pa"))
    nxt = groups.select(
        (F.col("rank") - 1).alias("rank"),
        F.col(f"_rep.{id_col}").alias("idb"), F.col("_rep.pos").alias("pb"))
    pairs = cur.join(nxt, "rank")  # (r, rep_r, rep_{r+1}): R-1 rows
    seed_h = min(k for k, _t in tables)
    if len(tables) == 1:
        # adaptive full-suffix seed: the single level's ranks ARE the
        # final ranks, and adjacent reps have distinct ranks by
        # construction, so the table walk can never advance — the whole
        # LCP is the refine's in-row comparison
        walked = pairs.withColumn("lcp", F.lit(0).cast("long"))
    else:
        walked = _lcp_walk(pairs, tables, id_col, total=total)
    walked = _lcp_refine(walked, arr, id_col, seed_h)
    lcp_next = walked.select("rank", F.col("lcp").alias("_ln"))
    lcp_prev = walked.select((F.col("rank") + 1).alias("rank"),
                             F.col("lcp").alias("_lp"))
    per_rank = (
        groups.select("rank", "_m")
        .join(lcp_next, "rank", "left")
        .join(lcp_prev, "rank", "left")
    )
    # full suffix length = doc token count - pos + 1 (in-row size over
    # the already-materialized token arrays — no aggregation)
    doclen = arr.select(id_col, F.size("toks").cast("long").alias("_dl"))
    return (
        final.join(per_rank, "rank")
        .join(doclen, id_col)
        .select(
            id_col, "pos",
            F.greatest(
                F.when(F.col("_m") > 1,
                       F.col("_dl") - F.col("pos") + 1).otherwise(F.lit(0)),
                F.coalesce("_ln", F.lit(0)),
                F.coalesce("_lp", F.lit(0)),
            ).cast("long").alias("lrp"),
        )
    )


def repeated_regions(docs: DataFrame, min_len: int,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, span_start, span_end, span_len): maximal merged intervals of
    positions covered by a repeated substring of length >= ``min_len``
    — the removal mask exact-substring dedup applies.  A position p
    with lrp(p) >= min_len certifies the window [p, p+lrp) repeats
    elsewhere; per document the certified windows are merged in-row
    (sort + one fold over this doc's flagged positions — bounded by doc
    length, zero extra shuffle beyond the lrp group)."""
    if min_len < 1:
        raise ValueError("min_len must be >= 1")
    lrp = longest_repeated_prefix(docs, id_col, text_col)
    flagged = lrp.filter(F.col("lrp") >= min_len).select(
        id_col, F.struct(F.col("pos").cast("long").alias("s"),
                         (F.col("pos") + F.col("lrp")).cast("long")
                         .alias("e")).alias("iv"))
    per_doc = flagged.groupBy(id_col).agg(
        F.sort_array(F.collect_list("iv")).alias("ivs"))
    # in-row interval merge: fold sorted intervals into
    # array<struct<s,e>>, extending the open interval or appending
    init = F.expr("CAST(array() AS array<struct<s:bigint, e:bigint>>)")
    merged = F.aggregate(
        "ivs", init,
        lambda acc, iv: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1)["e"] >= iv["s"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.struct(
                    F.element_at(acc, -1)["s"].alias("s"),
                    F.greatest(F.element_at(acc, -1)["e"],
                               iv["e"]).alias("e"))),
            ),
        ).otherwise(F.concat(acc, F.array(iv))),
    )
    return (
        per_doc.select(id_col, F.explode(merged).alias("m"))
        .select(id_col,
                F.col("m.s").alias("span_start"),
                F.col("m.e").alias("span_end"),
                (F.col("m.e") - F.col("m.s")).alias("span_len"))
    )
