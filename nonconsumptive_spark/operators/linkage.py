"""Probabilistic record linkage: Fellegi–Sunter match scoring.

Entity resolution is the row-level sibling of document dedup: where
``operators/dedup.py`` finds near-identical TEXT, linkage finds records
that are the same ENTITY under noisy fields (Fellegi & Sunter 1969, the
model behind Splink/RecordLinkage).  The reference engine has no linkage
operator; this is a training-data-pipeline extension in the repo's
exact-arithmetic style.

Mechanics:

  * candidate pairs come from a BLOCKING equi-join (here the nation key)
    — never all-pairs, the same candidate-generation discipline as the
    LSH band joins in operators/dedup.py;
  * each pair is compared on a vector of field-agreement booleans;
  * the match weight is Σ_j log2(m_j/u_j) over agreeing fields plus
    Σ_j log2((1−m_j)/(1−u_j)) over disagreeing ones, where u_j (the
    chance-agreement rate) is estimated FROM THE BLOCKED PAIRS themselves
    (one corpus aggregate) and m_j is a fixed prior — the standard
    u-from-data / m-assumed simplification of the EM fit;
  * per-field log-weights are quantized to FS_SCALE the instant they are
    produced (the DSIR_LR_SCALE discipline), so pair scores are exact
    BIGINT sums and hash-replay cross-engine.

Distribution shape (100 TB): the blocking join shuffles on the block key
only; the u-estimate is one map-side-combined aggregate attached back as
a broadcast 1-row frame.  Block-size skew is the known failure mode of
linkage at scale — the fix is a finer composite block key (or salting via
operators/skew.py), not a different algorithm.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FS_SCALE = 1_000_000
FS_M = 0.9  # assumed per-field agreement probability among true matches


def _cmp_fields(side: str):
    """Comparison-ready projection of the customer table."""
    return [
        F.col("c_custkey").alias(f"key_{side}"),
        F.col("c_mktsegment").alias(f"seg_{side}"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias(f"bal_{side}"),
        F.col("c_name").substr(F.length("c_name"), F.lit(1)).alias(
            f"dig_{side}"
        ),
    ]


def fs_link_scores(cust: DataFrame, m_prob: float = FS_M,
                   min_agree: int = 2) -> DataFrame:
    """(key_a, key_b, n_agree, weight_scaled) for every blocked customer
    pair agreeing on at least ``min_agree`` of the three comparison
    fields (market segment, account-balance band, name check digit).

    ``weight_scaled`` is the Fellegi–Sunter log2 match weight on the
    FS_SCALE integer grid.  u_j rates are clamped to [1/n, 1−1/n] so the
    weights stay finite when a field never (or always) agrees by chance."""
    a = cust.select(*_cmp_fields("a"), F.col("c_nationkey").alias("blk"))
    b = cust.select(*_cmp_fields("b"), F.col("c_nationkey").alias("blk"))
    pairs = (
        a.join(b, "blk")
        .where(F.col("key_a") < F.col("key_b"))
        .select(
            "key_a", "key_b",
            (F.col("seg_a") == F.col("seg_b")).alias("g1"),
            (F.col("bal_a") == F.col("bal_b")).alias("g2"),
            (F.col("dig_a") == F.col("dig_b")).alias("g3"),
        )
    )
    # Pair-agreement totals WITHOUT a pass over the pair frame: within a
    # block, pairs agreeing on field j = sum over values of C(cnt, 2),
    # and the pair population is C(block size, 2) — identical exact
    # integers to counting the blocked pairs directly (fields are
    # non-NULL; a NULL group would wrongly count NULL==NULL as
    # agreement, hence the isNotNull guard), computed at CUSTOMER scale
    # instead of pair scale.  The blocked self-join below then runs
    # exactly once, for the output rows.
    base = cust.select(
        F.col("c_nationkey").alias("blk"),
        F.col("c_mktsegment").alias("f1"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("f2"),
        F.col("c_name").substr(F.length("c_name"), F.lit(1)).alias("f3"),
    )
    c2 = "coalesce(sum(count * (count - 1) div 2), 0)"
    stats = (
        base.groupBy("blk").count()
        .agg(F.expr(c2).cast("long").alias("n"))
    )
    for j in (1, 2, 3):
        stats = stats.crossJoin(F.broadcast(
            base.filter(F.col(f"f{j}").isNotNull())
            .groupBy("blk", f"f{j}").count()
            .agg(F.expr(c2).cast("long").alias(f"ca{j}"))
        ))
    scored = pairs.crossJoin(F.broadcast(stats))  # 1-row aggregate attach

    def wq(j: int):
        n = F.col("n").cast("double")
        ca = F.greatest(
            F.least(F.col(f"ca{j}"), F.col("n") - 1), F.lit(1)
        ).cast("double")
        m = F.lit(float(m_prob))
        agree_w = F.log2(m * n / ca)
        disagree_w = F.log2((F.lit(1.0) - m) * n / (n - ca))
        return F.round(
            F.when(F.col(f"g{j}"), agree_w).otherwise(disagree_w)
            * F.lit(float(FS_SCALE))
        ).cast("long")

    n_agree = sum(F.col(f"g{j}").cast("int") for j in (1, 2, 3))
    return (
        scored.select(
            "key_a", "key_b",
            n_agree.cast("long").alias("n_agree"),
            (wq(1) + wq(2) + wq(3)).alias("weight_scaled"),
        )
        .where(F.col("n_agree") >= min_agree)
    )


JW_PREFIX_WEIGHT = 0.1
JW_BOOST_THRESHOLD = 0.7
JW_KEY_CHARS = 24
JW_WINDOW = 12


def _jaro_winkler_py(s1: str, s2: str) -> float:
    """Jaro–Winkler similarity, mirroring DuckDB's vendored
    jarowinkler-cpp implementation operation-for-operation (same
    association of the float ops, 0.7 boost threshold, 0.1 prefix
    weight, prefix capped at 4) so the oracle's built-in
    ``jaro_winkler_similarity`` reproduces it bit-for-bit."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    flags1 = [False] * l1
    flags2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo = i - window if i > window else 0
        hi = i + window + 1
        if hi > l2:
            hi = l2
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = True
                flags2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(l1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    sim = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if sim > JW_BOOST_THRESHOLD:
        prefix = 0
        for c1, c2 in zip(s1[:4], s2[:4]):
            if c1 != c2:
                break
            prefix += 1
        sim += (prefix * JW_PREFIX_WEIGHT) * (1.0 - sim)
    return sim


def jaro_winkler_pairs(docs: DataFrame, threshold: float = 0.8,
                       id_col: str = "doc_id", text_col: str = "text",
                       lang_col: str = "lang", window: int = JW_WINDOW,
                       key_chars: int = JW_KEY_CHARS) -> DataFrame:
    """(doc_a, doc_b, jw) — Jaro–Winkler similarity over sorted-
    neighborhood candidate pairs of document key strings (first
    ``key_chars`` lowercased chars), keeping pairs with
    round(jw, 6) >= ``threshold`` — the fuzzy-string linkage primitive
    (names, titles, short keys) complementing the token-set measures in
    operators/dedup.py.

    Candidate generation is SNM (sorted neighborhood, Hernández &
    Stolfo 1995): rank every doc by (lang, key, id) — the content sort
    puts near-identical keys adjacent, which is exactly where the
    Winkler prefix boost puts high-similarity pairs — and compare only
    pairs within ``window`` rank positions in the same lang.  Candidates
    are therefore <= N*window (LINEAR in the corpus), unlike an id-mod
    block whose population grows quadratically within blocks as N grows.
    The rank comes from ``assign_dense_ids`` (range partition +
    per-partition offsets, never a single-reducer sort) and the
    rank-distance self-join is realized as TWO equi-joins on the rank
    bucket ``rank DIV window`` — the snm_pairs discipline.

    Spark has no Jaro–Winkler builtin, so the kernel is an Arrow-batched
    pandas UDF (per-pair O(key_chars^2) worst case, constant-bounded by
    ``key_chars``); DuckDB's builtin checks it bit-for-bit.  The UDF
    sees only the two short key columns, never full text."""
    from pyspark.sql.functions import pandas_udf

    from nonconsumptive_spark.sources.readers import assign_dense_ids

    @pandas_udf("double")
    def jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [_jaro_winkler_py(x, y) if x is not None and y is not None
             else None
             for x, y in zip(a, b)],
            dtype="float64",
        )

    keyed = docs.select(
        F.col(id_col).alias("doc"),
        F.col(lang_col).alias("lang"),
        F.substring(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                    1, key_chars).alias("k"),
    )
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    # materialized: the two bucket joins read this frame four times —
    # unmaterialized, each side would re-run the dense-rank sort
    ranked = materialize_once(
        assign_dense_ids(
            keyed, ["lang", "k", "doc"], id_name="rnk"
        ).withColumn("bkt", (F.col("rnk") / window).cast("long")),
        "jw_ranked",
    )
    a = ranked.select(F.col("doc").alias("doc_a"),
                      F.col("lang").alias("lang_a"),
                      F.col("rnk").alias("ra"), F.col("bkt").alias("ba"),
                      F.col("k").alias("ka"))
    b = ranked.select(F.col("doc").alias("doc_b"),
                      F.col("lang").alias("lang_b"),
                      F.col("rnk").alias("rb"), F.col("bkt").alias("bb"),
                      F.col("k").alias("kb"))
    same = a.join(b, a["ba"] == b["bb"])
    nxt = a.join(b, a["ba"] + 1 == b["bb"])
    return (
        same.unionByName(nxt)
        .filter((F.col("rb") > F.col("ra"))
                & (F.col("rb") - F.col("ra") < window)
                & (F.col("lang_a") == F.col("lang_b")))
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
            (F.round(jw(F.col("ka"), F.col("kb")), 6)
             + F.lit(0.0)).alias("jw"))
        .filter(F.col("jw") >= threshold)
    )
