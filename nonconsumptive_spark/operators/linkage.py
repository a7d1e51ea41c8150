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
    stats = pairs.agg(
        F.count("*").alias("n"),
        *[F.sum(F.col(f"g{j}").cast("long")).alias(f"ca{j}") for j in (1, 2, 3)],
    )
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
