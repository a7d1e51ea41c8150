"""W4: Markov next-token sampling over n-gram counts (the reference's
Ngrams.ipynb chain cells) — seeded, so tests are deterministic."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def transition_table(bigram_counts: DataFrame) -> DataFrame:
    """(w0, w1, count, prob): conditional next-token distribution from
    per-doc bigram counts aggregated corpus-wide."""
    global_counts = bigram_counts.groupBy("w0", "w1").agg(F.sum("count").alias("count"))
    w = Window.partitionBy("w0")
    return global_counts.withColumn(
        "prob", F.col("count") / F.sum("count").over(w)
    )


def sample_next(transitions: DataFrame, w0: str, seed: int = 42) -> str | None:
    """Weighted sample of the next token after ``w0``.  Deterministic for a
    given seed: rank by seeded-hash-scaled weight (the distributed analog
    of a weighted reservoir draw)."""
    cand = transitions.filter(F.col("w0") == w0)
    # Efraimidis-Spirakis one-pass weighted sampling: key = u^(1/w) with a
    # deterministic per-row uniform from a seeded hash.
    u = (F.abs(F.hash(F.col("w1"), F.lit(seed))) % 1_000_000 + 1) / 1_000_001.0
    keyed = cand.withColumn("k", F.pow(u, 1.0 / F.col("count")))
    row = keyed.orderBy(F.desc("k"), F.asc("w1")).limit(1).collect()
    return row[0]["w1"] if row else None


def generate_chain(bigram_counts: DataFrame, start: str, length: int = 10,
                   seed: int = 42) -> list[str]:
    """Greedy chain generation: repeated seeded weighted draws.  Driver-side
    loop over a *broadcastable* transition table (vocab-bounded, not
    corpus-bounded)."""
    tt = transition_table(bigram_counts).persist()
    try:
        out = [start]
        cur = start
        for i in range(length - 1):
            nxt = sample_next(tt, cur, seed=seed + i)
            if nxt is None:
                break
            out.append(nxt)
            cur = nxt
        return out
    finally:
        tt.unpersist()


STAT_SCALE = 10**12
STAT_ITERS = 5
STAT_DAMPING = 0.85


def stationary_distribution(bigram_counts: DataFrame,
                            n_iter: int = STAT_ITERS,
                            damping: float = STAT_DAMPING) -> DataFrame:
    """(node, pi): the damped stationary distribution of the token Markov
    chain — power iteration on the ROW-NORMALIZED transition matrix
    (weighted PageRank: edges carry transition probabilities instead of
    1/out_degree), with uniform teleport for ergodicity.  Answers "where
    does the chain actually spend its time", the usage-weighted
    centrality that plain PageRank's unweighted edges flatten.

    Exactness: each edge contribution floor-quantizes π·P to a
    1e-12-scaled BIGINT BEFORE the per-node sum (π·P ≤ 1, so sums stay
    far from overflow below ~10^6 nodes per partition of mass), the
    repo playbook that keeps float summation order out of every round;
    teleport + damping are applied to the identical integer sums.
    Dangling tokens (never a ``w0``) receive teleport and contribute
    nothing — the pagerank convention.

    Scale shape: per round ONE equi-join (π ⋈ transitions on w0) and ONE
    dst-keyed agg; transitions materialize once, π re-materializes per
    round (lineage-cut discipline)."""
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    tt = materialize_once(
        transition_table(bigram_counts).select("w0", "w1", "prob"),
        "stat_tt",
    )
    nodes = materialize_once(
        tt.select(F.col("w0").alias("node"))
        .union(tt.select(F.col("w1").alias("node")))
        .distinct(),
        "stat_nodes",
    )
    n = nodes.count()  # scalar, bounded: vocabulary size
    if n == 0:  # no transitions at all -> empty distribution, not 1/0
        return nodes.select("node", F.lit(0.0).alias("pi"))
    pi = nodes.select("node", F.lit(1.0 / n).alias("p"))
    for i in range(n_iter):
        contrib = (
            tt.join(pi.withColumnRenamed("node", "w0"), "w0")
            .select(
                F.col("w1").alias("node"),
                F.floor(F.lit(float(STAT_SCALE))
                        * (F.col("p") * F.col("prob")))
                .cast("long").alias("q"),
            )
            .groupBy("node")
            .agg(F.sum("q").cast("long").alias("s"))
        )
        pi = materialize_once(
            nodes.join(contrib, "node", "left").select(
                "node",
                (F.lit((1.0 - damping) / n)
                 + F.lit(damping)
                 * (F.coalesce("s", F.lit(0)).cast("double")
                    / F.lit(float(STAT_SCALE)))).alias("p"),
            ),
            f"stat_iter_{i}",
        )
    return pi.select(
        "node", (F.round("p", 9) + F.lit(0.0)).alias("pi"))
