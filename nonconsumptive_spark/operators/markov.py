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
