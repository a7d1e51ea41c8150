"""Sequence packing — assemble documents into fixed-token-budget training
sequences, the step between a cleaned corpus and a dataloader.

A training run consumes fixed-length sequences (e.g. 2048/8192 tokens);
packing short documents together instead of padding each to the budget is
a 2-5x effective-throughput win.  Exact optimal bin packing is NP-hard and
needs global state; production pipelines instead shard the corpus and run
GREEDY SEQUENTIAL FILL per shard — deterministic, embarrassingly parallel,
and within a few percent of first-fit-decreasing on natural-language
length distributions.

Spark shape: one shuffle on the shard key (deterministic md5 of the doc
id, so assignment is reproducible across runs/cluster sizes — same
rationale as ``textstats.hash_sample``), then an ``applyInPandas`` greedy
fill per shard.  The fill is inherently sequential WITHIN a shard (each
doc's bin depends on every prior assignment), which is exactly why the
shard exists: at 100 TB you pick ``n_shards`` so each shard holds a few
hundred MB of ids+counts and the cluster packs all shards concurrently.
No global order, no driver state, no second shuffle.

The fill loop is O(rows-per-shard) python over a numpy array of counts —
not a per-token cost; tokenized text never moves, only (id, count) pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nonconsumptive_spark.operators.textstats import ws_token_count


def shard_of(col, n_shards: int):
    """Deterministic shard id: first 15 hex digits of md5 (< 2^60, no
    overflow) mod ``n_shards``.  Pure function of the row — reproducible
    across engines and partitionings (DuckDB: ``CAST(('0x'||substr(md5(..),
    1,15)) AS BIGINT) % n``)."""
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10)
    return (h.cast("long") % n_shards).alias("shard")


def pack_sequences(docs: DataFrame, max_len: int, n_shards: int = 16,
                   id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Greedy sequential fill: within each shard, documents (ordered by id)
    are appended to the current sequence while they fit; a doc that would
    overflow ``max_len`` opens the next sequence.  A single doc longer than
    ``max_len`` gets a sequence of its own (callers chunk oversized docs
    upstream; reference chunking semantics at transformations.py:224-255).

    Returns one row per document: (shard, seq_id, doc_id, n_tokens,
    seq_offset) — ``seq_id`` is 1-based per shard, ``seq_offset`` the token
    position where the doc starts inside its sequence.
    """
    # One narrow select — shard key and token count are both row-local
    # expressions, so the only shuffle in the whole operator is the
    # groupBy(shard) feeding the fill.
    counts = docs.select(
        F.col(id_col), shard_of(id_col, n_shards),
        ws_token_count(text_col).alias("n_tokens"),
    )

    schema = f"shard long, seq_id long, {id_col} long, n_tokens long, seq_offset long"

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        n = pdf["n_tokens"].to_numpy(dtype=np.int64)
        seq = np.empty(len(n), dtype=np.int64)
        off = np.empty(len(n), dtype=np.int64)
        s, filled = 0, max_len + 1  # force-open a sequence on the first doc
        for i, t in enumerate(n):
            if filled + t > max_len:
                s += 1
                filled = 0
            seq[i] = s
            off[i] = filled
            filled += t
        return pd.DataFrame({
            "shard": pdf["shard"].to_numpy(),
            "seq_id": seq,
            id_col: pdf[id_col].to_numpy(),
            "n_tokens": n,
            "seq_offset": off,
        })

    return counts.groupBy("shard").applyInPandas(fill, schema=schema)


def packing_stats(packed: DataFrame, max_len: int) -> DataFrame:
    """Corpus-level packing efficiency: sequences produced, docs per
    sequence, and fill ratio (tokens packed / capacity).  One extra
    aggregation over the packed assignment — no re-pack."""
    per_seq = packed.groupBy("shard", "seq_id").agg(
        F.count("*").alias("docs_in_seq"),
        F.sum("n_tokens").alias("tokens_in_seq"),
    )
    return per_seq.agg(
        F.count("*").cast("long").alias("n_sequences"),
        F.sum("docs_in_seq").cast("long").alias("n_docs"),
        F.round(F.avg("docs_in_seq"), 4).alias("avg_docs_per_seq"),
        F.round(
            F.sum(F.least(F.col("tokens_in_seq"), F.lit(max_len)))
            / (F.count("*") * max_len), 4,
        ).alias("fill_ratio"),
    )
