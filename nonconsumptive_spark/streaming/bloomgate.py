"""Streaming Bloom-filter novelty gate: score every arriving document's
shingle overlap against a corpus-signed Bloom filter, as a stream-static
join.

The production shape: the corpus signs its shingles into the filter
offline (a bounded <= m-row set-bit table — `bloom_bits_table`, the same
representation the batch operator broadcasts); the stream side is the
fresh crawl.  Per-doc novelty (how many of my shingles the corpus has
probably seen) is the cheap pre-filter that decides which documents are
worth the expensive dedup joins at all.

Streaming constraint and how the plan differs from batch: the batch
operator (`operators/dedup.bloom_shingle_novelty`) groups probe rows per
(doc, shingle) to require ALL k positions set, then re-aggregates per
doc — two chained aggregations, which Structured Streaming rejects.
Here each of the k probes instead LEFT-joins the static bits table
SEPARATELY (k stream-static equi-joins on a <= m-row broadcast side), so
a shingle's hit flag is a pure row expression and ONE per-doc
aggregation finishes — kernel equality with the batch operator is
test-asserted."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nonconsumptive_spark.operators.dedup import (
    BLOOM_K,
    BLOOM_M,
    _bloom_pos,
    doc_shingles,
    shingle_array,
)
from nonconsumptive_spark.functions.text import tokenize


def _shingle_arr(text_col: str):
    """Distinct shingle array as a bare expression (streams can't route
    through doc_shingles' filter without losing shingle-less docs)."""
    return shingle_array(tokenize(text_col))


def bloom_bits_table(corpus_docs: DataFrame, m: int = BLOOM_M,
                     k: int = BLOOM_K, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """The static side: the corpus's Bloom filter as its DISTINCT set-bit
    positions (<= m rows however large the corpus)."""
    sh = doc_shingles(corpus_docs, id_col, text_col).select(
        F.explode("shingles").alias("shingle")
    ).distinct()
    probes = F.array(*[_bloom_pos(F.col("shingle"), i, m) for i in range(k)])
    return sh.select(F.explode(probes).alias("pos")).distinct()


def bloom_novelty_gate(stream: DataFrame, bits: DataFrame,
                       m: int = BLOOM_M, k: int = BLOOM_K,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(id, n_shingles, n_bloom_hits) per streamed document.

    Each probe joins the broadcast bits table on its own position column
    (k stream-static LEFT joins); a shingle hits iff every probe matched,
    which is then a plain row conjunction feeding the single per-doc
    aggregation Structured Streaming allows."""
    probed = stream.select(
        id_col,
        F.explode_outer(_shingle_arr(text_col)).alias("shingle"),
    )
    for i in range(k):
        probed = probed.withColumn(f"p{i}", _bloom_pos(F.col("shingle"), i, m))
        side = bits.select(
            F.col("pos").alias(f"p{i}"), F.lit(1).alias(f"h{i}")
        )
        probed = probed.join(F.broadcast(side), [f"p{i}"], "left")
    hit = F.when(
        F.col("shingle").isNotNull(),
        sum(
            (F.col(f"h{i}").isNotNull().cast("int") for i in range(k)),
            F.lit(0),
        ) == k,
    ).otherwise(F.lit(False))
    return (
        probed.select(id_col, F.col("shingle"), hit.alias("hit"))
        .groupBy(id_col)
        .agg(
            F.count("shingle").cast("long").alias("n_shingles"),
            F.sum(F.col("hit").cast("long")).cast("long").alias("n_bloom_hits"),
        )
    )
