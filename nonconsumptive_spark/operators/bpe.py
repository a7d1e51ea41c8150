"""BPE vocabulary induction — learn the first ``n_merges`` byte-pair
merges from a corpus, the algorithm behind every modern LLM tokenizer
(GPT-2/SentencePiece-BPE family).

Semantics (classic word-level BPE):
  * corpus → (word, freq) counts; each word starts as its character
    sequence;
  * each round: count adjacent symbol pairs weighted by word freq
    (one count per adjacent position, so 'aaa' holds two 'a a' pairs),
    pick the most frequent pair (ties broken lexicographically), and
    merge it greedily left-to-right in every word;
  * emit (step, x, y, merged, cnt) — the merge table a tokenizer ships.

Distribution shape: the corpus-sized work is ONE word-count aggregation.
Everything after runs on the (word, freq) vocabulary table — orders of
magnitude smaller than the corpus (Heaps' law), so the per-round cost is
a vocab-sized scan.  Merge selection is inherently sequential (round i+1's
counts depend on round i's merge — the same argument as connected
components' label propagation), so each round does one bounded 1-row
collect for the argmax; the merge rewrite itself is a pure Catalyst array
fold, and each round's words frame is re-materialized so round k never
replays rounds 1..k-1's folds.

The greedy left-to-right merge as a fold: append each symbol unless the
accumulator ends with x and the incoming symbol is y, in which case the
tail becomes xy.  A just-merged tail (xy) can never re-merge in the same
round because xy != x for non-empty y — this reproduces exactly the
non-overlapping leftmost-first semantics of reference BPE trainers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nonconsumptive_spark.functions.text import let, tokenize
from nonconsumptive_spark.plans.checkpoint import materialize_once


def word_counts(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(word, freq) over the F1 tokenizer — the only corpus-sized stage."""
    return (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word freq (per occurrence)."""
    def pairs(s):
        return F.zip_with(
            F.slice(s, 1, F.greatest(F.size(s) - 1, F.lit(0))),
            F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("x"), b.alias("y")),
        )

    return (
        words.select("freq", F.explode(let(F.col("syms"), pairs)).alias("p"))
        .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_round(words: DataFrame, x: str, y: str) -> DataFrame:
    """Greedy left-to-right merge of (x, y) -> xy inside every word."""
    empty = F.array().cast("array<string>")

    def fold(s):
        step = lambda acc, sym: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(x))
            & (sym == F.lit(y)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(x + y))),
        ).otherwise(F.concat(acc, F.array(sym)))
        return F.aggregate(s, empty, step)

    return words.select("word", "freq", let(F.col("syms"), fold).alias("syms"))


def _train(docs: DataFrame, n_merges: int, id_col: str,
           text_col: str) -> tuple[list[tuple], DataFrame]:
    """Shared training loop: returns (merge rows, final segmented words)."""
    words = materialize_once(
        word_counts(docs, id_col, text_col)
        .select("word", "freq", F.split(F.col("word"), "").alias("syms")),
        "bpe_words",
    )
    merges = []
    for step in range(1, n_merges + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("x"), F.asc("y"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        x, y, cnt = best[0].x, best[0].y, best[0].cnt
        merges.append((step, x, y, x + y, cnt))
        words = materialize_once(_merge_round(words, x, y), f"bpe_round_{step}")
    return merges, words


def train_bpe(docs: DataFrame, n_merges: int = 8, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Returns the merge table: (step, x, y, merged, cnt), one row per
    learned merge, in merge order."""
    merges, _ = _train(docs, n_merges, id_col, text_col)
    return docs.sparkSession.createDataFrame(
        merges, "step long, x string, y string, merged string, cnt long"
    )


def encode_bpe(docs: DataFrame, n_merges: int = 8, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """The inference half over the training vocabulary: every word with
    its frequency, post-merge symbol count, and space-joined segmentation
    after all ``n_merges`` learned merges have been applied."""
    _, words = _train(docs, n_merges, id_col, text_col)
    return words.select(
        "word",
        F.col("freq").cast("long").alias("freq"),
        F.size("syms").cast("long").alias("n_syms"),
        F.concat_ws(" ", F.col("syms")).alias("segmented"),
    )


def apply_bpe(words: DataFrame, merge_table: list[tuple[str, str]]) -> DataFrame:
    """Segment a (word, freq, syms) frame with an already-learned merge
    list, in order — the inference half of the tokenizer."""
    for x, y in merge_table:
        words = _merge_round(words, x, y)
    return words
