"""Chunk-level corpus deduplication — the "line dedup" pass of the
CCNet / RefinedWeb pipelines, applied at sub-document granularity.

Web-pipeline line dedup removes any LINE that occurs in many documents
(navigation bars, cookie banners, boilerplate footers) while keeping the
rest of each document intact.  The synthetic corpus carries no newlines,
so the unit here is a deterministic fixed-length token window
(``chunk_len`` tokens) — the same boundaries on both engines, which is
exactly how fixed-window substring dedup (e.g. suffix-window passes) is
run when no natural line structure exists.

Semantics: a chunk whose normalized text occurs in >= ``min_doc_freq``
DISTINCT documents is removed from EVERY document containing it; each
document's text is reassembled from its surviving chunks in order.
(Within-document repeats don't count toward the threshold — that axis is
covered by operators/dedup.py `remove_repeated_spans`.)

Distribution shape (the 100 TB story):

  * the document-frequency pass explodes (id, idx, md5(chunk)) — 32-char
    hashes, never chunk text — so the big shuffle carries short keys;
  * flagged chunk hashes come back via a LEFT SEMI equi-join on the hash,
    then collapse to one (id, bad_idx[]) row per affected document — the
    only rows that reach the reassembly join;
  * reassembly rebuilds text IN-ROW with an index-aware ``filter`` over
    the chunk array, so document text itself is never exploded; the final
    join's right side holds only ints for the (usually small) flagged
    subset, which AQE broadcast-converts when it fits;
  * the tokenize -> chunk expression is evaluated once per branch via
    ``let`` (two corpus scans total: one for counting, one for rebuild —
    the classic two-pass trade that avoids materializing chunk text).

No reference analog (the reference dedups whole documents only); this is
one of the brief's training-data-pipeline extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nonconsumptive_spark.functions.text import let, tokenize

CHUNK_LEN = 8
MIN_DOC_FREQ = 2


def chunk_texts(text_col, chunk_len: int = CHUNK_LEN):
    """text -> array<string> of space-joined ``chunk_len``-token windows
    (last window may be shorter).  Empty text -> empty array."""
    def build(t):
        n = F.floor((F.size(t) + chunk_len - 1) / F.lit(chunk_len)).cast("int")
        return F.when(
            n > 0,
            F.transform(
                F.sequence(F.lit(0), n - 1),
                lambda i: F.concat_ws(" ", F.slice(t, i * chunk_len + 1, chunk_len)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return let(tokenize(text_col), build)


def remove_duplicated_chunks(
    docs: DataFrame,
    chunk_len: int = CHUNK_LEN,
    min_doc_freq: int = MIN_DOC_FREQ,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, clean_text, n_chunks, n_removed): drop every chunk present in
    >= ``min_doc_freq`` distinct documents, reassemble the survivors."""
    chunked = docs.select(F.col(id_col), chunk_texts(text_col, chunk_len).alias("chunks"))

    hashed = chunked.select(
        id_col, F.posexplode("chunks").alias("idx", "chunk")
    ).select(id_col, "idx", F.md5("chunk").alias("h"))

    flagged = (
        hashed.groupBy("h")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") >= min_doc_freq)
        .select("h")
    )

    bad_pos = (
        hashed.join(flagged, "h", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("idx").alias("bad_idx"))
    )

    bad = F.coalesce(F.col("bad_idx"), F.array().cast("array<int>"))
    return (
        chunked.join(bad_pos, id_col, "left")
        .select(
            id_col,
            let(
                bad,
                lambda b: F.concat_ws(
                    " ",
                    F.filter("chunks", lambda c, i: ~F.array_contains(b, i)),
                ),
            ).alias("clean_text"),
            F.size("chunks").cast("long").alias("n_chunks"),
            F.size(bad).cast("long").alias("n_removed"),
        )
    )


# --------------------------------------------------------------------------
# Content-defined chunking (CDC): the rsync/LBFS boundary trick applied to
# token streams.  Fixed windows (above) lose every boundary after a single
# inserted token; CDC cuts wherever a rolling content hash hits 0 mod G, so
# an edit only perturbs the one chunk containing it and chunking re-syncs
# at the next content-defined boundary — the property storage dedup systems
# rely on, applied here to find shift-invariant duplicated text.
CDC_G = 8  # boundary divisor => expected chunk length ~G tokens


def cdc_chunks(text_col, g: int = CDC_G):
    """text -> array<string> of content-defined chunks.  A chunk starts at
    position 1 and after every position p (2-based) where
    md5(token[p-1] + ' ' + token[p]) % g == 0 — a pure function of the two
    local tokens, so identical text yields identical chunks at ANY offset."""
    from nonconsumptive_spark.operators.dedup import _md5_long

    def cut(t):
        cand = F.when(
            F.size(t) >= 2,
            F.filter(
                F.sequence(F.lit(2), F.size(t)),
                lambda p: _md5_long(
                    F.concat_ws(" ", F.element_at(t, p - 1), F.element_at(t, p))
                ) % g == 0,
            ),
        ).otherwise(F.array().cast("array<int>"))
        starts = F.concat(F.array(F.lit(1)), cand)

        def assemble(s):
            return F.transform(
                F.sequence(F.lit(1), F.size(s)),
                lambda i: F.concat_ws(
                    " ",
                    F.slice(
                        t,
                        F.element_at(s, i),
                        F.when(
                            i < F.size(s),
                            F.element_at(s, i + 1) - F.element_at(s, i),
                        ).otherwise(F.size(t) - F.element_at(s, i) + 1),
                    ),
                ),
            )

        return F.when(F.size(t) > 0, let(starts, assemble)) \
                .otherwise(F.array().cast("array<string>"))

    return let(tokenize(text_col), cut)


def cdc_duplicated_chunks(docs: DataFrame, g: int = CDC_G,
                          min_doc_freq: int = MIN_DOC_FREQ,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """(chunk_md5, n_docs, n_occ) for every content-defined chunk appearing
    in >= ``min_doc_freq`` DISTINCT documents — the shift-invariant
    boilerplate detector (a copied passage surfaces even when its host
    documents prepend/insert text, where fixed-window chunking would slide
    every boundary).

    Plan shape (100 TB): chunking is a zero-shuffle in-row expression; the
    explode emits one md5 SHORT KEY per ~g tokens (chunk text never
    shuffles); the doc-frequency agg is one map-side-combinable hash agg
    on that key.  Same shuffle discipline as remove_duplicated_chunks."""
    chunks = docs.select(
        F.col(id_col), F.explode(cdc_chunks(text_col, g)).alias("chunk")
    )
    return (
        chunks.select(id_col, F.md5("chunk").alias("chunk_md5"))
        .groupBy("chunk_md5")
        .agg(
            F.count_distinct(id_col).cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= min_doc_freq)
    )
