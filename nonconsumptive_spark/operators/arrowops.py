"""mapInArrow operators: batch→batch transforms on raw Arrow RecordBatches.

This is the closest Spark analog to the reference's ``process_batch(
RecordBatch) → RecordBatch`` surface (data_storage.py:347-348) — no
pandas materialization at all: pyarrow.compute kernels run directly on
the Arrow buffers Spark hands over.  Prefer built-in F.* expressions
when they exist (they stay in codegen); use this tier when a pyarrow
kernel or third-party Arrow-native library is the natural
implementation.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame


def arrow_text_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(doc, n_bytes, n_ws_tokens) computed with pyarrow.compute kernels
    per RecordBatch — zero pandas, zero row loops."""
    import numpy as np
    import pyarrow.compute as pc

    def per_batch(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            text = b.column(b.schema.get_field_index(text_col))
            n_bytes = pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64())
            # ws-token count = non-empty elements of a whitespace split
            toks = pc.split_pattern_regex(text, r"\s+")
            flat = pc.list_flatten(toks)
            nonempty = pc.cast(pc.not_equal(flat, ""), pa.int64())
            parents = pc.list_parent_indices(toks)
            sums = np.zeros(len(b), dtype="int64")
            np.add.at(sums, parents.to_numpy(zero_copy_only=False),
                      nonempty.to_numpy(zero_copy_only=False))
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index(id_col)),
                    n_bytes.combine_chunks() if isinstance(n_bytes, pa.ChunkedArray) else n_bytes,
                    pa.array(sums, pa.int64()),
                ],
                names=[id_col, "n_bytes", "n_ws_tokens"],
            )

    return docs.select(id_col, text_col).mapInArrow(
        per_batch, schema=f"`{id_col}` long, n_bytes long, n_ws_tokens long"
    )
