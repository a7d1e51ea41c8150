"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
pipelines.

The Spark-side machinery — schemas, batch iteration, partitioning, UDF
signatures — is real and tested.  The actual media decode is STUBBED
(``decode_fn``): the runtime container has no image/audio libraries, so the
default decoder is a deterministic fake that parses our synthetic header
format.  Swap ``decode_fn`` for a PIL/ffmpeg-backed callable in a real
deployment; nothing else changes.

Scale notes: media bytes never leave the executor (mapInPandas streams
Arrow batches); metadata-only queries prune the binary column at the scan
(columnar parquet), so "list all 1080p videos" never reads pixel bytes.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),      # image | audio | video
        StructField("mime", StringType()),
        StructField("content", BinaryType()),   # opaque payload
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha1", StringType()),
        StructField("width", IntegerType()),    # null for non-image
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),  # video frame-sample count
    ]
)


def fake_decode(content: bytes, kind: str) -> dict:
    """Deterministic fake decoder for the synthetic header format
    ``NCIM|<width>|<height>|...`` / ``NCVID|<frames>|...``.  A real
    deployment replaces this with PIL/ffmpeg — the surrounding Spark
    plumbing is identical."""
    try:
        head = content[:64].split(b"|")
        if kind == "image" and head[0] == b"NCIM":
            return {"width": int(head[1]), "height": int(head[2]), "n_frames": None}
        if kind == "video" and head[0] == b"NCVID":
            return {"width": None, "height": None, "n_frames": int(head[1])}
    except (IndexError, ValueError):
        pass
    raise NotImplementedError(
        "real media decode requires an image/audio library not present in "
        "this container; payload not in the synthetic NCIM/NCVID format"
    )


def extract_media_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], dict] = fake_decode,
) -> DataFrame:
    """Binary media → typed feature rows, one Arrow batch at a time."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None else b""
                try:
                    meta = decode_fn(content, r["kind"])
                except NotImplementedError:
                    meta = {"width": None, "height": None, "n_frames": None}
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "n_bytes": len(content),
                        "sha1": hashlib.sha1(content).hexdigest(),
                        **meta,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index,
    without decoding — the explode happens JVM-side, the (stubbed) decode
    would run per-frame in a downstream mapInPandas."""
    vids = extract_media_features(media).filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
