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


def stdlib_decode(content: bytes, kind: str) -> dict:
    """REAL decoder for formats parseable with the standard library alone
    — no PIL/ffmpeg needed for container headers:

      * PNG  — width/height from the IHDR chunk (big-endian u32 at 16/20)
      * GIF  — logical screen size (little-endian u16 at 6/8)
      * BMP  — BITMAPINFOHEADER dims (little-endian i32 at 18/22)
      * WAV  — frame count via the stdlib ``wave`` module (mapped onto
        ``n_frames``; sample width/rate validate the container)

    Falls back to the synthetic ``fake_decode`` format so mixed corpora
    decode uniformly; anything else raises like ``fake_decode`` does.
    Pixel/PCM *content* decode beyond headers still needs a media
    library — this covers the metadata layer for real files."""
    import struct

    try:
        if kind == "image":
            if content[:8] == b"\x89PNG\r\n\x1a\n":
                w, h = struct.unpack(">II", content[16:24])
                return {"width": int(w), "height": int(h), "n_frames": None}
            if content[:6] in (b"GIF87a", b"GIF89a"):
                w, h = struct.unpack("<HH", content[6:10])
                return {"width": int(w), "height": int(h), "n_frames": None}
            if content[:2] == b"BM":
                w, h = struct.unpack("<ii", content[18:26])
                return {"width": int(w), "height": abs(int(h)),
                        "n_frames": None}
            if content[:2] == b"\xff\xd8":  # JPEG: scan for an SOF marker
                i = 2
                while i + 9 < len(content):
                    if content[i] != 0xFF:
                        break
                    marker = content[i + 1]
                    if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                        i += 2
                        continue
                    seg_len = struct.unpack(">H", content[i + 2:i + 4])[0]
                    if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                        h, w = struct.unpack(">HH", content[i + 5:i + 9])
                        return {"width": int(w), "height": int(h),
                                "n_frames": None}
                    i += 2 + seg_len
        if kind == "audio" and content[:4] == b"RIFF" and content[8:12] == b"WAVE":
            import io
            import wave

            with wave.open(io.BytesIO(content)) as wf:
                return {"width": None, "height": None,
                        "n_frames": int(wf.getnframes())}
    except (struct.error, EOFError, ValueError):
        pass
    return fake_decode(content, kind)


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


def resize_bmp_nearest(content: bytes, dst_w: int, dst_h: int) -> bytes:
    """REAL nearest-neighbor resample of an uncompressed 24-bit BMP using
    numpy only — the one common raster format whose pixels are readable
    without an image library.  Preserves top-down/bottom-up orientation
    and 4-byte row padding; raises NotImplementedError for compressed or
    non-24-bit payloads (those genuinely need a media library)."""
    import struct

    import numpy as np

    off = struct.unpack("<I", content[10:14])[0]
    w, h = struct.unpack("<ii", content[18:26])
    bpp = struct.unpack("<H", content[28:30])[0]
    comp = struct.unpack("<I", content[30:34])[0]
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        raise NotImplementedError("only uncompressed 24-bit BMP resamples "
                                  "without an image library")
    hh = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    arr = (np.frombuffer(content, dtype=np.uint8, count=stride * hh,
                         offset=off)
           .reshape(hh, stride)[:, :w * 3].reshape(hh, w, 3))
    ys = (np.arange(dst_h) * hh) // dst_h
    xs = (np.arange(dst_w) * w) // dst_w
    out = arr[ys][:, xs]
    dstride = (dst_w * 3 + 3) // 4 * 4
    rows = np.zeros((dst_h, dstride), dtype=np.uint8)
    rows[:, :dst_w * 3] = out.reshape(dst_h, dst_w * 3)
    header = bytearray(content[:off])
    struct.pack_into("<i", header, 18, dst_w)
    struct.pack_into("<i", header, 22, dst_h if h > 0 else -dst_h)
    struct.pack_into("<I", header, 34, dstride * dst_h)
    struct.pack_into("<I", header, 2, off + dstride * dst_h)
    return bytes(header) + rows.tobytes()


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("src_width", IntegerType()),
        StructField("src_height", IntegerType()),
        StructField("dst_width", IntegerType()),
        StructField("dst_height", IntegerType()),
        StructField("scale_pct", IntegerType()),   # round(100 * dst_w / src_w)
        StructField("content", BinaryType()),      # resized payload (stub)
    ]
)


def resize_images(media: DataFrame, max_side: int = 256,
                  decode_fn: Callable[[bytes, str], dict] = fake_decode) -> DataFrame:
    """Image resize pass: fit each image inside a ``max_side`` square
    preserving aspect ratio (never upscale) — the standard normalization
    before feature extraction or VLM training.

    The geometry (target dims, scale) is REAL; the pixel resample is
    stubbed the same way decode is (no image library in this container):
    the output payload re-serializes the synthetic header with the new
    dims, which keeps the Arrow batch shape — binary in, binary out —
    identical to a PIL-backed implementation.  Swap ``decode_fn`` plus
    the payload line for Pillow and nothing else changes."""

    def _resample(content: bytes, dw: int, dh: int) -> bytes:
        if content[:2] == b"BM":
            try:
                return resize_bmp_nearest(content, dw, dh)
            except NotImplementedError:
                pass
        return f"NCIM|{dw}|{dh}|resized".encode()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None else b""
                try:
                    meta = decode_fn(content, r["kind"])
                except NotImplementedError:
                    meta = {"width": None, "height": None}
                w, h = meta.get("width"), meta.get("height")
                if not w or not h:
                    continue
                scale = min(max_side / w, max_side / h, 1.0)
                dw, dh = max(int(w * scale), 1), max(int(h * scale), 1)
                rows.append({
                    "media_id": r["media_id"],
                    "src_width": w, "src_height": h,
                    "dst_width": dw, "dst_height": dh,
                    # floor(x + 0.5): explicit half-up, portable across
                    # engines (Python round() is half-even, SQL's is not)
                    "scale_pct": int(100.0 * dw / w + 0.5),
                    # REAL resample for uncompressed 24-bit BMP
                    # (numpy-only); synthetic/stub payload otherwise
                    "content": _resample(content, dw, dh),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    imgs = media.filter(F.col("kind") == "image")
    return imgs.mapInPandas(run, schema=RESIZE_SCHEMA)


ENERGY_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("rms_q", LongType()),   # RMS quantized to 1e-4 units
    ]
)


def audio_window_energy(media: DataFrame, frame_len: int = 1024,
                        payload_offset: int = 16) -> DataFrame:
    """(media_id, frame, n_samples, rms_q): windowed RMS energy over audio
    payload bytes interpreted as signed int8 PCM — REAL signal math (no
    external library needed for 8-bit PCM), not a stub; only the codec
    layer (mp3/ogg -> PCM) would need a library and is bypassed by our
    synthetic raw-PCM payloads after ``payload_offset`` header bytes.

    This is the audio analog of resize_images: an Arrow-batched
    ``mapInPandas`` kernel whose per-row output is a bounded list of
    frames.  Non-audio rows are PRUNED BEFORE the UDF (predicate on the
    metadata column, binary bytes never move for them), and RMS is
    quantized so downstream comparisons are integer-exact."""
    import numpy as np

    def _pcm_of(content: bytes) -> "np.ndarray":
        # REAL WAV path: stdlib wave -> int16 (or int8) PCM, normalized
        # to [-1, 1); synthetic payloads fall back to raw int8 after the
        # fixed header offset
        if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
            import io
            import wave

            with wave.open(io.BytesIO(content)) as wf:
                raw = wf.readframes(wf.getnframes())
                width = wf.getsampwidth()
            if width == 2:
                return np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
            if width == 1:  # WAV 8-bit is UNsigned
                return (np.frombuffer(raw, dtype=np.uint8)
                        .astype(np.float64) - 128.0) / 128.0
            raise NotImplementedError("only 8/16-bit PCM WAV")
        return (np.frombuffer(content[payload_offset:], dtype=np.int8)
                .astype(np.float64) / 128.0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                pcm = _pcm_of(bytes(row["content"]))
                for i in range(0, len(pcm), frame_len):
                    chunk = pcm[i:i + frame_len]
                    if len(chunk) == 0:
                        continue
                    rms = float(np.sqrt(np.mean(chunk * chunk)))
                    # explicit half-up floor(x + 0.5), NOT Python round():
                    # banker's rounding has no portable SQL mirror, and
                    # rms >= 0 so half-up is exact on both engines
                    out.append((int(row["media_id"]), i // frame_len,
                                int(len(chunk)),
                                int(np.floor(rms * 10_000 + 0.5))))
            yield pd.DataFrame(
                out, columns=["media_id", "frame", "n_samples", "rms_q"])

    audio = media.filter(F.col("kind") == "audio").select("media_id", "content")
    return audio.mapInPandas(run, schema=ENERGY_SCHEMA)
