"""Multimodal plumbing + Markov sampler tests."""

from __future__ import annotations

import hashlib

from nonconsumptive_spark.operators import markov, multimodal as mm
from nonconsumptive_spark.operators.wordcount import ngram_counts


def _media(spark):
    rows = [
        (1, "image", "image/x-nc", bytearray(b"NCIM|640|480|" + b"x" * 100)),
        (2, "image", "image/x-nc", bytearray(b"NCIM|1920|1080|" + b"y" * 50)),
        (3, "video", "video/x-nc", bytearray(b"NCVID|25|" + b"z" * 200)),
        (4, "audio", "audio/x-nc", bytearray(b"RAWPCM" + b"a" * 30)),
    ]
    return spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)


def test_media_feature_extraction(spark):
    feats = {r["media_id"]: r for r in mm.extract_media_features(_media(spark)).collect()}
    assert feats[1]["width"] == 640 and feats[1]["height"] == 480
    assert feats[2]["width"] == 1920
    assert feats[3]["n_frames"] == 25 and feats[3]["width"] is None
    # undecodable audio falls back to metadata-only (stub documented)
    assert feats[4]["width"] is None
    assert feats[4]["n_bytes"] == 36
    assert feats[1]["sha1"] == hashlib.sha1(b"NCIM|640|480|" + b"x" * 100).hexdigest()


def test_binary_column_pruned_for_metadata_query(spark, tmp_path):
    # metadata-only projection must not read the binary column from parquet
    p = str(tmp_path / "media")
    _media(spark).write.parquet(p)
    df = spark.read.parquet(p).select("media_id", "kind")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan  # column pruned at scan
    assert df.count() == 4


def test_frame_sample_plan(spark):
    frames = mm.frame_sample_plan(_media(spark), every_n=10).collect()
    assert {(r["media_id"], r["frame_idx"]) for r in frames} == {(3, 0), (3, 10), (3, 20)}


def test_markov_chain_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat the cat ran"), (2, "the dog sat on the rug")],
        ["doc_id", "text"],
    )
    bi = ngram_counts(docs, 2)
    c1 = markov.generate_chain(bi, "the", length=5, seed=7)
    c2 = markov.generate_chain(bi, "the", length=5, seed=7)
    assert c1 == c2
    assert c1[0] == "the" and len(c1) >= 2
    # every adjacent pair must be an observed bigram
    observed = {(r["w0"], r["w1"]) for r in bi.collect()}
    assert all((a, b) in observed for a, b in zip(c1, c1[1:]))


def test_resize_geometry_and_stub_payload(spark):
    from nonconsumptive_spark.operators import multimodal as mm
    from pyspark.sql import functions as F

    media = spark.createDataFrame(
        [(1, "image", "image/x-nc", b"NCIM|1920|1080|xx"),
         (2, "image", "image/x-nc", b"NCIM|100|50|xx"),
         (3, "video", "video/x-nc", b"NCVID|30|xx")],   # filtered out
        ["media_id", "kind", "mime", "content"],
    )
    rows = {r["media_id"]: r for r in mm.resize_images(media, max_side=256).collect()}
    assert set(rows) == {1, 2}
    # downscale preserving aspect: 1920x1080 -> 256x144
    assert (rows[1]["dst_width"], rows[1]["dst_height"]) == (256, 144)
    assert rows[1]["scale_pct"] == 13
    # never upscale: 100x50 stays
    assert (rows[2]["dst_width"], rows[2]["dst_height"]) == (100, 50)
    assert rows[2]["scale_pct"] == 100
    # stub payload re-serializes the new dims (PIL drop-in point)
    assert bytes(rows[1]["content"]).startswith(b"NCIM|256|144|")


def test_audio_window_energy_matches_numpy(spark):
    """Windowed RMS over synthetic int8 PCM: frames tile the payload,
    values match a straight numpy computation, non-audio rows are pruned
    before the UDF."""
    import numpy as np

    from nonconsumptive_spark.operators.multimodal import (
        MEDIA_SCHEMA, audio_window_energy)

    rng = np.random.RandomState(7)
    pcm = rng.randint(-128, 128, size=2500, dtype=np.int16).astype(np.int8)
    content = b"NCAU|16b-header|" + pcm.tobytes()
    assert len(b"NCAU|16b-header|") == 16
    rows = [
        (1, "audio", "audio/pcm", bytearray(content)),
        (2, "image", "image/fake", bytearray(b"NCIM|8|8|xxxxxxxx")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["frame"]: r for r in
           audio_window_energy(media, frame_len=1024).collect()}
    assert sorted(got) == [0, 1, 2]          # 2500 samples -> 1024+1024+452
    assert got[2]["n_samples"] == 452
    assert all(r["media_id"] == 1 for r in got.values())
    x = pcm.astype(np.float64) / 128.0
    for f in range(3):
        chunk = x[f * 1024:(f + 1) * 1024]
        expect = int(np.floor(
            float(np.sqrt(np.mean(chunk * chunk))) * 10_000 + 0.5))
        assert got[f]["rms_q"] == expect


def test_stdlib_decode_handles_real_container_formats(spark):
    """PNG/GIF/BMP/WAV built with the standard library alone decode for
    real through the same mapInPandas pipeline as the synthetic format —
    the metadata layer needs no media library."""
    import io
    import struct
    import wave

    from nonconsumptive_spark.operators.multimodal import (
        extract_media_features,
        stdlib_decode,
    )

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">IIBBBBB", 640, 480, 8, 2, 0, 0, 0))
    gif = b"GIF89a" + struct.pack("<HH", 320, 200)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 100, -50)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"\x00\x01" * 1234)
    rows = [
        (1, "image", "image/png", bytearray(png)),
        (2, "image", "image/gif", bytearray(gif)),
        (3, "image", "image/bmp", bytearray(bmp)),
        (4, "audio", "audio/wav", bytearray(buf.getvalue())),
        (5, "image", "image/x-nc", bytearray(b"NCIM|32|16|x")),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, mime string, content binary")
    got = {r["media_id"]: (r["width"], r["height"], r["n_frames"])
           for r in extract_media_features(
               media, decode_fn=stdlib_decode).collect()}
    assert got[1] == (640, 480, None)
    assert got[2] == (320, 200, None)
    assert got[3] == (100, 50, None)   # bottom-up BMP: |height|
    assert got[4] == (None, None, 1234)
    assert got[5] == (32, 16, None)    # synthetic fallback still works


def test_resize_images_really_resamples_bmp_pixels(spark):
    """For uncompressed 24-bit BMP the resize pass produces a genuinely
    resampled payload (numpy nearest-neighbor), not a stub header — the
    output re-decodes with the new dims and carries real pixels."""
    import struct

    from nonconsumptive_spark.operators.multimodal import (
        resize_images,
        stdlib_decode,
    )

    def make_bmp(w, h, rows_bottom_up):
        stride = (w * 3 + 3) // 4 * 4
        body = bytearray()
        for row in rows_bottom_up:
            r = bytearray()
            for px in row:
                r += bytes(px)
            r += b"\x00" * (stride - len(r))
            body += r
        header = bytearray(54)
        header[0:2] = b"BM"
        struct.pack_into("<I", header, 2, 54 + len(body))
        struct.pack_into("<I", header, 10, 54)
        struct.pack_into("<I", header, 14, 40)
        struct.pack_into("<i", header, 18, w)
        struct.pack_into("<i", header, 22, h)
        struct.pack_into("<H", header, 26, 1)
        struct.pack_into("<H", header, 28, 24)
        return bytes(header) + bytes(body)

    # 4x2, left half red, right half green (both storage rows identical)
    row = [(0, 0, 255)] * 2 + [(0, 255, 0)] * 2   # BGR byte order
    bmp = make_bmp(4, 2, [row, row])
    media = spark.createDataFrame(
        [(1, "image", "image/bmp", bytearray(bmp))],
        "media_id long, kind string, mime string, content binary")
    out = resize_images(media, max_side=2, decode_fn=stdlib_decode).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["src_width"], r["src_height"]) == (4, 2)
    assert (r["dst_width"], r["dst_height"]) == (2, 1)
    payload = bytes(r["content"])
    meta = stdlib_decode(payload, "image")
    assert (meta["width"], meta["height"]) == (2, 1)
    off = struct.unpack("<I", payload[10:14])[0]
    # nearest-neighbor at half scale: one red, one green pixel survive
    assert payload[off:off + 3] == b"\x00\x00\xff"
    assert payload[off + 3:off + 6] == b"\x00\xff\x00"


def test_audio_energy_decodes_real_wav_pcm(spark):
    """A genuine 16-bit WAV built with the stdlib wave module goes through
    the energy kernel for real: a constant-amplitude half-scale square
    wave has RMS exactly 0.5 (5000 in 1e-4 units)."""
    import io
    import wave

    import numpy as np

    from nonconsumptive_spark.operators.multimodal import audio_window_energy

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        samples = np.tile(np.array([16384, -16384], dtype="<i2"), 1024)
        wf.writeframes(samples.tobytes())
    media = spark.createDataFrame(
        [(1, "audio", "audio/wav", bytearray(buf.getvalue()))],
        "media_id long, kind string, mime string, content binary")
    rows = audio_window_energy(media, frame_len=1024).collect()
    assert len(rows) == 2  # 2048 samples / 1024 per frame
    assert all(r["rms_q"] == 5000 for r in rows)
    assert all(r["n_samples"] == 1024 for r in rows)
