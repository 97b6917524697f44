"""Multimodal plumbing: binary columns + Arrow-batched feature UDF.

Decode kernels try-import PIL/soundfile on the executor and fall back
to the deterministic fake feature when absent (this sandbox has
neither) — these tests exercise the REAL distributed parts either
way: schema, mapInPandas batching, partitioning, null payloads,
graceful fallback.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legate_dataframe_spark.pipeline.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
    resize_images,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "image/png", 64, 64, None, bytes([1, 2, 3, 4] * 8)),
        (2, "image", "image/jpeg", 32, 32, None, bytes(range(16))),
        (3, "video", "video/mp4", 640, 480, 3500, bytes([9] * 64)),
        (4, "audio", "audio/wav", None, None, 2000, None),  # null payload
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(3)


def test_extract_features_shapes(media):
    out = extract_features(media, dim=8).collect()
    by_id = {r["media_id"]: r for r in out}
    assert set(by_id) == {1, 2, 3, 4}
    assert by_id[1]["n_bytes"] == 32
    assert len(by_id[1]["feature"]) == 8
    assert abs(sum(by_id[1]["feature"]) - 1.0) < 1e-6  # normalized
    assert by_id[4]["feature"] is None and by_id[4]["n_bytes"] is None


def test_extract_features_deterministic(media):
    a = {r["media_id"]: r["feature"] for r in extract_features(media, dim=4).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(media, dim=4).collect()}
    assert a == b


def test_extract_features_real_decode_falls_back(media):
    """fake=False must not fail when codecs are missing: each kind
    falls back to the fake feature (warning on the executor), and when
    PIL exists image features come from real pixel decode."""
    out = {r["media_id"]: r for r in
           extract_features(media, dim=8, fake=False).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[4]["feature"] is None  # null payload stays null
    from legate_dataframe_spark.pipeline.multimodal import codecs_available
    if not codecs_available()["image"]:
        # fallback = identical to the fake path
        fake = {r["media_id"]: r["feature"] for r in
                extract_features(media, dim=8).collect()}
        assert out[1]["feature"] == fake[1]
    else:
        # payload bytes aren't a real PNG → decode failure → null
        assert out[1]["feature"] is None


def test_resize_images_real_path_passthrough(media):
    """fake=False resize without PIL passes payloads through; schema is
    the 4-column resized shape either way."""
    out = {r["media_id"]: r for r in resize_images(media, 8, 8, fake=False).collect()}
    assert set(out) == {1, 2}
    assert all(r["width"] == 8 and r["height"] == 8 for r in out.values())
    from legate_dataframe_spark.pipeline.multimodal import codecs_available
    if not codecs_available()["image"]:
        assert out[1]["payload"] == bytes([1, 2, 3, 4] * 8)


def test_frame_sample_plan(media):
    out = frame_sample_plan(media, every_ms=1000).collect()
    # video id=3, duration 3500ms → frames at 0,1000,2000,3000
    assert [r["frame_ts_ms"] for r in sorted(out, key=lambda r: r["frame_ts_ms"])] == [0, 1000, 2000, 3000]
    assert {r["media_id"] for r in out} == {3}


def test_resize_images_metadata(media):
    out = resize_images(media, 16, 16).collect()
    assert {r["media_id"] for r in out} == {1, 2}
    assert all(r["width"] == 16 and r["height"] == 16 for r in out)


def test_resize_images_same_schema_both_modes(media):
    """fake and real resize paths must expose one schema
    (RESIZED_SCHEMA) — callers can't depend on codec availability."""
    fake_cols = resize_images(media, 8, 8, fake=True).columns
    real_cols = resize_images(media, 8, 8, fake=False).columns
    assert fake_cols == real_cols == ["media_id", "width", "height", "payload"]


# ---------------------------------------------------------------- stdlib real decode
def test_synthesize_media_payloads_are_real_containers(spark):
    """Payloads must be genuinely decodable by INDEPENDENT stdlib
    readers (wave module / BMP header math), not just opaque bytes."""
    import io
    import struct
    import wave

    from legate_dataframe_spark.pipeline.multimodal import synthesize_media

    rows = {r.media_id: r for r in
            synthesize_media(spark, n_audio=3, n_image=3).collect()}
    assert len(rows) == 6

    a = rows[1]
    assert a.kind == "audio"
    with wave.open(io.BytesIO(bytes(a.payload)), "rb") as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == 8000
        assert w.getnframes() == 2048
        frames = w.readframes(2)
    # first two samples of media 1: ((1*7919 + i*104729) % 65536) - 32768
    exp0 = ((7919) % 65536) - 32768
    exp1 = ((7919 + 104729) % 65536) - 32768
    assert struct.unpack("<2h", frames) == (exp0, exp1)

    b = rows[4]
    assert b.kind == "image"
    payload = bytes(b.payload)
    assert payload[:2] == b"BM"
    _h, w_, h_, _p, bpp = struct.unpack_from("<IiiHH", payload, 14)
    assert (w_, h_, bpp) == (13, 9, 24)
    # bottom-up: first stored row is y=8; first pixel x=0 stored B,G,R
    offset = struct.unpack_from("<I", payload, 10)[0]
    m, y = 4, 8
    assert payload[offset] == (m + 7 * y) % 256
    assert payload[offset + 1] == (m + 7 * y + 11) % 256
    assert payload[offset + 2] == (m + 7 * y + 22) % 256


def test_decode_media_stats_closed_form(spark):
    """Decoded sums must equal the closed-form synthesis formulas —
    proving the decoder actually parses headers, strides and padding
    rather than echoing synthesis internals."""
    from legate_dataframe_spark.pipeline.multimodal import (
        decode_media_stats,
        synthesize_media,
    )

    media = synthesize_media(spark, n_audio=2, n_image=2)
    got = {r.media_id: r for r in decode_media_stats(media).collect()}
    for m in (0, 1):
        samples = [((m * 7919 + i * 104729) % 65536) - 32768
                   for i in range(2048)]
        r = got[m]
        assert r.kind == "audio" and r.n_units == 2048
        assert r.s1 == sum(abs(s) for s in samples)
        assert r.s2 == max(abs(s) for s in samples)
        assert r.s3 == sum(s * s for s in samples)
    for m in (2, 3):
        r = got[m]
        assert r.kind == "image" and r.n_units == 13 * 9
        for ci, field in enumerate(("s1", "s2", "s3")):
            want = sum((m + 3 * x + 7 * y + 11 * ci) % 256
                       for x in range(13) for y in range(9))
            assert getattr(r, field) == want


def test_decode_media_stats_corrupt_payload_yields_nulls(spark):
    """Undecodable bytes → null stats, not job failure (same contract
    as extract_features)."""
    from legate_dataframe_spark.pipeline.multimodal import decode_media_stats

    df = spark.createDataFrame(
        [(1, "audio", bytearray(b"not a wav")),
         (2, "image", bytearray(b"BMbogus"))],
        "media_id long, kind string, payload binary")
    rows = {r.media_id: r for r in decode_media_stats(df).collect()}
    assert rows[1].n_units is None and rows[1].s1 is None
    assert rows[2].n_units is None and rows[2].s3 is None
