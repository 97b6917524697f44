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
