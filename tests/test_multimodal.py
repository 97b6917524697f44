"""Multimodal plumbing: binary columns + Arrow-batched feature UDF.

The decode kernels are stubbed (no codec libs here) — these tests
exercise the REAL distributed parts: schema, mapInPandas batching,
partitioning, null payloads.
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


def test_extract_features_real_decoder_stubbed(media):
    with pytest.raises(NotImplementedError, match="codec"):
        extract_features(media, fake=False)


def test_frame_sample_plan(media):
    out = frame_sample_plan(media, every_ms=1000).collect()
    # video id=3, duration 3500ms → frames at 0,1000,2000,3000
    assert [r["frame_ts_ms"] for r in sorted(out, key=lambda r: r["frame_ts_ms"])] == [0, 1000, 2000, 3000]
    assert {r["media_id"] for r in out} == {3}


def test_resize_images_metadata(media):
    out = resize_images(media, 16, 16).collect()
    assert {r["media_id"] for r in out} == {1, 2}
    assert all(r["width"] == 16 and r["height"] == 16 for r in out)
