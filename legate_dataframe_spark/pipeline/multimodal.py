"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode/feature kernels are STUBBED (image/audio libraries are not
available in this environment — see ``_require_codec``): the Spark-side
plumbing — schemas, Arrow-batched ``mapInPandas`` UDF signatures, batch
shaping, partition sizing — is real and tested with a deterministic
fake decoder.

Scale notes: media blobs ride as parquet binary columns; decode happens
inside ``mapInPandas`` (Arrow batches, no per-row pickling), and
``spark.sql.files.maxPartitionBytes`` bounds blob-partition memory.
Metadata-only transforms never touch the binary column (column pruning
keeps blobs unread on disk).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from legate_dataframe_spark.core.partitioning import widen_partitions

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),      # image/video
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),   # audio/video
    T.StructField("payload", T.BinaryType(), True),     # opaque blob
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def _require_codec(kind: str):
    raise NotImplementedError(
        f"real {kind} decoding needs a codec library (PIL/ffmpeg/librosa) "
        "not available in this environment; use fake=True for the "
        "deterministic stub decoder"
    )


def extract_features(media: DataFrame, dim: int = 8,
                     fake: bool = True) -> DataFrame:
    """Binary payload → feature vector via Arrow-batched mapInPandas.

    The deterministic fake feature is a byte histogram folded to ``dim``
    buckets, normalized — stands in for a real embedding so the
    distributed plumbing (batching, schema, partitioning) is exercised
    end-to-end.
    """
    if not fake:
        _require_codec("media")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained on purpose: no module-global references, so
        # cloudpickle ships the whole closure by value and executors
        # never need this package on their PYTHONPATH (the driver
        # contract imports the repo by file path, not as an installed
        # package).
        def feat(payload):
            if payload is None:
                return None
            acc = [0.0] * dim
            for i, b in enumerate(payload):
                acc[i % dim] += float(b)
            total = sum(acc) or 1.0
            return [v / total for v in acc]

        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pdf["payload"].map(
                    lambda p: len(p) if p is not None else None),
                "feature": pdf["payload"].map(feat),
            })
            yield out

    # decode is the textbook compute-heavy per-row pass: a narrow input
    # (few files/row-groups) must be widened or it runs on one core
    return widen_partitions(media.select("media_id", "payload")) \
        .mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → frame-sample timestamps (metadata-only; decode stubbed).

    Produces one row per planned frame via ``sequence``+``explode`` —
    pure SQL, no blob access, fully pruned scan.
    """
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id",
                F.explode(F.sequence(F.lit(0), F.col("duration_ms"),
                                     F.lit(every_ms))).alias("frame_ts_ms"))
    )


def resize_images(media: DataFrame, width: int, height: int,
                  fake: bool = True) -> DataFrame:
    """Image resize plumbing; stubbed decode (deterministic passthrough
    that records the target size in metadata)."""
    if not fake:
        _require_codec("image")
    return (
        media.filter(F.col("kind") == "image")
        .withColumn("width", F.lit(width))
        .withColumn("height", F.lit(height))
    )
