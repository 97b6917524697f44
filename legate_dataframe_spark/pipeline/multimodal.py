"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Decode kernels are REAL when a codec library is importable on the
executors (PIL for images, soundfile for audio — both optional) and
fall back to a deterministic fake decoder with a logged warning when
not (this sandbox has neither, so tests exercise the fake path; the
Spark-side plumbing — schemas, Arrow-batched ``mapInPandas`` UDF
signatures, batch shaping, partition sizing — is identical either way).

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


def codecs_available() -> dict[str, bool]:
    """Which real decoders are importable HERE (driver-side probe; the
    worker closures re-probe on the executors, where it matters)."""
    out = {}
    try:
        import PIL.Image  # noqa: F401
        out["image"] = True
    except ImportError:
        out["image"] = False
    try:
        import soundfile  # noqa: F401
        out["audio"] = True
    except ImportError:
        out["audio"] = False
    return out


def extract_features(media: DataFrame, dim: int = 8,
                     fake: bool = True) -> DataFrame:
    """Binary payload → feature vector via Arrow-batched mapInPandas.

    ``fake=True`` (default): deterministic byte-histogram feature —
    payload bytes folded into ``dim`` buckets, normalized — so the
    distributed plumbing (batching, schema, partitioning) is exercised
    end-to-end with reproducible values.

    ``fake=False``: real decode where a codec import succeeds on the
    executor — PIL images → ``dim``-bucket grayscale-intensity
    histogram; soundfile audio → ``dim``-bucket mean-|amplitude|
    profile — falling back to the fake feature (one logged warning per
    worker) for kinds whose codec is missing.  Rows that fail to
    decode yield a null feature rather than failing the job.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained on purpose: no module-global references, so
        # cloudpickle ships the whole closure by value and executors
        # never need this package on their PYTHONPATH (the driver
        # contract imports the repo by file path, not as an installed
        # package).  Codec imports run HERE, on the executor.
        import io
        import warnings

        def fake_feat(payload):
            acc = [0.0] * dim
            for i, b in enumerate(payload):
                acc[i % dim] += float(b)
            total = sum(acc) or 1.0
            return [v / total for v in acc]

        decoders = {}
        if not fake:
            try:
                from PIL import Image

                def image_feat(payload):
                    img = Image.open(io.BytesIO(payload)).convert("L")
                    acc = [0.0] * dim
                    for px in img.getdata():
                        acc[(px * dim) // 256] += 1.0
                    total = sum(acc) or 1.0
                    return [v / total for v in acc]

                decoders["image"] = image_feat
            except ImportError:
                warnings.warn("PIL unavailable on executor: image rows "
                              "use the deterministic fake feature")
            try:
                import numpy as np
                import soundfile as sf

                def audio_feat(payload):
                    data, _sr = sf.read(io.BytesIO(payload))
                    mono = np.abs(np.atleast_2d(data).mean(axis=-1)
                                  if data.ndim > 1 else data)
                    if mono.size == 0:
                        return [0.0] * dim
                    chunks = np.array_split(mono, dim)
                    return [float(c.mean()) if c.size else 0.0
                            for c in chunks]

                decoders["audio"] = audio_feat
            except ImportError:
                warnings.warn("soundfile unavailable on executor: audio "
                              "rows use the deterministic fake feature")

        def feat(payload, kind):
            if payload is None:
                return None
            fn = decoders.get(kind, fake_feat)
            try:
                return fn(payload)
            except Exception:
                return None  # undecodable blob → null, not job failure

        for pdf in batches:
            kinds = (pdf["kind"] if "kind" in pdf.columns
                     else [""] * len(pdf))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pdf["payload"].map(
                    lambda p: len(p) if p is not None else None),
                "feature": [feat(p, k) for p, k in
                            zip(pdf["payload"], kinds)],
            })

    # decode is the textbook compute-heavy per-row pass: a narrow input
    # (few files/row-groups) must be widened or it runs on one core.
    # `kind` routes real decoders; a kind-less frame takes the fake path
    cols = (["media_id", "kind", "payload"] if "kind" in media.columns
            else ["media_id", "payload"])
    return widen_partitions(media.select(*cols)) \
        .mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → frame-sample timestamps (metadata-only; no decode).

    Produces one row per planned frame via ``sequence``+``explode`` —
    pure SQL, no blob access, fully pruned scan.
    """
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id",
                F.explode(F.sequence(F.lit(0), F.col("duration_ms"),
                                     F.lit(every_ms))).alias("frame_ts_ms"))
    )


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), True),
])


def resize_images(media: DataFrame, width: int, height: int,
                  fake: bool = True) -> DataFrame:
    """Image resize.

    ``fake=True``: metadata-only passthrough recording the target size
    (payload untouched) — plumbing without a codec.  ``fake=False``:
    real PIL resize inside mapInPandas where PIL imports on the
    executor, passthrough with a logged warning where it doesn't.
    """
    imgs = media.filter(F.col("kind") == "image")
    if fake:
        # same RESIZED_SCHEMA projection as the real path — callers
        # must see one schema regardless of codec availability
        return imgs.select(
            "media_id",
            F.lit(width).alias("width"), F.lit(height).alias("height"),
            "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import warnings

        try:
            from PIL import Image
        except ImportError:
            Image = None
            warnings.warn("PIL unavailable on executor: resize_images "
                          "passes payloads through unchanged")

        def resize(payload):
            if payload is None or Image is None:
                return payload
            try:
                img = Image.open(io.BytesIO(payload))
                buf = io.BytesIO()
                img.resize((width, height)).save(buf, format=img.format or "PNG")
                return buf.getvalue()
            except Exception:
                return None

        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": width,
                "height": height,
                "payload": pdf["payload"].map(resize),
            })

    return widen_partitions(imgs.select("media_id", "payload")) \
        .mapInPandas(run, RESIZED_SCHEMA)
