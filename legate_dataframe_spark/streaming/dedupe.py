"""Streaming exact deduplication — the continuous-ingest twin of
``pipeline/dedup.exact_dedup``.

State discipline at scale: unbounded ``dropDuplicates`` state grows
with every distinct key ever seen; ``dropDuplicatesWithinWatermark``
bounds state to the watermark horizon — the right default for a
continuously-ingesting 100 TB pipeline where re-crawled duplicates
arrive close together in event time.  Keying on a content digest
(md5 of normalized text) instead of raw text keeps the state store
rows small and the shuffle uniform (no hot keys from popular
boilerplate documents).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_key(text_col: str = "text") -> F.Column:
    """Digest used as the dedup identity: md5 of whitespace-normalized
    lowercased text (matches pipeline/dedup.normalize_text)."""
    return F.md5(F.regexp_replace(F.trim(F.lower(F.col(text_col))),
                                  r"\s+", " "))


def stream_exact_dedup(
    stream: DataFrame,
    ts_col: str,
    text_col: str = "text",
    keys: Sequence[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival per content digest within the watermark
    horizon.  ``keys`` overrides the digest (e.g. a natural id)."""
    df = stream.withWatermark(ts_col, watermark)
    if keys is None:
        df = df.withColumn("__content_key", content_key(text_col))
        keys = ["__content_key"]
    return df.dropDuplicatesWithinWatermark(list(keys)).drop("__content_key")
