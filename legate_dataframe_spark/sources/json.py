"""NDJSON scan (reference translates-but-mostly-rejects it,
dsl/ir.py:393-397,446-455 — Spark supports it outright)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def json_read(spark: SparkSession, paths: str | Sequence[str],
              schema: T.StructType | None = None) -> DataFrame:
    if isinstance(paths, str):
        paths = [paths]
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(list(paths))
