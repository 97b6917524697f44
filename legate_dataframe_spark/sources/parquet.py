"""Parquet read/write (parquet.hpp:104-142).

Spark-first scale notes:
- The reference splits files by row-group round-robin over workers
  (cpp/src/parquet.cpp:152-207); Spark computes splits natively
  (``spark.sql.files.maxPartitionBytes``) and additionally prunes
  row-groups by min/max stats when filters push down — strictly better.
- Column projection (``columns=``) reaches the scan via ``select``;
  verify with ``.explain`` → ``ReadSchema`` shows only the projected
  columns.
- ``parquet_write`` produces a directory of part files, one per
  partition — the reference's ``part.<rank>.parquet`` layout
  (cpp/src/parquet.cpp:39-58) is Spark's native layout.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parquet_read(spark: SparkSession, paths: str | Sequence[str],
                 columns: Sequence[str] | None = None) -> DataFrame:
    if isinstance(paths, str):
        paths = [paths]
    df = spark.read.parquet(*paths)
    if columns is not None:
        df = df.select(*columns)
    return df


def parquet_read_array(spark: SparkSession, paths: str | Sequence[str],
                       columns: Sequence[str], out_col: str = "data") -> DataFrame:
    """parquet.hpp:138-142 — N same-dtype columns → one array column."""
    df = parquet_read(spark, paths, columns)
    return df.select(F.array(*columns).alias(out_col))


def parquet_write(df: DataFrame, dirpath: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(dirpath)
