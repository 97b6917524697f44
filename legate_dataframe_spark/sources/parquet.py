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


def parquet_write(
    df: DataFrame,
    dirpath: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    max_records_per_file: int | None = None,
    cluster_by: Sequence[str] | None = None,
) -> None:
    """Write a parquet directory (reference layout, parquet.hpp:104).

    ``partition_by`` produces Hive-style ``col=value/`` subdirectories —
    the 100 TB backbone: a reader filtering on the partition column
    scans only matching directories (PartitionFilters in the plan, zero
    I/O for pruned partitions, asserted in
    tests/test_sources_table.py::test_partitioned_write_prunes).
    Choose low-cardinality columns (date, language, source); a
    high-cardinality partition key = millions of tiny files.
    ``max_records_per_file`` caps file size where partitions are
    skewed (one giant date directory would otherwise emit one giant
    file per task).

    ``cluster_by`` range-partitions then sorts rows by the given
    columns before writing, so each file/row-group covers a narrow
    value range and its parquet min/max statistics actually prune: a
    later ``WHERE col BETWEEN …`` skips whole row groups (zone maps).
    Unclustered data has every row group spanning the full value range
    — stats exist but never exclude anything.  Pick the column(s) the
    dominant queries filter on (ship/event date, usually).  Costs one
    range shuffle at write time, amortized over every later scan —
    the storage-side sibling of bucketing (`core/bucketing.py`)."""
    if cluster_by:
        df = (df.repartitionByRange(*cluster_by)
              .sortWithinPartitions(*cluster_by))
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(dirpath)
