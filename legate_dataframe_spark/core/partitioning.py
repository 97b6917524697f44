"""Partitioning helpers.

``widen_partitions`` fixes the narrow-stage parallelism trap: a
single-row-group parquet file scans as ONE task, so compute-heavy
per-row pipelines (minhash signatures, cosine scoring) would run
serially no matter how many cores exist.  AQE can coalesce shuffle
partitions but cannot split a narrow map stage — an explicit
repartition before heavy per-row compute is the correct move at any
scale where input splits < cores.  When the input is already wide
(the 100 TB case: thousands of files), this is a no-op — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_partitions(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
