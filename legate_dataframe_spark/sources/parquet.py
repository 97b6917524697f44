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
    zorder_by: Sequence[str] | None = None,
    n_files: int | None = None,
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
    the storage-side sibling of bucketing (`core/bucketing.py`).

    ``zorder_by`` is the multi-column form: rows sort along a Morton
    curve over the given columns (``zorder_key``), so row-group min/max
    ranges narrow on EVERY keyed column simultaneously — a filter on
    any one of them skips row groups.  Mutually exclusive with
    ``cluster_by`` (one physical sort order per file).

    ``n_files`` pins the clustered/z-ordered range-shuffle partition
    count (= output file count).  Default None lets AQE size it from
    data volume — right in production, but AQE coalesces small inputs
    to ONE partition, whose single full-span row group defeats the
    clustering; pin it when writing small curated datasets.
    """
    if cluster_by and zorder_by:
        raise ValueError("cluster_by and zorder_by are mutually exclusive")
    rng_args = (n_files,) if n_files else ()
    if zorder_by:
        df = (zorder_key(df, zorder_by)
              .repartitionByRange(*rng_args, "__zkey")
              .sortWithinPartitions("__zkey")
              .drop("__zkey"))
    if cluster_by:
        df = (df.repartitionByRange(*rng_args, *cluster_by)
              .sortWithinPartitions(*cluster_by))
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(dirpath)


def zorder_key(df: DataFrame, cols: Sequence[str],
               bits_per_col: int = 16) -> DataFrame:
    """Append a ``__zkey`` Morton (Z-order) key over ``cols``.

    Each column is min/max-scaled to ``bits_per_col`` bits (the 1-row
    stats frame broadcasts — no driver round-trip), then the bit
    planes interleave: bit b of column i lands at position
    ``b*len(cols)+i``.  Rows close in Z-key are close in EVERY keyed
    dimension, which is what makes multi-column zone-map skipping work
    where single-column clustering cannot: ``cluster_by`` narrows one
    column's row-group ranges and leaves the others full-span, the
    Z-order curve narrows all of them at once.  len(cols) ×
    bits_per_col must fit 63 bits.
    """
    n = len(cols)
    if n * bits_per_col > 63:
        raise ValueError(f"{n} cols × {bits_per_col} bits exceeds int64")
    stats = df.groupBy().agg(*sum((
        [F.min(F.col(c).cast("double")).alias(f"__mn_{i}"),
         F.max(F.col(c).cast("double")).alias(f"__mx_{i}")]
        for i, c in enumerate(cols)), []))
    top = (1 << bits_per_col) - 1
    scaled = []
    for i, c in enumerate(cols):
        mn, mx = F.col(f"__mn_{i}"), F.col(f"__mx_{i}")
        frac = (F.col(c).cast("double") - mn) / \
            F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        scaled.append(F.least(F.lit(top), F.greatest(F.lit(0), F.floor(
            frac * top).cast("long"))))
    key = F.lit(0).cast("long")
    for b in range(bits_per_col):
        for i in range(n):
            key = key + F.shiftleft(
                F.shiftright(scaled[i], b).bitwiseAND(F.lit(1)),
                b * n + i)
    return (df.join(F.broadcast(stats))
            .select(*df.columns, key.alias("__zkey")))


def compact_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: int = 256,
    cluster_by: Sequence[str] | None = None,
) -> int:
    """Rewrite a small-file parquet directory into ~``target_mb`` files
    — the table-maintenance pass every streaming/incremental pipeline
    needs (each micro-batch appends a file; a thousand 2 MB files
    makes every later scan schedule a thousand splits and read a
    thousand footers).

    File count derives from the SOURCE's total on-disk bytes (parquet
    footer metadata via the input_file listing — no data pass), then
    one repartition/range-shuffle rewrites.  ``cluster_by`` re-sorts
    while compacting (compaction is the natural moment to restore
    zone-map locality that incremental appends destroyed).  Returns
    the output file count.
    """
    import glob as _glob
    import os as _os

    # walk the whole tree: a hive-partitioned source keeps its data
    # files under key=value subdirectories, where a top-level glob
    # matches nothing and would silently size the rewrite at 0 bytes
    # (collapsing the table into a single file)
    files = (_glob.glob(_os.path.join(src, "**", "*.parquet"),
                        recursive=True)
             or _glob.glob(_os.path.join(src, "**", "part-*"),
                           recursive=True))
    files = [f for f in files if _os.path.isfile(f)]
    if not files:
        raise ValueError(f"no parquet data files found under {src!r}")
    total = sum(_os.path.getsize(f) for f in files)
    n_files = max(1, round(total / (target_mb * (1 << 20))))
    df = spark.read.parquet(src)
    if cluster_by:
        df = (df.repartitionByRange(n_files, *cluster_by)
              .sortWithinPartitions(*cluster_by))
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(dst)
    return len(_glob.glob(_os.path.join(dst, "part-*.parquet")))
