"""Incremental file-to-file ETL — the checkpointed ingest pattern a
100 TB training-data pipeline actually runs on.

``incremental_etl`` turns a batch transformation into an incremental
one: each invocation processes only files that appeared in ``src``
since the last run (Structured Streaming's file-source tracking in the
checkpoint), applies the transform, and appends to a parquet sink with
exactly-once semantics (the sink's transaction log in
``_spark_metadata`` makes partially-written batches invisible to
readers).  Re-running after a crash neither drops nor duplicates rows.

The reference is batch-only (SURVEY §2.9) — this is pure-Spark
capability on top.  ``trigger(availableNow=True)`` drains everything
currently visible and stops, so the same function serves both cron
-style incremental batch and, with a different trigger, a live stream.

Transforms must be stateless row-wise ops (filter/project/enrich —
anything without an aggregation) for append mode; aggregating flows
belong to ``streaming/windows.py`` with watermarks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def incremental_etl(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame],
    fmt: str = "parquet",
    timeout_s: int = 300,
) -> None:
    """Process new ``src_dir`` files through ``transform`` into
    ``dst_dir``; blocks until the backlog is drained.

    The source schema is inferred from the current files once per call
    (one driver-side footer read; streaming sources require an explicit
    schema).
    """
    schema = spark.read.format(fmt).load(src_dir).schema
    stream = spark.readStream.format(fmt).schema(schema).load(src_dir)
    q = (transform(stream)
         .writeStream.format(fmt)
         .option("path", dst_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    finished = q.awaitTermination(timeout_s)
    if q.exception() is not None:
        raise q.exception()
    if not finished:
        # timed out with the query still running: stop it and fail loudly —
        # returning silently would let callers read a partially-drained
        # sink or start a conflicting run on the same checkpoint
        q.stop()
        raise TimeoutError(
            f"incremental_etl: backlog not drained within {timeout_s}s "
            f"(src={src_dir}); query stopped, checkpoint remains valid — "
            "re-run to resume")
