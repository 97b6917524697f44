"""Session-scoped cache tracking: every ``persist()`` gets a matching
``unpersist()``.

The engine persists multi-consumer subtrees (LSH shingle frames, the
q11/q15/q21 shared aggregations — the reference models the same thing
as an explicit Cache node, ldf_polars/dsl/ir.py:632).  Those persists
are plan-local: once the query's result is materialized the cached
blocks are dead weight, and a long-lived session running ~90 registry
queries back-to-back (the driver's correctness gate, bench.py's 3×
repeats) would otherwise accumulate them until shutdown — memory blocks
are LRU-evicted but disk-spilled blocks linger.

Contract: operators call ``tracked_persist(df)`` instead of
``df.persist()``; entry points (the query registry, bench.py) call
``release_caches()`` between queries.  Unpersist is always
correctness-safe in Spark — a released subtree simply recomputes — so
an early release can never break a consumer, only slow it.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []

# NOTE: an earlier revision also tracked streaming-sink temp dirs here
# (tracked_tempdir), deleting them at the NEXT query's release_caches().
# That deferred-delete contract was unsound: a caller building several
# registry queries before collecting had its first result's sink dir
# deleted out from under the still-lazy frame (review r03).  Streaming
# and roundtrip queries now materialize their read-backs eagerly
# (localCheckpoint) and delete their own dirs before returning.


def tracked_persist(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """``df.persist(level)``, registered for later ``release_caches()``."""
    df.persist(level)
    _LIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked frame; returns how many were released.

    Non-blocking: block deletion proceeds async on the executors while
    the next query plans.
    """
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
