"""Custom stateful streaming operator via ``applyInPandasWithState``.

Beyond-reference capability (the reference is batch-only, SURVEY §2.9):
Spark's escape hatch for operators the built-in windowed aggregations
can't express — arbitrary per-key state evolved batch-by-batch, with
timeout-driven eviction.

Scale notes:
- state is partitioned by the grouping key, so the operator distributes
  like any keyed aggregation (one shuffle on user_id);
- each micro-batch hands the operator Arrow-backed pandas frames — the
  Python work is vectorized per key-batch, never per row;
- ``GroupStateTimeout`` bounds state size: keys idle past the watermark
  are finalized and evicted (unbounded state is the 100 TB killer).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# (user_id, n_events, total_value, max_value) — running per-user stats.
USER_STATS_SCHEMA = (
    "user_id long, n_events long, total_value double, max_value double"
)
_STATE_SCHEMA = "n long, total double, mx double"


def _make_update_user_stats(evict_after_ms: int | None):
    def _update_user_stats(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Fold each micro-batch into (count, sum, max) running state
        and emit the updated totals for this key."""
        if state.hasTimedOut:
            # idle key: emit the final state one last time and evict it.
            n, total, mx = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                "total_value": [total], "max_value": [mx]})
            return
        n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        if evict_after_ms is not None:
            state.setTimeoutDuration(evict_after_ms)
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total], "max_value": [mx]})

    return _update_user_stats


def running_user_stats(events: DataFrame,
                       user_col: str = "user_id",
                       value_col: str = "value",
                       evict_after_ms: int | None = None) -> DataFrame:
    """Per-user running (count, sum, max) maintained as explicit state.

    Works on a streaming DataFrame (``spark.readStream``); each
    micro-batch emits the updated totals for the users it touched.
    The batch-mode equivalent is a plain groupBy aggregation — used as
    the differential oracle in tests/test_streaming.py.

    ``evict_after_ms`` turns on ProcessingTimeTimeout state eviction —
    the 24/7 deployment setting (unbounded per-key state is the 100 TB
    killer).  Leave it ``None`` for BOUNDED availableNow drains: with a
    processing-time timeout registered, Spark keeps scheduling
    timeout-evaluation micro-batches after the data is exhausted, so an
    availableNow query never terminates (observed: 100+ empty epochs).
    """
    sel = events.select(user_col, value_col)
    return sel.groupBy(user_col).applyInPandasWithState(
        _make_update_user_stats(evict_after_ms),
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(GroupStateTimeout.NoTimeout if evict_after_ms is None
                     else GroupStateTimeout.ProcessingTimeTimeout),
    )


def batch_user_stats(events: DataFrame,
                     user_col: str = "user_id",
                     value_col: str = "value") -> DataFrame:
    """The batch-semantics twin of :func:`running_user_stats`."""
    from pyspark.sql import functions as F

    return (events.groupBy(user_col)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(value_col).alias("total_value"),
                 F.max(value_col).alias("max_value")))
