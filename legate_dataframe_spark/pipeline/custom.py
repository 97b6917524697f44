"""Grouped custom tasks — the applyInPandas half of the UDF surface.

The reference's extension point is a raw Legate task over a
``PhysicalTable`` shard (SURVEY §2.10; python/tests/test_tasks.py,
lib/core/column.pyx:370).  Spark's equivalents: ``mapInPandas`` for
partition-wise tasks (pipeline/multimodal.py) and ``applyInPandas``
for group-wise tasks — this module.  Each group arrives as ONE pandas
frame, so the task can run arbitrary ordered/imperative logic the SQL
layer can't express; Spark shuffles by the grouping key first, exactly
the reference's repartition-then-run-task shape.

Scale discipline: a group must fit one task's memory — key choice is
the contract (user_id: fine; country: not).  Everything expressible
with built-in window/agg functions should stay JVM-side; grouped
Python tasks are the escape hatch, Arrow-batched to keep the boundary
cheap.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def grouped_task(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType | str,
) -> DataFrame:
    """Run ``fn`` once per key-group (pandas in → pandas out)."""
    return df.groupBy(*list(keys)).applyInPandas(fn, schema)


GAP_SCHEMA = ("user_id long, n_events long, median_gap_s double, "
              "max_gap_s double")


def user_event_gaps(events: DataFrame) -> DataFrame:
    """Per-user inter-event-gap stats (median/max seconds) — ordered,
    group-local logic as a grouped task.  Self-contained closure: no
    module globals, so cloudpickle ships it whole to executors."""

    def gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf["ts"].sort_values()
        deltas = ts.diff().dropna().dt.total_seconds()
        return pd.DataFrame({
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [len(pdf)],
            "median_gap_s": [float(deltas.median()) if len(deltas) else None],
            "max_gap_s": [float(deltas.max()) if len(deltas) else None],
        })

    return grouped_task(events.select("user_id", "ts"), ["user_id"],
                        gaps, GAP_SCHEMA)
