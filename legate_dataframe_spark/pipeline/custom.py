"""Custom task surface: grouped (applyInPandas) and zero-copy
partition-wise (mapInArrow) tasks.

The reference's extension point is a raw Legate task over a
``PhysicalTable`` shard (SURVEY §2.10; python/tests/test_tasks.py,
lib/core/column.pyx:370), with ``__legate_data_interface__``
(lib/core/column.pyx:232) as the zero-copy handoff to other libraries.
Spark's equivalents, all Arrow-batched:

- ``mapInPandas`` for partition-wise tasks with a pandas view
  (pipeline/multimodal.py);
- ``applyInPandas`` for group-wise tasks — each group arrives as ONE
  pandas frame, so the task can run arbitrary ordered/imperative logic
  the SQL layer can't express; Spark shuffles by the grouping key
  first, exactly the reference's repartition-then-run-task shape;
- ``mapInArrow`` — this module's ``arrow_task`` — the closest analogue
  of the reference's zero-copy interface: the task sees raw
  ``pyarrow.RecordBatch``es with NO pandas conversion on either side,
  so libraries that speak Arrow (tokenizers, sketches, compiled
  kernels) consume Spark partitions without a copy.

Scale discipline: a group must fit one task's memory — key choice is
the contract (user_id: fine; country: not).  Everything expressible
with built-in window/agg functions should stay JVM-side; Python tasks
are the escape hatch, Arrow-batched to keep the boundary cheap.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

import pandas as pd
import pyarrow as pa
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


def arrow_task(
    df: DataFrame,
    fn: Callable[[Iterator[pa.RecordBatch]], Iterator[pa.RecordBatch]],
    schema: T.StructType | str,
) -> DataFrame:
    """Run ``fn`` once per partition over zero-copy Arrow batches.

    ``fn`` receives an iterator of ``pyarrow.RecordBatch`` and yields
    record batches matching ``schema`` — no pandas materialization in
    either direction (the ``__legate_data_interface__`` analogue,
    reference lib/core/column.pyx:232).  Prefer this over
    ``mapInPandas`` when the kernel already speaks Arrow: it skips the
    arrow→pandas→arrow copy pair per batch.
    """
    return df.mapInArrow(fn, schema)


BYTE_STATS_SCHEMA = "doc_id long, n_bytes long, n_ascii long"


def doc_byte_stats_arrow(docs: DataFrame) -> DataFrame:
    """Per-doc byte/ASCII counts computed directly on Arrow buffers —
    the demonstration kernel for ``arrow_task`` (differentially tested
    against a mapInPandas twin).  Self-contained closure: cloudpickle
    ships it whole; executors never import this package."""

    def kernel(batches):
        import pyarrow as _pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column(batch.schema.get_field_index("text"))
            n_bytes = pc.binary_length(pc.cast(text, _pa.large_binary()))
            ascii_only = pc.utf8_length(
                pc.replace_substring_regex(text, "[^\\x00-\\x7F]", ""))
            yield _pa.RecordBatch.from_arrays(
                [batch.column(batch.schema.get_field_index("doc_id")),
                 pc.cast(n_bytes, _pa.int64()),
                 pc.cast(ascii_only, _pa.int64())],
                names=["doc_id", "n_bytes", "n_ascii"])

    return arrow_task(docs.select("doc_id", "text"), kernel,
                      BYTE_STATS_SCHEMA)


def doc_byte_stats_pandas(docs: DataFrame) -> DataFrame:
    """mapInPandas twin of ``doc_byte_stats_arrow`` for the
    differential test."""

    def kernel(pdfs):
        import pandas as _pd

        for pdf in pdfs:
            yield _pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["text"].map(
                    lambda t: len(t.encode("utf-8")) if t is not None else None),
                "n_ascii": pdf["text"].map(
                    lambda t: sum(1 for ch in t if ord(ch) < 128)
                    if t is not None else None),
            })

    return docs.select("doc_id", "text").mapInPandas(
        kernel, BYTE_STATS_SCHEMA)


GAP_SCHEMA = ("user_id long, n_events long, median_gap_s double, "
              "max_gap_s double")


def user_event_gaps(events: DataFrame) -> DataFrame:
    """Per-user inter-event-gap stats (median/max seconds) — ordered,
    group-local logic as a grouped task.  Self-contained closure: no
    module globals, so cloudpickle ships it whole to executors."""

    def gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf["ts"].sort_values()
        # integer-µs arithmetic end-to-end: library medians interpolate
        # even-count midpoints in floats, whose last-ulp/rounding
        # behavior is engine-specific (a 0.5 µs midpoint is a genuine
        # round-half tie at 6 decimals).  Floor-to-µs midpoint then one
        # exact /1e6 (µs ≪ 2^53) is bit-identical everywhere.
        d = sorted(ts.diff().dropna() // pd.Timedelta(1, "us"))
        n = len(d)
        med_us = (int(d[(n - 1) // 2]) + int(d[n // 2])) // 2 if n else None
        return pd.DataFrame({
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [len(pdf)],
            "median_gap_s": [med_us / 1e6 if n else None],
            "max_gap_s": [int(d[-1]) / 1e6 if n else None],
        })

    return grouped_task(events.select("user_id", "ts"), ["user_id"],
                        gaps, GAP_SCHEMA)


def cogrouped_task(
    left: DataFrame,
    right: DataFrame,
    left_keys: Sequence[str],
    right_keys: Sequence[str],
    fn: Callable[[tuple, pd.DataFrame, pd.DataFrame], pd.DataFrame],
    schema: T.StructType | str,
) -> DataFrame:
    """Run ``fn`` once per key across TWO tables
    (``FlatMapCoGroupsInPandas``): both sides shuffle by their keys and
    the task receives the key plus each side's group as a pandas frame
    (either may be empty — full-outer key semantics).

    The two-table generalization of :func:`grouped_task` — the shape
    for enrich/reconcile logic that needs BOTH sides' rows in one
    imperative scope (the SQL layer would need a full-outer join plus
    per-side windows).  Scale contract is the same: one shuffle per
    side keyed by the group key; a single key-group must fit one
    task's memory.
    """
    return (left.groupBy(*list(left_keys))
            .cogroup(right.groupBy(*list(right_keys)))
            .applyInPandas(fn, schema))


def arrow_grouped_task(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable[[pa.Table], pa.Table],
    schema: T.StructType | str,
) -> DataFrame:
    """Run ``fn`` once per key-group over a zero-copy ``pyarrow.Table``
    (``applyInArrow``) — the grouped twin of :func:`arrow_task`:
    shuffle by key like :func:`grouped_task`, but hand the group to the
    kernel as Arrow with no pandas conversion on either side.  The
    right surface when a per-group kernel already speaks Arrow
    (tokenizers, sketch libraries, compiled UDFs)."""
    return df.groupBy(*list(keys)).applyInArrow(fn, schema)
