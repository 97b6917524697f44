"""Event-time windowing over the `events` table.

Beyond-reference capability (the reference is batch-only, SURVEY §2.9).
These operators are written against a plain DataFrame so the SAME code
path serves batch (driver correctness gate) and Structured Streaming
(``spark.readStream`` input + watermark) — Spark's unified model.

Scale notes: ``F.window``/``F.session_window`` group rows by derived
window keys — one hash shuffle, partial+final agg, no per-row Python.
In streaming mode add ``withWatermark`` (see tests/test_streaming.py for
the readStream → watermark → sink wiring) so state for closed windows is
evicted — unbounded state is the 100 TB killer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Count + sum per (tumbling window, keys)."""
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum(value_col), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), *keys, "n_events", "sum_value")
    )


def sliding_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Overlapping windows — each row lands in window/slide buckets."""
    return (
        events.groupBy(F.window(ts_col, window, slide).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum(value_col), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), *keys, "n_events", "sum_value")
    )


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions per user via the native ``F.session_window``.

    A session = maximal run of a user's events where consecutive events
    are ≤ gap apart; output one row per session with start time, event
    count and value sum.  (Equivalent to the classic lag→flag→cumsum
    construction, but expressed with Spark's built-in session operator —
    streaming-capable with a watermark.)
    """
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), user_col)
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum(value_col), 2).alias("sum_value"))
        .select(user_col, F.col("w.start").alias("session_start"),
                "n_events", "sum_value")
    )
