"""Exact heavy hitters at bounded memory: per-partition Misra–Gries
candidate generation + exact recount.

The naive ``groupBy(token).count()`` relies on map-side partial
aggregation to compress the shuffle — which works until the per-task
distinct-key set outgrows the aggregation hash map (a heavy-tailed
100 TB vocabulary: trillions of distinct n-grams), at which point the
partial agg spills and the shuffle degrades toward the full token
multiset.  The sketch path bounds BOTH:

1. each task folds its partition through a Misra–Gries summary of at
   most ``n_counters`` entries (an ``arrow_task`` — the custom-task
   surface, zero-copy batches, O(n_counters) memory regardless of
   partition size);
2. any item with global frequency > N/n_counters is GUARANTEED to
   survive at least one partition's summary (pigeonhole over the
   per-partition guarantee), so the union of summaries is a candidate
   superset — at most n_counters × n_partitions rows ride the shuffle;
3. a second corpus pass recounts ONLY the candidates (broadcast
   semi-join before the count shuffle) and applies the exact
   threshold, discarding Misra–Gries' false positives.

False negatives are impossible above the support threshold, the
recount is exact below-bounded, so the final answer is EXACT and the
DuckDB oracle is a plain count/HAVING.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    items: DataFrame,
    item_col: str,
    min_share: float = 0.001,
    n_counters: int | None = None,
) -> DataFrame:
    """Items whose frequency is ≥ ``min_share`` of the total item
    count, with exact counts — computed at bounded memory/shuffle via
    Misra–Gries candidates + exact recount (module docstring).

    ``n_counters`` defaults to ``ceil(2 / min_share)``: the summary
    threshold N/n_counters is then half the decision threshold, a
    safety margin so the guarantee never sits on the boundary.
    """
    if not 0 < min_share <= 1:
        raise ValueError(f"min_share must be in (0, 1], got {min_share}")
    floor_counters = math.ceil(1 / min_share)
    if n_counters is None:
        n_counters = int(2 / min_share) + 1
    elif n_counters < floor_counters:
        # Below ceil(1/min_share) the pigeonhole guarantee no longer
        # covers the decision threshold — true heavy hitters could be
        # silently dropped (false negatives), voiding the EXACT
        # contract this function documents.
        raise ValueError(
            f"n_counters={n_counters} < ceil(1/min_share)={floor_counters}: "
            "the Misra–Gries guarantee would not cover the threshold")

    from legate_dataframe_spark.pipeline.custom import arrow_task

    src = items.select(F.col(item_col).cast("string").alias("item")) \
               .filter(F.col("item").isNotNull())

    def summarize(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        counters: dict[str, int] = {}
        for batch in batches:
            for v in batch.column(0).to_pylist():
                if v in counters:
                    counters[v] += 1
                elif len(counters) < n_counters:
                    counters[v] = 1
                else:
                    for key in list(counters):
                        counters[key] -= 1
                        if not counters[key]:
                            del counters[key]
        if counters:
            yield pa.RecordBatch.from_pydict(
                {"item": pa.array(list(counters), pa.string())})

    candidates = arrow_task(src, summarize, "item string").distinct()

    total = src.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    return (src.join(F.broadcast(candidates), "item", "left_semi")
            .groupBy("item").agg(F.count(F.lit(1)).alias("n_occurrences"))
            .join(F.broadcast(total))
            .filter(F.col("n_occurrences") >= F.col("__n") * F.lit(min_share))
            .select("item", "n_occurrences"))
