"""Grouped aggregation with the reference's tuple API.

Reference: ``groupby_aggregation(table, keys, [(in_col, kind, out_col)])``
(groupby_aggregation.hpp:64-70); kinds sum/min/max/mean/product/count/
count_distinct/nunique validated against the Arrow registry
(cpp/src/groupby_aggregation.cpp:146-162).

Spark-first: ``groupBy().agg()`` already does partial (map-side) + final
hash aggregation with a single hash shuffle — the reference's explicit
repartition-then-local-Acero-aggregate scheme
(cpp/src/groupby_aggregation.cpp:79-93) is the built-in physical plan.
At 100 TB the partial agg is the load-bearing piece: per-partition
combine shrinks the shuffle to |groups| × partitions rows.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AGG_KINDS: dict[str, Callable[[str], Column]] = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "mean": F.avg,
    "avg": F.avg,
    "product": F.product,
    "count": F.count,                 # count_valid: non-null values
    "count_all": lambda c: F.count(F.lit(1)),
    "count_distinct": F.countDistinct,
    "nunique": F.countDistinct,
    "n_unique": F.countDistinct,
    "any": F.bool_or,
    "all": F.bool_and,
    "first": F.first,
    "last": F.last,
    "approx_count_distinct": F.approx_count_distinct,
}


def groupby_aggregation(
    table: DataFrame,
    keys: Sequence[str],
    column_aggregations: Sequence[tuple[str, str, str]],
) -> DataFrame:
    """``column_aggregations`` = [(in_col, kind, out_col), ...]."""
    aggs = []
    for in_col, kind, out_col in column_aggregations:
        fn = AGG_KINDS.get(kind)
        if fn is None:
            raise ValueError(
                f"unsupported aggregation kind {kind!r}; "
                f"supported: {sorted(AGG_KINDS)}"
            )
        aggs.append(fn(in_col).alias(out_col))
    if not aggs:
        raise ValueError("at least one aggregation required")
    return table.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
