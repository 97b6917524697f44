"""Global column reductions.

Reference: ``reduce(column, op, initial?)`` with associative ops
any/all/min/max/product/sum/count_valid (reduction.hpp:52-56,
cpp/src/reduction.cpp:153-161); ``mean`` decomposed to sum+count
(:285-297).  The reference's two-phase local-reduce → gather → final
(:110-146) is Spark's partial+final HashAggregate — automatic.

Returns a 1-row DataFrame (the reference returns a scalar column —
length-1, broadcastable; a 1×1 DataFrame crossJoins cheaply the same way).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REDUCE_OPS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "product": F.product,
    "mean": F.avg,
    "any": F.bool_or,
    "all": F.bool_and,
    "count_valid": F.count,
}


def reduce(column: DataFrame | Column, op: str, *, col: str | None = None,
           initial=None) -> DataFrame:
    """Reduce one column of ``table`` to a single value.

    ``reduce(df, "sum", col="x")`` → 1-row DataFrame with column ``x``.
    ``initial`` folds one extra value in (reduction.hpp:52-56).
    """
    if op not in _REDUCE_OPS:
        raise ValueError(f"unsupported reduction {op!r}; supported: {sorted(_REDUCE_OPS)}")
    table = column
    if col is None:
        if len(table.columns) != 1:
            raise ValueError("col= required for multi-column tables")
        col = table.columns[0]
    expr = _REDUCE_OPS[op](col).alias(col)
    out = table.agg(expr)
    if initial is not None:
        extra = table.sparkSession.createDataFrame([(initial,)], out.schema)
        out = out.unionAll(extra).agg(_REDUCE_OPS[op](col).alias(col))
    return out
