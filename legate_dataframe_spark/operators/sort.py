"""Distributed sort / top-k.

Reference: ``sort(tbl, keys, sort_ascending[], nulls_at_end, stable,
limit?)`` (sort.hpp:76-81) implemented as a distributed sample sort
(cpp/src/sort.cpp:312-376).  Spark's ``orderBy`` IS that algorithm —
range partitioning from a sample, then per-partition sort; with
``limit`` Catalyst plans ``TakeOrderedAndProject`` (distributed top-k,
no global shuffle of the full data), matching the reference's
limit-pushdown into local sorted runs (cpp/src/sort.cpp:296-308).

Negative limit = tail (last |n| rows of the sorted order), as in
cpp/src/sort.cpp:425-431: implemented by sorting in reverse order,
taking |n|, and re-sorting the (small) result.

Spark is strictly more general than the reference on null placement:
per-key nulls_first/last instead of one global flag (sort.hpp:76-81
notes the Arrow limitation).  We accept either a single bool or a list.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _order_cols(keys: Sequence[str], ascending: Sequence[bool],
                nulls_at_end: Sequence[bool], flip: bool = False) -> list[Column]:
    cols = []
    for k, asc, ne in zip(keys, ascending, nulls_at_end):
        if flip:
            asc, ne = not asc, not ne
        c = F.col(k)
        if asc:
            cols.append(c.asc_nulls_last() if ne else c.asc_nulls_first())
        else:
            cols.append(c.desc_nulls_last() if ne else c.desc_nulls_first())
    return cols


def sort(
    table: DataFrame,
    keys: Sequence[str],
    sort_ascending: Sequence[bool] | bool = True,
    nulls_at_end: Sequence[bool] | bool = True,
    stable: bool = False,
    limit: int | None = None,
) -> DataFrame:
    """Totally order ``table`` by ``keys``; optional top-k / tail limit."""
    n = len(keys)
    ascending = [sort_ascending] * n if isinstance(sort_ascending, bool) else list(sort_ascending)
    at_end = [nulls_at_end] * n if isinstance(nulls_at_end, bool) else list(nulls_at_end)
    if len(ascending) != n or len(at_end) != n:
        raise ValueError("per-key flag lists must match len(keys)")
    # stable: like the reference (sort.hpp:62-65) we do not guarantee
    # stability — document-don't-rely semantics; flag accepted for parity.
    if limit is not None and limit < 0:
        # tail: reverse order, top-|n|, then restore requested order.
        rev = table.orderBy(*_order_cols(keys, ascending, at_end, flip=True)).limit(-limit)
        return rev.orderBy(*_order_cols(keys, ascending, at_end))
    out = table.orderBy(*_order_cols(keys, ascending, at_end))
    if limit is not None:
        out = out.limit(limit)
    return out
