"""copy_if_else / concatenate / slice.

Reference: ``copy_if_else(cond, lhs, rhs)`` with scalar broadcast on
either branch (copying.hpp:74, cpp/src/copying.cpp:27-68) →
``F.when``; per-column ``concatenate`` (copying.hpp:84) → DataFrame
``unionByName``; polars-style slice (dsl/ir.py:1252-1272, negative
offset = from end) → limit/offset.

Slice caveat (SURVEY §7): Spark rows have no inherent order, so slice is
only well-defined after a sort; like the reference documents for
``stable`` (sort.hpp:62-65) we document rather than hide the divergence.
``slice`` here uses Spark ≥3.4 ``offset``+``limit`` which respect the
immediately preceding ``orderBy``.
"""

from __future__ import annotations

from functools import reduce as _functools_reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def copy_if_else(cond: Column, lhs: Column, rhs: Column) -> Column:
    """Row-wise ``cond ? lhs : rhs`` (null cond → rhs is NOT the
    reference semantics: null cond yields null there; match it)."""
    # reference: output row is null where cond is null (cudf/arrow
    # if_else semantics) — F.when(cond, lhs).when(~cond, rhs) leaves
    # null-cond rows null, unlike .otherwise(rhs) which treats null
    # as false.
    return F.when(cond, lhs).when(~cond, rhs)


def concatenate(tables: Sequence[DataFrame]) -> DataFrame:
    """Vertical concat, by column name (Union IR node, dsl/ir.py:808-831)."""
    if not tables:
        raise ValueError("need at least one table")
    return _functools_reduce(lambda a, b: a.unionByName(b), tables)


def slice(table: DataFrame, offset: int, length: int | None = None,
          total_rows: int | None = None) -> DataFrame:
    """Polars zlice: (offset, length), negative offset counts from the end.

    Requires the input to carry an explicit order (immediately follows an
    ``orderBy``) for deterministic results.  Negative offsets need the
    row count; pass ``total_rows`` to avoid an extra count job.
    """
    if offset < 0:
        n = total_rows if total_rows is not None else table.count()
        offset = max(n + offset, 0)
    out = table.offset(offset) if offset else table
    if length is not None:
        out = out.limit(length)
    return out
