"""Boolean expression functions (dsl/expressions/boolean.py:84-148)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_in(col: Column, values: Sequence) -> Column:
    return col.isin(list(values))


def is_null(col: Column) -> Column:
    return col.isNull()


def is_not_null(col: Column) -> Column:
    return col.isNotNull()


def is_nan(col: Column) -> Column:
    return F.isnan(col)


def not_(col: Column) -> Column:
    return ~col


def is_between(col: Column, lo, hi, closed: str = "both") -> Column:
    """IsBetween — reference rewrites to two comparisons + and_kleene
    (dsl/translate.py:499-519); same 3-valued result here."""
    lo = lo if isinstance(lo, Column) else F.lit(lo)
    hi = hi if isinstance(hi, Column) else F.lit(hi)
    left = col >= lo if closed in ("both", "left") else col > lo
    right = col <= hi if closed in ("both", "right") else col < hi
    return left & right
