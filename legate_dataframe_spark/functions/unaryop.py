"""Unary operations — reference surface dsl/expressions/unary.py:77-99
plus round/cast (unaryop.hpp:58-69, cpp/src/unaryop.cpp:36-69).

Rounding modes: reference default half_away_from_zero → ``F.round``;
half_to_even → ``F.bround`` (SURVEY §7).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

UNARY_OPS: dict[str, Callable[[Column], Column]] = {
    "sin": F.sin, "cos": F.cos, "tan": F.tan,
    "asin": F.asin, "acos": F.acos, "atan": F.atan,
    "sinh": F.sinh, "cosh": F.cosh, "tanh": F.tanh,
    "asinh": lambda c: F.log(c + F.sqrt(c * c + 1)),
    "acosh": lambda c: F.log(c + F.sqrt(c * c - 1)),
    "atanh": lambda c: F.log((1 + c) / (1 - c)) / 2,
    "exp": F.exp, "sqrt": F.sqrt,
    "ceil": F.ceil, "floor": F.floor, "abs": F.abs,
    "negate": lambda c: -c,
    "ln": F.log, "log2": F.log2, "log10": F.log10,
    "bit_not": F.bitwise_not,
    "invert": lambda c: ~c,
    "is_nan": F.isnan,
    "is_null": lambda c: c.isNull(),
    "is_valid": lambda c: c.isNotNull(),
}


def unary_operation(col: Column, op: str) -> Column:
    fn = UNARY_OPS.get(op)
    if fn is None:
        raise ValueError(f"unsupported unary op {op!r}; supported: {sorted(UNARY_OPS)}")
    return fn(col)


def round_column(col: Column, digits: int = 0,
                 mode: str = "half_away_from_zero") -> Column:
    """unaryop.hpp:69 round with both rounding modes."""
    if mode == "half_away_from_zero":
        return F.round(col, digits)
    if mode == "half_to_even":
        return F.bround(col, digits)
    raise ValueError(f"unknown rounding mode {mode!r}")


def cast(col: Column, dtype: str | T.DataType) -> Column:
    """Arrow-style unsafe cast (cpp/src/unaryop.cpp:36-37)."""
    return col.cast(dtype)


def fill_null(col: Column, value) -> Column:
    return F.coalesce(col, F.lit(value))


def mask_nans(col: Column) -> Column:
    """NaN → null (dsl/expressions/unary.py:163-197)."""
    return F.when(F.isnan(col), F.lit(None)).otherwise(col)
