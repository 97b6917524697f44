"""Binary operations — the reference's allowlist (binaryop.hpp:26-48).

col∘col, col∘scalar, scalar∘col: Spark broadcasts ``F.lit`` scalars
natively (the reference flags length-1 columns ``is_scalar`` and wires
broadcast constraints, cpp/src/binaryop.cpp:116-132 — not needed here).

Null semantics: "output null iff any input null" matches Spark's
expression semantics; ``and_kleene``/``or_kleene`` are Spark SQL's
native 3-valued AND/OR.  Plain ``and``/``or`` (Arrow's non-Kleene
variants) are exposed as the same Kleene ops — the reference's polars
layer only ever emits the Kleene forms for nullable bools
(dsl/expressions/binaryop.py:54-59).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _scalar(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


BINARY_OPS: dict[str, Callable[[Column, Column], Column]] = {
    "add": lambda a, b: a + b,
    "subtract": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "divide": lambda a, b: a / b,
    "true_divide": lambda a, b: a.cast(T.DoubleType()) / b,
    "floor_divide": lambda a, b: F.floor(a / b),
    "power": F.pow,
    "logb": lambda a, b: F.log(b, a) if not isinstance(b, Column) else F.log(a) / F.log(b),
    "atan2": F.atan2,
    "bit_wise_and": lambda a, b: a.bitwiseAND(b),
    "bit_wise_or": lambda a, b: a.bitwiseOR(b),
    "bit_wise_xor": lambda a, b: a.bitwiseXOR(b),
    "shift_left": lambda a, b: F.shiftleft(a, b),
    "shift_right": lambda a, b: F.shiftright(a, b),
    "equal": lambda a, b: a == b,
    "not_equal": lambda a, b: a != b,
    "less": lambda a, b: a < b,
    "less_equal": lambda a, b: a <= b,
    "greater": lambda a, b: a > b,
    "greater_equal": lambda a, b: a >= b,
    "and": lambda a, b: a & b,
    "or": lambda a, b: a | b,
    "and_kleene": lambda a, b: a & b,
    "or_kleene": lambda a, b: a | b,
}


def binary_operation(lhs, rhs, op: str, output_type: str | T.DataType | None = None) -> Column:
    """Evaluate ``lhs op rhs``; optional explicit output cast
    (binaryop.hpp:80-83 requires an explicit output dtype)."""
    fn = BINARY_OPS.get(op)
    if fn is None:
        raise ValueError(f"unsupported binary op {op!r}; supported: {sorted(BINARY_OPS)}")
    if op in ("shift_left", "shift_right") and not isinstance(rhs, Column):
        out = fn(_scalar(lhs), rhs)  # shiftleft/right take int literal
    else:
        out = fn(_scalar(lhs), _scalar(rhs))
    if output_type is not None:
        out = out.cast(output_type)
    return out
