"""String matching — the reference's 4 implemented ops
(strings.hpp:49, allowlist cpp/src/strings.cpp:78-81) plus the wider
polars-surface names we support natively in Spark.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

STRING_OPS: dict[str, Callable[[Column, str], Column]] = {
    # the reference's implemented allowlist:
    "starts_with": lambda c, p: c.startswith(p),
    "ends_with": lambda c, p: c.endswith(p),
    "match_substring": lambda c, p: c.contains(p),
    "match_substring_regex": lambda c, p: c.rlike(p),
    # natural Spark extensions (polars-surface names, string.py:29-75):
    "lowercase": lambda c, _p: F.lower(c),
    "uppercase": lambda c, _p: F.upper(c),
    "strip_chars": lambda c, _p: F.trim(c),
    "len_chars": lambda c, _p: F.length(c),
    "reverse": lambda c, _p: F.reverse(c),
    "replace": None,  # handled in string_function (needs 2 args)
}


def string_function(col: Column, op: str, pattern: str | None = None,
                    replacement: str | None = None) -> Column:
    if op == "replace":
        return F.regexp_replace(col, pattern, replacement)
    fn = STRING_OPS.get(op)
    if fn is None:
        raise ValueError(f"unsupported string op {op!r}; supported: {sorted(STRING_OPS)}")
    return fn(col, pattern)
