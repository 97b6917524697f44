"""Timestamp parse + component extraction.

Reference: ``to_timestamps(col, type, format)`` with cudf strptime codes
(timestamps.hpp:100, format table :40-66) and
``extract_timestamp_component(col, component)`` with Arrow component
names (timestamps.hpp:112).

We translate cudf/strptime ``%``-codes to Java SimpleDateTime patterns
(SURVEY §7) and map Arrow component names to ``F.date_part``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# cudf strptime code → Java datetime pattern (timestamps.hpp:40-66)
_STRPTIME_TO_JAVA = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd",
    "%H": "HH", "%I": "hh", "%M": "mm", "%S": "ss",
    "%f": "SSSSSS", "%z": "XX", "%j": "DDD", "%p": "a",
    "%%": "%",
}


def strptime_to_java(fmt: str) -> str:
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            code = fmt[i:i + 2]
            if code not in _STRPTIME_TO_JAVA:
                raise ValueError(f"unsupported strptime code {code!r}")
            out.append(_STRPTIME_TO_JAVA[code])
            i += 2
        else:
            # literal chars; quote Java pattern letters
            if re.match(r"[A-Za-z]", fmt[i]):
                out.append(f"'{fmt[i]}'")
            else:
                out.append(fmt[i])
            i += 1
    return "".join(out)


def to_timestamps(col: Column, fmt: str = "%Y-%m-%d %H:%M:%S") -> Column:
    return F.to_timestamp(col, strptime_to_java(fmt))


# Arrow component name → Spark date_part field (timestamps.hpp:112,
# polars surface dsl/expressions/datetime.py:90-194)
_COMPONENTS = {
    "year": lambda c: F.year(c),
    "month": lambda c: F.month(c),
    "day": lambda c: F.dayofmonth(c),
    "weekday": lambda c: F.weekday(c),        # Monday=0, polars WeekDay is Mon=1
    "day_of_week": lambda c: F.dayofweek(c),  # Sunday=1 (Spark native)
    "day_of_year": lambda c: F.dayofyear(c),
    "hour": lambda c: F.hour(c),
    "minute": lambda c: F.minute(c),
    "second": lambda c: F.second(c),
    "millisecond": lambda c: (F.date_part(F.lit("SECOND"), c) * 1000 % 1000).cast("int"),
    "microsecond": lambda c: (F.date_part(F.lit("SECOND"), c) * 1000000 % 1000000).cast("int"),
    "nanosecond": lambda c: (F.date_part(F.lit("SECOND"), c) * 1000000000 % 1000000000).cast("long"),
    "quarter": lambda c: F.quarter(c),
}


def extract_timestamp_component(col: Column, component: str) -> Column:
    fn = _COMPONENTS.get(component)
    if fn is None:
        raise ValueError(f"unsupported component {component!r}; supported: {sorted(_COMPONENTS)}")
    return fn(col)
