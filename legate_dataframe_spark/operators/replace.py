"""replace_nulls — fill nulls with a scalar (replace.hpp:46).

Pure expression-level: ``F.coalesce(col, lit(v))`` stays inside
whole-stage codegen; ``fillna`` at table level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def replace_nulls(col: Column, value) -> Column:
    return F.coalesce(col, F.lit(value))


def replace_nulls_table(table: DataFrame, values: dict) -> DataFrame:
    """Table-level fill: {column: scalar}."""
    return table.fillna(values)
