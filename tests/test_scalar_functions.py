"""Scalar expression layer: binary/unary/boolean/string/timestamp
functions against the reference's allowlists (SURVEY §2.8)."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from legate_dataframe_spark.functions.binaryop import BINARY_OPS, binary_operation
from legate_dataframe_spark.functions.boolean import is_between, is_in
from legate_dataframe_spark.functions.strings import string_function
from legate_dataframe_spark.functions.timestamps import (
    extract_timestamp_component,
    strptime_to_java,
    to_timestamps,
)
from legate_dataframe_spark.functions.unaryop import (
    UNARY_OPS,
    fill_null,
    mask_nans,
    round_column,
    unary_operation,
)


@pytest.fixture(scope="module")
def num(spark):
    return spark.createDataFrame(
        [(2.0, 3.0, 5, 7), (-4.0, 0.5, -2, 3), (0.0, 2.0, 0, 1)],
        "x: double, y: double, i: int, j: long")


def _col(df, expr):
    return [r["r"] for r in df.select(expr.alias("r")).collect()]


def test_binary_arith(num):
    assert _col(num, binary_operation(F.col("x"), F.col("y"), "add")) == [5.0, -3.5, 2.0]
    assert _col(num, binary_operation(F.col("x"), F.col("y"), "subtract")) == [-1.0, -4.5, -2.0]
    assert _col(num, binary_operation(F.col("x"), F.col("y"), "multiply")) == [6.0, -2.0, 0.0]
    assert _col(num, binary_operation(F.col("x"), 2, "divide")) == [1.0, -2.0, 0.0]
    assert _col(num, binary_operation(F.col("x"), 2, "power")) == [4.0, 16.0, 0.0]


def test_binary_scalar_broadcast_both_sides(num):
    assert _col(num, binary_operation(10, F.col("x"), "add")) == [12.0, 6.0, 10.0]
    assert _col(num, binary_operation(F.col("i"), 1, "shift_left")) == [10, -4, 0]


def test_binary_comparisons(num):
    assert _col(num, binary_operation(F.col("x"), F.col("y"), "less")) == [True, True, True]
    assert _col(num, binary_operation(F.col("x"), 0.0, "greater_equal")) == [True, False, True]
    assert _col(num, binary_operation(F.col("x"), 0.0, "equal")) == [False, False, True]


def test_binary_bitwise(num):
    assert _col(num, binary_operation(F.col("i"), F.col("j"), "bit_wise_and")) == [5, 2, 0]
    assert _col(num, binary_operation(F.col("i"), F.col("j"), "bit_wise_xor")) == [2, -3, 1]


def test_kleene_and_or(spark):
    df = spark.createDataFrame(
        [(True, None), (False, None), (None, None), (True, False)],
        "a: boolean, b: boolean")
    got_and = _col(df, binary_operation(F.col("a"), F.col("b"), "and_kleene"))
    got_or = _col(df, binary_operation(F.col("a"), F.col("b"), "or_kleene"))
    assert got_and == [None, False, None, False]   # Kleene: F & null = F
    assert got_or == [True, None, None, True]      # Kleene: T | null = T


def test_binary_output_type_cast(num):
    vals = _col(num, binary_operation(F.col("x"), F.col("y"), "add", "long"))
    assert vals == [5, -3, 2]


def test_binary_rejects_unknown():
    with pytest.raises(ValueError, match="unsupported binary"):
        binary_operation(F.col("x"), 1, "frobnicate")


def test_unary_math(num):
    assert _col(num, unary_operation(F.col("x"), "abs")) == [2.0, 4.0, 0.0]
    got = _col(num, unary_operation(F.col("y"), "sqrt"))
    assert math.isclose(got[0], math.sqrt(3.0))
    got = _col(num, unary_operation(F.col("x"), "exp"))
    assert math.isclose(got[2], 1.0)
    assert _col(num, unary_operation(F.col("i"), "bit_not")) == [-6, 1, -1]
    # full allowlist resolves
    for op in UNARY_OPS:
        unary_operation(F.col("y"), op)


def test_round_modes(spark):
    df = spark.createDataFrame([(2.5,), (3.5,), (-2.5,)], "v: double")
    half_away = _col(df, round_column(F.col("v"), 0))
    half_even = _col(df, round_column(F.col("v"), 0, "half_to_even"))
    assert half_away == [3.0, 4.0, -3.0]
    assert half_even == [2.0, 4.0, -2.0]


def test_mask_nans_and_fill(spark):
    df = spark.createDataFrame([(float("nan"),), (1.0,), (None,)], "v: double")
    got = _col(df, mask_nans(F.col("v")))
    assert got[0] is None and got[1] == 1.0 and got[2] is None
    assert _col(df, fill_null(F.col("v"), 9.0))[2] == 9.0


def test_boolean_helpers(num):
    assert _col(num, is_in(F.col("i"), [0, 5])) == [True, False, True]
    assert _col(num, is_between(F.col("x"), -1.0, 2.0)) == [True, False, True]
    assert _col(num, is_between(F.col("x"), 0.0, 2.0, closed="right")) == [True, False, False]


def test_string_ops(spark):
    df = spark.createDataFrame([("abcdef",), ("abc",), ("",), (None,)], "s: string")
    assert _col(df, string_function(F.col("s"), "starts_with", "abc")) == [True, True, False, None]
    assert _col(df, string_function(F.col("s"), "ends_with", "def")) == [True, False, False, None]
    assert _col(df, string_function(F.col("s"), "match_substring", "cd")) == [True, False, False, None]
    assert _col(df, string_function(F.col("s"), "match_substring_regex", "^a.c")) == [True, True, False, None]
    assert _col(df, string_function(F.col("s"), "replace", "b", "X")) == ["aXcdef", "aXc", "", None]
    assert _col(df, string_function(F.col("s"), "len_chars")) == [6, 3, 0, None]


def test_strptime_translation():
    assert strptime_to_java("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss"
    assert strptime_to_java("%Y/%m/%d") == "yyyy/MM/dd"
    with pytest.raises(ValueError, match="unsupported strptime"):
        strptime_to_java("%Q")


def test_to_timestamps_and_extract(spark):
    df = spark.createDataFrame([("2021-03-04 05:06:07",)], "s: string")
    ts = df.select(to_timestamps(F.col("s")).alias("t"))
    row = ts.collect()[0]["t"]
    assert row == datetime.datetime(2021, 3, 4, 5, 6, 7)
    comps = ts.select(
        *[extract_timestamp_component(F.col("t"), c).alias(c)
          for c in ["year", "month", "day", "hour", "minute", "second", "quarter"]]
    ).collect()[0]
    assert tuple(comps) == (2021, 3, 4, 5, 6, 7, 1)
