"""sort (per-key order, null placement, ±limit), slice, boolean mask,
distinct keep-any, union/concatenate, sequence, replace_nulls, contains."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legate_dataframe_spark.operators.copying import concatenate, copy_if_else, slice as ldf_slice
from legate_dataframe_spark.operators.filling import sequence
from legate_dataframe_spark.operators.replace import replace_nulls, replace_nulls_table
from legate_dataframe_spark.operators.search import contains
from legate_dataframe_spark.operators.sort import sort as ldf_sort
from legate_dataframe_spark.operators.stream_compaction import apply_boolean_mask, distinct

DATA = [(3, "c"), (1, "a"), (None, "n"), (2, "b"), (1, "a2"), (None, "n2")]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(DATA, "k: long, v: string")


def test_sort_asc_nulls_last(df):
    got = [r["k"] for r in ldf_sort(df, ["k", "v"]).collect()]
    assert got == [1, 1, 2, 3, None, None]


def test_sort_desc_nulls_first(df):
    got = [r["k"] for r in ldf_sort(df, ["k", "v"], sort_ascending=False,
                                    nulls_at_end=False).collect()]
    assert got == [None, None, 3, 2, 1, 1]


def test_sort_per_key_flags(spark):
    df = spark.createDataFrame([(1, 9), (1, 7), (2, 8), (2, 6)], "a: long, b: long")
    got = [(r["a"], r["b"]) for r in
           ldf_sort(df, ["a", "b"], sort_ascending=[True, False]).collect()]
    assert got == [(1, 9), (1, 7), (2, 8), (2, 6)]


def test_sort_limit_topk(df):
    got = [r["k"] for r in ldf_sort(df, ["k", "v"], limit=3).collect()]
    assert got == [1, 1, 2]


def test_sort_negative_limit_tail(df):
    got = [r["k"] for r in ldf_sort(df, ["k", "v"], limit=-2).collect()]
    assert got == [None, None]  # tail of asc-nulls-last order, in order


def test_slice(spark):
    df = spark.range(0, 100)
    s = ldf_slice(df.orderBy("id"), 10, 5)
    assert [r["id"] for r in s.collect()] == [10, 11, 12, 13, 14]
    neg = ldf_slice(df.orderBy("id"), -3)
    assert [r["id"] for r in neg.collect()] == [97, 98, 99]


def test_apply_boolean_mask_null_drops(spark):
    df = spark.createDataFrame([(1, True), (2, False), (3, None)], "x: long, m: boolean")
    assert [r["x"] for r in apply_boolean_mask(df, F.col("m")).collect()] == [1]


def test_distinct_keep_any(df):
    out = distinct(df, ["k"]).collect()
    keys = [r["k"] for r in out]
    assert sorted([k for k in keys if k is not None]) == [1, 2, 3]
    assert keys.count(None) == 1  # null is a distinct key
    src = {(r[0], r[1]) for r in DATA}
    assert all((r["k"], r["v"]) in src for r in out)  # rows come from input


def test_copy_if_else_null_cond_yields_null(spark):
    df = spark.createDataFrame([(True, 1, 10), (False, 2, 20), (None, 3, 30)],
                               "c: boolean, a: long, b: long")
    out = df.select(copy_if_else(F.col("c"), F.col("a"), F.col("b")).alias("r")).collect()
    assert [r["r"] for r in out] == [1, 20, None]


def test_concatenate(spark):
    a = spark.createDataFrame([(1,)], "x: long")
    b = spark.createDataFrame([(2,)], "x: long")
    c = spark.createDataFrame([(3,)], "x: long")
    assert sorted(r["x"] for r in concatenate([a, b, c]).collect()) == [1, 2, 3]


def test_sequence(spark):
    df = sequence(spark, 5, init=10, name="n")
    assert [r["n"] for r in df.collect()] == [10, 11, 12, 13, 14]


def test_replace_nulls(spark):
    df = spark.createDataFrame([(1.0,), (None,)], "x: double")
    out = df.select(replace_nulls(F.col("x"), -1.0).alias("x")).collect()
    assert [r["x"] for r in out] == [1.0, -1.0]
    out2 = replace_nulls_table(df, {"x": -2.0}).collect()
    assert sorted(r["x"] for r in out2) == [-2.0, 1.0]


def test_contains_literal_and_column(spark):
    needles = spark.createDataFrame([(1,), (2,), (3,)], "x: long")
    out = contains(needles, "x", [1, 3])
    assert {(r["x"], r["contains"]) for r in out.collect()} == {(1, True), (2, False), (3, True)}
    hay = spark.createDataFrame([(3,), (4,), (3,)], "h: long")
    out2 = contains(needles, "x", hay, "h")
    assert {(r["x"], r["contains"]) for r in out2.collect()} == {(1, False), (2, False), (3, True)}
