"""groupby_aggregation tuple API + global reductions, incl. null keys
and partition-count invariance (reference scope sweep, testing.py:272-291)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from legate_dataframe_spark.operators.groupby import groupby_aggregation
from legate_dataframe_spark.operators.reduction import reduce as ldf_reduce

ROWS = [
    ("x", 1, 3), ("x", 2, 2), ("y", 0, 4), ("y", 4, 5), ("z", 1, 1),
    (None, 7, 2), (None, 3, None), ("x", None, 6),
]


@pytest.fixture(scope="module")
def gb(spark):
    return spark.createDataFrame(ROWS, "k1: string, d1: long, d2: long")


@pytest.mark.parametrize("partitions", [1, 8])
def test_groupby_kinds(gb, spark, partitions):
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        out = groupby_aggregation(gb, ["k1"], [
            ("d1", "sum", "s"), ("d1", "min", "mn"), ("d1", "max", "mx"),
            ("d1", "mean", "avg"), ("d2", "count", "cnt_valid"),
            ("d2", "count_all", "cnt_all"), ("d1", "count_distinct", "nuniq"),
        ])
        got = {r["k1"]: r for r in out.collect()}
        assert set(got) == {"x", "y", "z", None}  # null key is a group
        assert got["x"]["s"] == 3 and got["x"]["cnt_all"] == 3
        assert got["x"]["cnt_valid"] == 3 and got["x"]["nuniq"] == 2
        assert got[None]["s"] == 10 and got[None]["cnt_valid"] == 1
        assert got["y"]["mn"] == 0 and got["y"]["mx"] == 4
        assert math.isclose(got["y"]["avg"], 2.0)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")


def test_groupby_product(spark):
    df = spark.createDataFrame([("a", 2.0), ("a", 3.0), ("b", 5.0)], "k: string, v: double")
    out = groupby_aggregation(df, ["k"], [("v", "product", "p")])
    got = {r["k"]: r["p"] for r in out.collect()}
    assert got == {"a": 6.0, "b": 5.0}


def test_groupby_rejects_unknown_kind(gb):
    with pytest.raises(ValueError, match="unsupported aggregation"):
        groupby_aggregation(gb, ["k1"], [("d1", "median", "m")])


def test_reduce_ops(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (None,), (4.0,)], "x: double")
    assert ldf_reduce(df, "sum").collect()[0]["x"] == 7.0
    assert ldf_reduce(df, "min").collect()[0]["x"] == 1.0
    assert ldf_reduce(df, "max").collect()[0]["x"] == 4.0
    assert ldf_reduce(df, "count_valid").collect()[0]["x"] == 3
    assert math.isclose(ldf_reduce(df, "mean").collect()[0]["x"], 7.0 / 3)


def test_reduce_initial(spark):
    df = spark.createDataFrame([(5.0,), (9.0,)], "x: double")
    assert ldf_reduce(df, "max", initial=11.0).collect()[0]["x"] == 11.0
    assert ldf_reduce(df, "sum", initial=1.0).collect()[0]["x"] == 15.0


def test_reduce_bool(spark):
    df = spark.createDataFrame([(True,), (False,), (None,)], "b: boolean")
    assert ldf_reduce(df, "any").collect()[0]["b"] is True
    assert ldf_reduce(df, "all").collect()[0]["b"] is False
