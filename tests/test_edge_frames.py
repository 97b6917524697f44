"""Edge-frame coverage mirroring the reference's test strategy
(python/legate_dataframe/testing.py:219-270): its std_dataframe_set
always includes an EMPTY table, and columns sweep dtype×null.  Plus
hypothesis-driven differential tests against DuckDB — randomized
frames with null keys/values must agree between the engines on the
core relational diagonal (groupby-agg, inner join).

Empty-frame semantics note: Spark (like SQL/DuckDB) reduces
sum(empty) → NULL; polars says 0 and the reference post-fixes that
(utils/aggregations.py:132-145).  This engine follows SQL — the
oracle gate compares against DuckDB, so the SQL choice is load-bearing
and asserted here."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from legate_dataframe_spark.operators.groupby import groupby_aggregation
from legate_dataframe_spark.operators.join import join
from legate_dataframe_spark.operators.reduction import reduce as ldf_reduce
from legate_dataframe_spark.operators.sort import sort
from legate_dataframe_spark.operators.stream_compaction import distinct

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.DoubleType()),
    T.StructField("s", T.StringType()),
])


@pytest.fixture(scope="module")
def empty(spark):
    return spark.createDataFrame([], SCHEMA)


@pytest.fixture(scope="module")
def small(spark):
    rows = [(1, 1.5, "a"), (1, None, "b"), (None, 2.0, "c"), (2, 0.5, None)]
    return spark.createDataFrame(rows, SCHEMA)


# ---------------------------------------------------------------- empty

@pytest.mark.parametrize("how,expect", [
    ("inner", 0), ("left", 4), ("full", 4), ("left_semi", 0),
    ("left_anti", 4),
])
def test_join_empty_right(small, empty, how, expect):
    out = join(small, empty.withColumnRenamed("k", "k2"), ["k"], ["k2"],
               join_type=how)
    assert out.count() == expect


def test_join_empty_left(small, empty):
    out = join(empty, small.withColumnRenamed("k", "k2"), ["k"], ["k2"],
               join_type="inner")
    assert out.count() == 0
    assert out.columns[0] == "k"  # schema survives emptiness


def test_groupby_empty(empty):
    out = groupby_aggregation(empty, ["k"], [("v", "sum", "sum_v"),
                                            ("v", "count", "n")])
    assert out.count() == 0
    assert set(out.columns) == {"k", "sum_v", "n"}


def test_reduce_empty_is_sql_null(empty):
    row = ldf_reduce(empty, "sum", col="v").collect()[0]
    assert row["v"] is None  # SQL semantics, NOT polars' 0
    assert ldf_reduce(empty, "count_valid", col="v").collect()[0]["v"] == 0


def test_sort_distinct_filter_empty(empty):
    assert sort(empty, ["k"], [True]).count() == 0
    assert distinct(empty, ["k"]).count() == 0
    assert empty.filter(F.col("v") > 0).count() == 0
    assert empty.limit(5).count() == 0


def test_union_with_empty_is_identity(small, empty):
    assert small.unionByName(empty).count() == small.count()


# ----------------------------------------------------- dtype×null grid

def test_dtype_null_grid_roundtrip(spark):
    grid = T.StructType([
        T.StructField("b", T.BooleanType()),
        T.StructField("i8", T.ByteType()),
        T.StructField("i16", T.ShortType()),
        T.StructField("i32", T.IntegerType()),
        T.StructField("i64", T.LongType()),
        T.StructField("f32", T.FloatType()),
        T.StructField("f64", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("d", T.DateType()),
        T.StructField("ts", T.TimestampType()),
    ])
    import datetime as dt
    full = (True, 1, 2, 3, 4, 1.5, 2.5, "x",
            dt.date(2020, 1, 2), dt.datetime(2020, 1, 2, 3, 4, 5))
    rows = [full, tuple([None] * len(grid))]
    # one row with exactly one null per column
    for i in range(len(grid)):
        rows.append(tuple(None if j == i else full[j]
                          for j in range(len(grid))))
    df = spark.createDataFrame(rows, grid)
    # sort with nulls first/last on every dtype
    for c in df.columns:
        assert sort(df, [c], [True], nulls_at_end=True).collect()[-1][c] is None
    # distinct treats nulls as equal (keep-any, stream_compaction.hpp:74)
    assert distinct(df.select("i64"), ["i64"]).count() == 2  # {4, null}
    # null-safe self-join keeps null keys (join.hpp:85 default)
    j = join(df.select(F.col("i64").alias("a")),
             df.select(F.col("i64").alias("bb")), ["a"], ["bb"],
             nulls_equal=True)
    n_null = sum(r.a is None for r in df.select(F.col("i64").alias("a")).collect())
    n_val = len(rows) - n_null
    assert j.count() == n_null * n_null + n_val * n_val
    # ...and drops them with nulls_equal=False (SQL =)
    j2 = join(df.select(F.col("i64").alias("a")),
              df.select(F.col("i64").alias("bb")), ["a"], ["bb"],
              nulls_equal=False)
    assert j2.count() == n_val * n_val


# ------------------------------------------------- hypothesis vs duckdb

_key = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))
_val = st.one_of(st.none(),
                 st.floats(min_value=-100, max_value=100,
                           allow_nan=False, allow_infinity=False))
_frame = st.lists(st.tuples(_key, _val), min_size=0, max_size=40)


def _pdf(rows):
    return pd.DataFrame({
        "k": pd.array([r[0] for r in rows], dtype="Int64"),
        "v": pd.array([r[1] for r in rows], dtype="Float64"),
    })


def _norm(df: pd.DataFrame):
    out = []
    for row in df.itertuples(index=False):
        out.append(tuple(None if pd.isna(x)
                         else round(x, 9) if isinstance(x, float) else int(x)
                         for x in row))
    return sorted(out, key=repr)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow], derandomize=True)
@given(rows=_frame)
def test_groupby_agg_matches_duckdb(spark, rows):
    sdf = groupby_aggregation(
        spark.createDataFrame(rows, "k long, v double"), ["k"],
        [("v", "sum", "sum_v"), ("v", "count", "n"),
         ("v", "min", "min_v"), ("v", "max", "max_v")]).toPandas()
    pdf = _pdf(rows)  # noqa: F841  (duckdb reads it by name)
    odf = duckdb.query("""
        SELECT k, sum(v) AS sum_v, count(v) AS n,
               min(v) AS min_v, max(v) AS max_v
        FROM pdf GROUP BY k""").df()
    assert _norm(sdf) == _norm(odf)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow], derandomize=True)
@given(lrows=_frame, rrows=_frame)
def test_inner_join_matches_duckdb(spark, lrows, rrows):
    l = spark.createDataFrame(lrows, "k long, v double")
    r = (spark.createDataFrame(rrows, "k long, v double")
         .withColumnRenamed("k", "k2").withColumnRenamed("v", "w"))
    sdf = (join(l, r, ["k"], ["k2"], "inner", nulls_equal=False)
           .select("k", "v", "w").toPandas())
    lp, rp = _pdf(lrows), _pdf(rrows).rename(columns={"k": "k2", "v": "w"})  # noqa: F841
    odf = duckdb.query("""
        SELECT lp.k AS k, lp.v AS v, rp.w AS w
        FROM lp JOIN rp ON lp.k = rp.k2""").df()
    assert _norm(sdf) == _norm(odf)
