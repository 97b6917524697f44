"""Bucketed tables must deliver the plans they exist for: a join or
groupBy on the bucket key with NO Exchange on the bucketed side(s).
This is the persistent form of the reference's repartition_by_hash
(cpp/src/core/repartition_by_hash.cpp:61-143) — shuffle paid once at
write time, amortized over every later query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legate_dataframe_spark.core.bucketing import read_bucketed, write_bucketed

from tests.test_plan_quality import plan_of


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    orders = (spark.range(0, 10_000)
              .select(F.col("id").alias("o_orderkey"),
                      (F.col("id") % 100).alias("o_custkey"),
                      (F.rand(7) * 1000).alias("o_total")))
    lineitem = (spark.range(0, 40_000)
                .select((F.col("id") % 10_000).alias("l_orderkey"),
                        (F.rand(11) * 50).alias("l_quantity")))
    write_bucketed(orders, "bucketdb.orders_b", ["o_orderkey"], num_buckets=8)
    write_bucketed(lineitem, "bucketdb.lineitem_b", ["l_orderkey"],
                   num_buckets=8)
    yield spark
    spark.sql("DROP DATABASE bucketdb CASCADE")


def _no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    return prev


def test_bucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    prev = _no_broadcast(spark)
    try:
        left = read_bucketed(spark, "bucketdb.lineitem_b")
        right = read_bucketed(spark, "bucketdb.orders_b")
        joined = left.join(
            right, left.l_orderkey == right.o_orderkey, "inner")
        plan = plan_of(joined, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 40_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_exchange(bucketed):
    spark = bucketed
    agg = (read_bucketed(spark, "bucketdb.lineitem_b")
           .groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("sum_qty")))
    plan = plan_of(agg, "simple")
    assert "Exchange" not in plan, plan
    assert agg.count() == 10_000


def test_unbucketed_join_does_shuffle(bucketed):
    # control: the same join off plain DataFrames must show the
    # Exchange that bucketing removes — proves the assertion above is
    # meaningful, not vacuous.
    spark = bucketed
    prev = _no_broadcast(spark)
    try:
        left = spark.range(0, 1000).select(F.col("id").alias("k"))
        right = spark.range(0, 1000).select(F.col("id").alias("k2"))
        plan = plan_of(left.join(right, left.k == right.k2), "simple")
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
