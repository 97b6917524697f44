"""Salted join / salted groupBy must be result-identical to their
plain counterparts on a pathologically skewed key distribution (90% of
rows on one key), while spreading the hot key over `salt` partitions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legate_dataframe_spark.core.skew import salted_groupby, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of fact rows hit key 0; dim has keys 0..49.
    fact = (spark.range(0, 20_000)
            .select(F.when(F.col("id") % 10 < 9, F.lit(0))
                    .otherwise(F.col("id") % 50).alias("k"),
                    (F.col("id") % 7).cast("double").alias("v")))
    dim = (spark.range(0, 50)
           .select(F.col("id").alias("dk"),
                   F.concat(F.lit("name_"), F.col("id")).alias("name")))
    return fact, dim


def _counts(df, cols):
    return sorted(tuple(r) for r in
                  df.groupBy(*cols).count().collect())


def test_salted_inner_matches_plain(skewed):
    fact, dim = skewed
    plain = fact.join(dim, fact.k == dim.dk, "inner")
    salted = salted_join(fact, dim, ["k"], ["dk"], "inner", salt=8)
    assert _counts(salted, ["k", "name"]) == _counts(plain, ["k", "name"])


def test_salted_left_matches_plain(skewed):
    fact, dim = skewed
    # dim missing some keys → unmatched left rows must survive exactly once
    dim_holes = dim.filter(F.col("dk") % 2 == 0)
    plain = fact.join(dim_holes, fact.k == dim_holes.dk, "left")
    salted = salted_join(fact, dim_holes, ["k"], ["dk"], "left", salt=8)
    assert _counts(salted, ["k", "name"]) == _counts(plain, ["k", "name"])


def test_salted_hot_keys_only(skewed):
    fact, dim = skewed
    plain = fact.join(dim, fact.k == dim.dk, "inner")
    salted = salted_join(fact, dim, ["k"], ["dk"], "inner",
                         salt=8, hot_keys=[0])
    assert _counts(salted, ["k", "name"]) == _counts(plain, ["k", "name"])
    # cold keys keep salt 0 → dim replication is limited to the hot key:
    # replicated dim is 49 cold rows + 8 hot replicas, not 50*8.


def test_salted_join_rejects_outer(skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], ["dk"], "full")


def test_salted_groupby_matches_plain(skewed):
    fact, _ = skewed
    plain = (fact.groupBy("k")
             .agg(F.sum("v").alias("sum_v"), F.count("v").alias("n"),
                  F.min("v").alias("min_v"), F.max("v").alias("max_v")))
    salted = salted_groupby(
        fact, ["k"],
        {"sum_v": ("v", "sum"), "n": ("v", "count"),
         "min_v": ("v", "min"), "max_v": ("v", "max")}, salt=8)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert [r[:1] + tuple(round(x, 9) for x in r[1:]) for r in a] == \
           [r[:1] + tuple(round(x, 9) for x in r[1:]) for r in b]


def test_salted_groupby_rejects_nonalgebraic(skewed):
    fact, _ = skewed
    with pytest.raises(ValueError):
        salted_groupby(fact, ["k"], {"d": ("v", "count_distinct")})


def test_salted_join_hot_keys_dtype_mismatch_raises(spark):
    """int hot_keys against a string key column must fail loudly, not
    silently skip salting (the replication cost without the benefit)."""
    import pytest as _pytest

    left = spark.createDataFrame([("a", 1), ("b", 2)], "k: string, v: int")
    right = spark.createDataFrame([("a", 10)], "k: string, w: int")
    with _pytest.raises(TypeError, match="hot_keys"):
        salted_join(left, right, ["k"], hot_keys=[1, 2])


def test_salted_join_hot_keys_numeric_literals_cast(spark):
    """Numeric hot_keys against a numeric key column salt correctly
    (literals cast to the column's exact type)."""
    left = spark.createDataFrame([(1, "x")] * 50 + [(2, "y")],
                                 "k: int, v: string")
    right = spark.createDataFrame([(1, "hot"), (2, "cold")],
                                  "k: int, d: string")
    out = salted_join(left, right, ["k"], hot_keys=[1], salt=4)
    assert out.count() == 51  # identical to the unsalted join


def test_salted_join_accepts_widening_numeric_keys(spark):
    """int vs bigint keys are the same numeric family — must not be
    rejected (Spark widens them safely)."""
    left = spark.createDataFrame([(1, "x")] * 20, "k: int, v: string")
    right = spark.createDataFrame([(1, "d")], "k: long, d: string")
    assert salted_join(left, right, ["k"], hot_keys=[1], salt=4).count() == 20


def test_salted_join_unsupported_hot_key_dtype_raises(spark):
    """Array/struct keys have no validated literal mapping — loud
    refusal beats silent no-salt."""
    import pytest as _pytest

    left = spark.createDataFrame([([1], 1)], "k: array<int>, v: int")
    right = spark.createDataFrame([([1], 2)], "k: array<int>, w: int")
    with _pytest.raises(TypeError, match="unsupported key dtype"):
        salted_join(left, right, ["k"], hot_keys=[[1]])
