"""split_by_hash: deterministic, partition-invariant, append-stable,
and correctly proportioned."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legate_dataframe_spark.pipeline.sampling import split_by_hash

FR = {"train": 0.8, "val": 0.1, "test": 0.1}


def _assign(spark, n, parts):
    df = spark.range(0, n, numPartitions=parts) \
              .withColumnRenamed("id", "doc_id")
    return {r.doc_id: r.split
            for r in split_by_hash(df, "doc_id", FR).collect()}


def test_split_deterministic_and_partition_invariant(spark):
    a = _assign(spark, 5000, 1)
    b = _assign(spark, 5000, 13)
    assert a == b


def test_split_append_stable(spark):
    # growing the dataset must not move any existing row's split
    small = _assign(spark, 2000, 4)
    big = _assign(spark, 6000, 4)
    assert all(big[k] == v for k, v in small.items())


def test_split_proportions(spark):
    got = _assign(spark, 20000, 8)
    from collections import Counter
    c = Counter(got.values())
    for name, frac in FR.items():
        assert abs(c[name] / 20000 - frac) < 0.02, (name, c)


def test_split_fraction_validation(spark):
    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        split_by_hash(df, "doc_id", {"a": 0.5, "b": 0.2})


def test_salt_changes_assignment(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in
         split_by_hash(df, "doc_id", FR, salt="s1").collect()}
    b = {r.doc_id: r.split for r in
         split_by_hash(df, "doc_id", FR, salt="s2").collect()}
    assert any(a[k] != b[k] for k in a)  # different salt, different fold
