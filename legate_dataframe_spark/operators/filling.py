"""sequence — int64 range column (filling.hpp:56, cpp/src/filling.cpp).

``spark.range`` is the native distributed equivalent: each partition
generates its slice locally, no shuffle, no data movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def sequence(spark: SparkSession, size: int, init: int = 0,
             name: str = "id", num_partitions: int | None = None) -> DataFrame:
    """Column of int64 [init, init+size)."""
    df = spark.range(init, init + size, numPartitions=num_partitions)
    return df.withColumnRenamed("id", name) if name != "id" else df
