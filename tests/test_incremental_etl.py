"""incremental_etl: exactly-once across repeated invocations — new
source files are processed once, already-seen files never again, and a
re-run with nothing new appends nothing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legate_dataframe_spark.streaming.etl import incremental_etl


def _transform(df):
    return (df.filter(F.col("value") > 10)
            .select("event_id", "user_id",
                    (F.col("value") * 2).alias("value2")))


@pytest.fixture()
def dirs(tmp_path):
    return (str(tmp_path / "src"), str(tmp_path / "dst"),
            str(tmp_path / "ckpt"))


def _write_batch(spark, src, start, n):
    rows = [(i, i % 5, float(i)) for i in range(start, start + n)]
    (spark.createDataFrame(rows, "event_id long, user_id long, value double")
     .coalesce(1).write.mode("append").parquet(src))


def test_incremental_exactly_once(spark, dirs):
    src, dst, ckpt = dirs
    _write_batch(spark, src, 0, 50)
    incremental_etl(spark, src, dst, ckpt, _transform)
    first = spark.read.parquet(dst)
    assert first.count() == 50 - 11  # values 11..49 pass the filter
    assert set(first.columns) == {"event_id", "user_id", "value2"}

    # second batch of files: only the delta is processed
    _write_batch(spark, src, 50, 30)
    incremental_etl(spark, src, dst, ckpt, _transform)
    both = spark.read.parquet(dst)
    assert both.count() == 80 - 11
    # no duplicates: event_ids are unique
    assert both.select("event_id").distinct().count() == both.count()

    # idle re-run appends nothing
    incremental_etl(spark, src, dst, ckpt, _transform)
    assert spark.read.parquet(dst).count() == 80 - 11
