"""Write→read-back roundtrip queries: driver-verifiable rows for the
sink/source operators that otherwise have no ``queries()`` entry
(SURVEY §2.1 — parquet_write parquet.hpp:104 / cpp/src/parquet.cpp:39-58,
csv_write csv.hpp:71 / cpp/src/csv.cpp:37-56, csv_read csv.hpp:96,
ndjson dsl/ir.py:393-397, from_arrow/to_arrow table.hpp:85-88).

Shape: load a testdata table, write it through the engine's sink into a
session-temp directory, read it back through the engine's source, then
aggregate.  The DuckDB oracle runs the same aggregate over the ORIGINAL
view — so a green row proves the sink+source pair is lossless for every
value that reaches the aggregate (keys, counts, sums, min/max over all
columns involved).

Scale notes: the write is a normal distributed ``df.write`` (one file
per partition — the reference's part.<rank> layout); nothing rides the
driver except ``arrow_roundtrip``, which gathers a 25-row dimension
table by design (``to_arrow`` IS the gather verb, table.hpp:323-336 —
its contract is "small result to client", same as the reference's
blocking gather).  Each roundtrip materializes its read-back
aggregate eagerly (``localCheckpoint``) and deletes its temp dir before
returning, so no lazy /tmp dependency escapes the call (review r03: a
later query's cleanup used to delete a dir a prior lazy result still
read from).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from legate_dataframe_spark.plans.relational import load_table


def _tmp(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=prefix)


def _finish(df: DataFrame, tmpdir: str) -> DataFrame:
    """Eagerly materialize the (small) roundtrip aggregate and delete
    the roundtrip directory — the returned frame carries its data in
    Spark block storage, not as a lazy scan of /tmp."""
    out = df.localCheckpoint(eager=True)
    shutil.rmtree(tmpdir, ignore_errors=True)
    return out


# ------------------------------------------------------------- parquet
def parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → parquet_write(partition_by=o_orderpriority,
    cluster_by=o_orderdate) → parquet_read(projection) → aggregate.

    Exercises the Hive-partitioned layout (col=value/ dirs) AND the
    zone-map clustering path in one verified write; the read-back
    projection proves column pruning through the engine's own reader.
    """
    from legate_dataframe_spark.sources.parquet import (
        parquet_read,
        parquet_write,
    )

    o = load_table(spark, sf_dir, "orders")
    out = _tmp("ldf_rt_parquet_")
    parquet_write(o, out, partition_by=["o_orderpriority"],
                  cluster_by=["o_orderdate"])
    back = parquet_read(
        spark, out,
        columns=["o_orderpriority", "o_orderkey", "o_totalprice",
                 "o_orderdate"])
    return _finish(
        back.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
             F.min("o_orderkey").alias("min_key"),
             F.max("o_orderdate").alias("max_date")), out)


PARQUET_ROUNDTRIP_SQL = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price,
       min(o_orderkey) AS min_key,
       max(o_orderdate) AS max_date
FROM orders GROUP BY o_orderpriority
"""


# ----------------------------------------------------------------- csv
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → csv_write('|') → csv_read(explicit dtypes, usecols)
    → aggregate.  Explicit dtypes prove the reference's
    schema-declared read path (csv.hpp:96-102: dtypes/usecols/sep),
    not inference; usecols proves projection through the CSV reader.
    """
    from legate_dataframe_spark.sources.csv import csv_read, csv_write

    c = load_table(spark, sf_dir, "customer")
    out = _tmp("ldf_rt_csv_")
    csv_write(c, out, delimiter="|")
    back = csv_read(
        spark, out,
        dtypes={"c_custkey": "int64", "c_name": "string",
                "c_nationkey": "int32", "c_acctbal": "float64",
                "c_mktsegment": "string"},
        usecols=["c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment",
                 "c_name"],
        delimiter="|")
    return _finish(
        back.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"),
             F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
             F.sum(F.length("c_name")).alias("name_chars"),
             F.countDistinct("c_nationkey").alias("n_nations")), out)


CSV_ROUNDTRIP_SQL = """
SELECT c_mktsegment,
       count(*) AS n_cust,
       round(sum(c_acctbal), 2) AS sum_bal,
       CAST(sum(length(c_name)) AS BIGINT) AS name_chars,
       count(DISTINCT c_nationkey) AS n_nations
FROM customer GROUP BY c_mktsegment
"""


# -------------------------------------------------------------- ndjson
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events(projection) → write ndjson → json_read(explicit schema)
    → aggregate.  Timestamps are ISO-8601 strings in flight and parsed
    back to µs — the lossiest of the three formats, hence the
    µs-precision max-ts probe in the aggregate.
    """
    from legate_dataframe_spark.sources.json import json_read

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts")
    out = _tmp("ldf_rt_json_")
    # ISO-8601 with explicit µs so read-back is lossless
    (e.withColumn("ts", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
     .write.mode("overwrite").json(out))
    back = json_read(
        spark, out,
        schema=("event_id long, user_id long, event_type string, "
                "value double, ts timestamp"))
    return _finish(
        back.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"),
             F.max("ts").alias("max_ts"),
             F.countDistinct("user_id").alias("n_users")), out)


JSON_ROUNDTRIP_SQL = """
SELECT event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       max(ts) AS max_ts,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------- arrow
def arrow_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → to_arrow (gather) → widen unsigned → from_arrow
    (scatter) → join-free aggregate.

    ``to_arrow`` is the reference's blocking gather-to-client
    (table.hpp:323-336) — valid only for client-sized results, so this
    uses the 25-row nation dimension.  The arrow table is rebuilt with
    uint8/uint32 key columns to prove the unsigned-widening policy
    (SURVEY §1: uint8→short, uint32→long) through ``from_arrow``.
    """
    import pyarrow as pa

    from legate_dataframe_spark.core.table import LogicalTable

    n = load_table(spark, sf_dir, "nation")
    gathered = LogicalTable(n).to_arrow()
    # recast keys to unsigned — the dtype family the reference supports
    # but Spark lacks; from_arrow must widen them losslessly
    unsigned = gathered.set_column(
        gathered.schema.get_field_index("n_nationkey"), "n_nationkey",
        gathered.column("n_nationkey").cast(pa.uint8()))
    unsigned = unsigned.set_column(
        unsigned.schema.get_field_index("n_regionkey"), "n_regionkey",
        unsigned.column("n_regionkey").cast(pa.uint32()))
    back = LogicalTable.from_arrow(spark, unsigned).df
    return (back.groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n_nations"),
                 F.sum("n_nationkey").alias("key_sum"),
                 F.sum(F.length("n_name")).alias("name_chars"))
            .select(F.col("n_regionkey").cast("long").alias("n_regionkey"),
                    "n_nations", F.col("key_sum").cast("long").alias("key_sum"),
                    "name_chars"))


ARROW_ROUNDTRIP_SQL = """
SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
       count(*) AS n_nations,
       CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
       CAST(sum(length(n_name)) AS BIGINT) AS name_chars
FROM nation GROUP BY n_regionkey
"""
