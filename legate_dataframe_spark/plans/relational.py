"""Relational query plans covering SURVEY §2's operator inventory,
each paired with a DuckDB oracle (registered in plans/registry.py).

Conventions (driver compares row-count + schema + order-insensitive
value-hash of Spark result vs DuckDB oracle):

- every computed column is aliased identically on both sides;
- double aggregates are ``round(x, k)`` on BOTH sides — the summation
  order differs between engines (and between Spark partitionings), so
  raw float hashes would flap;
- DuckDB ``sum(BIGINT)`` → HUGEINT and ``year()`` → BIGINT: oracle SQL
  casts to BIGINT / Spark side casts to long so schemas line up;
- timestamps stay µs-exact (no arithmetic that could diverge).

Scale notes are inline per query; the common themes: dimension joins are
broadcast (region/nation/supplier/part at TPC-H scale are ≪ fact
tables), aggregations rely on Spark's partial+final hash agg, top-k
relies on TakeOrderedAndProject — no full-data shuffles beyond the
unavoidable fact-fact joins, which AQE plans from runtime stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from legate_dataframe_spark.core.caching import tracked_persist


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    Spark rejects parquet TIMESTAMP(NANOS) outright; read ns columns as
    long (legacy conf) and truncate to µs timestamps — the same ns→µs
    truncation DuckDB applies, so oracle comparisons agree.  Schema
    sniffing is one footer read on the driver (scale-independent).
    """
    path = f"{sf_dir}/{name}.parquet"
    # pin timestamp semantics: parquet values are naive/UTC; component
    # extraction must not shift with the host timezone (the driver's
    # session may not set one).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    schema_path = path
    if os.path.isdir(path):  # directory-of-parts table (production layout)
        # recursive: a Hive-partitioned layout (col=val/part-*.parquet —
        # what parquet_write(partition_by=...) produces) has no data
        # files at the top level
        parts = (sorted(_glob.glob(f"{path}/*.parquet"))
                 or sorted(_glob.glob(f"{path}/**/*.parquet", recursive=True))
                 or [path])
        schema_path = parts[0]
    # ns detection MUST use the parquet physical type: INT64 +
    # TIMESTAMP(NANOS) is what Spark rejects (or, under the legacy
    # conf, surfaces as long).  The arrow-level schema is ambiguous —
    # pyarrow reports Spark's own INT96 timestamps as ns too, and the
    # legacy conf is session-global so a try/except read is stateful.
    psch = pq.ParquetFile(schema_path).schema
    ns_cols = {
        psch.column(i).name
        for i in range(len(psch))
        if psch.column(i).physical_type == "INT64"
        and "timeUnit=nanoseconds" in str(psch.column(i).logical_type)
    }
    if not ns_cols:
        return _ltz_normalize(spark.read.parquet(path))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return _ltz_normalize(df)


def _ltz_normalize(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP (LTZ).

    Parquet µs timestamps with isAdjustedToUTC=false infer as
    TIMESTAMP_NTZ under Spark 4, while the ns→µs path above produces
    LTZ — one engine-wide timestamp type keeps literal comparisons,
    double-casts, and oracle schema checks uniform.  The session
    timezone is pinned to UTC in ``load_table``, so the cast is a pure
    reinterpretation (no instant shift).
    """
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields
           if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def _ts(lit: str):
    return F.lit(lit).cast("timestamp")


def _cents(col) -> "F.Column":
    """Exact integer cents of a 2-decimal-quantized double column.

    Money columns in the testdata are 2-decimal quantized; double
    arithmetic on them is only reproducible across engines (Spark vs the
    DuckDB oracle, different summation orders) if sums run in exact
    integer cents.  round(x*100) is bit-deterministic from the input
    double in every engine; int64 sums are exact.
    """
    return F.round(col * 100, 0).cast("long")


# --------------------------------------------------------------------------
# q01 — flagship: scan → filter → groupby-agg → sort (TPC-H Q1 shape).
# Exercises the reference's core diagonal: parquet_read (parquet.hpp:123),
# apply_boolean_mask (stream_compaction.hpp:59), binaryop (binaryop.hpp:26),
# groupby_aggregation (groupby_aggregation.hpp:64), sort (sort.hpp:76).
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    price_c = _cents(F.col("l_extendedprice"))           # exact cents
    disc_p = _cents(F.col("l_discount"))                 # discount in %
    tax_p = _cents(F.col("l_tax"))                       # tax in %
    n = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= _ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(price_c) / 100.0, 2).alias("sum_base_price"),
            F.round(F.sum(price_c * (100 - disc_p)) / 10000.0, 4).alias("sum_disc_price"),
            F.round(F.sum(price_c * (100 - disc_p) * (100 + tax_p)) / 1000000.0, 6).alias("sum_charge"),
            F.round(F.sum("l_quantity") / n, 6).alias("avg_qty"),
            F.round(F.sum(price_c) / 100.0 / n, 6).alias("avg_price"),
            F.round(F.sum(disc_p) / 100.0 / n, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0, 2) AS sum_base_price,
       round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) / 10000.0, 4) AS sum_disc_price,
       round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
                    * (100 + CAST(round(l_tax * 100, 0) AS BIGINT))) AS BIGINT) / 1000000.0, 6) AS sum_charge,
       round(sum(l_quantity) / count(*), 6) AS avg_qty,
       round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 / count(*), 6) AS avg_price,
       round(CAST(sum(CAST(round(l_discount * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q03 — shipping priority: 3-way join + agg + top-k.
# customer is the small side → broadcast; top-10 by revenue is
# TakeOrderedAndProject (no global sort shuffle).  Ordering key is the
# ROUNDED revenue + orderkey so both engines rank identically.
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = _ts("1998-03-15 00:00:00")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_cents(F.col("l_extendedprice"))
                           * (100 - _cents(F.col("l_discount")))) / 10000.0, 4)
             .alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q03_SQL = """
SELECT l_orderkey, o_orderdate,
       round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) / 10000.0, 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# q05 — multi-way star join: fact-fact join + three broadcast dims.
def q05_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(_cents(F.col("l_extendedprice"))
                          * (100 - _cents(F.col("l_discount")))) / 10000.0, 4)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q05_SQL = """
SELECT n_name,
       round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) / 10000.0, 4) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --------------------------------------------------------------------------
# join family — the reference's 5 join types (join.hpp:25).
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_custkey", "c_name",
                F.round("o_totalprice", 2).alias("total"))
    )


JOIN_INNER_SQL = """
SELECT o_orderkey, c_custkey, c_name, round(o_totalprice, 2) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select("c_custkey", "c_name", "o_orderkey",
                F.round("o_totalprice", 2).alias("total"))
    )


JOIN_LEFT_SQL = """
SELECT c_custkey, c_name, o_orderkey, round(o_totalprice, 2) AS total
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
"""


def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "full")
        .select("c_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


JOIN_FULL_SQL = """
SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS total
FROM (SELECT * FROM customer WHERE c_acctbal > 0) c
FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 150000) o
  ON c_custkey = o_custkey
"""


# --------------------------------------------------------------------------
# skew mitigation (core/skew.py) — salting must be invisible in the
# result, so the oracle is the PLAIN join/groupBy SQL.  At 100 TB this
# is the fallback for hot keys AQE can't split (shuffled-hash joins,
# a-priori-known whales); the reference has no skew handling at all.
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.core.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = salted_join(li, o, ["l_orderkey"], ["o_orderkey"], "inner", salt=8)
    return (j.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))


SKEW_SALTED_JOIN_SQL = """
SELECT o_orderpriority, count(*) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.core.skew import salted_groupby

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_groupby(
        li, ["l_returnflag"],
        {"sum_qty": ("l_quantity", "sum"), "n": ("l_quantity", "count"),
         "min_qty": ("l_quantity", "min"), "max_qty": ("l_quantity", "max")},
        salt=8)
    return out.select("l_returnflag", F.round("sum_qty", 2).alias("sum_qty"),
                      "n", "min_qty", "max_qty")


SKEW_SALTED_AGG_SQL = """
SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
       count(l_quantity) AS n,
       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# groupby with the reference's full agg-kind set (sum/min/max/mean/product/
# count_all/count_distinct — groupby_aggregation.cpp tests, SURVEY §2.4).
def groupby_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_orderkey")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.round(F.sum(_cents(F.col("l_discount"))) / 100.0 / F.count(F.lit(1)), 6)
            .alias("avg_disc"),
            # product over integer percents: exactness is lost past ~8
            # factors (102^10 > 2^53) but relative error stays ~1e-15,
            # far inside the round-6 bucket after normalizing by 100^n.
            F.round(F.product(100 + _cents(F.col("l_tax")))
                    / F.pow(F.lit(100.0), F.count(F.lit(1))), 6).alias("prod_tax"),
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


GROUPBY_AGGS_SQL = """
SELECT l_orderkey,
       round(sum(l_quantity), 2)        AS sum_qty,
       round(min(l_extendedprice), 2)   AS min_price,
       round(max(l_extendedprice), 2)   AS max_price,
       round(CAST(sum(CAST(round(l_discount * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 / count(*), 6) AS avg_disc,
       round(product(100 + CAST(round(l_tax * 100, 0) AS BIGINT))
             / pow(100.0, count(*)), 6) AS prod_tax,
       count(*)                         AS n_lines,
       count(DISTINCT l_suppkey)        AS n_supps
FROM lineitem GROUP BY l_orderkey
"""


# --------------------------------------------------------------------------
# global reduction (reduction.hpp:52; two-phase partial+final is automatic).
def reduce_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.round(F.sum(_cents(F.col("l_extendedprice"))) / 100.0, 2).alias("sum_price"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
        F.round(F.sum(_cents(F.col("l_discount"))) / 100.0 / F.count(F.lit(1)), 6)
        .alias("avg_disc"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


REDUCE_GLOBAL_SQL = """
SELECT round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0, 2) AS sum_price,
       round(min(l_quantity), 2)       AS min_qty,
       round(max(l_quantity), 2)       AS max_qty,
       round(CAST(sum(CAST(round(l_discount * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 / count(*), 6) AS avg_disc,
       count(*)                        AS n_rows,
       count(DISTINCT l_orderkey)      AS n_orders,
       min(l_shipdate)                 AS first_ship,
       max(l_shipdate)                 AS last_ship
FROM lineitem
"""


# --------------------------------------------------------------------------
# distinct on keys (stream_compaction.hpp:74, keep="any" → key-only output
# keeps the oracle deterministic).
def distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.select("l_returnflag", "l_linestatus").dropDuplicates()


DISTINCT_KEYS_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


# --------------------------------------------------------------------------
# sort + top-k (sort.hpp:76-81 limit pushdown ≈ TakeOrderedAndProject)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("total"))
    )


SORT_TOPK_SQL = """
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# sort with negative limit = tail (cpp/src/sort.cpp:425-431)
def sort_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.operators.sort import sort as ldf_sort

    o = load_table(spark, sf_dir, "orders")
    t = ldf_sort(o, ["o_totalprice", "o_orderkey"], limit=-10)
    return t.select("o_orderkey", F.round("o_totalprice", 2).alias("total"))


SORT_TAIL_SQL = """
SELECT o_orderkey, round(o_totalprice, 2) AS total
FROM orders ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 10
"""


# sorted slice with offset (dsl/ir.py:1252-1272 → Spark ≥3.4 offset)
def slice_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderkey")
        .offset(100)
        .limit(50)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


SLICE_OFFSET_SQL = """
SELECT o_orderkey, round(o_totalprice, 2) AS total
FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100
"""


# --------------------------------------------------------------------------
# union (dsl/ir.py:808-831)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 200000).select(
        "o_orderkey", F.lit("hi").alias("bucket"))
    lo = o.filter(F.col("o_totalprice") < 50000).select(
        "o_orderkey", F.lit("lo").alias("bucket"))
    return hi.unionByName(lo)


UNION_ALL_SQL = """
SELECT o_orderkey, 'hi' AS bucket FROM orders WHERE o_totalprice > 200000
UNION ALL
SELECT o_orderkey, 'lo' AS bucket FROM orders WHERE o_totalprice < 50000
"""


# --------------------------------------------------------------------------
# copy_if_else / when-otherwise (copying.hpp:74)
def case_when_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") > 200000, F.lit("large"))
        .when(F.col("o_totalprice") > 100000, F.lit("medium"))
        .otherwise(F.lit("small"))
    )
    return (
        o.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum(_cents(F.col("o_totalprice"))) / 100.0, 2).alias("total"))
        .orderBy("bucket")
    )


CASE_WHEN_SQL = """
SELECT CASE WHEN o_totalprice > 200000 THEN 'large'
            WHEN o_totalprice > 100000 THEN 'medium'
            ELSE 'small' END AS bucket,
       count(*) AS n,
       round(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0, 2) AS total
FROM orders GROUP BY 1 ORDER BY bucket
"""


# --------------------------------------------------------------------------
# isin / contains (search.hpp:47)
def isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


ISIN_SQL = """
SELECT o_orderpriority, count(*) AS n
FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# string functions — the reference's implemented set (strings.hpp:49):
# starts_with / ends_with / match_substring / match_substring_regex.
def string_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_name",
        F.col("p_name").startswith("red").alias("is_red"),
        F.col("p_name").endswith("bolt").alias("is_bolt"),
        F.col("p_name").contains("wid").alias("has_wid"),
        F.col("p_name").rlike("^(red|blue) .*(gear|bolt)$").alias("re_match"),
    )


STRING_MATCH_SQL = """
SELECT p_partkey, p_name,
       p_name LIKE 'red%'  AS is_red,
       p_name LIKE '%bolt' AS is_bolt,
       p_name LIKE '%wid%' AS has_wid,
       regexp_matches(p_name, '^(red|blue) .*(gear|bolt)$') AS re_match
FROM part
"""


# --------------------------------------------------------------------------
# binary/unary expression grid (binaryop.hpp:26-48, unary.py:77-99)
def arithmetic_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        # per-row money product is 4-decimal-true → round 4 keeps the
        # value at a bucket center (round 2 would sit on .xx5 boundaries
        # where Spark's decimal-string HALF_UP and DuckDB's binary
        # rounding disagree).
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.abs(F.col("l_quantity") - 25).cast("double").alias("qty_dev"),
        F.floor("l_extendedprice").alias("floor_price"),
        F.ceil("l_extendedprice").alias("ceil_price"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        (F.col("l_linenumber").cast("long") % 3).alias("mod3"),
    )


ARITHMETIC_SQL = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 4)  AS revenue,
       round(sqrt(l_quantity), 6)                    AS sqrt_qty,
       round(pow(1 + l_tax, 2), 6)                   AS tax_sq,
       CAST(abs(l_quantity - 25) AS DOUBLE)          AS qty_dev,
       CAST(floor(l_extendedprice) AS BIGINT)        AS floor_price,
       CAST(ceil(l_extendedprice) AS BIGINT)         AS ceil_price,
       round(ln(l_extendedprice), 6)                 AS ln_price,
       CAST(l_linenumber AS BIGINT) % 3              AS mod3
FROM lineitem
"""


# --------------------------------------------------------------------------
# timestamp component extraction (timestamps.hpp:112)
def ts_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("mo"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.minute("ts").cast("long").alias("mi"),
        F.second("ts").cast("long").alias("s"),
    )


TS_EXTRACT_SQL = """
SELECT event_id, year(ts) AS y, month(ts) AS mo, day(ts) AS d,
       hour(ts) AS h, minute(ts) AS mi, second(ts) AS s
FROM events
"""


# timestamp parse round-trip (timestamps.hpp:100 strptime)
def ts_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    formatted = F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    return e.select(
        "event_id",
        formatted.alias("ts_str"),
        F.to_timestamp(formatted, "yyyy-MM-dd HH:mm:ss").alias("ts_parsed"),
    )


TS_PARSE_SQL = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S')                               AS ts_str,
       strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS ts_parsed
FROM events
"""


# --------------------------------------------------------------------------
# window functions (beyond-reference: SURVEY §2.5 — declared, never
# implemented there; native in Spark).
def window_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (W.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return o.select(
        "o_orderkey", "o_custkey",
        F.round(F.sum(_cents(F.col("o_totalprice"))).over(w) / 100.0, 2).alias("cum_spend"),
    )


WINDOW_CUMSUM_SQL = """
SELECT o_orderkey, o_custkey,
       round(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0, 2) AS cum_spend
FROM orders
"""


def window_cumall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full declared cum_* set (cum_sum/min/max/prod —
    allowlisted but unimplemented there, dsl/expressions/unary.py:110-117)
    as ordered window frames.  cum_prod runs on (1+l_tax) ≤ 1.1^7 per
    order, so the double stays exact to 6 places.

    The testdata's l_linenumber is NOT unique per order — the order-by
    includes every column the cumulatives consume, so tied rows are
    interchangeable and the output multiset is deterministic (same
    discipline as the rounded-measure+id-tiebreak ranking rule)."""
    l = load_table(spark, sf_dir, "lineitem")
    w = (W.partitionBy("l_orderkey")
         .orderBy("l_linenumber", "l_quantity", "l_extendedprice", "l_tax")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return l.select(
        "l_orderkey", "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 2).alias("cum_qty"),
        F.round(F.min("l_extendedprice").over(w), 2).alias("cum_min_price"),
        F.round(F.max("l_extendedprice").over(w), 2).alias("cum_max_price"),
        F.round(F.product(1 + F.col("l_tax")).over(w), 6).alias("cum_tax_factor"),
        F.count("*").over(w).alias("cum_n"),
    )


WINDOW_CUMALL_SQL = """
SELECT l_orderkey, l_linenumber,
       round(sum(l_quantity) OVER w, 2) AS cum_qty,
       round(min(l_extendedprice) OVER w, 2) AS cum_min_price,
       round(max(l_extendedprice) OVER w, 2) AS cum_max_price,
       round(product(1 + l_tax) OVER w, 6) AS cum_tax_factor,
       count(*) OVER w AS cum_n
FROM lineitem
WINDOW w AS (PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_quantity, l_extendedprice, l_tax
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey",
                 F.round("o_totalprice", 2).alias("total"),
                 F.row_number().over(w).cast("long").alias("rn"))
        .filter(F.col("rn") <= 3)
    )


WINDOW_TOPN_SQL = """
SELECT o_custkey, o_orderkey, total, rn FROM (
  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# q06 — pure filter + global agg (predicate pushdown showcase: all three
# filters reach the parquet scan).
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter((F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
                 & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
                 & (F.col("l_discount").between(0.03, 0.07))
                 & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(_cents(F.col("l_extendedprice"))
                           * _cents(F.col("l_discount"))) / 10000.0, 4).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


Q06_SQL = """
SELECT round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                 * CAST(round(l_discount * 100, 0) AS BIGINT)) AS BIGINT) / 10000.0, 4) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# q10 — returned items: join + group + top-k customers by lost revenue.
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum(_cents(F.col("l_extendedprice"))
                           * (100 - _cents(F.col("l_discount")))) / 10000.0, 4)
             .alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name,
       round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) / 10000.0, 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# rollup / cube — grouping sets (beyond-reference; native in Spark AND
# expressible in the DuckDB oracle).
def rollup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.count(F.lit(1)).alias("n"))
    )


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def grouping_sets_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): per-(flag,status),
    per-flag, and grand total — the ad-hoc aggregation-lattice shape
    OLAP reports use.  Spark: groupingSets on Dataset via SQL expr."""
    l = load_table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("__gs_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
    """)


GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum(_cents(F.col("o_totalprice"))) / 100.0, 2).alias("total"),
             F.count(F.lit(1)).alias("n"))
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       round(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0, 2) AS total,
       count(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# set ops beyond Union: INTERSECT / EXCEPT (set semantics both engines).
def intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    with_orders = o.select(F.col("o_custkey").alias("custkey"))
    positive_bal = c.filter(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("custkey"))
    return with_orders.intersect(positive_bal)


INTERSECT_SQL = """
SELECT o_custkey AS custkey FROM orders
INTERSECT
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
"""


def except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    all_keys = c.select(F.col("c_custkey").alias("custkey"))
    with_orders = o.select(F.col("o_custkey").alias("custkey"))
    return all_keys.exceptAll(with_orders).distinct()


EXCEPT_SQL = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders
"""


# --------------------------------------------------------------------------
# wider math-function surface: trig/log/shift allowlist coverage
# (binaryop.hpp:26-48 atan2/logb/shifts; unary.py:77-99 sin/cos/...).
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return e.select(
        "event_id",
        F.round(F.sin(v), 6).alias("sin_v"),
        F.round(F.cos(v), 6).alias("cos_v"),
        F.round(F.atan2(v, F.lit(2.0)), 6).alias("atan2_v"),
        F.round(F.atan(v / 100), 6).alias("atan_v"),
        F.round(F.log2(v + 1), 6).alias("log2_v"),
        F.round(F.log10(v + 1), 6).alias("log10_v"),
        F.round(F.exp(-v / 100), 6).alias("exp_v"),
        F.shiftleft(F.col("user_id"), 3).alias("shl"),
        F.shiftright(F.col("user_id"), 1).alias("shr"),
        (F.col("user_id").bitwiseXOR(F.col("event_id"))).alias("xor_ids"),
    )


MATH_FUNCTIONS_SQL = """
SELECT event_id,
       round(sin(value), 6)            AS sin_v,
       round(cos(value), 6)            AS cos_v,
       round(atan2(value, 2.0), 6)     AS atan2_v,
       round(atan(value / 100), 6)     AS atan_v,
       round(log2(value + 1), 6)       AS log2_v,
       round(log10(value + 1), 6)      AS log10_v,
       round(exp(-value / 100), 6)     AS exp_v,
       CAST(user_id * 8 AS BIGINT)     AS shl,
       CAST(floor(user_id / 2) AS BIGINT) AS shr,
       xor(user_id, event_id)          AS xor_ids
FROM events
"""


# --------------------------------------------------------------------------
# as-of join (operators/asof.py): for each purchase event, the most
# recent at-or-before view event of the same user.  DuckDB oracle uses
# its native ASOF JOIN.
def asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase") \
                 .select("event_id", "user_id", "ts")
    views = e.filter(F.col("event_type") == "view") \
             .select("user_id", "ts", F.col("event_id").alias("view_event_id"),
                     F.round("value", 2).alias("view_value"))
    out = asof_join(purchases, views, on=["user_id"], left_ts="ts",
                    right_ts="ts", right_payload=["view_event_id", "view_value"])
    return out.select("event_id", "user_id", "ts",
                      F.col("ts_right").alias("view_ts"),
                      "view_event_id", "view_value")


ASOF_SQL = """
SELECT p.event_id, p.user_id, p.ts,
       v.ts AS view_ts, v.event_id AS view_event_id,
       round(v.value, 2) AS view_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""


def asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound (pandas merge_asof tolerance
    semantics): views older than 15 minutes before the purchase are
    masked back to null.  Same one-shuffle merge-asof plan."""
    from legate_dataframe_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase") \
                 .select("event_id", "user_id", "ts")
    views = e.filter(F.col("event_type") == "view") \
             .select("user_id", "ts", F.col("event_id").alias("view_event_id"))
    out = asof_join(purchases, views, on=["user_id"], left_ts="ts",
                    right_ts="ts", right_payload=["view_event_id"],
                    tolerance="15 MINUTES")
    return out.select("event_id", "user_id", "ts",
                      F.col("ts_right").alias("view_ts"), "view_event_id")


ASOF_TOLERANCE_SQL = """
SELECT p.event_id, p.user_id, p.ts,
       CASE WHEN v.ts >= p.ts - INTERVAL 15 MINUTE THEN v.ts END AS view_ts,
       CASE WHEN v.ts >= p.ts - INTERVAL 15 MINUTE THEN v.event_id END
           AS view_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""


# --------------------------------------------------------------------------
# q04-shaped — order priority checking via EXISTS (left-semi join with a
# cross-table predicate).  The testdata lineitem has no commit/receipt
# dates, so "late line" = shipped after the order date.
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-10-01 00:00:00")))
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(l, (o.o_orderkey == l.l_orderkey)
               & (l.l_shipdate > o.o_orderdate), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q04_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q07 — volume shipping between two nations, by direction and ship year.
# supplier/customer/nation are broadcast dims; the only big shuffle is
# lineitem⋈orders.
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00")))
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")) | \
           ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.round(F.sum(_cents(F.col("l_extendedprice"))
                           * (100 - _cents(F.col("l_discount")))) / 10000.0, 4)
             .alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q07_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) / 10000.0, 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# q08 — market share of one supplier nation inside a region, by order
# year: conditional-sum ratio over a 6-way star join.
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00")))
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey"))
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    target = F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0)))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(target / F.sum(vol), 6).alias("mkt_share"),
             F.round(F.sum(vol) / 10000.0, 4).alias("total_volume"))
        .orderBy("o_year")
    )


Q08_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
                  THEN CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
                  ELSE 0 END) AS BIGINT)
             / CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT), 6) AS mkt_share,
       round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) / 10000.0, 4) AS total_volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND p_type = 'ECONOMY' AND r_name = 'ASIA'
GROUP BY 1
ORDER BY 1
"""


# --------------------------------------------------------------------------
# q12-shaped — conditional-count pivot: high/low-priority line counts per
# linestatus in a ship window (testdata has no l_shipmode; linestatus
# stands in as the pivot axis).
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00")))
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"))
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# --------------------------------------------------------------------------
# q14 — promo revenue share: conditional-sum ratio, part side broadcast.
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-03-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00")))
    p = load_table(spark, sf_dir, "part")
    vol = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0)))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(F.round(promo * 100.0 / F.sum(vol), 6).alias("promo_revenue"))
    )


Q14_SQL = """
SELECT round(CAST(sum(CASE WHEN p_type = 'PROMO'
                THEN CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
                ELSE 0 END) AS BIGINT) * 100.0
             / CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT), 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


# --------------------------------------------------------------------------
# q17 — small-quantity revenue for one brand: correlated per-part average
# rewritten as groupBy + broadcast join (no re-scan, no subquery loop).
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 15))
    lp = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    # exact sums → identical double quotient in every engine
    avg_q = (lp.groupBy(F.col("l_partkey").alias("ap_key"))
             .agg((F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")))
    return (
        lp.join(F.broadcast(avg_q), F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(F.sum(_cents(F.col("l_extendedprice"))) / 100.0 / 7.0, 4)
             .alias("avg_yearly"))
    )


Q17_SQL = """
WITH lp AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1' AND p_size <= 15),
a AS (
  SELECT l_partkey AS ap_key, sum(l_quantity) / count(*) AS avg_qty
  FROM lp GROUP BY 1)
SELECT round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 / 7.0, 4) AS avg_yearly
FROM lp JOIN a ON l_partkey = ap_key
WHERE l_quantity < 0.2 * avg_qty
"""


# --------------------------------------------------------------------------
# q18 — large-volume orders: HAVING-filtered agg drives a semi-ish join.
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (l.groupBy(F.col("l_orderkey").alias("b_okey"))
           .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
           .filter(F.col("sum_qty") > 300))
    return (
        o.join(big, o.o_orderkey == F.col("b_okey"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                F.round(_cents(F.col("o_totalprice")) / 100.0, 2).alias("o_totalprice"),
                "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       round(CAST(round(o_totalprice * 100, 0) AS BIGINT) / 100.0, 2) AS o_totalprice,
       sum_qty
FROM orders
JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING round(sum(l_quantity), 2) > 300) b
  ON o_orderkey = b.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# q19 — disjunctive predicate join (three OR'd brand/size/quantity arms):
# Catalyst pushes the common partkey equi-key and evaluates the residual
# disjunction post-join, so this stays a hash join, not a nested loop.
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    arm = lambda brand, qlo, qhi, smax: (
        (F.col("p_brand") == brand)
        & F.col("l_quantity").between(qlo, qhi)
        & (F.col("p_size").between(1, smax)))
    cond = arm("Brand#12", 1, 11, 5) | arm("Brand#23", 10, 20, 10) | arm("Brand#34", 20, 30, 15)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(_cents(F.col("l_extendedprice"))
                           * (100 - _cents(F.col("l_discount")))) / 10000.0, 4)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )


Q19_SQL = """
SELECT round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) / 10000.0, 4) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""


# --------------------------------------------------------------------------
# q22-shaped — rich lapsed customers: scalar-subquery threshold (broadcast
# single-row cross join) + anti join against recent orders (testdata has
# no c_phone, so segmentation is by mktsegment).
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    thresh = (c.filter(F.col("c_acctbal") > 0)
              .agg((F.sum(_cents(F.col("c_acctbal"))) / F.count(F.lit(1)))
                   .alias("avg_cents")))
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(_cents(F.col("c_acctbal")) > F.col("avg_cents"))
        .join(o.filter(F.col("o_orderdate") >= _ts("2000-01-01 00:00:00")),
              F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.round(F.sum(_cents(F.col("c_acctbal"))) / 100.0, 2).alias("totacctbal"))
        .orderBy("c_mktsegment")
    )


Q22_SQL = """
WITH t AS (
  SELECT CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
         / count(*) AS avg_cents
  FROM customer WHERE c_acctbal > 0)
SELECT c_mktsegment, count(*) AS numcust,
       round(CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) / 100.0, 2) AS totacctbal
FROM customer, t
WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) > avg_cents
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --------------------------------------------------------------------------
# Final TPC-H wave: q02 q09 q11 q13 q15 q16 q20 q21 adapted to the testdata
# schema (no partsupp table, no commit/receipt dates).  The part↔supplier
# relation is derived as `supplies` = DISTINCT (l_partkey, l_suppkey) from
# lineitem — a composite-key shuffle whose output (~parts×avg-suppliers) is
# dimension-sized, so every later join against it is broadcastable.
# "Lateness" (q21) is re-expressed as shipdate > orderdate + 60 days.

def _supplies(l: DataFrame) -> DataFrame:
    """DISTINCT (l_partkey, l_suppkey) — the partsupp surrogate.

    Scale note: dropDuplicates is a partial+final hash agg (map-side
    combine shrinks the shuffle to ~|partsupp| rows, not |lineitem|).
    """
    return l.select("l_partkey", "l_suppkey").dropDuplicates()


def _region_suppliers(spark: SparkSession, sf_dir: str, r_name: str) -> DataFrame:
    """Suppliers in one region with their nation name (dim-sized)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == r_name)
    return (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
             .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
             .select("s_suppkey", "s_name", "s_acctbal", "n_name"))


# q02-shaped — best supplier per part: derived supplies ⋈ broadcast dims,
# per-part window min (no self-join), top-k output.  TPC-H Q2's correlated
# MIN(ps_supplycost) subquery becomes min(s_acctbal) OVER (PARTITION BY
# p_partkey) — one pass, no re-scan.  (reference: join.hpp:78 equi-joins +
# groupby_aggregation.hpp:64; windows are beyond-reference, SURVEY §2.5)
def q02_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .filter((F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)))
    eu = _region_suppliers(spark, sf_dir, "EUROPE")
    cand = (_supplies(l)
            .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
            .join(F.broadcast(eu), F.col("l_suppkey") == eu.s_suppkey))
    w = W.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "s_name", "n_name", "s_acctbal")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q02_SQL = """
WITH supplies AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
                     JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'EUROPE')
SELECT p_partkey, s_name, n_name, s_acctbal
FROM supplies JOIN part ON l_partkey = p_partkey
              JOIN eu   ON l_suppkey = s_suppkey
WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
QUALIFY s_acctbal = min(s_acctbal) OVER (PARTITION BY p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# q09-shaped — product-type profit by nation and year.  TPC-H Q9 minus the
# ps_supplycost term (no partsupp): profit = Σ extprice·(1-disc), exact
# cents.  lineitem⋈orders is the only fact-fact shuffle; part filter and
# supplier→nation are broadcast.
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(_cents(F.col("l_extendedprice"))
                           * (100 - _cents(F.col("l_discount")))) / 10000.0, 4)
             .alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q09_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) / 10000.0, 4) AS sum_profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE 'red%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


# q11-shaped — important parts: per-part value for one nation's suppliers,
# kept when > 0.1% of that nation's total.  The scalar total is a 1-row agg
# broadcast via crossJoin (no second scan of the grouped data; Spark reuses
# the shuffle for both branches only if cached — at 100 TB the grouped
# intermediate is small (per-part), so recomputing the 1-row global sum from
# it is cheap either way).
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = (load_table(spark, sf_dir, "nation")
         .filter(F.col("n_name") == "NATION_7"))
    nat_lines = (l.join(F.broadcast(
                     s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                      .select("s_suppkey")),
                 l.l_suppkey == F.col("s_suppkey")))
    # per_part feeds both the global total and the detail filter —
    # persist so the lineitem aggregation runs once (no cross-branch CSE)
    per_part = tracked_persist(
        nat_lines.groupBy("l_partkey")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("value_cents")))
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") > 0.001 * F.col("total_cents"))
        .select("l_partkey",
                F.round(F.col("value_cents") / 100.0, 2).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


Q11_SQL = """
WITH nat_lines AS (
  SELECT l_partkey, CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'),
per_part AS (
  SELECT l_partkey, CAST(sum(cents) AS BIGINT) AS value_cents
  FROM nat_lines GROUP BY l_partkey)
SELECT l_partkey, round(value_cents / 100.0, 2) AS part_value
FROM per_part
WHERE value_cents > 0.001 * (SELECT CAST(sum(value_cents) AS BIGINT) FROM per_part)
ORDER BY part_value DESC, l_partkey
"""


# q13-shaped — customer order-count distribution: left join with an extra
# join-side predicate (priority <> 1-URGENT), two stacked aggregations.
# Exercises LEFT join null semantics (count(o_orderkey) skips nulls) —
# reference join.hpp:25 LEFT + groupby count_valid.
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, (c.c_custkey == o.o_custkey)
               & (o.o_orderpriority != "1-URGENT"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# q15-shaped — top supplier(s) by 3-month revenue; the max is a 1-row agg
# broadcast back (exact integer cents ⇒ cross-engine equality is safe).
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.filter((F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
                 & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00")))
        .groupBy("l_suppkey")
        .agg(F.sum(_cents(F.col("l_extendedprice"))
                   * (100 - _cents(F.col("l_discount")))).alias("rev_units"))
    )
    # consumed by max() and the detail filter — persist to run the
    # lineitem aggregation once (no cross-branch CSE)
    rev = tracked_persist(rev)
    best = rev.agg(F.max("rev_units").alias("max_units"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("rev_units") == F.col("max_units"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(F.col("s_suppkey"), F.col("s_name"),
                F.round(F.col("rev_units") / 10000.0, 4).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
              * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS rev_units
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, round(rev_units / 10000.0, 4) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_units = (SELECT max(rev_units) FROM rev)
ORDER BY s_suppkey
"""


# q16-shaped — supplier count by part attributes: derived supplies, NOT-IN
# suppliers with negative balance (broadcast anti join), count distinct.
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .filter((F.col("p_brand") != "Brand#5") & (F.col("p_type") != "PROMO")
                 & F.col("p_size").isin(1, 3, 9, 14, 23, 36, 45, 49)))
    bad = (load_table(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (
        _supplies(l)
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(bad), F.col("l_suppkey") == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
WITH supplies AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM supplies JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 3, 9, 14, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# q20-shaped — suppliers who moved volume: per (part,supplier) 1996 shipped
# quantity over 'cold%' parts above a threshold, then semi-join suppliers of
# one region.  TPC-H Q20's ps_availqty/2 correlated subquery becomes the
# qty > 45 HAVING filter (no partsupp).
def q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_name").startswith("cold")).select("p_partkey"))
    af = _region_suppliers(spark, sf_dir, "AFRICA")
    movers = (
        l.filter((F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
                 & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00")))
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 45)
        .select("l_suppkey").dropDuplicates()
    )
    return (
        af.join(movers, af.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AFRICA'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'cold%'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_partkey, l_suppkey
    HAVING sum(l_quantity) > 45)
ORDER BY s_name
"""


# q21-shaped — suppliers who kept orders waiting.  "Late" = shipped > 60
# days after order date (no commit/receipt dates in testdata).  TPC-H Q21's
# EXISTS/NOT-EXISTS pair collapses into one per-order aggregate: the late
# supplier counts iff the order has >1 distinct supplier and exactly 1 late
# one.  One lineitem⋈orders shuffle + one per-order agg — no correlated
# re-scans (at 100 TB an EXISTS-per-row plan would be quadratic).
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    asia = _region_suppliers(spark, sf_dir, "ASIA")
    # `joined` feeds BOTH the stats and late branches; without a
    # persist Spark runs the fact-fact join twice (no cross-branch
    # CSE — same lesson as pipeline/components.py).  Project down to
    # the 3 consumed columns first so the cached footprint is minimal.
    joined = tracked_persist(
        l.join(o, l.l_orderkey == o.o_orderkey)
        .withColumn("is_late",
                    F.col("l_shipdate") > F.col("o_orderdate")
                    + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey", "is_late"))
    stats = (joined.groupBy("l_orderkey")
             .agg(F.count_distinct("l_suppkey").alias("nsupp"),
                  F.count_distinct(F.when(F.col("is_late"),
                                          F.col("l_suppkey"))).alias("nlate")))
    late = (joined.filter("is_late")
            .select("l_orderkey", "l_suppkey").dropDuplicates())
    return (
        late.join(stats.filter((F.col("nsupp") > 1) & (F.col("nlate") == 1)),
                  "l_orderkey", "left_semi")
        .join(F.broadcast(asia), F.col("l_suppkey") == asia.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


Q21_SQL = """
WITH joined AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'),
stats AS (
  SELECT l_orderkey, count(DISTINCT l_suppkey) AS nsupp,
         count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS nlate
  FROM joined GROUP BY l_orderkey),
late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM joined WHERE is_late)
SELECT s_name, count(*) AS numwait
FROM late
JOIN stats USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE nsupp > 1 AND nlate = 1 AND r_name = 'ASIA'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# --------------------------------------------------------------------------
# exact percentiles (beyond-reference: the reference rejects quantile,
# dsl/ir.py:962-968 — Spark has an exact distributed percentile built in).
def quantile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flag quartiles of l_quantity + p90 of price.

    ``F.percentile`` is exact (sort-based partial aggregation, one
    shuffle on the group keys); use ``approx_sketches`` below when a
    t-digest sketch is the right 100 TB trade-off.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(F.round(F.percentile("l_quantity", 0.25), 6).alias("q25"),
             F.round(F.percentile("l_quantity", 0.5), 6).alias("median"),
             F.round(F.percentile("l_quantity", 0.75), 6).alias("q75"),
             F.round(F.percentile("l_extendedprice", 0.9), 6).alias("p90_price"))
    )


QUANTILE_STATS_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25), 6)      AS q25,
       round(quantile_cont(l_quantity, 0.5), 6)       AS median,
       round(quantile_cont(l_quantity, 0.75), 6)      AS q75,
       round(quantile_cont(l_extendedprice, 0.9), 6)  AS p90_price
FROM lineitem GROUP BY l_returnflag
"""


# min_by/max_by — "value at arg-extreme" aggregation (reference expresses
# first/last only as slices, dsl/expressions/aggregation.py:39-81; this is
# the distributed-safe equivalent: deterministic because the ordering
# column o_orderkey is unique).
def minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.max_by("o_totalprice", "o_orderkey").alias("latest_price"),
             F.min_by("o_totalprice", "o_orderkey").alias("first_price"),
             F.max("o_orderkey").alias("last_key"))
    )


MINMAX_BY_SQL = """
SELECT o_custkey,
       arg_max(o_totalprice, o_orderkey) AS latest_price,
       arg_min(o_totalprice, o_orderkey) AS first_price,
       max(o_orderkey)                   AS last_key
FROM orders GROUP BY o_custkey
"""


# sequence (filling.hpp:56) — generated range column, aggregated so the
# oracle compare stays tiny. spark.range generates per-partition slices
# locally: no input IO, no shuffle until the final 1-row agg.
def sequence_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.operators.filling import sequence

    s = sequence(spark, size=100_000, init=1, name="n")
    return s.agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("n") * F.col("n")) % 97).cast("long").alias("sq_mod"),
    )


SEQUENCE_AGG_SQL = """
SELECT CAST(sum(n) AS BIGINT)            AS total,
       count(*)                          AS n_rows,
       CAST(sum((n * n) % 97) AS BIGINT) AS sq_mod
FROM range(1, 100001) t(n)
"""


# contains with a *column* haystack (search.hpp:47): broadcast the small
# distinct haystack, mark membership with a broadcast hash join — the
# fact table never moves (same distribution as the reference's
# broadcast-haystack design, cpp/src/search.cpp:77-78).
def contains_column_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.operators.search import contains

    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    hay = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    marked = contains(l.select("l_suppkey"), "l_suppkey", hay,
                      "s_suppkey", out_col="in_debt")
    return (
        marked.groupBy("in_debt")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("l_suppkey").cast("long").alias("sum_supp"))
    )


CONTAINS_COLUMN_SQL = """
SELECT l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         AS in_debt,
       count(*) AS n,
       CAST(sum(l_suppkey) AS BIGINT) AS sum_supp
FROM lineitem GROUP BY 1
"""


# approximate sketches — the 100 TB variants of count-distinct and
# percentile (HyperLogLog++ / t-digest style: fixed-size state, no
# sort, mergeable across partitions).  Approx VALUES are
# engine-specific, so the verifiable output is (exact value,
# bounded-error boolean): the engine computes both the sketch estimate
# and the exact answer in one query and asserts the estimate's
# documented error bound; the oracle recomputes the exact values and
# asserts the literal bound-holds booleans — turning the old rows-only
# entry into a full hash-checked row (VERDICT r02 §missing 4).
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    # rsd 0.05 ⇒ HLL++ standard error 5%; 4σ ⇒ deterministic-safe 20%
    # bound.  percentile_approx accuracy 10000 ⇒ rank error ≤ n/10000;
    # 5% relative VALUE tolerance is orders looser than that rank slop
    # maps to on this distribution.
    #
    # The distinct-count leg runs in its OWN aggregation: mixing
    # count_distinct with imperative-buffer aggregates (HLL sketch,
    # percentile digests) makes Catalyst rewrite the whole agg through
    # an Expand — every input row duplicated per aggregate group, the
    # sketch buffers then fed the expanded, null-padded stream.
    # Measured 11.7 s fused vs 0.4-0.9 s per leg at sf0.1 (caught by
    # the r08 bench --all ledger — this query had no timing row
    # before); two aggs + a 3-row broadcast join cost ~1 s total.
    dist = (l.groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_orderkey", rsd=0.05)
                 .alias("approx_orders"),
                 F.count_distinct("l_orderkey").alias("exact_orders")))
    pct = (l.groupBy("l_returnflag")
           .agg(F.percentile_approx("l_extendedprice", 0.5, 10000)
                .alias("approx_median"),
                F.percentile("l_extendedprice", 0.5)
                .alias("exact_median")))
    agg = dist.join(F.broadcast(pct), "l_returnflag")
    return agg.select(
        "l_returnflag", "exact_orders",
        F.round("exact_median", 6).alias("exact_median_price"),
        (F.abs(F.col("approx_orders") - F.col("exact_orders"))
         <= 0.20 * F.col("exact_orders")).alias("distinct_in_bound"),
        (F.abs(F.col("approx_median") - F.col("exact_median"))
         <= 0.05 * F.abs(F.col("exact_median"))).alias("median_in_bound"))


APPROX_SKETCHES_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS exact_orders,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_median_price,
       true AS distinct_in_bound,
       true AS median_in_bound
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# unpivot / melt — wide→long normalization (DataFrame.unpivot; the
# inverse of pivot_event_values).  The column list is static, so the
# plan is a narrow Expand node: no shuffle, output = 4 rows per input.
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (l.select("l_orderkey", "l_linenumber", "l_quantity",
                     "l_extendedprice", "l_discount", "l_tax")
            .unpivot(["l_orderkey", "l_linenumber"],
                     ["l_quantity", "l_extendedprice", "l_discount",
                      "l_tax"],
                     "metric", "val")
            .select("l_orderkey", "l_linenumber", "metric",
                    F.round("val", 4).alias("val")))


UNPIVOT_METRICS_SQL = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
       round(l_quantity, 4) AS val FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice',
       round(l_extendedprice, 4) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount',
       round(l_discount, 4) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', round(l_tax, 4) FROM lineitem
"""


# --------------------------------------------------------------------------
# lag/lead/ntile — the offset-window family (beyond-reference; the
# reference has no window functions at all, SURVEY §2.5).  Full
# (ts, event_id) tiebreak makes every offset deterministic.
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    e = load_table(spark, sf_dir, "events")
    w = _W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id",
        F.round(F.lag("value").over(w), 4).alias("prev_value"),
        F.round(F.lead("value").over(w), 4).alias("next_value"),
        F.ntile(4).over(w).cast("long").alias("quartile"))


WINDOW_LAG_LEAD_SQL = """
SELECT event_id, user_id,
       round(lag(value) OVER w, 4) AS prev_value,
       round(lead(value) OVER w, 4) AS next_value,
       ntile(4) OVER w AS quartile
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL surface: customers
    above their OWN nation's average balance.  Registers the table as
    a temp view and goes through ``spark.sql`` so Catalyst's subquery
    DECORRELATION runs (the rewrite into an aggregate + join — not
    expressible directly in the DataFrame API).  Balances compare in
    exact integer cents, and the per-nation average is a ratio of an
    exact int sum to a count, so the boundary is engine-identical."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql("""
        SELECT c.c_nationkey, count(*) AS n_above
        FROM customer c
        WHERE CAST(round(c.c_acctbal * 100, 0) AS BIGINT) >
              (SELECT avg(CAST(round(c2.c_acctbal * 100, 0) AS BIGINT))
               FROM customer c2
               WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY c.c_nationkey
    """)


CORRELATED_SUBQUERY_SQL = """
SELECT c.c_nationkey, count(*) AS n_above
FROM customer c
WHERE CAST(round(c.c_acctbal * 100, 0) AS BIGINT) >
      (SELECT avg(CAST(round(c2.c_acctbal * 100, 0) AS BIGINT))
       FROM customer c2
       WHERE c2.c_nationkey = c.c_nationkey)
GROUP BY c.c_nationkey
"""


def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS through the SQL surface: brands with a
    high-quantity lineitem but no returned lineitem.  Catalyst
    rewrites the pair into a left-semi + left-anti join — the SQL
    spelling of the join_semi/join_anti operators already covered at
    the DataFrame level."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT p.p_brand, count(*) AS n_parts
        FROM part p
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey
                        AND l.l_quantity > 45)
          AND NOT EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey
                            AND l2.l_returnflag = 'R'
                            AND l2.l_quantity >= 40)
        GROUP BY p.p_brand
    """)


EXISTS_SUBQUERY_SQL = """
SELECT p.p_brand, count(*) AS n_parts
FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
  AND NOT EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_partkey = p.p_partkey
                    AND l2.l_returnflag = 'R'
                    AND l2.l_quantity >= 40)
GROUP BY p.p_brand
"""


# --------------------------------------------------------------------------
# SCD type-2 dimension build — turn a user's purchase-value event
# stream into validity intervals [valid_from, valid_to) with change
# collapsing, the standard snapshot/dimension-history shape a training
# pipeline uses to join "the value AS OF the example's timestamp".
# Two windows over the SAME (user_id)/(ts, event_id) partitioning —
# Catalyst reuses one sort+shuffle for both; no join, no driver data.
# Change detection compares integer cents (round-trip-stable in any
# engine) rather than raw doubles, so the oracle collapses identically.
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    chg = (e.filter(F.col("event_type") == "purchase")
           .select("user_id", "event_id", "ts", cents.alias("val_cents"))
           .withColumn("__prev", F.lag("val_cents").over(w))
           .filter(F.col("__prev").isNull()
                   | (F.col("__prev") != F.col("val_cents")))
           .drop("__prev"))
    return (chg.withColumn("valid_to", F.lead("ts").over(w))
            .select("user_id", "val_cents",
                    F.col("ts").alias("valid_from"), "valid_to",
                    F.col("valid_to").isNull().alias("is_current")))


SCD2_INTERVALS_SQL = """
WITH p AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100, 0) AS BIGINT) AS val_cents
  FROM events WHERE event_type = 'purchase'),
chg AS (
  SELECT user_id, event_id, ts, val_cents
  FROM (SELECT *, lag(val_cents) OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM p)
  WHERE prev IS NULL OR prev != val_cents)
SELECT user_id, val_cents, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           IS NULL AS is_current
FROM chg
"""


# --------------------------------------------------------------------------
# equi-depth histogram — the optimizer-statistics / data-profiling op.
# The naive construction (global ntile window) funnels the whole table
# through ONE sort partition; the scale-safe form computes the decile
# boundary VALUES with the distributed exact percentile (sort-based
# partial agg), broadcasts the 1-row boundary array, and assigns each
# row its bucket with a counting comparison — one narrow map + one
# 10-group aggregate, no global sort at any size.
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    qs = [i / 10 for i in range(1, 10)]
    # ONE array-percentile aggregate, not nine scalar ones: each scalar
    # F.percentile is an independent sort-buffer aggregate, and nine of
    # them measured 38 s vs 1.9 s for the single array form at sf0.1
    bounds = l.groupBy().agg(F.transform(
        F.percentile("l_extendedprice",
                     F.array(*[F.lit(q) for q in qs])),
        lambda b: F.round(b, 6)).alias("bs"))
    bucket = F.aggregate(
        F.col("bs"), F.lit(0),
        lambda acc, b: acc + F.when(F.col("l_extendedprice") > b, 1)
        .otherwise(0))
    return (l.join(F.broadcast(bounds))
            .select(bucket.cast("long").alias("bucket"), "l_extendedprice")
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.round(F.min("l_extendedprice"), 2).alias("lo"),
                 F.round(F.max("l_extendedprice"), 2).alias("hi"),
                 F.round(F.sum("l_extendedprice"), 2).alias("total")))


EQUIDEPTH_HISTOGRAM_SQL = """
WITH b AS (
  SELECT list_transform(quantile_cont(l_extendedprice,
           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
         x -> round(x, 6)) AS bs
  FROM lineitem)
SELECT len(list_filter(bs, x -> l_extendedprice > x)) AS bucket,
       count(*) AS n_rows,
       round(min(l_extendedprice), 2) AS lo,
       round(max(l_extendedprice), 2) AS hi,
       round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS total
FROM lineitem, b
GROUP BY 1
"""


# --------------------------------------------------------------------------
# table profiling — ANALYZE-style per-column statistics (row/null/
# distinct counts, min/max), the stats-collection pass an optimizer or
# data-quality monitor runs.  ONE scan: all columns aggregate together
# (multi-column count_distinct becomes a single Expand + partial-agg
# pass), then the 1-row wide result unpivots to (column, stat) rows —
# a k-scan per-column UNION would read the table k times.
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "value"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        # doubles: fixed-decimal %.4f formatting AFTER the min/max —
        # a bare CAST(double AS string) is engine-default rendering
        # (Spark goes scientific for |x|<1e-3 or >=1e7, DuckDB stays
        # plain decimal), which would silently break parity if the
        # value range ever drifts
        if c == "value":
            aggs += [
                F.count(c).alias(f"{c}__nn"),
                F.count_distinct(c).alias(f"{c}__nd"),
                F.format_string(
                    "%.4f", F.min(F.round(F.col(c).cast("double"), 4)))
                .alias(f"{c}__mn"),
                F.format_string(
                    "%.4f", F.max(F.round(F.col(c).cast("double"), 4)))
                .alias(f"{c}__mx"),
            ]
        else:
            aggs += [
                F.count(c).alias(f"{c}__nn"),
                F.count_distinct(c).alias(f"{c}__nd"),
                F.min(c).cast("string").alias(f"{c}__mn"),
                F.max(c).cast("string").alias(f"{c}__mx"),
            ]
    wide = e.groupBy().agg(*aggs)
    per_col = [
        wide.select(F.lit(c).alias("column"), "n_rows",
                    (F.col("n_rows") - F.col(f"{c}__nn"))
                    .alias("n_nulls"),
                    F.col(f"{c}__nd").alias("n_distinct"),
                    F.col(f"{c}__mn").alias("min_val"),
                    F.col(f"{c}__mx").alias("max_val"))
        for c in cols
    ]
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionByName(p)
    return out


PROFILE_TABLE_SQL = """
WITH w AS (
  SELECT count(*) AS n_rows,
         count(event_id) AS a_nn, count(DISTINCT event_id) AS a_nd,
         CAST(min(event_id) AS VARCHAR) AS a_mn,
         CAST(max(event_id) AS VARCHAR) AS a_mx,
         count(user_id) AS b_nn, count(DISTINCT user_id) AS b_nd,
         CAST(min(user_id) AS VARCHAR) AS b_mn,
         CAST(max(user_id) AS VARCHAR) AS b_mx,
         count(event_type) AS c_nn, count(DISTINCT event_type) AS c_nd,
         CAST(min(event_type) AS VARCHAR) AS c_mn,
         CAST(max(event_type) AS VARCHAR) AS c_mx,
         count(value) AS d_nn, count(DISTINCT value) AS d_nd,
         printf('%.4f', min(round(value, 4))) AS d_mn,
         printf('%.4f', max(round(value, 4))) AS d_mx
  FROM events)
SELECT 'event_id' AS "column", n_rows, n_rows - a_nn AS n_nulls,
       a_nd AS n_distinct, a_mn AS min_val, a_mx AS max_val FROM w
UNION ALL
SELECT 'user_id', n_rows, n_rows - b_nn, b_nd, b_mn, b_mx FROM w
UNION ALL
SELECT 'event_type', n_rows, n_rows - c_nn, c_nd, c_mn, c_mx FROM w
UNION ALL
SELECT 'value', n_rows, n_rows - d_nn, d_nd, d_mn, d_mx FROM w
"""
