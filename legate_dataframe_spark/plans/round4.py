"""Round-4 query plans: deeper OLAP statistics, scalar-function
breadth, and gaps-and-islands / skyline / decay analytics.

Same contract as plans/relational.py — every query returns a
DataFrame whose columns are aliased identically to its DuckDB oracle,
doubles rounded on both sides, int outputs cast to long so schemas
line up (DuckDB count/bit aggregates are BIGINT).

Engine-parity notes discovered while building these oracles:

- DuckDB ``skewness``/``kurtosis`` are the SAMPLE statistics (G1,
  adjusted), Spark's are the POPULATION moments (g1 = m3/m2^1.5,
  excess m4/m2^2 - 3) — the oracles compute the explicit central
  moments instead of calling DuckDB's aggregates;
- DuckDB ``dayofweek`` is 0=Sunday, Spark's is 1=Sunday (+1 shift in
  the oracle); Spark ``weekday`` (0=Monday) maps to ``isodow - 1``;
- ``date_trunc`` returns timestamp in Spark but date in DuckDB for
  date-granularity units — both sides cast to DATE;
- DuckDB has no ``months_between``/``initcap``/``soundex`` — those
  stay out of the parity surface (datediff covers the date-delta
  need).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from legate_dataframe_spark.plans.relational import load_table


# ----------------------------------------------------------------- stats
# Higher statistical moments + bivariate stats per group — the
# reference's groupby covers sum/mean/min/max/count (SURVEY §2.4);
# skew/kurtosis/corr/covariance are the next aggregates any profiling
# or drift-monitoring pass needs.  One hash-aggregate pass, partial
# (map-side) moment accumulation — no extra shuffle vs a plain sum.
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(F.round(F.skewness("l_quantity"), 6).alias("skew_qty"),
             F.round(F.kurtosis("l_quantity"), 6).alias("kurt_qty"),
             F.round(F.corr("l_quantity", "l_extendedprice"), 6)
             .alias("corr_qty_price"),
             F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2)
             .alias("cov_qty_price"),
             F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"))
    )


STATS_MOMENTS_SQL = """
WITH g AS (SELECT l_returnflag, avg(l_quantity) AS mq FROM lineitem GROUP BY 1)
SELECT l.l_returnflag,
       round(avg(pow(l_quantity - mq, 3))
             / pow(avg(pow(l_quantity - mq, 2)), 1.5), 6) AS skew_qty,
       round(avg(pow(l_quantity - mq, 4))
             / pow(avg(pow(l_quantity - mq, 2)), 2) - 3, 6) AS kurt_qty,
       round(corr(l_quantity, l_extendedprice), 6)          AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 2)    AS cov_qty_price,
       round(stddev_samp(l_quantity), 6)                    AS sd_qty
FROM lineitem l JOIN g USING (l_returnflag)
GROUP BY l.l_returnflag
"""


# bit_and / bit_or / bit_xor aggregates — exact integer outputs, the
# canonical flag-mask rollup.  Plain partial+final hash agg.
def bitwise_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.bit_and("o_orderkey").alias("key_and"),
             F.bit_or("o_orderkey").alias("key_or"),
             F.bit_xor("o_orderkey").alias("key_xor"),
             F.count(F.lit(1)).alias("n"))
    )


BITWISE_AGGS_SQL = """
SELECT o_orderpriority,
       bit_and(o_orderkey) AS key_and,
       bit_or(o_orderkey)  AS key_or,
       bit_xor(o_orderkey) AS key_xor,
       count(*)            AS n
FROM orders GROUP BY o_orderpriority
"""


# Deterministic mode: both engines' built-in ``mode()`` breaks ties
# arbitrarily, so the parity-safe (and distribution-safe) form is the
# explicit count + rank with a total tiebreak — count desc, value asc.
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    counts = (e.withColumn("bucket", F.col("user_id") % 10)
              .groupBy("bucket", "event_type")
              .agg(F.count(F.lit(1)).alias("n_occ")))
    w = W.partitionBy("bucket").orderBy(F.desc("n_occ"), F.asc("event_type"))
    return (counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("bucket", F.col("event_type").alias("mode_event"),
                    "n_occ"))


MODE_PER_GROUP_SQL = """
WITH c AS (
  SELECT user_id % 10 AS bucket, event_type, count(*) AS n_occ
  FROM events GROUP BY 1, 2),
r AS (
  SELECT bucket, event_type, n_occ,
         row_number() OVER (PARTITION BY bucket
                            ORDER BY n_occ DESC, event_type) AS rn
  FROM c)
SELECT bucket, event_type AS mode_event, n_occ FROM r WHERE rn = 1
"""


# Filtered aggregation (SQL FILTER clause / count_if) — conditional
# aggregates in ONE pass instead of N self-joined scans.
def filtered_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    promo = F.col("l_discount") >= 0.05
    heavy = F.col("l_quantity") > 25
    return (
        l.groupBy("l_linestatus")
        .agg(F.count_if(promo).alias("n_promo"),
             F.round(F.sum(F.when(promo, F.col("l_extendedprice"))), 2)
             .alias("promo_revenue"),
             F.round(F.avg(F.when(heavy, F.col("l_extendedprice"))), 2)
             .alias("avg_heavy_price"),
             F.count_if(promo & heavy).alias("n_both"),
             F.count(F.lit(1)).alias("n_rows"))
    )


FILTERED_AGGS_SQL = """
SELECT l_linestatus,
       count(*) FILTER (l_discount >= 0.05)                    AS n_promo,
       round(sum(l_extendedprice) FILTER (l_discount >= 0.05), 2)
                                                               AS promo_revenue,
       round(avg(l_extendedprice) FILTER (l_quantity > 25), 2) AS avg_heavy_price,
       count(*) FILTER (l_discount >= 0.05 AND l_quantity > 25) AS n_both,
       count(*)                                                AS n_rows
FROM lineitem GROUP BY l_linestatus
"""


# ------------------------------------------------------------- skyline
# Pareto frontier of orders on (totalprice, orderdate): an order is on
# the skyline iff no other order has both a >= price and a >= date
# (strict in at least one).  Exact, no pairwise join:
#   1. collapse to per-price max date (any same-price-lower-date row
#      is dominated by its price peer) — one hash agg;
#   2. LOCAL skyline per partition: sort desc by price, keep rows whose
#      date exceeds the running max of all strictly-higher-price rows —
#      any locally dominated row is globally dominated, so this narrow
#      pass shrinks the candidate set before data moves;
#   3. GLOBAL skyline over the (tiny) survivor union with the same
#      running-max rule.
# At 100 TB the single-partition global window only ever sees the
# local survivors (frontier-sized, typically ≪ input).
def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_price = (o.groupBy("o_totalprice")
                 .agg(F.max("o_orderdate").alias("best_date")))

    def survivors(df: DataFrame, part_cols: list) -> DataFrame:
        w = (W.partitionBy(*part_cols).orderBy(F.desc("o_totalprice"))
             .rowsBetween(W.unboundedPreceding, -1))
        return (df.withColumn("m", F.max("best_date").over(w))
                .filter(F.col("m").isNull()
                        | (F.col("m") < F.col("best_date")))
                .drop("m"))

    local = survivors(per_price.withColumn("pid", F.spark_partition_id()),
                      [F.col("pid")]).drop("pid")
    return (survivors(local, [])
            .select(F.col("o_totalprice").alias("price"),
                    F.col("best_date").alias("latest_date")))


SKYLINE_ORDERS_SQL = """
WITH pd AS (
  SELECT o_totalprice, max(o_orderdate) AS best_date
  FROM orders GROUP BY 1),
m AS (
  SELECT o_totalprice, best_date,
         max(best_date) OVER (ORDER BY o_totalprice DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prev_max
  FROM pd)
SELECT o_totalprice AS price, best_date AS latest_date
FROM m WHERE prev_max IS NULL OR prev_max < best_date
"""


# ------------------------------------------------- gaps and islands
# Runs of consecutive active days per user (the classic
# day_number - row_number grouping trick): streak analytics every
# engagement pipeline needs.  Two window passes over (user, day)
# DISTINCT rows — the distinct collapses events to ≤ span-days rows
# per user before any window sort.
def sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    days = (e.select("user_id",
                     F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
                     .alias("day_num"))
            .distinct())
    w = W.partitionBy("user_id").orderBy("day_num")
    islands = (days.withColumn(
        "grp", F.col("day_num") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("len")))
    return (islands.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_streaks"),
                 F.max("len").alias("longest_streak"),
                 F.sum("len").cast("long").alias("n_active_days")))


SEQUENCE_GAPS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_num
  FROM events),
isl AS (
  SELECT user_id,
         day_num - row_number() OVER (PARTITION BY user_id
                                      ORDER BY day_num) AS grp,
         count(*) OVER () AS _n
  FROM days),
runs AS (
  SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2)
SELECT user_id,
       count(*)              AS n_streaks,
       max(len)              AS longest_streak,
       CAST(sum(len) AS BIGINT) AS n_active_days
FROM runs GROUP BY user_id
"""


# ------------------------------------------------- time-decay weighting
# Exponentially decayed revenue per customer (half-life analytics /
# recency-weighted LTV).  The reference point "now" is the corpus max
# date — a 1-row broadcast, so the fact scan stays a narrow map into
# one hash agg.
def time_decay_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    now = o.agg(F.max("o_orderdate").alias("now_date"))
    decayed = (o.join(F.broadcast(now))
               .withColumn(
                   "w",
                   F.exp(-F.datediff(F.col("now_date"), F.col("o_orderdate"))
                         / F.lit(365.0))))
    return (decayed.groupBy("o_custkey")
            .agg(F.round(F.sum(F.col("o_totalprice") * F.col("w")), 2)
                 .alias("decayed_revenue"),
                 F.round(F.sum("w"), 6).alias("decayed_orders"))
            .filter(F.col("decayed_revenue") > 0))


TIME_DECAY_REVENUE_SQL = """
WITH now_d AS (SELECT max(o_orderdate) AS now_date FROM orders)
SELECT o_custkey,
       round(sum(o_totalprice *
                 exp(-datediff('day', o_orderdate, now_date) / 365.0)), 2)
           AS decayed_revenue,
       round(sum(exp(-datediff('day', o_orderdate, now_date) / 365.0)), 6)
           AS decayed_orders
FROM orders, now_d
GROUP BY o_custkey
HAVING round(sum(o_totalprice *
                 exp(-datediff('day', o_orderdate, now_date) / 365.0)), 2) > 0
"""


# ------------------------------------------------ scalar breadth
# String-function surface beyond §2.8's starts/ends/contains/regex:
# split_part, translate, pad, reverse, repeat, instr, substring —
# all JVM codegen'd narrow maps (and all with exact DuckDB twins).
def string_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou")
        .alias("seg_lowvowel"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_pad"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
        F.repeat(F.substring(F.col("c_mktsegment"), 1, 2), 3)
        .alias("seg_rep"),
        F.instr(F.col("c_name"), "#").cast("long").alias("hash_pos"),
        F.concat_ws("|", F.col("c_mktsegment"),
                    F.col("c_custkey").cast("string")).alias("joined"),
        F.length(F.rtrim(F.ltrim(F.col("c_name")))).cast("long")
        .alias("trim_len"),
    )


STRING_FUNCTIONS2_SQL = """
SELECT c_custkey,
       split_part(c_name, '#', 2)                    AS name_num,
       translate(c_mktsegment, 'AEIOU', 'aeiou')     AS seg_lowvowel,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0')     AS key_pad,
       reverse(c_mktsegment)                         AS seg_rev,
       repeat(substr(c_mktsegment, 1, 2), 3)         AS seg_rep,
       instr(c_name, '#')                            AS hash_pos,
       concat_ws('|', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS joined,
       length(rtrim(ltrim(c_name)))                  AS trim_len
FROM customer
"""


# Timestamp/date component surface beyond §2.8's extract: ISO weeks,
# quarter, week/month truncation, last_day, day deltas.  Engine
# calendar conventions differ (module docstring) — the oracle carries
# the shifts so BOTH sides state their native idiom.
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.dayofweek("ts").cast("long").alias("dow_sun1"),
        F.weekday("ts").cast("long").alias("wd_mon0"),
        F.weekofyear("ts").cast("long").alias("iso_week"),
        F.quarter("ts").cast("long").alias("qtr"),
        F.to_date(F.date_trunc("week", F.col("ts"))).alias("week_start"),
        F.to_date(F.date_trunc("month", F.col("ts"))).alias("month_start"),
        F.last_day(F.col("ts")).alias("month_end"),
        F.hour("ts").cast("long").alias("hr"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).cast("long")
        .alias("days_in"),
    )


DATE_FUNCTIONS_SQL = """
SELECT event_id,
       dayofweek(ts) + 1                         AS dow_sun1,
       isodow(ts) - 1                            AS wd_mon0,
       weekofyear(ts)                            AS iso_week,
       quarter(ts)                               AS qtr,
       CAST(date_trunc('week', ts) AS DATE)      AS week_start,
       CAST(date_trunc('month', ts) AS DATE)     AS month_start,
       last_day(CAST(ts AS DATE))                AS month_end,
       hour(ts)                                  AS hr,
       datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_in
FROM events
"""


# Array/list-function surface (SURVEY §2.8 array literals + the
# higher-order functions Spark adds): construct, sort, distinct,
# intersect, slice, flatten, zip_with+aggregate dot — all narrow
# maps.  Array results are rendered to strings / reduced to scalars
# for the driver compare (the value-hash serialization of list
# columns differs between engines' pandas materializations; scalars
# hash bit-exactly — the same reason kmeans_centroids explodes its
# vectors).  Float components are fixed-point-scaled to ints before
# rendering so no float-to-string formatting enters the hash.
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    arr = F.sequence(F.lit(1), (F.col("vec_id") % 5) + 1)
    head = F.slice(F.col("embedding").cast("array<double>"), 1, 4)

    def render(a):  # int array → "1,2,3"
        return F.concat_ws(",", a.cast("array<string>"))

    return e.select(
        "vec_id",
        render(arr).alias("arr"),
        render(F.sort_array(F.concat(arr, arr), asc=False))
        .alias("doubled_desc"),
        render(F.sort_array(
            F.array_distinct(F.concat(arr, F.array(F.lit(2), F.lit(9))))))
        .alias("with_extras"),
        render(F.sort_array(
            F.array_intersect(arr, F.array(F.lit(2), F.lit(3), F.lit(4)))))
        .alias("overlap"),
        F.array_contains(arr, 3).alias("has3"),
        F.size("embedding").cast("long").alias("dim"),
        render(F.transform(
            head, lambda x: F.round(x * 10000).cast("long")))
        .alias("head4_fp"),
        F.round(F.aggregate(F.zip_with(head, F.reverse(head),
                                       lambda x, y: x * y),
                            F.lit(0.0), lambda acc, x: acc + x), 4)
        .alias("dot_rev"),
        render(F.flatten(F.array(arr, F.reverse(arr)))).alias("mirrored"),
        F.aggregate(arr, F.lit(0).cast("long"),
                    lambda a, x: a + x).alias("arr_sum"),
    )


ARRAY_FUNCTIONS_SQL = """
WITH b AS (
  SELECT vec_id,
         range(1, CAST(vec_id % 5 AS INT) + 2) AS arr,
         (embedding::DOUBLE[])[1:4]            AS head
  FROM embeddings)
SELECT vec_id,
       array_to_string(arr, ',')                             AS arr,
       array_to_string(list_sort(list_concat(arr, arr), 'DESC'), ',')
                                                             AS doubled_desc,
       array_to_string(list_sort(list_distinct(list_concat(arr, [2, 9]))), ',')
                                                             AS with_extras,
       coalesce(array_to_string(
           list_sort(list_intersect(arr, [2, 3, 4])), ','), '')
                                                             AS overlap,
       list_contains(arr, 3)                                 AS has3,
       64::BIGINT                                            AS dim,
       array_to_string(list_transform(
           head, x -> CAST(round(x * 10000) AS BIGINT)), ',') AS head4_fp,
       round(list_dot_product(head, list_reverse(head)), 4)  AS dot_rev,
       array_to_string(list_concat(arr, list_reverse(arr)), ',') AS mirrored,
       CAST(list_sum(arr) AS BIGINT)                         AS arr_sum
FROM b
"""


# regexp_extract_all + explode: pull every number out of semi-
# structured text (digits injected deterministically — the corpus
# fixture is letter-only), then reduce per doc.  Pure narrow map +
# one hash agg.
def regexp_extract_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    txt = F.concat(F.col("text"), F.lit(" id"),
                   (F.col("doc_id") * 7919).cast("string"),
                   F.lit(" v"), (F.col("doc_id") % 13).cast("string"))
    nums = F.regexp_extract_all(txt, F.lit(r"[0-9]+"), 0)
    return d.select(
        "doc_id",
        F.size(nums).cast("long").alias("n_nums"),
        F.aggregate(F.transform(nums, lambda s: s.cast("long")),
                    F.lit(0).cast("long"), lambda a, x: a + x)
        .alias("num_sum"),
        F.array_max(F.transform(nums, F.length)).cast("long")
        .alias("max_len"),
    )


REGEXP_EXTRACT_NUMBERS_SQL = """
WITH t AS (
  SELECT doc_id,
         regexp_extract_all(
             text || ' id' || CAST(doc_id * 7919 AS VARCHAR)
                  || ' v' || CAST(doc_id % 13 AS VARCHAR),
             '[0-9]+') AS nums
  FROM documents)
SELECT doc_id,
       len(nums)                                             AS n_nums,
       CAST(list_sum(list_transform(nums, s -> CAST(s AS BIGINT)))
            AS BIGINT)                                       AS num_sum,
       CAST(list_max(list_transform(nums, s -> length(s))) AS BIGINT)
                                                             AS max_len
FROM t
"""
