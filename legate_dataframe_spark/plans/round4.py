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


# =================================================================== ANN
# Binary sign-bit quantization + Hamming shortlist + exact rerank —
# the 64×-compressed first pass (16 bytes/vector) that makes a
# 100 TB-corpus prefilter IO-bound on codes, not floats.
#
# FIXED query sample: the three search queries below cap the query
# side at vec_id < 2000 — a no-op at the test scales (sf0.01 has 500
# ids, sf0.1 has 2000) that pins the sample size when the corpus
# grows.  A %-only filter makes the query set grow WITH the corpus,
# so the pair stage goes quadratic at scale (the 10× probe measured
# 50× wall on the uncapped matryoshka form); search workloads are
# queries × corpus, and only the corpus side should scale.
_QUERY_ID_CAP = 2000


def binary_hamming_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.pipeline import similarity

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter((F.col("vec_id") % 100 == 0)
                 & (F.col("vec_id") < _QUERY_ID_CAP))
    return similarity.hamming_rerank_topk(e, q, shortlist=100, k=10)


BINARY_HAMMING_SEARCH_SQL = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
w AS (
  SELECT vec_id, ev,
         CAST(list_sum(list_transform(range(0, 32), i ->
             CASE WHEN ev[i + 1] > 0 THEN (1::BIGINT << i)
                  ELSE 0::BIGINT END)) AS BIGINT) AS w0,
         CAST(list_sum(list_transform(range(0, 32), i ->
             CASE WHEN ev[i + 33] > 0 THEN (1::BIGINT << i)
                  ELSE 0::BIGINT END)) AS BIGINT) AS w1
  FROM v),
q AS (SELECT vec_id AS q_id, ev AS qv, w0 AS qw0, w1 AS qw1
      FROM w WHERE vec_id % 100 = 0 AND vec_id < 2000),
h AS (SELECT q_id, vec_id AS c_id,
             bit_count(xor(w0, qw0)) + bit_count(xor(w1, qw1)) AS hamming,
             ev, qv
      FROM w, q WHERE vec_id != q_id),
s AS (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY hamming, c_id) AS hrank
      FROM h),
r AS (SELECT q_id, c_id, CAST(hamming AS BIGINT) AS hamming,
             round(list_cosine_similarity(ev, qv), 6) AS cos_sim
      FROM s WHERE hrank <= 100)
SELECT q_id, c_id, hamming, cos_sim,
       CAST(row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, c_id) AS BIGINT) AS rank
FROM r QUALIFY rank <= 10
"""


# Matryoshka truncated-prefix shortlist → full-dim exact rerank.
def matryoshka_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.pipeline import similarity

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter((F.col("vec_id") % 50 == 0)
                 & (F.col("vec_id") < _QUERY_ID_CAP))
    return similarity.matryoshka_topk(e, q, prefix_dim=16, shortlist=50,
                                      k=10)


MATRYOSHKA_SEARCH_SQL = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev,
                  (embedding::DOUBLE[])[1:16] AS pv
           FROM embeddings),
q AS (SELECT vec_id AS q_id, ev AS qv, pv AS qp FROM v
      WHERE vec_id % 50 = 0 AND vec_id < 2000),
s AS (SELECT q_id, vec_id AS c_id,
             round(list_cosine_similarity(pv, qp), 6) AS pre_sim, ev, qv
      FROM v, q WHERE vec_id != q_id),
sh AS (SELECT *, row_number() OVER (PARTITION BY q_id
                                    ORDER BY pre_sim DESC, c_id) AS prank
       FROM s),
r AS (SELECT q_id, c_id, pre_sim,
             round(list_cosine_similarity(ev, qv), 6) AS cos_sim
      FROM sh WHERE prank <= 50)
SELECT q_id, c_id, pre_sim, cos_sim,
       CAST(row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, c_id) AS BIGINT) AS rank
FROM r QUALIFY rank <= 10
"""


# k-NN majority-vote classification (labels ride the corpus) — the
# standard embedding-quality probe over a labeled corpus.
def knn_classify_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.pipeline import similarity

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter((F.col("vec_id") % 25 == 0)
                 & (F.col("vec_id") < _QUERY_ID_CAP))
    return similarity.knn_classify(e, q, k=10)


KNN_CLASSIFY_SQL = """
WITH c AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv, label
           FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv,
             CAST(label AS BIGINT) AS tl
      FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 2000),
s AS (SELECT q_id, c_id, label,
             round(list_cosine_similarity(cv, qv), 6) AS cos_sim
      FROM c, q WHERE c_id != q_id),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos_sim DESC, c_id) AS rank
      FROM s),
votes AS (SELECT q_id, CAST(label AS BIGINT) AS nbr_label,
                 count(*) AS votes,
                 CAST(sum(CAST(round(cos_sim * 1e6) AS BIGINT)) AS BIGINT)
                   AS sim_micro_sum
          FROM r WHERE rank <= 10 GROUP BY 1, 2),
p AS (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY votes DESC, nbr_label) AS rn
      FROM votes)
SELECT p.q_id, q.tl AS true_label, p.nbr_label AS pred_label,
       p.votes, p.sim_micro_sum, p.nbr_label = q.tl AS correct
FROM p JOIN q ON p.q_id = q.q_id WHERE p.rn = 1
"""


# LSH tuning signal: what fraction of the band-collision candidate
# pairs survive the exact-Jaccard verify?  (The recall twin is
# ann_recall_audit; this is the precision side — band/row settings
# trade one against the other.)  Runs the SAME banded pipeline with
# the verify threshold at 0 so every candidate is scored.
def minhash_precision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.pipeline import dedup

    d = load_table(spark, sf_dir, "documents")
    cand = dedup.minhash_lsh_pairs(d, num_hashes=16, bands=4,
                                   jaccard_threshold=0.0)
    return cand.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.count_if(F.col("jaccard") >= 0.5).alias("n_true"),
        F.round(F.count_if(F.col("jaccard") >= 0.5)
                / F.count(F.lit(1)), 6).alias("precision"))


from legate_dataframe_spark.plans.pipeline_queries import _lsh_cand_ctes

MINHASH_PRECISION_AUDIT_SQL = "WITH " + _lsh_cand_ctes() + """,
v AS (
  SELECT c.id_a, c.id_b,
         list_distinct(a.sh) AS sa, list_distinct(b.sh) AS sb
  FROM cand c JOIN shg a ON a.id = c.id_a JOIN shg b ON b.id = c.id_b),
j AS (
  SELECT round(len(list_intersect(sa, sb))
               / (len(sa) + len(sb) - len(list_intersect(sa, sb))), 6) AS jac
  FROM v)
SELECT count(*)                              AS n_candidates,
       count(*) FILTER (jac >= 0.5)          AS n_true,
       round(count(*) FILTER (jac >= 0.5) / count(*), 6) AS precision
FROM j
"""


# ================================================================= graph
# Shared oracle CTEs: succession edges (same construction as
# PAGERANK_SQL) symmetrized to an undirected graph.
_GRAPH_CTES = """ordered AS (
  SELECT event_type, user_id, event_id,
         lag(user_id) OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY ts, event_id) AS prev
  FROM events),
edges AS (
  SELECT DISTINCT prev AS src, user_id AS dst FROM ordered
  WHERE prev IS NOT NULL AND prev != user_id),
sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
nodes AS (SELECT DISTINCT src AS node FROM sym)"""


def _event_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.pipeline import graph

    ev = load_table(spark, sf_dir, "events")
    return graph.event_succession_edges(ev)


# Fixed-round synchronous min-label propagation (community /
# component signal); oracle unrolls the identical 3 rounds.
def label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.pipeline import graph

    return graph.min_label_propagation(_event_graph(spark, sf_dir),
                                       n_rounds=3)


LABEL_PROPAGATION_SQL = f"""
WITH {_GRAPH_CTES},
l0 AS (SELECT node, node AS lab FROM nodes),
m1 AS (SELECT s.dst AS node, min(l.lab) AS nl
       FROM sym s JOIN l0 l ON l.node = s.src GROUP BY s.dst),
l1 AS (SELECT l0.node, least(l0.lab, m1.nl) AS lab
       FROM l0 LEFT JOIN m1 USING (node)),
m2 AS (SELECT s.dst AS node, min(l.lab) AS nl
       FROM sym s JOIN l1 l ON l.node = s.src GROUP BY s.dst),
l2 AS (SELECT l1.node, least(l1.lab, m2.nl) AS lab
       FROM l1 LEFT JOIN m2 USING (node)),
m3 AS (SELECT s.dst AS node, min(l.lab) AS nl
       FROM sym s JOIN l2 l ON l.node = s.src GROUP BY s.dst),
l3 AS (SELECT l2.node, least(l2.lab, m3.nl) AS lab
       FROM l2 LEFT JOIN m3 USING (node))
SELECT node, lab FROM l3
"""


# Multi-source BFS hop distances within 3 hops (Bellman-Ford
# relaxation rounds); unreachable nodes drop out.
def bfs_hops_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.pipeline import graph

    edges = _event_graph(spark, sf_dir)
    sym = graph.undirected(edges)
    sources = (sym.select(F.col("src").alias("node")).distinct()
               .filter(F.col("node") % 97 == 0))
    return graph.bfs_hops(edges, sources, max_hops=3)


BFS_HOPS_SQL = f"""
WITH {_GRAPH_CTES},
d0 AS (SELECT node,
              CASE WHEN node % 97 = 0 THEN 0 ELSE NULL END AS d
       FROM nodes),
m1 AS (SELECT s.dst AS node, min(d.d + 1) AS nd
       FROM sym s JOIN d0 d ON d.node = s.src
       WHERE d.d IS NOT NULL GROUP BY s.dst),
d1 AS (SELECT d0.node, least(d0.d, m1.nd) AS d
       FROM d0 LEFT JOIN m1 USING (node)),
m2 AS (SELECT s.dst AS node, min(d.d + 1) AS nd
       FROM sym s JOIN d1 d ON d.node = s.src
       WHERE d.d IS NOT NULL GROUP BY s.dst),
d2 AS (SELECT d1.node, least(d1.d, m2.nd) AS d
       FROM d1 LEFT JOIN m2 USING (node)),
m3 AS (SELECT s.dst AS node, min(d.d + 1) AS nd
       FROM sym s JOIN d2 d ON d.node = s.src
       WHERE d.d IS NOT NULL GROUP BY s.dst),
d3 AS (SELECT d2.node, least(d2.d, m3.nd) AS d
       FROM d2 LEFT JOIN m3 USING (node))
SELECT node, CAST(d AS BIGINT) AS hops FROM d3 WHERE d IS NOT NULL
"""


# Fixed-round k-core peeling: survivors + their degree restricted to
# survivors, after 3 synchronous drop-below-k rounds.
def kcore_peel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.pipeline import graph

    return graph.kcore_peel(_event_graph(spark, sf_dir), k=_KCORE_K,
                            n_rounds=3)


_KCORE_K = 74

KCORE_PEEL_SQL_TEMPLATE = f"""
WITH {_GRAPH_CTES},
d1 AS (SELECT src AS node, count(*) AS degree FROM sym GROUP BY 1),
a1 AS (SELECT node FROM d1 WHERE degree >= {{k}}),
e2 AS (SELECT s.src, s.dst FROM sym s
       JOIN a1 x ON s.src = x.node JOIN a1 y ON s.dst = y.node),
d2 AS (SELECT src AS node, count(*) AS degree FROM e2 GROUP BY 1),
a2 AS (SELECT node FROM d2 WHERE degree >= {{k}}),
e3 AS (SELECT s.src, s.dst FROM e2 s
       JOIN a2 x ON s.src = x.node JOIN a2 y ON s.dst = y.node),
d3 AS (SELECT src AS node, count(*) AS degree FROM e3 GROUP BY 1),
a3 AS (SELECT node FROM d3 WHERE degree >= {{k}})
SELECT d3.node, d3.degree FROM d3 JOIN a3 USING (node)
"""

KCORE_PEEL_SQL = KCORE_PEEL_SQL_TEMPLATE.format(k=_KCORE_K)


# ========================================================= text pipeline
# Cluster-survivor selection by QUALITY policy (vs keep-lowest-id):
# per near-dup cluster keep the best-scoring member.  Oracle chains
# the minhash-pair CTEs + recursive components + the quality formula.
def canonical_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.pipeline import dedup, text
    from legate_dataframe_spark.pipeline.components import canonical_by_policy

    d = load_table(spark, sf_dir, "documents")
    scored = text.quality_score(d)
    pairs = dedup.minhash_lsh_pairs(d, num_hashes=16, bands=4,
                                    jaccard_threshold=0.5)
    return canonical_by_policy(scored, pairs.select("id_a", "id_b"),
                               score_col="quality")


# Word-boundary blocklist matching (safety filtering).
def blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.pipeline import text

    d = load_table(spark, sf_dir, "documents")
    return text.blocklist_hits(d, ["spark", "vector", "merge"])


BLOCKLIST_FILTER_SQL = r"""
WITH h AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '\b(spark|vector|merge)\b'))
             AS n_hits,
         regexp_extract(lower(text), '\b(spark|vector|merge)\b', 1)
             AS first_hit
  FROM documents)
SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits, first_hit
FROM h WHERE n_hits > 0
"""


# Flesch-style readability from regexp counts (single-sentence corpus
# degeneracy documented in pipeline/text.py::readability).
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.pipeline import text

    return text.readability(load_table(spark, sf_dir, "documents"))


READABILITY_SCORES_SQL = r"""
WITH c AS (
  SELECT doc_id, lower(text) AS t,
         len(regexp_extract_all(lower(text), '\S+'))      AS n_words,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
  FROM documents)
SELECT doc_id,
       CAST(n_words AS BIGINT)    AS n_words,
       CAST(n_syll AS BIGINT)     AS n_syllables,
       CASE WHEN n_words > 0 THEN
         round(CAST(206835 * n_words - 1015 * n_words * n_words
                    - 84600 * n_syll AS DOUBLE)
               / CAST(1000 * n_words AS DOUBLE), 4) END AS flesch,
       CASE WHEN n_words > 0 THEN
         round(length(t) / CAST(n_words AS DOUBLE), 4) END AS chars_per_word
FROM c
"""


# Mid-frequency inverted postings (df-banded, capped, df-before-
# collect — pipeline/text.py::inverted_index).
def inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.pipeline import text

    d = load_table(spark, sf_dir, "documents")
    return text.inverted_index(d, min_df=100, max_df=400, max_postings=20)


INVERTED_POSTINGS_SQL = r"""
WITH p AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(string_split_regex(trim(lower(text)), '\s+')))
             AS term
  FROM documents),
d AS (SELECT term, count(*) AS df FROM p GROUP BY 1
      HAVING count(*) BETWEEN 100 AND 400)
SELECT p.term, d.df,
       array_to_string(list_sort(list(p.doc_id))[1:20], ',') AS postings
FROM p JOIN d USING (term)
GROUP BY p.term, d.df
"""


# Rolling z-score anomaly flags: trailing-20-event mean/std per user,
# |z| >= 2 on the ROUNDED z so the cut is engine-deterministic.
def rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-20, -1))
    scored = e.select(
        "event_id", "user_id", "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count("value").over(w).alias("n_prev"))
    z = F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4)
    return (scored.filter((F.col("n_prev") >= 10) & (F.col("sd") > 0))
            .withColumn("z", z)
            .filter(F.abs(F.col("z")) >= 2)
            .select("event_id", "user_id", F.round("value", 4)
                    .alias("value_r"), "z"))


ROLLING_ZSCORE_SQL = """
WITH s AS (
  SELECT event_id, user_id, value,
         avg(value)    OVER w AS mu,
         stddev_samp(value) OVER w AS sd,
         count(value)  OVER w AS n_prev
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
z AS (
  SELECT event_id, user_id, round(value, 4) AS value_r,
         round((value - mu) / sd, 4) AS z
  FROM s WHERE n_prev >= 10 AND sd > 0)
SELECT event_id, user_id, value_r, z FROM z WHERE abs(z) >= 2
"""


# Per-source quantile normalization of the quality score: rank-based
# percent within source → global decile histogram (the cross-source
# score-calibration step before mixing corpora).
def quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legate_dataframe_spark.pipeline import text

    d = load_table(spark, sf_dir, "documents")
    scored = text.quality_score(d).select("doc_id", "source", "quality")
    w = W.partitionBy("source").orderBy("quality", "doc_id")
    dec = F.least(F.floor(F.percent_rank().over(w) * 10), F.lit(9))
    # sum scaled-integer qualities (6dp-rounded → ×1e6 is integral),
    # then ONE division of exact ints — the float avg() flapped a
    # half-ulp at the 6th decimal between engines' summation orders
    q_int = F.round(F.col("quality") * 1e6).cast("long")
    return (scored.withColumn("decile", dec.cast("long"))
            .groupBy("source", "decile")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.sum(q_int).cast("double")
                         / (F.count(F.lit(1)) * F.lit(1000000.0)), 6)
                 .alias("mean_quality")))


from legate_dataframe_spark.plans.pipeline_queries import (
    QUALITY_SCORES_SQL as _QS_SQL,
    _minhash_sql as _mh_sql,
)

CANONICAL_BEST_QUALITY_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_mh_sql()}) mh),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs),
walk(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node),
comp AS (SELECT node, min(label) AS component FROM walk GROUP BY node),
q AS (SELECT * FROM ({_QS_SQL}) qq),
m AS (SELECT comp.component, comp.node, q.quality
      FROM comp JOIN q ON q.doc_id = comp.node),
r AS (SELECT component, node, quality,
             row_number() OVER (PARTITION BY component
                                ORDER BY quality DESC, node) AS rn,
             count(*) OVER (PARTITION BY component) AS n_members
      FROM m)
SELECT component AS cluster_id, node AS survivor_id,
       quality AS survivor_quality,
       CAST(n_members AS BIGINT) AS n_members
FROM r WHERE rn = 1 AND n_members >= 2
"""

QUANTILE_NORMALIZE_SQL = f"""
WITH q AS (SELECT doc_id, quality FROM ({_QS_SQL}) qq),
s AS (SELECT d.source, q.doc_id, q.quality
      FROM q JOIN documents d USING (doc_id)),
dec AS (
  SELECT source, quality,
         least(CAST(floor(percent_rank() OVER (
             PARTITION BY source ORDER BY quality, doc_id) * 10) AS BIGINT),
             9) AS decile
  FROM s)
SELECT source, decile, count(*) AS n_docs,
       round(CAST(sum(CAST(round(quality * 1e6) AS BIGINT)) AS DOUBLE)
             / (count(*) * 1000000.0), 6) AS mean_quality
FROM dec GROUP BY source, decile
"""


# ============================================================ streaming
def _stage_single_file(df: DataFrame, stage_dir: str, name: str,
                       mtime: float) -> None:
    """Write ``df`` as exactly ONE parquet file ``stage_dir/name`` with
    a controlled mtime — Spark's FileStreamSource orders new files by
    (modification time, path), so staged mtimes + maxFilesPerTrigger=1
    give a DETERMINISTIC micro-batch sequence.  coalesce(1) is the
    deliberate test-rig shape: each staged batch must be one file or
    its rows would straddle triggers."""
    import glob as _glob
    import os
    import shutil

    tmp = f"{stage_dir}/_tmp_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = _glob.glob(f"{tmp}/part-*.parquet")[0]
    dst = f"{stage_dir}/{name}"
    shutil.move(part, dst)
    shutil.rmtree(tmp, ignore_errors=True)
    os.utime(dst, (mtime, mtime))


def stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA DROP semantics through a real two-batch
    Structured Streaming run — the one watermark behavior the other
    streaming drains never exercise (their single-batch runs never
    advance the watermark over late input).

    Three staged micro-batches: batch 0 (even event_ids, all days)
    establishes watermark = max(ts) − 1 day; batch 1 (odd ids, last
    days of the month) is on-time filler; batch 2 (odd ids, early
    days) is entirely LATE — its windows closed days before the
    watermark — and the streaming aggregation drops every row of it.
    Update mode + last-update-wins reconstruction
    (events_stream_tumbling's convention).

    Empirical Spark subtlety this construction DEPENDS on: the
    late-row filter in batch N uses the watermark committed before
    batch N−1 (one batch behind the progress display), so batch 1's
    odd-id day-25+ rows land while the effective watermark is still
    the initial 1970 epoch.  Under immediate watermark application
    the day-25..28 windows of batch 1 (which end below the batch-0
    watermark of max(ts)−1d) would ALSO be dropped and parity would
    break — the assertion below on numRowsDroppedByWatermark pins
    the assumption: exactly batch 2's window set is dropped, no
    more, no less.  The oracle states the drop arithmetically:
    even-id rows all count, odd-id rows count iff day >= the cutoff.

    State never exceeds the un-closed window set — the bound that
    makes indefinite streaming aggregation feasible at all.
    """
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import Window as _W

    from legate_dataframe_spark.plans.pipeline_queries import (
        _drain_available_now,
    )

    ev = load_table(spark, sf_dir, "events")
    stage = tempfile.mkdtemp(prefix="ldf_late_stage_")
    try:
        now = _time.time()
        odd = F.col("event_id") % 2 == 1
        day = F.dayofmonth("ts")
        late = ev.filter(odd & (day < 25))
        # numRowsDroppedByWatermark counts rows at the STATE operator,
        # i.e. post-merge aggregate rows — one per late window — not
        # raw input rows (measured: 24 for 3997 late inputs at sf0.01)
        n_late_windows = (late.select(F.date_trunc("day", "ts"))
                          .distinct().count())
        _stage_single_file(ev.filter(F.col("event_id") % 2 == 0), stage,
                           "b0.parquet", now - 300)
        _stage_single_file(ev.filter(odd & (day >= 25)), stage,
                           "b1.parquet", now - 200)
        _stage_single_file(late, stage, "b2.parquet", now - 100)
        stream = (spark.readStream.schema(ev.schema)
                  .option("maxFilesPerTrigger", 1).parquet(stage))
        agg = (stream.withWatermark("ts", "1 day")
               .groupBy(F.window("ts", "1 day").alias("w"))
               .agg(F.count(F.lit(1)).alias("n_events"))
               .select(F.col("w.start").alias("window_start"), "n_events"))
        progress: list = []
        upd = _drain_available_now(
            spark, agg, "ldf_late_drop", "update",
            "window_start: timestamp, n_events: long", with_batch_id=True,
            progress_out=progress)
        dropped = sum(op.get("numRowsDroppedByWatermark", 0)
                      for p in progress for op in p.get("stateOperators", []))
        # Bounds check, not an exact pin (ADVICE r05): requiring
        # dropped == n_late_windows pinned two Spark internals (the
        # one-batch watermark lag and post-merge state-operator row
        # accounting), turning a minor-version drift into a hard
        # failure.  The semantics the query exists for is "the
        # watermark dropped the late data" — assert at least the late
        # windows were rejected and warn (degrade gracefully) if the
        # internal accounting shifts above that floor.
        if dropped < n_late_windows:
            raise AssertionError(
                f"watermark did not drop the late data: expected ≥ "
                f"{n_late_windows} dropped state rows, saw {dropped}")
        if dropped != n_late_windows:
            import warnings
            warnings.warn(
                f"numRowsDroppedByWatermark={dropped} != late-window "
                f"count {n_late_windows} — Spark's state-operator row "
                "accounting drifted (result still watermark-correct)",
                stacklevel=2)
        w = _W.partitionBy("window_start").orderBy(F.desc("batch_id"))
        return (upd.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("window_start", "n_events"))
    finally:
        shutil.rmtree(stage, ignore_errors=True)


STREAM_LATE_DROP_SQL = """
WITH kept AS (
  SELECT ts FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT ts FROM events
  WHERE event_id % 2 = 1 AND date_part('day', ts) >= 25)
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       count(*) AS n_events
FROM kept GROUP BY 1
"""


# Schema-evolution read (§2.1): two parquet generations — v2 adds a
# column — merged by schema-merging scan; old rows surface NULL for
# the new column.  The write side is sources/parquet.py::parquet_write
# (one more §2.1 surface under the driver gate).
def parquet_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from legate_dataframe_spark.sources.parquet import parquet_write

    o = load_table(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="ldf_schema_merge_")
    try:
        parquet_write(o.filter(F.col("o_orderkey") % 2 == 0)
                      .select("o_orderkey", "o_totalprice"), f"{root}/gen1")
        parquet_write(o.filter(F.col("o_orderkey") % 2 == 1)
                      .select("o_orderkey", "o_totalprice",
                              "o_orderpriority"), f"{root}/gen2")
        merged = (spark.read.option("mergeSchema", "true")
                  .parquet(f"{root}/gen1", f"{root}/gen2"))
        out = (merged
               .groupBy(F.coalesce("o_orderpriority", F.lit("<none>"))
                        .alias("priority"))
               .agg(F.count(F.lit(1)).alias("n_orders"),
                    F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                    F.count("o_orderpriority").alias("n_with_col")))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


PARQUET_SCHEMA_MERGE_SQL = """
WITH m AS (
  SELECT o_orderkey, o_totalprice,
         CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
             AS o_orderpriority
  FROM orders)
SELECT coalesce(o_orderpriority, '<none>') AS priority,
       count(*)                            AS n_orders,
       round(sum(o_totalprice), 2)         AS revenue,
       count(o_orderpriority)              AS n_with_col
FROM m GROUP BY 1
"""


# ===================================================== function surface G
# first/last/nth_value + ntile over a TOTAL ordering (value ties broken
# by event_id — without the tiebreak every one of these is
# partition-layout-dependent).
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    wc = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return e.select(
        "event_id", "event_type",
        F.round(F.first_value("value").over(wf), 4).alias("lo_val"),
        F.round(F.last_value("value").over(wf), 4).alias("hi_val"),
        F.round(F.nth_value("value", 2).over(wc), 4).alias("second_seen"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


WINDOW_FIRST_LAST_SQL = """
SELECT event_id, event_type,
       round(first_value(value) OVER wf, 4)   AS lo_val,
       round(last_value(value) OVER wf, 4)    AS hi_val,
       round(nth_value(value, 2) OVER wc, 4)  AS second_seen,
       CAST(ntile(4) OVER w AS BIGINT)        AS quartile
FROM events
WINDOW w  AS (PARTITION BY event_type ORDER BY value, event_id),
       wf AS (PARTITION BY event_type ORDER BY value, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
       wc AS (PARTITION BY event_type ORDER BY value, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# Event-time RANGE frame with an INTERVAL bound (the calendar-window
# sibling of rolling_range_window's epoch-µs frame).  Sums run on
# integer cents so frame-internal summation order can't flap a float
# round between engines.
def range_interval_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    # the Python Window API only takes numeric range bounds; INTERVAL
    # frames over a timestamp ordering exist on the SQL surface
    frame = ("OVER (PARTITION BY o_custkey ORDER BY o_orderdate "
             "RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)")
    return (o.withColumn("cents", cents)
            .selectExpr("o_orderkey", "o_custkey",
                        f"sum(cents) {frame} AS trailing7d_cents",
                        f"CAST(count(1) {frame} AS BIGINT)"
                        " AS trailing7d_orders"))


RANGE_INTERVAL_WINDOW_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
            AS BIGINT)                   AS trailing7d_cents,
       CAST(count(*) OVER w AS BIGINT)   AS trailing7d_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
"""


# Content checksums (integrity / dedup keys): md5 + sha256 per doc —
# bit-exact strings on any engine, pure narrow map.
def sha_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.col("text")).alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        F.length(F.col("text").cast("binary")).cast("long")
        .alias("n_bytes"),
    )


SHA_CHECKSUMS_SQL = """
SELECT doc_id,
       md5(text)                          AS md5_hex,
       sha256(text)                       AS sha256_hex,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
"""


# Ordered string aggregation (listagg/string_agg) — capped at 15 ids
# per group so no group's state is unbounded at scale.
def string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (d.groupBy("source", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.concat_ws(",", F.slice(
                     F.sort_array(F.collect_list("doc_id")), 1, 15)
                     .cast("array<string>")).alias("first_ids")))


STRING_AGG_ORDERED_SQL = """
SELECT source, lang, count(*) AS n_docs,
       array_to_string(list_sort(list(doc_id))[1:15], ',') AS first_ids
FROM documents GROUP BY source, lang
"""


# Sketch rollup audit: per-source approx_count_distinct vs the exact
# distinct count, emitting the exact value + a bounded-error boolean
# (approx_sketches' convention, §2.4's sketch path per group).  The
# oracle cannot reproduce Spark's HLL value, so it asserts the same
# bound the engine must satisfy (rsd 0.05 ⇒ |err| < 15% with huge
# margin).
def hll_rollup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (d.groupBy("source")
            .agg(F.count_distinct("text").alias("n_exact"),
                 F.approx_count_distinct("text", 0.05).alias("__approx"))
            .select("source", "n_exact",
                    ((F.abs(F.col("__approx") - F.col("n_exact"))
                      / F.col("n_exact")) <= 0.15).alias("within_bound")))


HLL_ROLLUP_AUDIT_SQL = """
SELECT source, count(DISTINCT text) AS n_exact, TRUE AS within_bound
FROM documents GROUP BY source
"""


# Exact DISCRETE percentiles (the value AT position ceil(p*n), no
# interpolation — quantile_stats covers the continuous form).  The
# Spark side states the definition explicitly via one ordered window;
# DuckDB's native quantile_disc matches it.
def percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy("l_quantity")
    ranked = l.select(
        "l_returnflag", "l_quantity",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("l_returnflag")).alias("n"))
    pick = lambda p: F.max(F.when(  # noqa: E731
        F.col("rn") == F.ceil(F.col("n") * p), F.col("l_quantity")))
    return (ranked.groupBy("l_returnflag")
            .agg(pick(0.5).alias("p50_disc"),
                 pick(0.9).alias("p90_disc"),
                 pick(0.99).alias("p99_disc")))


PERCENTILE_DISC_SQL = """
SELECT l_returnflag,
       quantile_disc(l_quantity, 0.5)  AS p50_disc,
       quantile_disc(l_quantity, 0.9)  AS p90_disc,
       quantile_disc(l_quantity, 0.99) AS p99_disc
FROM lineitem GROUP BY l_returnflag
"""


# parse_url surface over deterministically synthesized URLs + host
# rollup (domain-level corpus accounting — the first grouping any
# web-scale pipeline does).
def url_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/"), F.col("lang"), F.lit("/doc"),
                   F.col("doc_id").cast("string"),
                   F.lit("?ref=r"), (F.col("doc_id") % 7).cast("string"))
    parsed = d.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"))
    return (parsed.groupBy("host")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.count_distinct("path").alias("n_paths"),
                 F.count_distinct("query").alias("n_refs")))


URL_STATS_SQL = """
WITH u AS (
  SELECT 'https://' || source || '.example.com/' || lang || '/doc'
             || CAST(doc_id AS VARCHAR) || '?ref=r'
             || CAST(doc_id % 7 AS VARCHAR) AS url
  FROM documents),
p AS (
  SELECT regexp_extract(url, 'https://([^/]+)/', 1)     AS host,
         regexp_extract(url, 'https://[^/]+([^?]+)', 1) AS path,
         regexp_extract(url, '[?](.*)$', 1)             AS query
  FROM u)
SELECT host, count(*) AS n_docs,
       count(DISTINCT path) AS n_paths,
       count(DISTINCT query) AS n_refs
FROM p GROUP BY host
"""


# Harmonic + geometric means (rate/ratio aggregation — arithmetic mean
# is the wrong average for rates; §2.4 beyond-sum surface).
def harmonic_geo_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return (l.groupBy("l_returnflag")
            .agg(F.round(F.exp(F.avg(F.log("l_quantity"))), 6)
                 .alias("geo_mean_qty"),
                 F.round(n / F.sum(1.0 / F.col("l_quantity")), 6)
                 .alias("harm_mean_qty"),
                 n.alias("n_rows")))


HARMONIC_GEO_MEANS_SQL = """
SELECT l_returnflag,
       round(exp(avg(ln(l_quantity))), 6)        AS geo_mean_qty,
       round(count(*) / sum(1.0 / l_quantity), 6) AS harm_mean_qty,
       count(*)                                   AS n_rows
FROM lineitem GROUP BY l_returnflag
"""
