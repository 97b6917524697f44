"""I/O round-trips (csv/parquet/json, FIXTURES F7) + LogicalTable."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from legate_dataframe_spark.core.table import LogicalTable
from legate_dataframe_spark.sources.csv import csv_read, csv_write
from legate_dataframe_spark.sources.json import json_read
from legate_dataframe_spark.sources.parquet import parquet_read, parquet_read_array, parquet_write


@pytest.fixture()
def tmpdir_str(tmp_path):
    return str(tmp_path)


def test_parquet_roundtrip_multifile(spark, tmpdir_str):
    df = spark.range(0, 1000, numPartitions=3).withColumnRenamed("id", "x")
    out = f"{tmpdir_str}/pq"
    parquet_write(df, out)
    # one part file per partition — the reference's part.<rank> layout
    assert len(glob.glob(f"{out}/part-*.parquet")) == 3
    back = parquet_read(spark, out)
    assert back.count() == 1000
    pruned = parquet_read(spark, out, columns=["x"])
    assert pruned.columns == ["x"]


def test_partitioned_write_prunes(spark, tmpdir_str):
    """Hive-partitioned layout + partition pruning: a filter on the
    partition column must reach the scan as PartitionFilters and the
    pruned directories must never be opened."""
    df = (spark.range(0, 300)
          .withColumn("day", (F.col("id") % 3).cast("string"))
          .withColumn("v", F.col("id") * 2))
    out = f"{tmpdir_str}/pq_part"
    parquet_write(df, out, partition_by=["day"])
    assert sorted(p.split("=")[-1] for p in glob.glob(f"{out}/day=*")) \
        == ["0", "1", "2"]
    back = parquet_read(spark, out).filter(F.col("day") == "1")
    assert back.count() == 100
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan
    assert "(day#" in plan and "= 1)" in plan
    # behavioral proof: poison a pruned directory — the day=1 read must
    # never open it (a full scan would explode on the corrupt file)
    with open(f"{out}/day=0/zz-corrupt.snappy.parquet", "wb") as fh:
        fh.write(b"this is not parquet")
    assert parquet_read(spark, out).filter(F.col("day") == "1").count() == 100
    with pytest.raises(Exception):
        parquet_read(spark, out).filter(F.col("day") == "0").count()


def test_clustered_write_narrows_rowgroup_stats(spark, tmpdir_str):
    """cluster_by must produce files whose per-file value ranges are
    disjoint slices (zone maps that actually prune), vs the unclustered
    control where every file spans ~the whole domain."""
    import pyarrow.parquet as pq

    df = (spark.range(0, 100_000, numPartitions=8)
          .withColumn("k", (F.col("id") * 7919) % 100_000))

    def file_ranges(d):
        ranges = []
        for p in sorted(glob.glob(f"{d}/part-*.parquet")):
            md = pq.ParquetFile(p).metadata
            ci = md.row_group(0).column(1)  # k
            lo, hi = ci.statistics.min, ci.statistics.max
            for rg in range(1, md.num_row_groups):
                s = md.row_group(rg).column(1).statistics
                lo, hi = min(lo, s.min), max(hi, s.max)
            ranges.append((lo, hi))
        return sorted(ranges)

    plain, clustered = f"{tmpdir_str}/plain", f"{tmpdir_str}/clust"
    parquet_write(df, plain)
    parquet_write(df, clustered, cluster_by=["k"])
    span = lambda rs: sum(hi - lo for lo, hi in rs)  # noqa: E731
    # every unclustered file spans ~the full domain; clustered files
    # tile it -> total span shrinks by ~#files
    assert span(file_ranges(clustered)) < span(file_ranges(plain)) / 4
    # clustered ranges are non-overlapping slices
    rs = file_ranges(clustered)
    assert all(rs[i][1] <= rs[i + 1][0] for i in range(len(rs) - 1))


def test_load_table_directory_layout(spark, tmpdir_str):
    """load_table must accept directory-of-parts tables (the production
    layout) including its timestamp handling, not just the testdata's
    single-file form."""
    from legate_dataframe_spark.plans.relational import load_table

    df = (spark.range(0, 100, numPartitions=4)
          .withColumn("ts", F.timestamp_micros(F.col("id") * 1_000_000)))
    out = f"{tmpdir_str}/events.parquet"
    df.write.mode("overwrite").parquet(out)
    back = load_table(spark, tmpdir_str, "events")
    assert back.count() == 100
    assert dict(back.dtypes)["ts"] == "timestamp"


def test_parquet_read_array(spark, tmpdir_str):
    df = spark.createDataFrame([(1.0, 2.0), (3.0, 4.0)], "a: double, b: double")
    out = f"{tmpdir_str}/arr"
    parquet_write(df, out)
    got = parquet_read_array(spark, out, ["a", "b"]).collect()
    assert sorted(r["data"] for r in got) == [[1.0, 2.0], [3.0, 4.0]]


@pytest.mark.parametrize("delim", [",", "|"])
@pytest.mark.parametrize("header", [True, False])
def test_csv_roundtrip(spark, tmpdir_str, delim, header):
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", -0.5)], "i: int, s: string, f: double")
    out = f"{tmpdir_str}/csv_{delim == ','}_{header}"
    csv_write(df, out, delimiter=delim, header=header)
    back = csv_read(spark, out, dtypes={"i": "int32", "s": "string", "f": "float64"},
                    delimiter=delim, header=header)
    assert sorted(tuple(r) for r in back.collect()) == [(1, "a", 1.5), (2, "b", -0.5)]


def test_csv_usecols(spark, tmpdir_str):
    df = spark.createDataFrame([(1, "a", 1.5)], "i: int, s: string, f: double")
    out = f"{tmpdir_str}/usecols"
    csv_write(df, out)
    back = csv_read(spark, out, dtypes={"i": "int32", "s": "string", "f": "float64"},
                    usecols=["s", "i"])
    assert back.columns == ["s", "i"]


def test_csv_unsigned_widening(spark, tmpdir_str):
    df = spark.createDataFrame([(200,)], "u: int")
    out = f"{tmpdir_str}/uw"
    csv_write(df, out)
    back = csv_read(spark, out, dtypes={"u": "uint8"})
    assert back.schema["u"].dataType.simpleString() == "smallint"


def test_json_read(spark, tmpdir_str):
    path = f"{tmpdir_str}/d.jsonl"
    with open(path, "w") as f:
        f.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    got = json_read(spark, path)
    assert sorted((r["a"], r["b"]) for r in got.collect()) == [(1, "x"), (2, "y")]


def test_logical_table_roundtrip_and_widening(spark):
    tbl = pa.table({
        "u8": pa.array([1, 250], pa.uint8()),
        "u32": pa.array([7, 2**31 + 5], pa.uint32()),
        "s": pa.array(["a", None], pa.utf8()),
    })
    lt = LogicalTable.from_arrow(spark, tbl)
    assert lt.num_rows() == 2
    assert lt.num_columns() == 3
    assert lt.column_names() == ["u8", "u32", "s"]
    schema = {f.name: f.dataType.simpleString() for f in lt.df.schema}
    assert schema["u8"] == "smallint" and schema["u32"] == "bigint"
    back = lt.to_arrow()
    assert back.column("u32").to_pylist() == [7, 2**31 + 5]


def test_logical_table_select_by_index(spark):
    lt = LogicalTable(spark.createDataFrame([(1, "a", 2.0)], "x: long, y: string, z: double"))
    sel = lt.select([2, "x"])
    assert sel.column_names() == ["z", "x"]
    with pytest.raises(KeyError):
        lt.select(["nope"])


def test_logical_table_rejects_duplicate_names(spark):
    df = spark.createDataFrame([(1, 2)], "a: long, b: long").selectExpr("a", "b as a")
    with pytest.raises(ValueError, match="duplicate"):
        LogicalTable(df)


def test_uint64_exact_decimal_mode(spark):
    """uint64 > 2^63 survives exactly with uint64_as='decimal'
    (DecimalType(20,0)); the default long mapping is documented-lossy
    there (SURVEY §1 policy)."""
    big = 2**63 + 12345  # not representable in a signed long
    tbl = pa.table({"u64": pa.array([1, big], pa.uint64())})
    lt = LogicalTable.from_arrow(spark, tbl, uint64_as="decimal")
    assert lt.df.schema["u64"].dataType.simpleString() == "decimal(20,0)"
    vals = sorted(int(v) for v in lt.to_arrow().column("u64").to_pylist())
    assert vals == [1, big]
    with pytest.raises(ValueError):
        LogicalTable.from_arrow(spark, tbl, uint64_as="nope")


def test_load_table_hive_partitioned_directory(spark, tmpdir_str):
    """load_table's schema sniff must find data files in a
    Hive-partitioned layout (col=val/part-*.parquet) — the layout
    parquet_write(partition_by=...) produces."""
    from legate_dataframe_spark.plans.relational import load_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)],
        "id: long, grp: string, v: double")
    parquet_write(df, f"{tmpdir_str}/tbl.parquet", partition_by=["grp"])
    back = load_table(spark, tmpdir_str, "tbl")
    assert back.count() == 3
    assert {r.grp for r in back.select("grp").distinct().collect()} == {"a", "b"}
