"""Sink/source roundtrip queries (plans/roundtrip.py): layout and
projection properties the aggregate-level oracle parity can't see.
The value-level checks live in test_oracle_parity (registry entries)."""

from __future__ import annotations

import glob
import os

from legate_dataframe_spark.plans import roundtrip as rt


def test_parquet_write_hive_layout(spark, sf_dir, tmp_path):
    """parquet_write(partition_by) must emit Hive-style col=value/
    dirs (reference one-file-per-partition layout, parquet.cpp:39-58).
    Written directly (not through the roundtrip query, which now
    deletes its temp dir before returning)."""
    from legate_dataframe_spark.plans.relational import load_table
    from legate_dataframe_spark.sources.parquet import parquet_write

    o = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_hive")
    parquet_write(o, out, partition_by=["o_orderpriority"],
                  cluster_by=["o_orderdate"])
    subdirs = [p for p in os.listdir(out)
               if p.startswith("o_orderpriority=")]
    assert len(subdirs) == 5  # 5 priorities → 5 Hive partitions
    assert glob.glob(f"{out}/o_orderpriority=*/*.parquet")


def test_parquet_roundtrip_no_tempdir_left(spark, sf_dir, tmp_path, monkeypatch):
    """The roundtrip query must delete its own temp dir BEFORE
    returning, and the returned frame must still be collectable
    (eager materialization — review r03)."""
    import tempfile

    made = []
    real = tempfile.mkdtemp

    def capture(*a, **k):
        d = real(*a, **k)
        made.append(d)
        return d

    monkeypatch.setattr(tempfile, "mkdtemp", capture)
    df = rt.parquet_roundtrip(spark, sf_dir)
    out = [d for d in made if "ldf_rt_parquet_" in d]
    assert out and not os.path.exists(out[0])
    assert df.count() == 5  # frame survives the dir deletion


def test_csv_roundtrip_usecols_projection(spark, sf_dir):
    df = rt.csv_roundtrip(spark, sf_dir)
    assert set(df.columns) == {"c_mktsegment", "n_cust", "sum_bal",
                               "name_chars", "n_nations"}
    assert df.count() > 0


def test_arrow_roundtrip_unsigned_widening(spark, sf_dir):
    """uint8 → short, uint32 → long per the SURVEY §1 policy, exercised
    through from_arrow inside the query."""
    out = rt.arrow_roundtrip(spark, sf_dir)
    assert dict(out.dtypes)["n_regionkey"] == "bigint"
    rows = out.collect()
    assert sum(r.n_nations for r in rows) == 25
