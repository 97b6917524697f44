"""Sink/source roundtrip queries (plans/roundtrip.py): layout and
projection properties the aggregate-level oracle parity can't see.
The value-level checks live in test_oracle_parity (registry entries)."""

from __future__ import annotations

import glob
import os

from legate_dataframe_spark.plans import roundtrip as rt


def test_parquet_roundtrip_layout_and_pruning(spark, sf_dir, tmp_path, monkeypatch):
    """parquet_write(partition_by) must emit Hive-style col=value/
    dirs (reference one-file-per-partition layout, parquet.cpp:39-58)
    and the read-back scan must prune both columns and partitions."""
    import tempfile

    made = []
    real = tempfile.mkdtemp

    def capture(*a, **k):
        d = real(*a, **k)
        made.append(d)
        return d

    monkeypatch.setattr(tempfile, "mkdtemp", capture)
    rt.parquet_roundtrip(spark, sf_dir).collect()
    out = [d for d in made if "ldf_rt_parquet_" in d]
    assert out, "query did not create its temp output dir"
    subdirs = [p for p in os.listdir(out[0])
               if p.startswith("o_orderpriority=")]
    assert len(subdirs) == 5  # 5 priorities → 5 Hive partitions
    assert glob.glob(f"{out[0]}/o_orderpriority=*/*.parquet")


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
