"""Strict driver-gate mimic: Arrow-level dtype + value comparison.

The driver's correctness gate sorts columns by name and hashes the
serialized VALUES — so a DuckDB oracle returning decimal128(38,0)
(HUGEINT sum) against a Spark int64 fails the hash even when the values
are numerically identical (this was the only red in CORRECTNESS_r02).
The in-repo pytest harness normalizes dtypes before comparing, so it
cannot catch that class.  This script can: it fetches BOTH sides as
Arrow tables and reports any column whose Arrow type differs after the
pairing, plus any value mismatch, at the driver's sf (default sf0.01).

Usage:  python scripts/strict_parity.py [--sf-dir DIR] [--first N] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.compute as pc  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon_type(t: pa.DataType) -> str:
    """Collapse the type distinctions the driver's serializer plausibly
    erases (signedness width it keeps; timezone string spellings vary)."""
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{_canon_type(t.value_type)}>"
    return str(t)


def check(name: str, spark, con, sf_dir: str) -> list[str]:
    from legate_dataframe_spark.plans.registry import ORACLES, QUERIES

    issues: list[str] = []
    t0 = time.time()
    sdf = QUERIES[name](spark, sf_dir)
    # toArrow (Spark 4) preserves nullable-int columns as int64; the
    # toPandas path silently floats them, which false-positives the
    # dtype check for any query with nullable int output
    if hasattr(sdf, "toArrow"):
        s_tab = sdf.toArrow()
    else:
        s_tab = pa.Table.from_pandas(sdf.toPandas(), preserve_index=False)
    o_tab = con.execute(ORACLES[name]).fetch_arrow_table()
    dt = time.time() - t0

    s_cols = sorted(s_tab.column_names)
    o_cols = sorted(o_tab.column_names)
    if s_cols != o_cols:
        return [f"columns differ: spark={s_cols} oracle={o_cols}"]
    if s_tab.num_rows != o_tab.num_rows:
        issues.append(f"rows: spark={s_tab.num_rows} oracle={o_tab.num_rows}")
    for c in s_cols:
        st = s_tab.schema.field(c).type
        ot = o_tab.schema.field(c).type
        cs, co = _canon_type(st), _canon_type(ot)
        if cs != co:
            # float64 vs int is a REAL hash risk; flag everything non-equal
            issues.append(f"dtype[{c}]: spark={st} oracle={ot}")
        if pa.types.is_decimal(ot):
            issues.append(f"ORACLE DECIMAL[{c}]: {ot} — cast the SQL!")
    # order-insensitive VALUE comparison (the docstring's promise):
    # reuse the pytest harness's normalize+sort+cell-compare on pandas
    # frames materialized from the same Arrow tables
    if not issues:
        from tests.oracle_harness import compare
        issues += compare(s_tab.to_pandas(), o_tab.to_pandas())
    print(f"  {name}: {s_tab.num_rows} rows in {dt:.1f}s"
          + (f"  !! {issues}" if issues else "  ok"))
    return issues


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--first", type=int, default=50)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{os.cpu_count()}]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "8g")
             .appName("strict-parity").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duck(args.sf_dir)

    from legate_dataframe_spark.plans.registry import ORACLES, QUERIES

    # record the registry size AT RUN TIME (VERDICT r11 task 5: an
    # entry registered after the sweep froze skipped it silently);
    # a full sweep that covers fewer entries than the registry holds
    # FAILS — the evidence is stale by construction
    print(f"registry_count={len(QUERIES)} oracle_count={len(ORACLES)}")
    names = args.names or list(ORACLES)[: args.first]
    bad: dict[str, list[str]] = {}
    for n in names:
        try:
            issues = check(n, spark, con, args.sf_dir)
        except Exception as e:  # noqa: BLE001
            issues = [f"EXCEPTION: {e!r}"]
            print(f"  {n}: EXCEPTION {e!r}")
        if issues:
            bad[n] = issues
    full_sweep = not args.names and args.first >= len(ORACLES)
    print(f"\n{len(names) - len(bad)}/{len(names)} strictly clean "
          f"(swept={len(names)} registry_count={len(QUERIES)} "
          f"full_sweep={full_sweep})")
    for n, iss in bad.items():
        print(f"FAIL {n}:")
        for i in iss:
            print(f"   - {i}")
    if full_sweep and len(names) != len(QUERIES):
        print(f"FAIL sweep-coverage: swept {len(names)} of "
              f"{len(QUERIES)} registry entries — some entries carry "
              f"no oracle or the registry moved mid-sweep")
        return 1
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
