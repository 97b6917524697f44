#!/usr/bin/env python
"""Listing-flatness probe (VERDICT r09 task 3 "Done" criterion).

Re-runs the r08 partition-count spot-check with the manifest-planned
refresh next to the legacy catalog-planned one: a day-partitioned
rollup with N days of history takes a fixed 2-day refresh batch; the
legacy path (`incremental_rollup_overwrite`, spark.table + DPP) pays
an O(partitions) driver listing at plan time, the manifest path
(`incremental_rollup_overwrite_manifest`) plans from the manifest and
must go FLAT in N.  Usage:

    python scripts/probe_listing.py [days ...]   # default: 100 1000

Prints one JSON line per (days, path) plus a summary ratio line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import contention_sentinel  # noqa: E402
from legate_dataframe_spark.session import get_session  # noqa: E402


def synth_events(spark, n_days: int, rows_per_day: int = 200):
    """Deterministic synthetic event slab: rows_per_day rows on each
    of n_days consecutive days, 5 event types."""
    n = n_days * rows_per_day
    return (spark.range(0, n)
            .select(F.col("id").alias("event_id"),
                    (F.lit("2020-01-01").cast("timestamp")
                     + F.make_interval(days=(F.col("id") % n_days)
                                       .cast("int"))).alias("ts"),
                    F.concat(F.lit("t"), (F.col("id") % 5))
                    .alias("event_type"),
                    (F.col("id") % 97).cast("double").alias("value")))


def main() -> None:
    days_list = [int(a) for a in sys.argv[1:]] or [100, 1000]
    spark = get_session(app_name="ldf-probe-listing",
                        master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    from legate_dataframe_spark.pipeline.rollup import (
        build_rollup_date_partitioned,
        build_rollup_partitioned,
        incremental_rollup_overwrite,
        incremental_rollup_overwrite_manifest,
    )

    results = []
    for n_days in days_list:
        e = synth_events(spark, n_days)
        # fixed 2-day batch regardless of history length
        batch = e.filter((F.col("ts") >= F.lit("2020-01-05")
                          .cast("timestamp"))
                         & (F.col("ts") < F.lit("2020-01-07")
                            .cast("timestamp")))
        db = f"probe_listing_{uuid.uuid4().hex[:8]}"
        loc = tempfile.mkdtemp(prefix="probe_listing_")
        spark.sql(f"CREATE DATABASE {db} LOCATION '{loc}'")
        try:
            # legacy: catalog-planned (spark.table lists partitions)
            build_rollup_partitioned(spark, e, f"{db}.legacy")
            t0 = time.perf_counter()
            incremental_rollup_overwrite(spark, f"{db}.legacy", batch)
            legacy = round(time.perf_counter() - t0, 3)
            # manifest-planned: explicit file list, no listing
            build_rollup_date_partitioned(spark, e, f"{db}.mf")
            t0 = time.perf_counter()
            planned, total, _ = incremental_rollup_overwrite_manifest(
                spark, f"{db}.mf", batch)
            mf = round(time.perf_counter() - t0, 3)
            row = {"days": n_days, "legacy_sec": legacy,
                   "manifest_sec": mf, "files_planned": planned,
                   "manifest_rows": total,
                   "sentinel_sec": contention_sentinel()}
            results.append(row)
            print(json.dumps(row), flush=True)
        finally:
            spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
            shutil.rmtree(loc, ignore_errors=True)
    if len(results) >= 2:
        a, b = results[0], results[-1]
        print(json.dumps({
            "metric": "listing_probe_growth",
            "days_ratio": b["days"] / a["days"],
            "legacy_growth": round(b["legacy_sec"]
                                   / max(a["legacy_sec"], 1e-9), 2),
            "manifest_growth": round(b["manifest_sec"]
                                     / max(a["manifest_sec"], 1e-9), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
