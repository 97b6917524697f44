#!/usr/bin/env python
"""n_list-scaling probe: the production rule that flattens ANN serving.

The ann_serve_only 10x row reads 3.3x — probed-cluster growth at a
FIXED n_list (clusters grow with the corpus, so a fixed n_probe scans
10x the rows).  The documented flattener is scaling n_list with the
corpus so clusters stay constant-sized; this probe measures it: the
same fixed 40-query serve against sf0.1 (n_list=8) and the 10x layout
with n_list=8 (the fixed-rule control) AND n_list=80 (the scale rule).
Expected: fixed n_list grows multiples; scaled n_list stays ~flat.

Usage:  python scripts/probe_nlist.py
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


def serve_time(spark, sf_dir: str, n_list: int, runs: int = 3):
    from legate_dataframe_spark.pipeline.similarity import (
        build_ivf_index,
        ivf_search_persisted,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cen = (e.filter(F.col("vec_id") < n_list)
           .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    # the fixed serving batch (the _ANN_QUERY_ID_CAP contract)
    q = e.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))
    db = f"probe_nlist_{uuid.uuid4().hex[:8]}"
    loc = tempfile.mkdtemp(prefix="probe_nlist_")
    spark.sql(f"CREATE DATABASE {db} LOCATION '{loc}'")
    try:
        t0 = time.perf_counter()
        build_ivf_index(spark, e, cen, f"{db}.ivf")
        build_s = round(time.perf_counter() - t0, 3)
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            (ivf_search_persisted(spark, q, f"{db}.ivf", k=5, n_probe=2)
             .write.format("noop").mode("overwrite").save())
            times.append(round(time.perf_counter() - t0, 3))
        n = e.count()
        return {"corpus": n, "n_list": n_list, "build_sec": build_s,
                "serve_runs": times, "serve_best": min(times)}
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(loc, ignore_errors=True)


def main() -> None:
    spark = get_session(app_name="ldf-probe-nlist", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    base = serve_time(spark, "/root/testdata/sf0.1", n_list=8)
    print(json.dumps({"layout": "sf0.1", **base}), flush=True)
    fixed = serve_time(spark, "/tmp/scale10", n_list=8)
    print(json.dumps({"layout": "10x fixed n_list", **fixed}),
          flush=True)
    scaled = serve_time(spark, "/tmp/scale10", n_list=80)
    print(json.dumps({"layout": "10x scaled n_list", **scaled}),
          flush=True)
    print(json.dumps({
        "metric": "nlist_scaling_probe",
        "fixed_growth": round(fixed["serve_best"]
                              / max(base["serve_best"], 1e-9), 2),
        "scaled_growth": round(scaled["serve_best"]
                               / max(base["serve_best"], 1e-9), 2),
        "sentinel_sec": contention_sentinel(),
    }), flush=True)


if __name__ == "__main__":
    main()
