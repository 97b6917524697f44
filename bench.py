#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall times.

Queries are forced to full materialization with the noop sink (no
result collection to the driver, no output IO) so the measured time is
the distributed compute itself — the same methodology as the
reference's fence-to-fence timing (python/benchmarks/join.py:95-97).
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_nation_revenue",
    "q09_product_profit",
    "q21_waiting_suppliers",
    "join_inner",
    "groupby_aggs",
    "distinct_keys",
    "sort_topk",
    "window_cumsum",
    "window_topn_per_group",
    "events_tumbling",
    "sessionize",
    "arithmetic_expr",
    "text_stats",
    "dedup_exact",
    "dedup_minhash",
    "similarity_topk",
    "ann_ivf_assign",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from legate_dataframe_spark.session import get_session
    from legate_dataframe_spark.plans.registry import QUERIES

    spark = get_session(app_name="ldf-bench", master=f"local[{cpus}]")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm up the JVM / parquet readers / codegen on the smallest query
    run("sort_topk")

    times: dict[str, float] = {}
    for name in HEADLINE:
        times[name] = round(run(name), 3)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_num if sf_num is not None else sf,
        "cpus": int(cpus) if cpus.isdigit() else cpus,
    }))


if __name__ == "__main__":
    main()
