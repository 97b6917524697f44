#!/usr/bin/env python
"""Generate the 10x scale-probe layout BASELINE.md's scale table uses.

Replicates the sf0.1 fact tables N times with shifted primary keys into
a 32-file-per-table layout — the production shape (testdata's
single-file tables cap scan parallelism at one task), so scan
parallelism, shuffle sizing, and AQE behave as they would on a real
multi-file dataset.  Dimensions (region/nation/customer/supplier/part)
are copied 1x with the same 32-file layout: fact foreign keys keep
their original values, so every join still matches, while fact primary
keys shift by replica so rows stay unique.  `documents` replicates with
identical text under shifted doc_ids — every doc becomes an
N-replica near-dup clique, the documented stress shape for the LSH
dedup queries (candidate pairs grow O(clique^2): more answer, not less
efficiency).

Usage:
    python scripts/make_scale_probe.py \
        --src /root/testdata/sf0.1 --dst /tmp/scale10 \
        --replicas 10 --files 32

Then: SPARK_GRAFT_SF_DIR=/tmp/scale10 python bench.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

# table → columns shifted per replica (primary/shared keys that must
# stay unique and consistent ACROSS tables: l_orderkey and o_orderkey
# shift by the same per-replica offset so the fact-fact join holds)
FACT_SHIFTS: dict[str, list[str]] = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/scale10")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--files", type=int, default=32)
    args = ap.parse_args()

    from legate_dataframe_spark.plans.relational import load_table
    from legate_dataframe_spark.session import get_session

    spark = get_session(app_name="scale-probe-gen", master="local[32]")

    # one offset per shared key domain, from the owning table's max
    orderkey_off = (load_table(spark, args.src, "orders")
                    .agg(F.max("o_orderkey")).collect()[0][0] + 1)
    offsets = {"l_orderkey": orderkey_off, "o_orderkey": orderkey_off}

    for table, shift_cols in FACT_SHIFTS.items():
        df = load_table(spark, args.src, table)
        for c in shift_cols:
            if c not in offsets:
                offsets[c] = df.agg(F.max(c)).collect()[0][0] + 1
        parts = []
        for r in range(args.replicas):
            rep = df
            for c in shift_cols:
                rep = rep.withColumn(c, F.col(c) + F.lit(r * offsets[c]))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        (out.repartition(args.files)
            .write.mode("overwrite").parquet(f"{args.dst}/{table}.parquet"))
        print(f"{table}: x{args.replicas} -> {args.dst}/{table}.parquet")

    for table in DIMS:
        df = load_table(spark, args.src, table)
        n = min(args.files, max(1, df.count() // 100 or 1))
        (df.repartition(n)
           .write.mode("overwrite").parquet(f"{args.dst}/{table}.parquet"))
        print(f"{table}: x1 -> {args.dst}/{table}.parquet")

    print("done:", args.dst)


if __name__ == "__main__":
    main()
