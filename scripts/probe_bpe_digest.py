#!/usr/bin/env python
"""Probe: large-k (k=50) positional digest construction variants over
the sf0.1 documents token stream — the dominant stage of
substring_span_removal_bpe.

A) slice-hash of STRING tokens (current): xxhash64(slice(toks, i, k))
B) pre-hashed tokens, slice-hash of LONGS:
       ht = transform(toks, xxhash64); xxhash64(slice(ht, i, k))

Both feed the same downstream shape (posexplode + groupBy count) so
the exchange is priced identically; only the digest build differs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from legate_dataframe_spark.session import get_session  # noqa: E402

K = 50


def digs_a(toks):
    return F.when(
        F.size(toks) >= K,
        F.transform(F.sequence(F.lit(1), F.size(toks) - F.lit(K - 1)),
                    lambda i: F.xxhash64(F.slice(toks, i, K)))
    ).otherwise(F.array().cast("array<bigint>"))


def digs_b(toks):
    ht = F.transform(toks, lambda t: F.xxhash64(t))
    return F.when(
        F.size(toks) >= K,
        F.transform(F.sequence(F.lit(1), F.size(toks) - F.lit(K - 1)),
                    lambda i: F.xxhash64(F.slice(ht, i, K)))
    ).otherwise(F.array().cast("array<bigint>"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(app_name="probe-bpe-digest",
                        master=f"local[{cpus}]")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    base = docs.select(F.col("doc_id"), toks.alias("__ts"))
    base = base.localCheckpoint(eager=True)  # isolate digest cost

    variants = {"A_string_slices": digs_a, "B_prehashed_longs": digs_b}
    for rep in range(3):
        for name, fn in variants.items():
            df = (base.select("doc_id",
                              F.posexplode(fn(F.col("__ts")))
                              .alias("off", "dig"))
                  .groupBy("dig").agg(F.count(F.lit(1)).alias("n")))
            spark.sparkContext.setJobDescription(f"digest:{name}#{rep}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            print(f"{name} rep{rep} {time.perf_counter() - t0:.3f}",
                  flush=True)
            spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
