#!/usr/bin/env python
"""r14 probe: large-k (k=50) positional digest builds over the sf0.1
BPE token stream — the dominant stage of substring_span_removal_bpe.

Variants (same downstream: posexplode + groupBy dig count, so the
exchange is priced identically; only the digest build differs):

A) slice-hash of STRING tokens (current _doc_kgrams k>12 path):
   xxhash64(slice(toks, i, k)) per position — O(k·n) string hashing.
C) pre-hashed tokens through a localCheckpoint barrier, then
   xxhash64(slice(ht, i, k)) per position — O(k·n) LONG hashing
   (the barrier defeats the lambda re-inlining probe_bpe_digest.py
   found).
E) numpy rolling polynomial hash (mod 2^64, odd multiplier) over the
   pre-hashed token longs via mapInArrow — O(n) per doc, vectorized
   (guide §4.2).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from legate_dataframe_spark.session import get_session  # noqa: E402

from legate_dataframe_spark.pipeline.dedup import (  # noqa: E402
    _rolling_digest_fn,
)

K = 50


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(app_name="probe-rolling", master=f"local[{cpus}]")

    from legate_dataframe_spark.pipeline import bpe
    from legate_dataframe_spark.plans.relational import load_table

    d = load_table(spark, sf_dir, "documents")
    merges = bpe.learn_bpe_merges(bpe.word_histogram(d), n_merges=8)
    stream = bpe.bpe_token_stream(d, merges).localCheckpoint(eager=True)

    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    base = stream.select(F.col("doc_id").alias("id"), toks.alias("__ts"))
    base = base.localCheckpoint(eager=True)  # isolate the digest cost
    nt = base.select(F.sum(F.size("__ts"))).collect()[0][0]
    print(f"total tokens: {nt}", flush=True)

    def digs_a(src):
        digs = F.when(
            F.size("__ts") >= K,
            F.transform(F.sequence(F.lit(1), F.size("__ts") - F.lit(K - 1)),
                        lambda i: F.xxhash64(F.slice(F.col("__ts"), i, K)))
        ).otherwise(F.array().cast("array<bigint>"))
        return src.select("id", F.posexplode(digs).alias("off", "dig"))

    hashed = base.select(
        "id", F.transform("__ts", lambda t: F.xxhash64(t)).alias("__h"))

    def digs_c(_):
        hb = hashed.localCheckpoint(eager=True)
        digs = F.when(
            F.size("__h") >= K,
            F.transform(F.sequence(F.lit(1), F.size("__h") - F.lit(K - 1)),
                        lambda i: F.xxhash64(F.slice(F.col("__h"), i, K)))
        ).otherwise(F.array().cast("array<bigint>"))
        return hb.select("id", F.posexplode(digs).alias("off", "dig"))

    def digs_e(_):
        out = hashed.mapInArrow(_rolling_digest_fn(K, "id"),
                                "id long, __digs array<bigint>")
        return out.select("id",
                          F.posexplode("__digs").alias("off", "dig"))

    variants = {"A_string_slices": digs_a,
                "C_ckpt_long_slices": digs_c,
                "E_numpy_rolling": digs_e}
    for rep in range(3):
        for name, fn in variants.items():
            df = fn(base).groupBy("dig").agg(F.count(F.lit(1)).alias("c"))
            spark.sparkContext.setJobDescription(f"digest:{name}#{rep}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            print(f"{name} rep{rep} {time.perf_counter() - t0:.3f}",
                  flush=True)
            spark.sparkContext.setJobDescription(None)
    # sanity: E emits exactly as many windows as A, and dup GROUPS match
    a = digs_a(base).groupBy("dig").count().filter("count > 1").count()
    e = digs_e(base).groupBy("dig").count().filter("count > 1").count()
    na = digs_a(base).count()
    ne = digs_e(base).count()
    print(f"windows A={na} E={ne}; dup-digest groups A={a} E={e}",
          flush=True)


if __name__ == "__main__":
    main()
