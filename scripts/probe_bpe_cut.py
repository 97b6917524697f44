#!/usr/bin/env python
"""Stage breakdown of substring_span_removal_bpe at sf0.1: where do
the ~11 s go, and what does the k=50 digest front cost on the REAL
BPE token stream (~char-level tokens, 8 merges)?

Stages:
  learn     learn_bpe_merges(word_histogram(docs), 8)  [actions inside]
  stream    bpe_token_stream(docs, merges) -> eager localCheckpoint
  kg_A      current digest front: xxhash64 over k-length STRING slices
            + dup-digest groupBy (the corpus exchange), noop
  kg_B      pre-hashed tokens (xxhash64 per token, once) then xxhash64
            over k-length LONG slices + same groupBy, noop
  cut       full remove_dup_spans(stream, k=50), noop
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from legate_dataframe_spark.session import get_session  # noqa: E402

K = 50


def kg_variant(stream, prehash: bool):
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    base = stream.select(F.col("doc_id"), toks.alias("__ts"))
    if prehash:
        # materialize the per-token hash array as a REAL column first:
        # referenced inside the position lambda it would be
        # re-evaluated per position (no CSE into lambdas)
        base = base.select(
            "doc_id", "__ts",
            F.transform(F.col("__ts"),
                        lambda t: F.xxhash64(t)).alias("__ht"))
        arr = F.col("__ht")
    else:
        arr = F.col("__ts")
    digs = F.when(
        F.size("__ts") >= K,
        F.transform(F.sequence(F.lit(1), F.size("__ts") - F.lit(K - 1)),
                    lambda i: F.xxhash64(F.slice(arr, i, K)))
    ).otherwise(F.array().cast("array<bigint>"))
    kg = (base.select("doc_id", F.posexplode(digs).alias("off", "dig")))
    return (kg.groupBy("dig")
            .agg(F.count_distinct("doc_id").alias("nd"))
            .filter(F.col("nd") > 1).select("dig"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(app_name="probe-bpe-cut", master=f"local[{cpus}]")
    from legate_dataframe_spark.pipeline import bpe
    from legate_dataframe_spark.pipeline.dedup import remove_dup_spans

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    for rep in range(3):
        t0 = time.perf_counter()
        merges = bpe.learn_bpe_merges(bpe.word_histogram(docs), n_merges=8)
        t1 = time.perf_counter()
        stream = bpe.bpe_token_stream(docs, merges).localCheckpoint(
            eager=True)
        t2 = time.perf_counter()
        print(f"rep{rep} learn {t1 - t0:.2f}  stream+ckpt {t2 - t1:.2f}",
              flush=True)
        ntok = stream.select(F.sum(F.size(F.split(
            F.col("text"), " ")))).collect()[0][0]
        if rep == 0:
            print(f"  total BPE tokens: {ntok}", flush=True)
        for name, pre in (("kg_A_string", False), ("kg_B_prehash", True)):
            spark.sparkContext.setJobDescription(f"{name}#{rep}")
            t0 = time.perf_counter()
            kg_variant(stream, pre).write.format("noop") \
                .mode("overwrite").save()
            print(f"  {name} {time.perf_counter() - t0:.2f}", flush=True)
        spark.sparkContext.setJobDescription(f"cut#{rep}")
        t0 = time.perf_counter()
        remove_dup_spans(stream, k=K).write.format("noop") \
            .mode("overwrite").save()
        print(f"  cut_full {time.perf_counter() - t0:.2f}", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
