#!/usr/bin/env python
"""r14 probe: how much of the word-family (k=8) span cost is the
digest front, and what a rolling front would buy.

W1) current front: zip_with 8-word shingle strings + md5 per position
    (_doc_kgrams k<=12 path), posexplode, groupBy(dig) count.
W2) rolling front: JVM xxhash64 per token once, numpy O(n) rolling
    window digests via mapInArrow, posexplode, groupBy(dig) count.
REF) full substring_dup_spans query for scale.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from legate_dataframe_spark.session import get_session  # noqa: E402
from legate_dataframe_spark.pipeline.dedup import (  # noqa: E402
    _rolling_digest_fn,
    word_shingles_of,
)

K = 8


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(app_name="probe-word-front",
                        master=f"local[{cpus}]")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    base = docs.select(F.col("doc_id").alias("id"), toks.alias("__ts"))
    base = base.localCheckpoint(eager=True)  # isolate the digest cost

    def w1(src):
        return (src.select(
                    "id",
                    F.posexplode(word_shingles_of(F.col("__ts"), K))
                    .alias("off", "s"))
                .select("id", (F.col("off") + 1).alias("pos"),
                        F.md5("s").alias("dig")))

    def w2(src):
        hashed = src.select(
            "id", F.transform("__ts", lambda t: F.xxhash64(t)).alias("__h"))
        out = hashed.mapInArrow(_rolling_digest_fn(K, "id"),
                                "id long, __digs array<bigint>")
        return (out.select("id",
                           F.posexplode("__digs").alias("off", "dig"))
                .select("id", (F.col("off") + 1).alias("pos"), "dig"))

    variants = {"W1_md5_shingles": w1, "W2_numpy_rolling": w2}
    for rep in range(3):
        for name, fn in variants.items():
            df = fn(base).groupBy("dig").agg(F.count(F.lit(1)).alias("c"))
            spark.sparkContext.setJobDescription(f"front:{name}#{rep}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            print(f"{name} rep{rep} {time.perf_counter() - t0:.3f}",
                  flush=True)
            spark.sparkContext.setJobDescription(None)
    # equality-class sanity: dup groups must coincide
    a = w1(base).groupBy("dig").count().filter("count > 1").count()
    e = w2(base).groupBy("dig").count().filter("count > 1").count()
    na, ne = w1(base).count(), w2(base).count()
    print(f"positions W1={na} W2={ne}; dup groups W1={a} W2={e}",
          flush=True)


if __name__ == "__main__":
    main()
