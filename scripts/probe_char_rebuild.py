"""Probe: r12 vs r13 char-span machinery on multi-MB documents
(VERDICT r12 task 4).

Two independent O(chars)-per-row costs made the r12
``remove_dup_spans_chars`` choke on big documents:

1. **Front**: ``substring(__t, pos, k)`` per position —
   UTF8String.substring scans from the string head to find the
   codepoint offset, so shingling is QUADRATIC per document.
2. **Rebuild**: ``sequence(1, n_chars)`` materialized per doc,
   array_except'd against covered positions, then one ``substr``
   call per kept CHARACTER.

r13 replaces the front with split-once + per-position char-array
slices (linear) and the rebuild with merged covered intervals +
``substring`` slices of the kept gaps (O(intervals) per row).  This
probe times three variants on synthetic documents that all carry a
shared boilerplate block (every doc TOUCHED — worst case):

    A. r12 verbatim  (substring front + per-char rebuild)
    B. linear front  + per-char rebuild   (isolates the rebuild win)
    C. r13 library   (linear front + interval rebuild)

Usage: python scripts/probe_char_rebuild.py --docs 40 --mb 2
       [--skip-r12]   (A is quadratic — skip it beyond ~100 kB docs)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from legate_dataframe_spark.pipeline.dedup import (  # noqa: E402
    _covered_positions,
    remove_dup_spans_chars,
)
from legate_dataframe_spark.session import get_session  # noqa: E402

K = 20


def _quadratic_front(base, k=K):
    """r12 front verbatim: per-position substring of the full text."""
    starts = F.when(
        F.col("__n") >= k,
        F.sequence(F.lit(1), F.col("__n") - F.lit(k - 1))
    ).otherwise(F.array().cast("array<int>"))
    return (base.select("doc_id", F.explode(starts).alias("pos"),
                        F.col("__t"))
            .select("doc_id", "pos",
                    F.xxhash64(F.expr(f"substring(__t, pos, {k})"))
                    .alias("dig")))


def _linear_front(base, k=K):
    """r13 front: split once, hash k-length char-array slices."""
    digs = F.transform(
        F.sequence(F.lit(1), F.col("__n") - F.lit(k - 1)),
        lambda i: F.xxhash64(F.slice(F.col("__cs"), i, k)))
    return (base.filter(F.col("__n") >= k)
            .withColumn("__cs", F.split("__t", ""))
            .select("doc_id", F.posexplode(digs).alias("off", "dig"))
            .select("doc_id", (F.col("off") + 1).alias("pos"), "dig"))


def _per_char_rebuild(base, kg, k=K):
    """r12 rebuild verbatim: per-char position arrays."""
    dup = (kg.groupBy("dig")
           .agg(F.count_distinct(F.col("doc_id")).alias("nd"))
           .filter(F.col("nd") > 1).select("dig"))
    covered = _covered_positions(kg, dup, "doc_id", k)
    cov_arr = (covered.groupBy("doc_id")
               .agg(F.collect_list("pos").alias("cov")))
    j = base.join(cov_arr, "doc_id", "left")
    kept_pos = F.array_except(
        F.when(F.col("__n") >= 1,
               F.sequence(F.lit(1), F.col("__n")))
        .otherwise(F.array().cast("array<int>")),
        F.coalesce(F.col("cov"), F.array().cast("array<int>")))
    n_removed = F.coalesce(F.size("cov"), F.lit(0))
    return j.select(
        "doc_id",
        n_removed.cast("long").alias("removed_chars"),
        (F.col("__n") - n_removed).cast("long").alias("kept_chars"),
        F.array_join(
            F.transform(kept_pos,
                        lambda i: F.substr("__t", i, F.lit(1))),
            "").alias("text_clean_chars"))


def _timed(label, df):
    t0 = time.time()
    row = df.select(F.sum("removed_chars").alias("r"),
                    F.sum("kept_chars").alias("kp"),
                    F.sum(F.length("text_clean_chars")).alias("L")
                    ).first()
    dt = time.time() - t0
    assert row["kp"] == row["L"], f"{label}: length law broken"
    print(f"{label}: {dt:.1f}s removed={row['r']} kept={row['kp']}",
          file=sys.stderr)
    return dt, (row["r"], row["kp"])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=40)
    ap.add_argument("--mb", type=float, default=2.0)
    ap.add_argument("--skip-r12", action="store_true")
    ap.add_argument("--variants", default="ABC",
                    help="subset of ABC to run (A and B are "
                         "quadratic — cap doc size accordingly)")
    args = ap.parse_args()

    spark = get_session(app_name="probe-char-rebuild",
                        master="local[16]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    n_chars = int(args.mb * 1_000_000)
    boiler = ("SHARED-BOILERPLATE-" * 120)[:2000]
    docs = (spark.range(args.docs)
            .select(F.col("id").alias("doc_id"),
                    F.concat(
                        F.lit(boiler),
                        F.repeat(F.concat(F.lit("u"),
                                          F.col("id").cast("string"),
                                          F.lit("-pad-")),
                                 int(n_chars / 12)),
                        F.lit(boiler)).alias("text"))
            .localCheckpoint(eager=True))
    total = docs.select(F.sum(F.length("text"))).first()[0]
    print(f"corpus: {args.docs} docs, {total/1e6:.1f} MB total",
          file=sys.stderr)
    base = docs.select("doc_id", F.col("text").alias("__t"),
                       F.length("text").alias("__n"))

    t_a = t_b = t_c = None
    agg_c = None
    if "C" in args.variants:
        t_c, agg_c = _timed("C r13 (linear front + interval rebuild)",
                            remove_dup_spans_chars(docs, k=K))
    if "B" in args.variants:
        t_b, agg_b = _timed("B linear front + per-char rebuild",
                            _per_char_rebuild(base,
                                              _linear_front(base)))
        assert agg_c is None or agg_b == agg_c, \
            f"B/C disagree: {agg_b} vs {agg_c}"
    if "A" in args.variants and not args.skip_r12:
        t_a, agg_a = _timed("A r12 verbatim (quadratic front + "
                            "per-char rebuild)",
                            _per_char_rebuild(base,
                                              _quadratic_front(base)))
        assert agg_c is None or agg_a == agg_c, \
            f"A/C disagree: {agg_a} vs {agg_c}"
    print(json.dumps({
        "metric": "char_rebuild_probe",
        "docs": args.docs, "mb_per_doc": args.mb,
        "r13_interval_sec": round(t_c, 1) if t_c else None,
        "linear_front_per_char_sec": round(t_b, 1) if t_b else None,
        "r12_verbatim_sec": round(t_a, 1) if t_a else None,
        "rebuild_speedup": round(t_b / t_c, 1) if t_b and t_c
        else None,
        "total_speedup": round(t_a / t_c, 1) if t_a and t_c
        else None}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
