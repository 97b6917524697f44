"""Probe: the composed one-shingle-pass corpus build vs chaining the
three individual cuts (VERDICT r12 task 1's measurement row).

Times, at a given sf-dir (documents split train/benchmark on
doc_id % 10 == 7, the registry entry's convention):

- ``sequential``: remove_contaminated_spans → remove_dup_spans on its
  output → remove_repeated_spans on that — the corpus build a user
  composes from the single-cut operators; each pass re-shingles and
  pays its own corpus-sized k-gram exchange (3 scans + 3 positional
  exchanges).  NOTE: on degenerately-duplicated corpora (the 10×
  replica layout) this chain benefits from early cutting — pass 1
  empties most documents, so passes 2–3 run on near-empty text;
  its semantics differ from the union (see clean_corpus docstring).
- ``individual_sum``: the three cuts each run on the ORIGINAL corpus
  (what the three separate registry entries cost side by side) —
  the apples-to-apples comparator for the union semantics.
- ``onepass``: clean_corpus — every predicate off ONE materialized
  per-(doc, digest) occurrence aggregate.

Usage:
    python scripts/probe_clean_corpus.py \
        [--sf-dir /root/testdata/sf0.1] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from legate_dataframe_spark.pipeline.dedup import (  # noqa: E402
    clean_corpus,
    remove_contaminated_spans,
    remove_dup_spans,
    remove_repeated_spans,
)
from legate_dataframe_spark.plans.relational import load_table  # noqa: E402
from legate_dataframe_spark.session import get_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus",
                    default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    spark = get_session(app_name="probe-clean-corpus",
                        master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, args.sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 10 != 7)
    test = d.filter(F.col("doc_id") % 10 == 7)

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    seq_times, ind_times, one_times = [], [], []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        s1 = remove_contaminated_spans(train, test, k=8) \
            .select("doc_id", F.col("text_clean").alias("text")) \
            .localCheckpoint(eager=True)
        s2 = remove_dup_spans(s1, k=8) \
            .select("doc_id", F.col("text_clean").alias("text")) \
            .localCheckpoint(eager=True)
        _noop(remove_repeated_spans(s2, k=8))
        seq_times.append(round(time.perf_counter() - t0, 2))

        t0 = time.perf_counter()
        _noop(remove_contaminated_spans(train, test, k=8))
        _noop(remove_dup_spans(train, k=8))
        _noop(remove_repeated_spans(train, k=8))
        ind_times.append(round(time.perf_counter() - t0, 2))

        t0 = time.perf_counter()
        _noop(clean_corpus(train, test, k=8))
        one_times.append(round(time.perf_counter() - t0, 2))
    print(json.dumps({
        "metric": "clean_corpus_probe", "sf_dir": args.sf_dir,
        "sequential_sec": seq_times,
        "individual_sum_sec": ind_times,
        "onepass_sec": one_times,
        "vs_sequential": round(min(one_times) / min(seq_times), 3),
        "vs_individual_sum": round(min(one_times) / min(ind_times),
                                   3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
