"""Results must be invariant to partition count — the Spark analogue
of the reference's multi-worker scoping sweeps (testing.py:272-291,
every key test runs at 1,2,4,…,N processors).  Catches operators that
silently depend on partition layout (per-partition state, unstable
windows, driver-side assumptions)."""

from __future__ import annotations

import pytest

from legate_dataframe_spark.plans.registry import QUERIES

REPRESENTATIVE = [
    "q01_pricing_summary",   # scan→filter→agg→sort diagonal
    "join_inner",            # shuffle join
    "join_full",             # outer join null fill
    "groupby_aggs",          # 7 agg kinds incl. count_distinct
    "distinct_keys",         # keep-any dedup
    "sort_topk",             # TakeOrderedAndProject
    "window_cumsum",         # ordered window frames
    "dedup_minhash",         # multi-stage LSH pipeline
    "dedup_clusters",        # iterative label propagation
    "skew_salted_agg",       # two-phase salted re-agg
    "events_tumbling",       # time windowing
    "dedup_levenshtein",     # LSH candidates + thresholded edit distance
    "pq_adc_search",         # trained codebooks + code-table join
    "byte_stats_arrow",      # mapInArrow partition task
    # round-3b additions
    "semantic_dedup",        # cluster-blocked pair stage + argmax assign
    "segment_dedup",         # cross-doc digest counts + reassembly
    "tfidf_terms",           # two-shuffle keyword extraction + top-k
    "weighted_sample",       # md5-threshold sampling (must not depend
                             # on layout by construction)
    "pagerank_users",        # iterative graph rounds w/ checkpoints
    "psi_drift",             # broadcast bin edges + two-level aggs
    "ivf_sq8_search",        # payload-carrying assignment + pruned scan
    # round-3e additions
    "heavy_hitter_tokens",   # MG candidate sets differ per layout —
                             # the exact recount must erase that
    "bloom_decontaminate",   # bitmap prune + exact join
    "triangle_count",        # orientation + wedge joins
    "bpe_merges",            # checkpointed iterative rounds
    # round-4 additions
    "skyline_orders",        # local-skyline prefilter must not change
                             # the global frontier under any layout
    "binary_hamming_search", # two-stage shortlist + rerank
    "knn_classify",          # top-k + majority vote
    "label_propagation",     # synchronous rounds w/ checkpoints
    "kcore_peel",            # per-round degree restriction
    "inverted_postings",     # df-band + collect_list (sorted render)
    "canonical_best_quality",# components + survivor window
    "rolling_zscore",        # trailing frames on total ordering
    # round-10 continuation
    "substring_dup_spans",   # digest groupBy + covered-position
                             # distinct must not depend on layout
    # round-11: the corpus rewrite — collect_list into cov arrays and
    # the ordered array rebuild must erase layout entirely (the cut
    # TEXT itself is compared, not just counts)
    "substring_span_removal",
    "substring_span_removal_raw",
    "dup_span_intervals",    # islands window over covered positions
]


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_partition_count_invariance(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = _rows(QUERIES[name](spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        many = _rows(QUERIES[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert one == many, f"{name} result depends on partition count"
