"""Round-4 operator semantics on hand-built fixtures: skyline
dominance, graph rounds (label prop / BFS / k-core), binary-Hamming
search, k-NN voting, blocklist boundaries, survivor policy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_skyline_semantics(spark, sf_dir):
    # brute-force dominance check over the actual data
    from legate_dataframe_spark.plans.round4 import skyline_orders

    sky = {(r["price"], r["latest_date"])
           for r in skyline_orders(spark, sf_dir).collect()}
    rows = [(r["o_totalprice"], r["o_orderdate"])
            for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_totalprice", "o_orderdate").collect()]
    frontier = {
        (p, d) for (p, d) in rows
        if not any((p2 >= p and d2 >= d and (p2 > p or d2 > d))
                   for (p2, d2) in rows)
    }
    assert sky == frontier and sky


def test_label_propagation_two_components(spark):
    from legate_dataframe_spark.pipeline.graph import min_label_propagation

    # path 1-2-3-4 and isolated pair 10-11: after 3 rounds every node
    # in the path reaches label 1 (diameter 3), the pair reaches 10
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["src", "dst"])
    got = {r["node"]: r["lab"]
           for r in min_label_propagation(edges, n_rounds=3).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_label_propagation_round_bound(spark):
    from legate_dataframe_spark.pipeline.graph import min_label_propagation

    # a 6-path: one round only moves labels one hop
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], ["src", "dst"])
    got = {r["node"]: r["lab"]
           for r in min_label_propagation(edges, n_rounds=1).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5}


def test_bfs_hops_hand_graph(spark):
    from legate_dataframe_spark.pipeline.graph import bfs_hops

    # star + tail: 0-1, 0-2, 2-3, 3-4, 4-5 (5 is 4 hops from 0)
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (2, 3), (3, 4), (4, 5)], ["src", "dst"])
    src = spark.createDataFrame([(0,)], ["node"])
    got = {r["node"]: r["hops"]
           for r in bfs_hops(edges, src, max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}  # 5 unreachable in 3


def test_kcore_peel_hand_graph(spark):
    from legate_dataframe_spark.pipeline.graph import kcore_peel

    # K4 (nodes 1-4, all degree 3) + pendant chain 4-5, 5-6: pendants
    # peel away, K4 survives with degree 3
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        ["src", "dst"])
    got = {r["node"]: r["degree"]
           for r in kcore_peel(edges, k=3, n_rounds=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_peel_gated_shuffle_path(spark):
    """Degenerate graph — the MAJORITY of nodes drop in round 1
    (VERDICT r05 task 1): with broadcast_max_rows=0 the size gate must
    take the non-broadcast path and still produce identical results to
    the broadcast path."""
    from legate_dataframe_spark.pipeline.graph import kcore_peel

    # K4 core (1-4) + 12 pendant leaves hanging off node 4: 12 of 16
    # nodes have degree < 3 and all drop in round 1.
    pend = [(4, 100 + i) for i in range(12)]
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)] + pend,
        ["src", "dst"])
    want = {r["node"]: r["degree"]
            for r in kcore_peel(edges, k=3, n_rounds=3).collect()}
    got = {r["node"]: r["degree"]
           for r in kcore_peel(edges, k=3, n_rounds=3,
                               broadcast_max_rows=0).collect()}
    assert got == want == {1: 3, 2: 3, 3: 3, 4: 3}


def test_binary_quantize_bits(spark):
    from legate_dataframe_spark.pipeline.similarity import binary_quantize

    vec = [1.0 if i in (0, 5, 33) else -1.0 for i in range(64)]
    df = spark.createDataFrame([(1, vec)], ["vec_id", "embedding"])
    row = binary_quantize(df).collect()[0]
    assert row["w0"] == (1 << 0) + (1 << 5)
    assert row["w1"] == 1 << (33 - 32)


def test_hamming_topk_matches_exact_on_separable_corpus(spark):
    from legate_dataframe_spark.pipeline.similarity import (
        brute_force_topk,
        hamming_rerank_topk,
    )

    # two well-separated sign clusters → the Hamming shortlist with
    # shortlist >= cluster size reproduces the exact top-k
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        base = 1.0 if i % 2 == 0 else -1.0
        rows.append((i, [base * (0.5 + rng.random())
                         for _ in range(64)]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") < 2)
    exact = {(r["q_id"], r["c_id"], r["rank"])
             for r in brute_force_topk(df, q, k=5).collect()}
    ham = {(r["q_id"], r["c_id"], r["rank"])
           for r in hamming_rerank_topk(df, q, shortlist=39, k=5).collect()}
    assert ham == exact and len(ham) == 10


def test_knn_classify_majority_and_tiebreak(spark):
    from legate_dataframe_spark.pipeline.similarity import knn_classify

    # corpus: 3 vectors near +1 labeled 7, 3 near -1 labeled 2; query
    # sits in the +1 cluster → predicted 7
    rows = [(i, [1.0 + 0.01 * i] * 8, 7) for i in range(3)]
    rows += [(i + 10, [-1.0 - 0.01 * i] * 8, 2) for i in range(3)]
    rows += [(100, [0.9] * 8, 2)]  # the query itself (mislabeled)
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    q = df.filter(F.col("vec_id") == 100)
    out = knn_classify(df, q, k=3).collect()[0]
    assert out["pred_label"] == 7 and out["true_label"] == 2
    assert out["votes"] == 3 and not out["correct"]


def test_blocklist_word_boundaries(spark):
    from legate_dataframe_spark.pipeline.text import blocklist_hits

    docs = spark.createDataFrame(
        [(1, "spark is here"), (2, "sparkle and sparks"),
         (3, "no match"), (4, "VECTOR Spark vector")],
        ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_hits"], r["first_hit"])
           for r in blocklist_hits(docs, ["spark", "vector"]).collect()}
    # 'sparkle'/'sparks' must NOT match (word boundary)
    assert got == {1: (1, "spark"), 4: (3, "vector")}


def test_readability_exact_integer_formula(spark):
    from legate_dataframe_spark.pipeline.text import readability

    docs = spark.createDataFrame([(1, "aa bb ee")], ["doc_id", "text"])
    row = readability(docs).collect()[0]
    # words=3, vowel groups: 'aa','ee' → 2
    assert (row["n_words"], row["n_syllables"]) == (3, 2)
    expected = round((206835 * 3 - 1015 * 9 - 84600 * 2) / 3000, 4)
    assert row["flesch"] == pytest.approx(expected, abs=1e-9)


def test_canonical_by_policy_prefers_quality_then_id(spark):
    from legate_dataframe_spark.pipeline.components import canonical_by_policy

    docs = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1), (9, 0.7)],
        ["doc_id", "quality"])
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)],
                                  ["id_a", "id_b"])  # {1,2,3,4}; 9 alone
    rows = canonical_by_policy(docs, pairs, "quality").collect()
    assert len(rows) == 1  # singletons excluded
    r = rows[0]
    # quality tie 2 vs 3 → lower id wins
    assert (r["survivor_id"], r["survivor_quality"], r["n_members"]) \
        == (2, 0.9, 4)


def test_sequence_gaps_streaks(spark):
    from legate_dataframe_spark.plans.round4 import SEQUENCE_GAPS_SQL  # noqa: F401 (oracle exists)
    from legate_dataframe_spark.plans.round4 import sequence_gaps

    # synthetic via events table is covered by the oracle; here check
    # the streak arithmetic on a crafted frame through the same window
    # construction
    import datetime as dt

    rows = [(u, dt.datetime(2024, 1, d), 1.0)
            for u, days in [(1, [1, 2, 3, 7, 8]), (2, [5])]
            for d in days]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    from pyspark.sql import Window as W

    days = df.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day_num")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day_num")
    islands = (days.withColumn("grp", F.col("day_num")
                               - F.row_number().over(w))
               .groupBy("user_id", "grp").agg(F.count("*").alias("len")))
    got = {
        r["user_id"]: r["lens"]
        for r in islands.groupBy("user_id")
        .agg(F.sort_array(F.collect_list("len")).alias("lens")).collect()}
    assert got == {1: [2, 3], 2: [1]}
