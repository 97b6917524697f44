"""connected_components / keep_canonical on graphs with known truth:
chains (worst-case diameter), cliques (the LSH shape), singleton
non-participants, and partition-count invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from legate_dataframe_spark.pipeline.components import (
    connected_components,
    keep_canonical,
)


def _comp(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.component
            for r in connected_components(df).collect()}


def test_two_cliques_and_a_chain(spark):
    edges = ([(1, 2), (2, 3), (1, 3)]            # clique {1,2,3}
             + [(10, 11), (11, 12)]              # chain {10,11,12}
             + [(20, 21)])                       # pair {20,21}
    got = _comp(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_chain_converges(spark):
    # diameter 30 — exercises the iteration loop + lineage truncation
    edges = [(i, i + 1) for i in range(30)]
    got = _comp(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 31


def test_edge_direction_irrelevant(spark):
    assert _comp(spark, [(5, 1), (1, 9)]) == {1: 1, 5: 1, 9: 1}


def test_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    kept = keep_canonical(docs, pairs)
    # clusters {1,2,3}→1, {5,6}→5; 0,4,7 untouched
    assert sorted(r.doc_id for r in kept.collect()) == [0, 1, 4, 5, 7]


def test_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges).count() == 0
    docs = spark.createDataFrame([(1, "a"), (2, "b")],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert keep_canonical(docs, pairs).count() == 2  # nothing dropped


def test_components_partition_invariance(spark):
    edges = [(i % 17, (i * 5) % 17) for i in range(40)] + [(100, 101)]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = _comp(spark, edges)
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        many = _comp(spark, edges)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert one == many


def test_string_node_ids_long_chain(spark):
    # The integral-label fast path (sum-based convergence) must not be
    # taken for STRING ids: a string label casts to NULL decimal, which
    # would read "converged" after one round and leave a long chain
    # half-labelled.  Diameter 12 needs several propagation rounds.
    edges = [(f"doc{i:03d}", f"doc{i + 1:03d}") for i in range(12)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.component
           for r in connected_components(df).collect()}
    assert len(got) == 13
    assert set(got.values()) == {"doc000"}
