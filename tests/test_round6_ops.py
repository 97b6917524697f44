"""Round-6 operators: incremental component maintenance against a
persisted bucketed label table, ANN search off a persisted IVF index,
and the compaction driver query's plumbing.  Registry-level oracle
parity for all three is covered by tests/test_oracle_parity.py; these
tests pin the pieces in isolation (hand graphs, persisted-vs-in-query
equality, plan shapes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def tempdb(spark, tmp_path):
    import uuid

    db = f"r6test_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db} LOCATION '{tmp_path}'")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_incremental_components_hand_graph(spark, tempdb):
    """Hand-checkable merge: corpus clusters {1,2,3} and {5,6}; the
    batch bridges {1,2,3} to batch nodes 10,20 and to the previously
    ISOLATED corpus node 7 (not in the label table — must enter the
    contracted graph as itself); {5,6} is untouched and must keep its
    label without recomputation."""
    from legate_dataframe_spark.pipeline.components import (
        build_components_index,
        incremental_components_update,
    )

    corpus_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"])
    build_components_index(spark, corpus_pairs, f"{tempdb}.labels",
                           num_buckets=4)
    cross = spark.createDataFrame(
        [(3, 10), (7, 20)], ["corpus_id", "batch_id"])
    bpairs = spark.createDataFrame([(10, 20)], ["id_a", "id_b"])
    got = {r["node"]: r["component"]
           for r in incremental_components_update(
               spark, f"{tempdb}.labels", cross, bpairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 10: 1, 20: 1, 7: 1}


def test_incremental_components_matches_full_recompute(spark, tempdb):
    """Random split invariance: incremental merge over a corpus/batch
    split must equal one-shot components over the union edge set."""
    import random

    from legate_dataframe_spark.pipeline.components import (
        build_components_index,
        connected_components,
        incremental_components_update,
    )

    rng = random.Random(13)
    edges = sorted({tuple(sorted((rng.randrange(60), rng.randrange(60))))
                    for _ in range(80)})
    edges = [(a, b) for a, b in edges if a != b]
    batch_nodes = {n for n in range(60) if n % 5 == 0}
    corpus_e = [(a, b) for a, b in edges
                if a not in batch_nodes and b not in batch_nodes]
    cross_e = [(a, b) if b in batch_nodes else (b, a)
               for a, b in edges
               if (a in batch_nodes) != (b in batch_nodes)]
    batch_e = [(a, b) for a, b in edges
               if a in batch_nodes and b in batch_nodes]

    build_components_index(
        spark, spark.createDataFrame(corpus_e, ["id_a", "id_b"]),
        f"{tempdb}.labels", num_buckets=4)
    got = {r["node"]: r["component"]
           for r in incremental_components_update(
               spark, f"{tempdb}.labels",
               spark.createDataFrame(cross_e, ["corpus_id", "batch_id"]),
               spark.createDataFrame(batch_e, ["id_a", "id_b"])).collect()}
    want = {r["node"]: r["component"]
            for r in connected_components(
                spark.createDataFrame(edges, ["id_a", "id_b"]),
                "id_a", "id_b").collect()}
    assert got == want


def test_ivf_persisted_matches_in_query(spark, tempdb):
    """Serving off the persisted index must be value-identical to the
    in-query ivf_search over the same centroids."""
    import random

    from legate_dataframe_spark.pipeline.similarity import (
        assign_with_payload,
        build_ivf_index,
        ivf_search,
        ivf_search_persisted,
    )

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cen = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), "embedding")
    q = e.filter(F.col("vec_id") % 10 == 0)

    build_ivf_index(spark, e, cen, f"{tempdb}.ivf", num_buckets=4)
    persisted = {(r["q_id"], r["rank"]): (r["c_id"], r["cos_sim"])
                 for r in ivf_search_persisted(
                     spark, q, f"{tempdb}.ivf", k=3, n_probe=2).collect()}
    assigned = assign_with_payload(e, cen, ["embedding"])
    inquery = {(r["q_id"], r["rank"]): (r["c_id"], r["cos_sim"])
               for r in ivf_search(assigned, cen, q, k=3,
                                   n_probe=2).collect()}
    assert persisted == inquery and persisted


def test_ivf_persisted_bucket_plan(spark, tempdb):
    """With broadcast off, the probe join must read the assignment
    table's buckets (Bucketed: true) with no Exchange on that side."""
    from legate_dataframe_spark.pipeline.similarity import (
        build_ivf_index,
        ivf_search_persisted,
    )
    from tests.test_plan_quality import plan_of

    e = spark.range(0, 60).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * p % 7).cast("double") + F.lit(0.1)
                  for p in (3, 5)]).alias("embedding"))
    cen = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("centroid_id"), "embedding")
    build_ivf_index(spark, e, cen, f"{tempdb}.ivf", num_buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = ivf_search_persisted(
            spark, e.filter(F.col("vec_id") % 20 == 0), f"{tempdb}.ivf",
            k=3, n_probe=2)
        plan = plan_of(out, "formatted")
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_compaction_reduces_files_and_is_lossless(spark, tmp_path):
    from legate_dataframe_spark.sources.parquet import compact_parquet_dir

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    df = spark.range(0, 50_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"))
    df.repartition(40).write.parquet(src)
    n_out = compact_parquet_dir(spark, src, dst, target_mb=256)
    assert n_out < 40
    back = spark.read.parquet(dst)
    assert back.count() == 50_000
    assert (back.agg(F.sum("k")).first()[0]
            == df.agg(F.sum("k")).first()[0])


def test_minhash_pairs_from_index_matches_direct(spark, tempdb):
    """Pairs served off the persisted index must equal a direct LSH
    pass over the same corpus, and the band self-join must read the
    band table's co-located buckets."""
    from legate_dataframe_spark.pipeline.dedup import (
        build_minhash_index,
        minhash_lsh_pairs,
        minhash_pairs_from_index,
    )
    from tests.test_plan_quality import plan_of

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "a completely different sentence about spark engines"),
         (4, "the quick brown fox jumps over the lazy dog"),
         (5, "a completely different sentence about spark engines")],
        ["doc_id", "text"])
    build_minhash_index(spark, docs, f"{tempdb}.c", num_buckets=4)
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in minhash_pairs_from_index(spark, f"{tempdb}.c").collect()}
    want = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in minhash_lsh_pairs(docs).collect()}
    assert got == want and got
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(minhash_pairs_from_index(spark, f"{tempdb}.c"),
                       "formatted")
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_ivf_insert_append_matches_full_build(spark, tempdb):
    """build(corpus) + insert(batch) must serve identically to
    build(corpus ∪ batch) — appended files keep bucket co-location."""
    import random

    from legate_dataframe_spark.pipeline.similarity import (
        build_ivf_index,
        insert_into_ivf_index,
        ivf_search_persisted,
    )

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(90)]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cen = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), "embedding")
    q = e.filter(F.col("vec_id") % 15 == 0)

    build_ivf_index(spark, e.filter(F.col("vec_id") % 3 != 0), cen,
                    f"{tempdb}.inc", num_buckets=4)
    insert_into_ivf_index(spark, e.filter(F.col("vec_id") % 3 == 0),
                          f"{tempdb}.inc", num_buckets=4)
    build_ivf_index(spark, e, cen, f"{tempdb}.full", num_buckets=4)
    inc = {(r["q_id"], r["rank"]): (r["c_id"], r["cos_sim"])
           for r in ivf_search_persisted(spark, q, f"{tempdb}.inc",
                                         k=3, n_probe=2).collect()}
    full = {(r["q_id"], r["rank"]): (r["c_id"], r["cos_sim"])
            for r in ivf_search_persisted(spark, q, f"{tempdb}.full",
                                          k=3, n_probe=2).collect()}
    assert inc == full and inc


def test_interval_overlap_hand_cases(spark, monkeypatch, tmp_path):
    """Binned overlap join on hand intervals: cross-month overlap
    found once (distinct), non-overlap excluded, different customers
    never pair, adjacent single-day overlap counts 1 day."""
    import datetime as dt

    from legate_dataframe_spark.plans import round6

    orders = spark.createDataFrame(
        [(1, 10, dt.datetime(2024, 1, 20)),   # ─┐ overlap Jan20..Feb10
         (2, 10, dt.datetime(2024, 2, 1)),    # ─┘ (cross-month, 2 bins)
         (3, 10, dt.datetime(2024, 5, 1)),    # no overlap with 1/2
         (4, 20, dt.datetime(2024, 1, 25)),   # other customer
         (5, 30, dt.datetime(2024, 3, 1)),    # ─┐ single shared day
         (6, 30, dt.datetime(2024, 3, 10))],  # ─┘ (Mar 10)
        ["o_orderkey", "o_custkey", "o_orderdate"])
    ship = spark.createDataFrame(
        [(1, dt.datetime(2024, 2, 10)), (2, dt.datetime(2024, 2, 20)),
         (3, dt.datetime(2024, 5, 5)), (4, dt.datetime(2024, 2, 5)),
         (5, dt.datetime(2024, 3, 10)), (6, dt.datetime(2024, 3, 20))],
        ["l_orderkey", "l_shipdate"])
    monkeypatch.setattr(
        round6, "load_table",
        lambda spark_, sf_, name: {"orders": orders, "lineitem": ship}[name])
    got = {(r["key_a"], r["key_b"]): r["overlap_days"]
           for r in round6.interval_overlap_join(spark, "unused").collect()}
    assert got == {(1, 2): 10, (5, 6): 1}


def test_dq_checks_flags_injected_violations(spark, monkeypatch):
    import datetime as dt

    from legate_dataframe_spark.plans import round6

    orders = spark.createDataFrame(
        [(1, 10, "O", 100.0, dt.datetime(2024, 1, 1), "1-URGENT"),
         (1, 11, "O", 50.0, dt.datetime(2024, 1, 2), "1-URGENT"),   # dup key
         (2, None, "O", -5.0, dt.datetime(2024, 1, 3), "1-URGENT")],  # null + nonpos
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"])
    li = spark.createDataFrame(
        [(1, 1.0, 0.9, dt.datetime(2024, 1, 5)),    # discount out of range
         (99, 2.0, 0.1, dt.datetime(2024, 1, 5)),   # orphan
         (2, 3.0, 0.1, dt.datetime(2023, 12, 1))],  # ship before order
        ["l_orderkey", "l_quantity", "l_discount", "l_shipdate"])
    monkeypatch.setattr(
        round6, "load_table",
        lambda spark_, sf_, name: {"orders": orders, "lineitem": li}[name])
    got = {r["rule"]: (r["violations"], r["pass"])
           for r in round6.dq_checks(spark, "unused").collect()}
    assert got["orders.duplicate_orderkey"] == (1, False)
    assert got["orders.null_custkey"] == (1, False)
    assert got["orders.totalprice_nonpositive"] == (1, False)
    assert got["lineitem.discount_out_of_range"] == (1, False)
    assert got["lineitem.orphan_orderkey"] == (1, False)
    assert got["lineitem.ship_before_orderdate"] == (1, False)
    assert got["lineitem.quantity_nonpositive"] == (0, True)


def test_trend_slope_hand_values(spark, monkeypatch):
    import datetime as dt

    from legate_dataframe_spark.plans import round6

    # user 1: y_micro = 2e6·x (slope 2e6/day); user 2: constant days → dropped
    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 0.0),
         (1, dt.datetime(2024, 1, 2), 2.0),
         (1, dt.datetime(2024, 1, 3), 4.0),
         (2, dt.datetime(2024, 1, 5), 1.0),
         (2, dt.datetime(2024, 1, 5), 9.0)],
        ["user_id", "ts", "value"])
    monkeypatch.setattr(round6, "load_table",
                        lambda spark_, sf_, name: ev)
    got = {r["user_id"]: (r["n"], r["slope_micro_per_day"])
           for r in round6.trend_per_group(spark, "unused").collect()}
    assert got == {1: (3, 2_000_000.0)}


def test_bm25_persisted_matches_in_query_and_prunes(spark, tempdb):
    """Persisted BM25 must rank identically to the in-query bm25_topk
    over the same corpus, and the postings scan must bucket-prune on
    the term filter (SelectedBucketsCount)."""
    from legate_dataframe_spark.pipeline.text import (
        bm25_search_persisted,
        bm25_topk,
        build_bm25_index,
    )
    from tests.test_plan_quality import plan_of

    docs = spark.createDataFrame(
        [(1, "spark shuffle join broadcast shuffle"),
         (2, "vector search with broadcast hash join"),
         (3, "an unrelated document about cats and dogs"),
         (4, "shuffle shuffle shuffle everywhere"),
         (5, "broadcast vector broadcast vector")],
        ["doc_id", "text"])
    build_bm25_index(spark, docs, f"{tempdb}.bm", num_buckets=4)
    out = bm25_search_persisted(
        spark, ["shuffle", "broadcast", "vector"], f"{tempdb}.bm", topk=3)
    got = {(r["doc_id"], r["rank"]): r["bm25"] for r in out.collect()}
    want = {(r["doc_id"], r["rank"]): r["bm25"]
            for r in bm25_topk(docs, ["shuffle", "broadcast", "vector"],
                               topk=3).collect()}
    assert got == want and got
    assert "SelectedBucketsCount" in plan_of(out, "formatted")


def test_incremental_rollup_hand_values(spark, tempdb):
    """Hand-checkable merge of batch partials into persisted state:
    day A/click matched (counts+sums add, min/max fold), day B/view
    untouched (must pass through unchanged), day C/click batch-only
    (must insert).  Result must equal a full recompute over the
    union."""
    import datetime as dt

    from legate_dataframe_spark.pipeline.rollup import (
        build_rollup_index,
        event_partials,
        incremental_rollup_update,
    )

    def ev(day, typ, val):
        return (dt.datetime(2024, 1, day, 12, 0), typ, val)

    corpus = spark.createDataFrame(
        [ev(1, "click", 1.5), ev(1, "click", -2.25),
         ev(2, "view", 10.0)],
        ["ts", "event_type", "value"])
    batch = spark.createDataFrame(
        [ev(1, "click", 7.0), ev(3, "click", 0.125)],
        ["ts", "event_type", "value"])
    build_rollup_index(spark, corpus, f"{tempdb}.state", num_buckets=4)
    out = incremental_rollup_update(spark, f"{tempdb}.state", batch)
    got = {(r["day"], r["event_type"]):
           (r["n"], r["sum_micro"], r["min_micro"], r["max_micro"])
           for r in out.collect()}
    d = dt.datetime
    assert got == {
        (d(2024, 1, 1), "click"): (3, 6_250_000, -2_250_000, 7_000_000),
        (d(2024, 1, 2), "view"): (1, 10_000_000, 10_000_000, 10_000_000),
        (d(2024, 1, 3), "click"): (1, 125_000, 125_000, 125_000),
    }
    want = {(r["day"], r["event_type"]):
            (r["n"], r["sum_micro"], r["min_micro"], r["max_micro"])
            for r in event_partials(corpus.unionByName(batch)).collect()}
    assert got == want
