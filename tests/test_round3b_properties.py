"""Property-based invariants for the round-3b operators: conservation
laws and Python-replay differentials that must hold for ANY corpus,
not just the handcrafted cases."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from legate_dataframe_spark.pipeline import similarity, text

WORDS = st.sampled_from(["a", "b", "cc", "dd", "e", "ff", "g"])
DOCS = st.lists(
    st.lists(WORDS, min_size=1, max_size=12).map(" ".join),
    min_size=1, max_size=8)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(DOCS)
def test_segment_dedup_token_conservation(spark, docs):
    # per doc: kept_tokens + tokens-in-dup-segments == total tokens,
    # and dup_segments ≤ n_segments
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id: long, text: string")
    rows = text.segment_dedup_stats(df, seg_tokens=3).collect()
    toks = {i: len(d.split()) for i, d in enumerate(docs)}
    assert {r["doc_id"] for r in rows} == set(toks)
    for r in rows:
        assert 0 <= r["dup_segments"] <= r["n_segments"]
        assert 0 <= r["kept_tokens"] <= toks[r["doc_id"]]
        # a fully-unique doc keeps everything
        if r["dup_segments"] == 0:
            assert r["kept_tokens"] == toks[r["doc_id"]]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(DOCS)
def test_tfidf_matches_python_replay(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id: long, text: string")
    got = {(r["doc_id"], r["term"]): r["tfidf"]
           for r in text.tfidf_topk_terms(df, topk=100).collect()}
    n = len(docs)
    dfreq: dict[str, int] = {}
    for d in docs:
        for t in set(d.split()):
            dfreq[t] = dfreq.get(t, 0) + 1
    for i, d in enumerate(docs):
        tf: dict[str, int] = {}
        for t in d.split():
            tf[t] = tf.get(t, 0) + 1
        for t, c in tf.items():
            assert got[(i, t)] == round(c * math.log(n / dfreq[t]), 6)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(st.floats(min_value=-8, max_value=8,
                                   allow_nan=False, width=32),
                         min_size=4, max_size=4),
                min_size=2, max_size=12))
def test_sq_quantize_bounds_and_monotonicity(spark, vecs):
    df = spark.createDataFrame(list(enumerate(vecs)),
                               "vec_id: long, embedding: array<float>")
    got = {r["vec_id"]: r["codes"]
           for r in similarity.sq_quantize(df).collect()}
    # codes in [0,255]; per-dim order of codes follows order of values
    for codes in got.values():
        assert all(0 <= c <= 255 for c in codes)
    for d in range(4):
        pairs = sorted((vecs[i][d], got[i][d]) for i in range(len(vecs)))
        code_seq = [c for _, c in pairs]
        assert code_seq == sorted(code_seq)  # monotone in the value


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 6))
                .filter(lambda e: e[0] != e[1]),
                min_size=1, max_size=15))
def test_pagerank_mass_bounds(spark, edges):
    from legate_dataframe_spark.pipeline import graph

    edges = sorted(set(edges))
    df = spark.createDataFrame(edges, "src: long, dst: long")
    rows = graph.pagerank(df, n_iter=2, damping=0.85).collect()
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    n = len(nodes)
    assert {r["node"] for r in rows} == nodes
    total = sum(r["rank"] for r in rows)
    for r in rows:
        # every node keeps at least the teleport mass
        assert r["rank"] >= round(0.15 / n, 8)
    # without dangling redistribution total mass can only LEAK (≤ 1)
    assert total <= 1.0 + 1e-6
