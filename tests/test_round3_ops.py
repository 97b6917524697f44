"""Round-3 pipeline operators: bigram fluency, cross-doc duplicated
n-grams, PII redaction, mixture sampling, streaming dedup drain."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from legate_dataframe_spark.pipeline import text
from legate_dataframe_spark.pipeline.redact import redact_pii
from legate_dataframe_spark.pipeline.sampling import mixture_sample


def test_bigram_logprob_handcrafted(spark):
    # corpus bigrams: (a,b) x2, (a,c) x1 → P(b|a)=2/3, P(c|a)=1/3
    df = spark.createDataFrame([(1, "a b"), (2, "a b"), (3, "a c")],
                               "doc_id: long, text: string")
    got = {r["doc_id"]: (r["n_bigrams"], r["nll_micro_sum"])
           for r in text.bigram_logprob(df).collect()}
    assert got[1] == got[2] == (1, round(-math.log(2 / 3) * 1e6))
    assert got[3] == (1, round(-math.log(1 / 3) * 1e6))


def test_bigram_logprob_excludes_single_token_docs(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "a b")],
                               "doc_id: long, text: string")
    ids = {r["doc_id"] for r in text.bigram_logprob(df).collect()}
    assert ids == {2}


def test_duplicated_ngrams_cross_doc(spark):
    # 2-grams: doc1 {x y, y z}, doc2 {x y, y w} → "x y" duplicated
    df = spark.createDataFrame([(1, "x y z"), (2, "x y w")],
                               "doc_id: long, text: string")
    got = {r["doc_id"]: (r["n_ngrams"], r["dup_ngrams"], r["dup_frac"])
           for r in text.duplicated_ngrams(df, n=2).collect()}
    assert got == {1: (2, 1, 0.5), 2: (2, 1, 0.5)}


def test_duplicated_ngrams_within_doc_repeat_not_dup(spark):
    # doc repeats its own phrase; no OTHER doc shares it → not duplicated
    df = spark.createDataFrame([(1, "p q p q"), (2, "r s t")],
                               "doc_id: long, text: string")
    got = {r["doc_id"]: r["dup_ngrams"]
           for r in text.duplicated_ngrams(df, n=2).collect()}
    assert got == {1: 0, 2: 0}


def test_redact_pii_counts_and_text(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.com or c.d+e@f-g.co.uk, call 555-010-1234, "
             "ip 10.0.0.1 end"),
         (2, "clean text")],
        "doc_id: long, text: string")
    rows = {r["doc_id"]: r for r in redact_pii(df).collect()}
    r1 = rows[1]
    assert (r1["n_email"], r1["n_phone"], r1["n_ipv4"]) == (2, 1, 1)
    assert r1["text_redacted"] == \
        "mail <EMAIL> or <EMAIL>, call <PHONE>, ip <IPV4> end"
    r2 = rows[2]
    assert (r2["n_email"], r2["n_phone"], r2["n_ipv4"]) == (0, 0, 0)
    assert r2["text_redacted"] == "clean text"


def test_mixture_sample_quotas(spark):
    rows = [(i, "A" if i < 10 else ("B" if i < 12 else "C"))
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    got = mixture_sample(df, "lang", {"A": 3, "B": 5}).collect()
    by_lang: dict[str, int] = {}
    for r in got:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    # A capped at quota; B has only 2 rows (< quota 5); C absent → dropped
    assert by_lang == {"A": 3, "B": 2}
    # deterministic: same draw every time
    again = mixture_sample(df, "lang", {"A": 3, "B": 5}).collect()
    assert sorted(r["doc_id"] for r in got) == \
        sorted(r["doc_id"] for r in again)


def test_stream_dedup_drain_multibatch_suppression(spark, tmp_path):
    """A later micro-batch repeating content from an earlier one must be
    suppressed by the cross-batch dropDuplicates state, and per-source
    counts must equal the batch distinct counts."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    src = tmp_path / "documents.parquet"
    src.mkdir()

    def _tbl(rows):
        return pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "text": pa.array([r[1] for r in rows], pa.string()),
             "lang": pa.array(["en"] * len(rows), pa.string()),
             "source": pa.array([r[2] for r in rows], pa.string()),
             "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})

    # file A: two distinct texts in s1; file B repeats one of them
    # (same source), adds a genuinely new one, and the SAME text under
    # a different source (distinct key: dedup is per (source, digest))
    pq_.write_table(_tbl([(1, "alpha beta", "s1"),
                          (2, "gamma delta", "s1")]), src / "a.parquet")
    pq_.write_table(_tbl([(3, "Alpha   BETA", "s1"),   # dup after normalize
                          (4, "epsilon zeta", "s1"),
                          (5, "alpha beta", "s2")]), src / "b.parquet")

    from legate_dataframe_spark.plans.pipeline_queries import stream_dedup_drain

    got = {r["source"]: r["n_unique"]
           for r in stream_dedup_drain(
               spark, str(tmp_path), _max_files_per_trigger=1).collect()}
    assert got == {"s1": 3, "s2": 1}


def test_stream_user_stats_multibatch_accumulates(spark, tmp_path):
    """The applyInPandasWithState drain must fold state ACROSS
    micro-batches: a user seen in both files ends at its combined
    totals, and last-update-wins reconstruction picks those."""
    import pyarrow as pa
    import pyarrow.parquet as pq_
    import datetime

    src = tmp_path / "events.parquet"
    src.mkdir()

    def _tbl(rows):
        t0 = datetime.datetime(2024, 1, 1)
        return pa.table(
            {"event_id": pa.array([r[0] for r in rows], pa.int64()),
             "ts": pa.array([t0] * len(rows), pa.timestamp("us")),
             "user_id": pa.array([r[1] for r in rows], pa.int64()),
             "event_type": pa.array(["click"] * len(rows), pa.string()),
             "value": pa.array([r[2] for r in rows], pa.float64()),
             "props": pa.array(["{}"] * len(rows), pa.string())})

    pq_.write_table(_tbl([(1, 1, 2.0), (2, 2, 3.0)]), src / "a.parquet")
    pq_.write_table(_tbl([(3, 1, 5.0), (4, 3, 7.0)]), src / "b.parquet")

    from legate_dataframe_spark.plans.pipeline_queries import (
        stream_user_stats_drain,
    )

    got = {r["user_id"]: (r["n_events"], r["total_value"], r["max_value"])
           for r in stream_user_stats_drain(
               spark, str(tmp_path), _max_files_per_trigger=1).collect()}
    assert got == {1: (2, 7.0, 5.0), 2: (1, 3.0, 3.0), 3: (1, 7.0, 7.0)}


def test_asof_join_tolerance_masks_stale(spark):
    import datetime

    from legate_dataframe_spark.operators.asof import asof_join

    t0 = datetime.datetime(2024, 1, 1, 12, 0)

    def m(mins):
        return t0 + datetime.timedelta(minutes=mins)

    left = spark.createDataFrame(
        [(1, 10, m(0)), (2, 10, m(60)), (3, 20, m(5))],
        "event_id: long, user_id: long, ts: timestamp")
    right = spark.createDataFrame(
        [(10, m(-5), 100), (10, m(30), 101)],
        "user_id: long, ts: timestamp, payload: long")
    got = {r["event_id"]: r["payload"]
           for r in asof_join(left, right, on=["user_id"], left_ts="ts",
                              right_ts="ts", right_payload=["payload"],
                              tolerance="15 MINUTES").collect()}
    # event 1: match at -5min (within 15) → 100
    # event 2: latest right at +30 is 30min stale → masked to null
    # event 3: user 20 has no right rows → null
    assert got == {1: 100, 2: None, 3: None}

    unbounded = {r["event_id"]: r["payload"]
                 for r in asof_join(left, right, on=["user_id"],
                                    left_ts="ts", right_ts="ts",
                                    right_payload=["payload"]).collect()}
    assert unbounded == {1: 100, 2: 101, 3: None}


def test_streaming_results_survive_later_query_construction(spark, sf_dir):
    """Review r03: constructing a SECOND registry query used to delete
    the sink dir a prior streaming query's still-lazy result read from
    (release_caches preamble + tracked tempdirs).  Drain results are
    now eagerly materialized, so build-several-then-collect works."""
    from legate_dataframe_spark.plans.registry import QUERIES

    first = QUERIES["stream_dedup_drain"](spark, sf_dir)
    # constructing another query triggers the release_caches preamble
    second = QUERIES["dedup_exact"](spark, sf_dir)
    assert first.count() > 0  # must not raise FileNotFound
    assert second.count() > 0
