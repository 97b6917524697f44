"""applyInPandas grouped task: results must equal the pure-SQL
window/aggregate formulation of the same statistics (differential
oracle, mirroring the reference's task-vs-compute comparisons)."""

from __future__ import annotations

from pyspark.sql import functions as F

from legate_dataframe_spark.pipeline.custom import user_event_gaps
from legate_dataframe_spark.plans.relational import load_table


def test_user_event_gaps_matches_sql(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {r.user_id: r for r in user_event_gaps(ev).collect()}

    ev.createOrReplaceTempView("__ev")
    want = {r.user_id: r for r in spark.sql("""
        WITH g AS (
          SELECT user_id,
                 CAST(ts AS DOUBLE) -
                 CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      AS DOUBLE) AS gap
          FROM __ev)
        SELECT user_id, count(*) AS n_events,
               median(gap) AS median_gap_s, max(gap) AS max_gap_s
        FROM g GROUP BY user_id""").collect()}

    assert set(got) == set(want)
    for uid, g in got.items():
        w = want[uid]
        assert g.n_events == w.n_events
        if g.median_gap_s is None:
            assert w.median_gap_s is None
        else:
            assert abs(g.median_gap_s - w.median_gap_s) < 1e-6
            assert abs(g.max_gap_s - w.max_gap_s) < 1e-6


def test_grouped_task_generic(spark):
    import pandas as pd

    from legate_dataframe_spark.pipeline.custom import grouped_task

    df = spark.createDataFrame(
        [(1, 2.0), (1, 4.0), (2, 10.0)], "k long, v double")

    def span(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [pdf["k"].iloc[0]],
                             "span": [pdf["v"].max() - pdf["v"].min()]})

    out = {r.k: r.span for r in
           grouped_task(df, ["k"], span, "k long, span double").collect()}
    assert out == {1: 2.0, 2: 0.0}


def test_arrow_task_differential_vs_pandas(spark, sf_dir):
    """mapInArrow kernel must agree exactly with its mapInPandas twin
    on the real documents table (zero-copy surface differential)."""
    from legate_dataframe_spark.pipeline.custom import (
        doc_byte_stats_arrow,
        doc_byte_stats_pandas,
    )

    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id: (r.n_bytes, r.n_ascii)
         for r in doc_byte_stats_arrow(docs).collect()}
    p = {r.doc_id: (r.n_bytes, r.n_ascii)
         for r in doc_byte_stats_pandas(docs).collect()}
    assert a == p
    assert len(a) == docs.count()


def test_arrow_task_generic_passthrough(spark):
    """arrow_task ships raw RecordBatches both ways."""
    import pyarrow as pa

    from legate_dataframe_spark.pipeline.custom import arrow_task

    df = spark.createDataFrame([(1, 2.0), (2, 4.0)], "k long, v double")

    def double_v(batches):
        import pyarrow.compute as pc
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [b.column(0), pc.multiply(b.column(1), 2.0)],
                names=["k", "v"])

    out = {r.k: r.v for r in
           arrow_task(df, double_v, "k long, v double").collect()}
    assert out == {1: 4.0, 2: 8.0}
