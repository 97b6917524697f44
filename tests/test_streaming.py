"""Structured Streaming: the same windowing operators run as a real
stream (file source → watermark → memory sink) and agree with batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legate_dataframe_spark.streaming.windows import (
    sessionize,
    sliding_window_agg,
    tumbling_window_agg,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # deterministic small event set written as parquet for readStream
    rows = [(i, f"2024-01-01 {i % 5:02d}:{(i * 7) % 60:02d}:00", i % 3, "t" + str(i % 2), float(i))
            for i in range(200)]
    df = (spark.createDataFrame(rows, "event_id: long, ts_s: string, user_id: long, event_type: string, value: double")
          .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s"))
    path = str(tmp_path_factory.mktemp("events_stream"))
    df.coalesce(2).write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, events_dir, make_query, name):
    static = spark.read.parquet(events_dir)
    stream = (spark.readStream.schema(static.schema).parquet(events_dir)
              .withWatermark("ts", "1 hour"))
    out = make_query(stream)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(f"select * from {name}")
    want = make_query(static)
    return got, want


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=str)


def test_tumbling_stream_matches_batch(spark, events_dir):
    got, want = _run_stream(spark, events_dir,
                            lambda df: tumbling_window_agg(df, window="30 minutes"),
                            "tumbling_mem")
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_sliding_stream_matches_batch(spark, events_dir):
    got, want = _run_stream(spark, events_dir,
                            lambda df: sliding_window_agg(df, window="30 minutes", slide="15 minutes"),
                            "sliding_mem")
    assert _rows(got) == _rows(want)


def test_session_stream_matches_batch(spark, events_dir):
    got, want = _run_stream(spark, events_dir,
                            lambda df: sessionize(df, gap="10 minutes"),
                            "session_mem")
    assert _rows(got) == _rows(want)


def test_stateful_user_stats_matches_batch(spark, events_dir):
    """applyInPandasWithState: the final per-user state after draining
    the stream equals the batch groupBy aggregation."""
    from legate_dataframe_spark.streaming.stateful import (
        batch_user_stats,
        running_user_stats,
    )

    static = spark.read.parquet(events_dir)
    stream = spark.readStream.schema(static.schema).parquet(events_dir)
    q = (running_user_stats(stream).writeStream.format("memory")
         .queryName("stateful_mem").outputMode("update")
         .trigger(availableNow=True).start())
    # must TERMINATE, not just drain: with a ProcessingTimeTimeout
    # registered, Spark schedules timeout-evaluation micro-batches
    # forever and availableNow never finishes (the NoTimeout default
    # exists precisely for bounded drains)
    assert q.awaitTermination(120), "availableNow drain did not terminate"
    # update mode appends one row per key per micro-batch: the LAST row
    # per user is the final state.
    got = spark.sql("""
        select user_id, n_events, total_value, max_value from (
          select *, row_number() over (partition by user_id
                                       order by n_events desc) rn
          from stateful_mem) where rn = 1""")
    want = batch_user_stats(static)
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_events_stream_tumbling_matches_batch(spark, sf_dir):
    """The registry's real-streaming tumbling query (update mode +
    foreachBatch last-update-wins) equals the batch window agg."""
    from legate_dataframe_spark.plans.pipeline_queries import (
        events_stream_tumbling,
        events_tumbling,
    )

    got = {(r.window_start, r.event_type): (r.n_events, r.sum_value)
           for r in events_stream_tumbling(spark, sf_dir).collect()}
    want = {(r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in events_tumbling(spark, sf_dir).collect()}
    assert got == want


def test_events_stream_tumbling_empty_source(spark, tmp_path):
    """Zero input rows must yield an empty frame (matching the batch
    twin), not a schema-inference failure on the empty sink."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    src = tmp_path / "events.parquet"
    pa_schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ])
    pq_.write_table(pa.table({f.name: [] for f in pa_schema},
                             schema=pa_schema), src)
    from legate_dataframe_spark.plans.pipeline_queries import (
        events_stream_tumbling,
    )

    out = events_stream_tumbling(spark, str(tmp_path))
    assert out.count() == 0
    assert out.columns == ["window_start", "event_type", "n_events",
                           "sum_value"]


def test_events_stream_tumbling_multibatch_late_data(spark, tmp_path):
    """A multi-batch drain where a LATER micro-batch carries events far
    older than the first batch's max timestamp must still match the
    batch aggregate (ADVICE r02: a 1h watermark silently dropped such
    rows whenever the file source split the drain)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq_

    src = tmp_path / "events.parquet"
    src.mkdir()

    def _tbl(rows):
        return pa.table(
            {"event_id": pa.array([r[0] for r in rows], pa.int64()),
             "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
             "user_id": pa.array([r[2] for r in rows], pa.int64()),
             "event_type": pa.array([r[3] for r in rows], pa.string()),
             "value": pa.array([r[4] for r in rows], pa.float64()),
             "props": pa.array([r[5] for r in rows], pa.string())})

    t0 = datetime.datetime(2024, 1, 1, 0, 30)
    late = t0 - datetime.timedelta(hours=6)   # >1h behind file A's max
    # file A: recent events; file B: late stragglers for an OLD window
    pq_.write_table(_tbl([(1, t0, 1, "click", 1.0, "{}"),
                          (2, t0, 2, "click", 2.0, "{}")]), src / "a.parquet")
    pq_.write_table(_tbl([(3, late, 3, "click", 4.0, "{}"),
                          (4, t0, 4, "view", 8.0, "{}")]), src / "b.parquet")

    from legate_dataframe_spark.plans.pipeline_queries import (
        events_stream_tumbling,
        events_tumbling,
    )

    got = {(r.window_start, r.event_type): (r.n_events, r.sum_value)
           for r in events_stream_tumbling(
               spark, str(tmp_path), _max_files_per_trigger=1).collect()}
    want = {(r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in events_tumbling(spark, str(tmp_path)).collect()}
    assert got == want
    assert len(got) == 3  # late window present, not dropped


def test_stream_session_merges_across_batches(spark, tmp_path):
    """Complete-mode session drain: a later micro-batch bridges two
    partial sessions from an earlier batch; the final snapshot must
    show the MERGED session (this is exactly why update mode is
    rejected for streaming session windows — partial rows would go
    stale in the sink)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq_

    src = tmp_path / "events.parquet"
    src.mkdir()

    def _tbl(rows):
        return pa.table(
            {"event_id": pa.array([r[0] for r in rows], pa.int64()),
             "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
             "user_id": pa.array([r[2] for r in rows], pa.int64()),
             "event_type": pa.array([r[3] for r in rows], pa.string()),
             "value": pa.array([r[4] for r in rows], pa.float64()),
             "props": pa.array([r[5] for r in rows], pa.string())})

    t0 = datetime.datetime(2024, 1, 1, 12, 0)
    m = datetime.timedelta(minutes=1)
    # file A: two events 50 min apart → two sessions in batch 1
    pq_.write_table(_tbl([(1, t0, 7, "click", 1.0, "{}"),
                          (2, t0 + 50 * m, 7, "click", 2.0, "{}")]),
                    src / "a.parquet")
    # file B: a bridging event 25 min in → batch 2 merges them
    pq_.write_table(_tbl([(3, t0 + 25 * m, 7, "click", 4.0, "{}")]),
                    src / "b.parquet")

    from legate_dataframe_spark.plans.pipeline_queries import (
        events_stream_session,
        sessionize,
    )

    got = {(r.user_id, r.session_start): (r.n_events, r.sum_value)
           for r in events_stream_session(
               spark, str(tmp_path), _max_files_per_trigger=1).collect()}
    want = {(r.user_id, r.session_start): (r.n_events, r.sum_value)
            for r in sessionize(spark, str(tmp_path)).collect()}
    assert got == want
    assert got == {(7, t0): (3, 7.0)}  # one merged session, 3 events


def test_stream_stream_join_matches_batch_across_batches(spark, tmp_path):
    """Stream-stream interval self-join, one file per micro-batch: a
    purchase in batch 1 must still match a view that only arrives in
    batch 2 (both join sides are stateful), and the drained pair set
    must equal the batch join exactly."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq_

    src = tmp_path / "events.parquet"
    src.mkdir()

    def _tbl(rows):
        return pa.table(
            {"event_id": pa.array([r[0] for r in rows], pa.int64()),
             "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
             "user_id": pa.array([r[2] for r in rows], pa.int64()),
             "event_type": pa.array([r[3] for r in rows], pa.string()),
             "value": pa.array([r[4] for r in rows], pa.float64()),
             "props": pa.array([r[5] for r in rows], pa.string())})

    t0 = datetime.datetime(2024, 1, 1, 12, 0)
    m = datetime.timedelta(minutes=1)
    # batch A: user 1's purchase + an in-window view; user 2's view
    pq_.write_table(_tbl([
        (1, t0, 1, "purchase", 1.0, "{}"),
        (2, t0 - 5 * m, 1, "view", 1.0, "{}"),
        (3, t0 - 2 * m, 2, "view", 1.0, "{}"),
    ]), src / "a.parquet")
    # batch B: user 2's purchase (matches batch-A view — right side
    # buffered), user 1's LATE view (matches batch-A purchase — left
    # side buffered), plus an out-of-window view
    pq_.write_table(_tbl([
        (4, t0 + 1 * m, 2, "purchase", 1.0, "{}"),
        (5, t0 - 10 * m, 1, "view", 1.0, "{}"),
        (6, t0 - 50 * m, 1, "view", 1.0, "{}"),
    ]), src / "b.parquet")

    from legate_dataframe_spark.plans.pipeline_queries import (
        stream_stream_join,
    )

    got = {(r.p_id, r.v_id, r.user_id, r.gap_s)
           for r in stream_stream_join(
               spark, str(tmp_path), _max_files_per_trigger=1).collect()}
    assert got == {(1, 2, 1, 300), (1, 5, 1, 600), (4, 3, 2, 180)}
