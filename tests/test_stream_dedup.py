"""stream_exact_dedup: duplicates arriving across micro-batches within
the watermark horizon are dropped; the surviving set equals batch
exact-dedup on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from legate_dataframe_spark.streaming.dedupe import content_key, stream_exact_dedup


def test_stream_dedup_matches_batch(spark, tmp_path):
    rows = []
    for i in range(60):
        # 20 distinct texts, each written 3× (with whitespace noise)
        base = f"document number {i % 20} body"
        noisy = base if i % 3 == 0 else "  " + base.upper() + " "
        rows.append((i, f"2024-01-01 00:{i:02d}:00", noisy))
    df = (spark.createDataFrame(rows, "event_id long, ts_s string, text string")
          .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s"))
    src = str(tmp_path / "src")
    # two files → at least two input splits for availableNow batching
    df.filter("event_id < 30").coalesce(1).write.mode("append").parquet(src)
    df.filter("event_id >= 30").coalesce(1).write.mode("append").parquet(src)

    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    out = stream_exact_dedup(stream, "ts", "text", watermark="2 hours")
    q = (out.writeStream.format("memory").queryName("dedup_mem")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.sql("select * from dedup_mem")
    assert got.count() == 20
    # survivors cover every distinct digest exactly once
    want_keys = {r[0] for r in
                 static.select(content_key("text")).distinct().collect()}
    got_keys = {r[0] for r in got.select(content_key("text")).collect()}
    assert got_keys == want_keys
