"""Round-13 operator tests: fixpoint span cuts (ADVICE r12 — a
single-pass cut is not idempotent when a cut junction forms a new
matching k-gram), takedown null-id safety + same-filesystem staging,
and the Spark-formatted ``_now_stamp`` fallback for session time
zones zoneinfo cannot parse."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


# ---------- fixpoint span cuts (ADVICE r12 medium) ----------------
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_fixpoint_cuts_junction_kgram(spark):
    """The ADVICE r12 counterexample: train = t1..t4 <leaked span>
    t5..t8 where both the span AND t1..t8 are benchmark 8-grams.
    Pass 1 cuts the span; the junction then forms t1..t8 — a fresh
    leak a single pass misses (and the old in-query certificate
    crashed on).  The fixpoint cuts it too and certifies zero leaks.
    """
    from legate_dataframe_spark.pipeline.dedup import (
        _doc_kgrams,
        remove_contaminated_spans,
        remove_contaminated_spans_fixpoint,
    )

    t = [f"t{i}" for i in range(1, 9)]
    s = [f"s{i}" for i in range(1, 9)]
    train = _docs(spark, [(1, " ".join(t[:4] + s + t[4:]))])
    test = _docs(spark, [(100, " ".join(s)), (101, " ".join(t))])

    single = remove_contaminated_spans(train, test, k=8).first()
    assert single["removed_tokens"] == 8  # only the span — leak left
    _, leftover_kg = _doc_kgrams(
        spark.createDataFrame([(1, single["text_clean"])],
                              "doc_id long, text string"),
        "text", "doc_id", 8)
    _, test_kg = _doc_kgrams(test, "text", "doc_id", 8)
    assert leftover_kg.join(test_kg.select("dig").distinct(), "dig",
                            "left_semi").count() > 0

    fixed = remove_contaminated_spans_fixpoint(train, test, k=8) \
        .first()
    assert fixed["n_tokens"] == 16
    assert fixed["removed_tokens"] == 16 and fixed["kept_tokens"] == 0
    assert fixed["text_clean"] == ""
    assert fixed["dup_ratio"] == 1.0


def test_repeated_fixpoint_reaches_idempotence(spark):
    """A cut junction re-forms an 8-gram that occurred earlier in the
    same document: X Y x1..x4 Y x5..x8 — keep-first cuts the second
    Y, joining x1..x4 to x5..x8 into a second occurrence of X.  The
    fixpoint cuts that too; its output is idempotent by construction.
    """
    from legate_dataframe_spark.pipeline.dedup import (
        remove_repeated_spans,
        remove_repeated_spans_fixpoint,
    )

    x = [f"x{i}" for i in range(1, 9)]
    y = [f"y{i}" for i in range(1, 9)]
    doc = " ".join(x + y + x[:4] + y + x[4:])
    d = _docs(spark, [(1, doc)])

    single = remove_repeated_spans(d, k=8).first()
    again = remove_repeated_spans(
        _docs(spark, [(1, single["text_clean"])]), k=8).first()
    assert again["removed_tokens"] > 0  # single pass NOT idempotent

    fixed = remove_repeated_spans_fixpoint(d, k=8).first()
    assert fixed["n_tokens"] == 32
    assert fixed["removed_tokens"] == 16  # second Y, then second X
    assert fixed["text_clean"] == " ".join(x + y)
    stable = remove_repeated_spans(
        _docs(spark, [(1, fixed["text_clean"])]), k=8).first()
    assert stable["removed_tokens"] == 0


def test_fixpoint_equals_single_pass_on_convergent_corpus(spark):
    """When pass 1 converges (every real corpus measured — and the
    driver's documents table), the fixpoint IS the single pass; this
    equality is what keeps the single-pass DuckDB oracles exact."""
    from legate_dataframe_spark.pipeline.dedup import (
        remove_contaminated_spans,
        remove_contaminated_spans_fixpoint,
        remove_repeated_spans,
        remove_repeated_spans_fixpoint,
    )
    from legate_dataframe_spark.plans.relational import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    train = d.filter(F.col("doc_id") % 10 != 7)
    test = d.filter(F.col("doc_id") % 10 == 7)
    a = remove_contaminated_spans(train, test, k=8)
    b = remove_contaminated_spans_fixpoint(train, test, k=8)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    a = remove_repeated_spans(d, k=8)
    b = remove_repeated_spans_fixpoint(d, k=8)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_fixpoint_divergence_guard(spark):
    from legate_dataframe_spark.pipeline.dedup import (
        remove_repeated_spans_fixpoint,
    )

    x = [f"x{i}" for i in range(1, 9)]
    y = [f"y{i}" for i in range(1, 9)]
    doc = " ".join(x + y + x[:4] + y + x[4:])
    with pytest.raises(AssertionError, match="fixpoint"):
        remove_repeated_spans_fixpoint(_docs(spark, [(1, doc)]),
                                       k=8, max_iters=1)


# ---------- takedown: null ids survive, staging stays local -------
def test_takedown_from_export_keeps_null_id_rows(spark, tmp_path):
    """NOT IN is three-valued: without the explicit isNull() keep, a
    takedown of ANY id silently deletes every null-id row in every
    rewritten shard (ADVICE r12 low)."""
    from legate_dataframe_spark.core import manifest as mf
    from legate_dataframe_spark.pipeline.takedown import (
        export_certified_shards,
        takedown_from_export,
    )

    out = str(tmp_path / "export")
    df = (spark.range(0, 100)
          .select(F.when(F.col("id") % 10 == 3, F.lit(None))
                  .otherwise(F.col("id")).alias("doc_id"),
                  F.concat(F.lit("doc-"), F.col("id")).alias("text"))
          .repartition(2))
    rows = export_certified_shards(spark, df, out,
                                   max_records_per_file=50,
                                   bloom_col="doc_id")
    res = takedown_from_export(spark, out, [4, 44, 84])
    assert res["rows_removed"] == 3
    back = mf.read_from_manifest(spark, out, sorted(
        mf.dir_file_rows(out)))
    assert back.count() == 97
    assert back.filter(F.col("doc_id").isNull()).count() == 10
    # and no staging litter survives inside the export directory
    assert not [p for p in os.listdir(out) if "ldf_tk_stage" in p]
    assert rows  # export itself succeeded


# ---------- _now_stamp under a zoneinfo-unparseable session TZ ----
def test_now_stamp_spark_fallback_matches_session_zone(spark):
    """Spark accepts zone ids zoneinfo rejects (three-letter CST);
    the fallback must format via Spark itself so the naive stamp,
    parsed back in the SESSION zone, reads as 'now' — a local-zone
    fallback would reintroduce the AS-OF future-stamp skew."""
    import zoneinfo

    from legate_dataframe_spark.core.bucketing import (
        _now_stamp,
        _session_tz,
    )

    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "CST")
    try:
        with pytest.raises(Exception):
            _session_tz(spark)  # the fallback path really triggers
        assert "CST" not in zoneinfo.available_timezones()
        stamp = _now_stamp(spark)
        skew = spark.sql(
            f"SELECT abs(unix_micros(current_timestamp()) - "
            f"unix_micros(to_timestamp('{stamp}'))) / 1e6"
        ).first()[0]
        assert skew < 120, f"stamp {stamp} skewed {skew}s in CST"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
