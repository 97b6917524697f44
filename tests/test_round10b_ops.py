"""Round-10 continuation units: apply_diff (CDF consumer), bloom
manifests (equality pruning), takedown orchestration contracts.

The four registry entries (cdf_apply_roundtrip, manifest_bloom_lookup,
takedown_cascade, swap_contention) are covered end-to-end by the
oracle-parity sweep; these tests pin the primitives' edge semantics
the entries don't reach."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legate_dataframe_spark.core import manifest as mf
from legate_dataframe_spark.core.bucketing import apply_diff


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# --------------------------------------------------------- apply_diff
def test_apply_diff_all_three_classes(spark):
    base = _df(spark, [("a", 1, 10), ("b", 2, 20), ("c", 3, 30)],
               "k string, n long, s long")
    diff = _df(spark, [
        ("b", "update", 2, 20, 5, 50),
        ("c", "delete", 3, 30, None, None),
        ("d", "insert", None, None, 7, 70),
    ], "k string, change_type string, old_n long, old_s long, "
       "new_n long, new_s long")
    got = {tuple(r) for r in
           apply_diff(base, diff, ["k"], ["n", "s"]).collect()}
    assert got == {("a", 1, 10), ("b", 5, 50), ("d", 7, 70)}


def test_apply_diff_across_schema_boundary(spark):
    # base LACKS the added column; unchanged rows keep NULL, updated
    # rows take the diff's new value — the null-filled-recompute law
    base = _df(spark, [("a", 1), ("b", 2)], "k string, n long")
    diff = _df(spark, [
        ("b", "update", 2, None, 2, 9),
    ], "k string, change_type string, old_n long, old_extra long, "
       "new_n long, new_extra long")
    got = {tuple(r) for r in
           apply_diff(base, diff, ["k"], ["n", "extra"]).collect()}
    assert got == {("a", 1, None), ("b", 2, 9)}


def test_apply_diff_refuses_untracked_columns(spark):
    base = _df(spark, [("a", 1, 99)], "k string, n long, rogue long")
    diff = _df(spark, [], "k string, change_type string, old_n long, "
                          "new_n long")
    with pytest.raises(ValueError, match="rogue"):
        apply_diff(base, diff, ["k"], ["n"])


def test_apply_diff_inverts_generation_diff(spark, tmp_path):
    # producer/consumer law on a real versioned table
    from legate_dataframe_spark.core.bucketing import (
        generation_diff,
        init_versioned,
        read_generation,
        swap_versioned,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS t10b_roundtrip "
              f"LOCATION '{tmp_path}/db'")
    try:
        v = "t10b_roundtrip.s"
        g0 = _df(spark, [(1, 10), (2, 20), (3, 30)], "k long, v long")
        g1 = _df(spark, [(1, 10), (2, 99), (4, 40)], "k long, v long")
        init_versioned(spark, g0, v, ["k"], num_buckets=4)
        swap_versioned(spark, g1, v, ["k"], num_buckets=4,
                       keep_old=True)
        diff = generation_diff(spark, v, 0, 1, ["k"], ["v"])
        recon = apply_diff(read_generation(spark, v, 0), diff,
                           ["k"], ["v"])
        assert ({tuple(r) for r in recon.collect()}
                == {tuple(r) for r in
                    read_generation(spark, v, 1).collect()})
    finally:
        spark.sql("DROP DATABASE IF EXISTS t10b_roundtrip CASCADE")


# ----------------------------------------------------- bloom manifest
def test_bloom_manifest_bucket_derivation_and_lookup(spark, tmp_path):
    """Every recorded bucket_id must equal pmod(F.hash(key), n) for
    every key in that file — the invariant point_lookup_candidates'
    probe-side recomputation rides on — and a full-key probe set must
    find every key with zero misses."""
    spark.sql("CREATE DATABASE IF NOT EXISTS t10b_bloom "
              f"LOCATION '{tmp_path}/db'")
    try:
        t = "t10b_bloom.t"
        nb = 4
        d = spark.range(200).select(F.col("id").alias("k"))
        (d.repartition(nb, "k").write.format("parquet")
         .bucketBy(nb, "k").sortBy("k").saveAsTable(t))
        mf.write_manifest(spark, t, generation=0, bloom_col="k")
        man = spark.table(mf.manifest_table(t)).collect()
        assert all(r["bloom"] is not None for r in man)
        # recorded bucket_id == Spark's hash assignment, per file
        for r in man:
            keys = (spark.read.parquet(f"file:{r['file']}")
                    .select(F.pmod(F.hash("k"), F.lit(nb))
                            .cast("int").alias("b"))
                    .distinct().collect())
            assert {x["b"] for x in keys} == {r["bucket_id"]}
        cand = mf.point_lookup_candidates(spark, t, d, "k",
                                          num_buckets=nb)
        found = cand.select("k").distinct().count()
        assert found == 200  # zero false negatives, ever
    finally:
        spark.sql("DROP DATABASE IF EXISTS t10b_bloom CASCADE")


def test_point_lookup_refuses_bloomless_manifest(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS t10b_nobloom "
              f"LOCATION '{tmp_path}/db'")
    try:
        t = "t10b_nobloom.t"
        d = spark.range(50).select(F.col("id").alias("k"))
        (d.repartition(2, "k").write.format("parquet")
         .bucketBy(2, "k").sortBy("k").saveAsTable(t))
        mf.write_manifest(spark, t, generation=0)  # no bloom_col
        with pytest.raises(ValueError, match="bloom"):
            mf.point_lookup_candidates(spark, t, d.limit(1), "k",
                                       num_buckets=2)
    finally:
        spark.sql("DROP DATABASE IF EXISTS t10b_nobloom CASCADE")


# ------------------------------------------------ takedown contracts
def test_takedown_requires_pair_source(spark):
    from legate_dataframe_spark.pipeline.takedown import (
        takedown_documents,
    )

    ids = spark.range(1).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="pairs_among"):
        takedown_documents(spark, ids, components_labels="x.labels")


def test_retained_occurrences_empty_states_raises(spark):
    from legate_dataframe_spark.pipeline.takedown import (
        retained_occurrences,
    )

    ids = spark.range(1).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="no retained"):
        retained_occurrences(spark, {}, ids)


# ------------------------------------------- substring dup spans
def test_substring_dup_spans_known_overlap(spark):
    from legate_dataframe_spark.pipeline.dedup import substring_dup_spans

    shared = "one two three four"  # 4 tokens, k=3 → 2 shared 3-grams
    docs = _df(spark, [
        (1, f"alpha {shared} beta"),        # 6 tokens
        (2, f"gamma delta {shared}"),       # 6 tokens
        (3, "totally unrelated text here"),  # 4 tokens, no overlap
        (4, "ab"),                           # 1 token < k → no kgrams
    ], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["covered_tokens"],
                         r["dup_ratio"])
           for r in substring_dup_spans(docs, k=3).collect()}
    # doc 1: shared 3-grams start at pos 2 and 3 → cover tokens 2..5
    assert got[1] == (6, 4, round(4 / 6, 6))
    # doc 2: shared 3-grams start at pos 3 and 4 → cover tokens 3..6
    assert got[2] == (6, 4, round(4 / 6, 6))
    assert got[3] == (4, 0, 0.0)
    assert got[4] == (1, 0, 0.0)


def test_substring_dup_spans_within_doc_repeat_not_counted(spark):
    # the signal is CROSS-document: a doc repeating its own phrase
    # (count>1, distinct docs==1) must not self-flag
    from legate_dataframe_spark.pipeline.dedup import substring_dup_spans

    docs = _df(spark, [(1, "x y z x y z"), (2, "p q r")],
               "doc_id long, text string")
    got = {r["doc_id"]: r["covered_tokens"]
           for r in substring_dup_spans(docs, k=3).collect()}
    assert got == {1: 0, 2: 0}


# --------------------------------- manifest opts ride the write API
def test_versioned_writes_carry_bloom_manifest(spark, tmp_path):
    from legate_dataframe_spark.core.bucketing import (
        append_versioned,
        init_versioned,
        swap_versioned,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS t10b_mopts "
              f"LOCATION '{tmp_path}/db'")
    try:
        v = "t10b_mopts.s"
        opts = {"bloom_col": "k"}
        d = spark.range(40).select(F.col("id").alias("k"))
        init_versioned(spark, d.filter(F.col("k") < 20), v, ["k"],
                       num_buckets=2, manifest=opts)
        append_versioned(spark,
                         d.filter(F.col("k") >= 20).repartition(2, "k"),
                         v, ["k"], num_buckets=2, manifest=opts)
        cand = mf.point_lookup_candidates(spark, v, d, "k",
                                          num_buckets=2, generation=0)
        assert cand.select("k").distinct().count() == 40
        # swap (compaction) re-records blooms for the new generation
        swap_versioned(spark, spark.table(v), v, ["k"], num_buckets=2,
                       manifest=opts)
        cand2 = mf.point_lookup_candidates(spark, v, d, "k",
                                           num_buckets=2, generation=1)
        assert cand2.select("k").distinct().count() == 40
    finally:
        spark.sql("DROP DATABASE IF EXISTS t10b_mopts CASCADE")


def test_apply_diff_empty_diff_is_identity(spark):
    base = _df(spark, [("a", 1), ("b", 2)], "k string, n long")
    diff = _df(spark, [], "k string, change_type string, old_n long, "
                          "new_n long")
    got = {tuple(r) for r in apply_diff(base, diff, ["k"], ["n"]).collect()}
    assert got == {("a", 1), ("b", 2)}


def test_apply_diff_all_deletes_empties_state(spark):
    base = _df(spark, [("a", 1), ("b", 2)], "k string, n long")
    diff = _df(spark, [("a", "delete", 1, None), ("b", "delete", 2, None)],
               "k string, change_type string, old_n long, new_n long")
    assert apply_diff(base, diff, ["k"], ["n"]).count() == 0


def test_apply_diff_composite_keys(spark):
    base = _df(spark, [("a", 1, 10), ("a", 2, 20), ("b", 1, 30)],
               "k1 string, k2 long, n long")
    diff = _df(spark, [
        ("a", 2, "update", 20, 99),
        ("b", 1, "delete", 30, None),
        ("c", 3, "insert", None, 7),
    ], "k1 string, k2 long, change_type string, old_n long, new_n long")
    got = {tuple(r) for r in
           apply_diff(base, diff, ["k1", "k2"], ["n"]).collect()}
    assert got == {("a", 1, 10), ("a", 2, 99), ("c", 3, 7)}


# ----------------------------------------------- AS-OF time travel
def test_read_asof_timeline_and_vacuum_pruning(spark, tmp_path):
    from legate_dataframe_spark.core.bucketing import (
        init_versioned,
        read_asof,
        swap_versioned,
        vacuum_generations,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS t10b_asof "
              f"LOCATION '{tmp_path}/db'")
    try:
        v = "t10b_asof.s"
        init_versioned(spark, _df(spark, [(1, 10)], "k long, n long"),
                       v, ["k"], num_buckets=2,
                       committed_at="2024-01-01 00:00:00")
        swap_versioned(spark, _df(spark, [(1, 10), (2, 20)],
                                  "k long, n long"),
                       v, ["k"], num_buckets=2, keep_old=True,
                       committed_at="2024-01-10 00:00:00")
        # between the two commits → generation 0
        assert read_asof(spark, v, "2024-01-05 00:00:00").count() == 1
        # exactly AT a commit → that generation (inclusive bound)
        assert read_asof(spark, v, "2024-01-10 00:00:00").count() == 2
        # before history → clean error
        with pytest.raises(ValueError, match="at or before"):
            read_asof(spark, v, "2023-12-31 00:00:00")
        # vacuum prunes the timeline with the snapshot
        assert vacuum_generations(spark, v, keep_last=1) == [0]
        with pytest.raises(ValueError, match="at or before"):
            read_asof(spark, v, "2024-01-05 00:00:00")
        assert read_asof(spark, v, "2024-02-01 00:00:00").count() == 2
    finally:
        spark.sql("DROP DATABASE IF EXISTS t10b_asof CASCADE")


def test_init_versioned_restarts_commit_timeline(spark, tmp_path):
    from legate_dataframe_spark.core.bucketing import (
        init_versioned,
        read_asof,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS t10b_asof2 "
              f"LOCATION '{tmp_path}/db'")
    try:
        v = "t10b_asof2.s"
        init_versioned(spark, _df(spark, [(1, 1)], "k long, n long"),
                       v, ["k"], num_buckets=2,
                       committed_at="2024-01-01 00:00:00")
        # REBUILD: the old timeline must not leak into the new one
        init_versioned(spark, _df(spark, [(1, 1), (2, 2)],
                                  "k long, n long"),
                       v, ["k"], num_buckets=2,
                       committed_at="2024-03-01 00:00:00")
        with pytest.raises(ValueError, match="at or before"):
            read_asof(spark, v, "2024-01-15 00:00:00")
        assert read_asof(spark, v, "2024-03-02 00:00:00").count() == 2
    finally:
        spark.sql("DROP DATABASE IF EXISTS t10b_asof2 CASCADE")


# ----------------------------------------------- shard export helper
def test_dir_file_rows_counts_footers(spark, tmp_path):
    out = str(tmp_path / "shards")
    (spark.range(100).repartition(2)
     .write.option("maxRecordsPerFile", "30").parquet(out))
    rows = mf.dir_file_rows(out)
    assert sum(rows.values()) == 100
    assert all(n <= 30 for n in rows.values())


def test_vacuum_older_than_time_policy(spark, tmp_path):
    from legate_dataframe_spark.core.bucketing import (
        init_versioned,
        list_generations,
        swap_versioned,
        vacuum_generations,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS t10b_expire "
              f"LOCATION '{tmp_path}/db'")
    try:
        v = "t10b_expire.s"
        init_versioned(spark, _df(spark, [(1, 1)], "k long, n long"),
                       v, ["k"], num_buckets=2,
                       committed_at="2024-01-01 00:00:00")
        for i, ts in enumerate(["2024-01-10 00:00:00",
                                "2024-01-20 00:00:00"]):
            swap_versioned(spark,
                           _df(spark, [(1, 1), (2 + i, 2)],
                               "k long, n long"),
                           v, ["k"], num_buckets=2, keep_old=True,
                           committed_at=ts)
        # count policy alone would drop g0; time policy says only
        # generations committed before Jan 5 may go → exactly g0
        assert vacuum_generations(spark, v, keep_last=1,
                                  older_than="2024-01-05 00:00:00") \
            == [0]
        # nothing else is old enough — a second time-bounded vacuum
        # is a no-op even though keep_last=1 would drop g1
        assert vacuum_generations(spark, v, keep_last=1,
                                  older_than="2024-01-05 00:00:00") \
            == []
        assert list_generations(spark, v) == [1, 2]
    finally:
        spark.sql("DROP DATABASE IF EXISTS t10b_expire CASCADE")


def test_vacuum_older_than_requires_timeline(spark, tmp_path):
    from legate_dataframe_spark.core.bucketing import (
        init_versioned,
        vacuum_generations,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS t10b_expire2 "
              f"LOCATION '{tmp_path}/db'")
    try:
        v = "t10b_expire2.s"
        init_versioned(spark, _df(spark, [(1, 1)], "k long, n long"),
                       v, ["k"], num_buckets=2)
        # r11: every publish default-stamps, so a missing timeline
        # only exists on LEGACY state — simulate one by dropping it
        spark.sql(f"DROP TABLE IF EXISTS {v}__commits")
        with pytest.raises(ValueError, match="stamped timeline"):
            vacuum_generations(spark, v, keep_last=1,
                               older_than="2024-01-05 00:00:00")
    finally:
        spark.sql("DROP DATABASE IF EXISTS t10b_expire2 CASCADE")


# ------------------------------------- substring index lifecycle
def test_substring_index_gate_matches_full_recompute(spark, tmp_path):
    from legate_dataframe_spark.pipeline.dedup import (
        batch_substring_spans,
        build_substring_index,
        substring_dup_spans,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS t10b_ssidx "
              f"LOCATION '{tmp_path}/db'")
    try:
        corpus = _df(spark, [
            (1, "a b c d e f"),
            (2, "z y x w v u"),
        ], "doc_id long, text string")
        # batch doc 10 shares a run with corpus doc 1; batch docs 11
        # and 12 share a run only with EACH OTHER (intra-batch)
        batch = _df(spark, [
            (10, "q q a b c d q"),
            (11, "m n o p r s"),
            (12, "t m n o p h"),
        ], "doc_id long, text string")
        build_substring_index(spark, corpus, "t10b_ssidx.i", k=3,
                              num_buckets=2)
        got = {r["doc_id"]: (r["n_tokens"], r["covered_tokens"])
               for r in batch_substring_spans(
                   spark, batch, "t10b_ssidx.i", k=3).collect()}
        full = {r["doc_id"]: (r["n_tokens"], r["covered_tokens"])
                for r in substring_dup_spans(
                    corpus.unionByName(batch), k=3).collect()
                if r["doc_id"] >= 10}
        assert got == full
        assert got[10][1] > 0 and got[11][1] > 0  # both classes fire
    finally:
        spark.sql("DROP DATABASE IF EXISTS t10b_ssidx CASCADE")
