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
