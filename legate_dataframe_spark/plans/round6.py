"""Round-6 driver queries (VERDICT r05 "Next round" tasks 6–8).

Three production-shape capabilities, each with a DuckDB oracle:

- ``incremental_components`` — the cluster-assignment twin of r05's
  ``incremental_dedup``: merge a daily batch's near-dup edges into a
  persisted, bucketed component-label table without recomputing
  components over the full corpus (pipeline/components.py
  ``build_components_index`` / ``incremental_components_update``).
- ``ann_persisted_search`` — the search-side twin: serve IVF ANN off
  a bucketBy-persisted catalog index (centroids + assignments)
  without re-training/re-assigning in-query
  (pipeline/similarity.py ``build_ivf_index`` /
  ``ivf_search_persisted``).
- ``compaction_roundtrip`` — driver row for the last sink-only
  surface, ``sources/parquet.py::compact_parquet_dir``: fragment a
  table on purpose, compact it, prove the read-back aggregate is
  lossless and the file count actually shrank.

Catalog hygiene follows round5.py: uuid-suffixed session-temp
databases, dropped (CASCADE) with their tempdir before returning,
results materialized eagerly so no lazy /tmp dependency escapes.
"""

from __future__ import annotations

import contextlib
import glob
import io
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from legate_dataframe_spark.plans.pipeline_queries import (
    _BANDS,
    _NUM_HASHES,
    DEDUP_CLUSTERS_SQL,
)
from legate_dataframe_spark.plans.relational import load_table


def _plan_of(df: DataFrame, mode: str = "simple") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@contextlib.contextmanager
def _temp_db(spark: SparkSession, stem: str):
    """uuid-suffixed session-temp database (ADVICE r05: fixed names +
    DROP CASCADE clobber concurrent runs sharing a warehouse)."""
    db = f"{stem}_{uuid.uuid4().hex[:8]}"
    loc = tempfile.mkdtemp(prefix=f"{stem}_")
    spark.sql(f"CREATE DATABASE {db} LOCATION '{loc}'")
    try:
        yield db
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(loc, ignore_errors=True)


# =================================================== incremental components
def incremental_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dup-CLUSTER maintenance against persisted state —
    closes the gap VERDICT r05 named after incremental_dedup landed:
    a daily batch no longer needs full-corpus ``dedup_clusters`` to
    get cluster ids.

    Split (same as incremental_dedup): doc_id % 10 != 0 is the
    standing corpus, the rest today's batch.  Build phase (paid once
    in production): corpus minhash index + corpus component labels
    bucketed on node.  Batch phase: cross pairs from the persisted
    minhash index, batch-internal pairs from batch-only LSH, then
    ``incremental_components_update`` merges them into the label
    table touching only batch edges and collided clusters.

    The oracle is batch-over-union equivalence stated maximally: the
    output must equal a FULL-corpus components recompute over all
    documents' near-dup pairs (DEDUP_CLUSTERS_SQL verbatim).

    In-query plan assertion (round5.py's pattern): the label-table
    anti-join must read its co-located buckets (``Bucketed: true``) —
    at 100 TB the corpus-sized label table never shuffles; only the
    contracted batch-side graph moves.
    """
    from legate_dataframe_spark.pipeline import dedup
    from legate_dataframe_spark.pipeline.components import (
        build_components_index,
        incremental_components_update,
    )

    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)

    with _temp_db(spark, "ldf_r6_comp") as db:
        # ---- build phase (amortized at scale; in-query for the gate).
        # Corpus pairs come OFF the just-built index (the band-table
        # self-join runs on its own bucket key — zero Exchange), so
        # the corpus is tokenized/minhashed exactly once.
        dedup.build_minhash_index(spark, corpus, f"{db}.corpus",
                                  num_hashes=_NUM_HASHES, bands=_BANDS)
        corpus_pairs = dedup.minhash_pairs_from_index(
            spark, f"{db}.corpus",
            jaccard_threshold=0.5).select("id_a", "id_b")
        build_components_index(spark, corpus_pairs, f"{db}.labels")
        # ---- batch phase
        cross = (dedup.incremental_minhash_dedup(
            spark, batch, f"{db}.corpus", num_hashes=_NUM_HASHES,
            bands=_BANDS, jaccard_threshold=0.5)
            .select("corpus_id", "batch_id"))
        bpairs = dedup.minhash_lsh_pairs(
            batch, num_hashes=_NUM_HASHES, bands=_BANDS,
            jaccard_threshold=0.5).select("id_a", "id_b")
        out = incremental_components_update(spark, f"{db}.labels",
                                            cross, bpairs)
        plan = _plan_of(out, "formatted")
        if "Bucketed: true" not in plan:
            raise AssertionError(
                "incremental components did not read the label table "
                f"bucket-aware:\n{plan}")
        return (out.select(F.col("node").alias("doc_id"),
                           F.col("component").alias("canonical_id"))
                .localCheckpoint(eager=True))


# the maximal statement of correctness: incremental maintenance must
# reproduce the full-corpus recompute bit-for-bit
INCREMENTAL_COMPONENTS_SQL = DEDUP_CLUSTERS_SQL


# ===================================================== persisted ANN index
def ann_persisted_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN served off a PERSISTED catalog index — the production
    serving shape (VERDICT r05 task 7: every in-query ANN entry
    rebuilds its index per run).  Build phase (paid once): assign the
    corpus to the 8 fixed centroids and bucketBy-persist assignments
    on centroid_id + the centroid table.  Serve phase: probe the 2
    nearest centroids per query and exact-rerank inside the probed
    clusters, reading the assignment table's co-located buckets.

    Broadcast is disabled (and restored) around the serve so the
    probe join plans the same bucket-aware SMJ at gate scale as at
    100 TB, and the plan assertion pins it: the assignment scan must
    be ``Bucketed: true`` with no corpus-side Exchange (the corpus is
    neither re-assigned nor re-shuffled at search time; only the tiny
    probe side moves).  With broadcast left on, AQE ships the probe
    side instead — also zero corpus shuffle, so production keeps AQE.

    Values are identical to the in-query ``ann_ivf_search`` over the
    same fixed centroids — persisting through parquet is lossless —
    so the oracle is that query's SQL verbatim.
    """
    from legate_dataframe_spark.pipeline.similarity import (
        build_ivf_index,
        ivf_search_persisted,
    )

    e = load_table(spark, sf_dir, "embeddings")
    cen = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding")
    q = e.filter(F.col("vec_id") % 50 == 0)

    with _temp_db(spark, "ldf_r6_ann") as db:
        build_ivf_index(spark, e, cen, f"{db}.ivf")
        prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            out = ivf_search_persisted(spark, q, f"{db}.ivf",
                                       k=5, n_probe=2)
            plan = _plan_of(out, "formatted")
            if "Bucketed: true" not in plan:
                raise AssertionError(
                    "persisted ANN search did not read the assignment "
                    f"table bucket-aware:\n{plan}")
            return out.localCheckpoint(eager=True)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)


def _ann_persisted_sql() -> str:
    from legate_dataframe_spark.plans.pipeline_queries import (
        ANN_IVF_SEARCH_SQL,
    )

    return ANN_IVF_SEARCH_SQL


ANN_PERSISTED_SEARCH_SQL = _ann_persisted_sql()


# ====================================================== parquet compaction
def compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver row for ``compact_parquet_dir`` (the last sink-only
    surface, VERDICT r05 task 8): write events deliberately
    fragmented (64 files), compact to ~256 MB targets (→ far fewer
    files at gate scale), read back and aggregate.  The query asserts
    the compaction actually reduced the file count; the oracle runs
    the same aggregate over the ORIGINAL events view, so a green row
    proves the rewrite is lossless.

    The value sum is integerized per row (Σ round(value·1e6) as
    BIGINT) — per-row rounding is engine-deterministic and integer
    sums are order-invariant, so the hash can't flap on summation
    order (knn_classify's r05 lesson applied at birth instead of
    after a red).
    """
    from legate_dataframe_spark.sources.parquet import compact_parquet_dir

    ev = load_table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="ldf_r6_compact_")
    src = os.path.join(tmp, "frag")
    dst = os.path.join(tmp, "compact")
    try:
        ev.repartition(64).write.parquet(src)
        n_src = len([f for f in glob.glob(os.path.join(src, "part-*"))
                     if os.path.isfile(f)])
        n_out = compact_parquet_dir(spark, src, dst, target_mb=256,
                                    cluster_by=["ts"])
        if n_out >= n_src:
            raise AssertionError(
                f"compaction did not reduce file count: {n_src} → {n_out}")
        back = spark.read.parquet(dst)
        out = (back.groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("n_events"),
                    F.sum(F.round(F.col("value") * 1e6).cast("long"))
                    .alias("value_micro_sum"),
                    F.min("event_id").alias("min_event"),
                    F.max("event_id").alias("max_event"),
                    F.max("ts").alias("max_ts"))
               .localCheckpoint(eager=True))
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


COMPACTION_ROUNDTRIP_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
         AS value_micro_sum,
       min(event_id) AS min_event,
       max(event_id) AS max_event,
       max(ts) AS max_ts
FROM events
GROUP BY event_type
"""
