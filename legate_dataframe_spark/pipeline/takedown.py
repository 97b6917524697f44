"""Cross-state document TAKEDOWN orchestration.

Each serving state has its own delete primitive
(dedup.delete_from_minhash_index, text.delete_from_bm25_index,
components.delete_from_components_index), each individually
documented and driver-verified — but a real takedown (GDPR erasure,
a copyright claim, a contaminated shard) is a PLATFORM operation: it
must hit every index the document reached, plus every RETAINED
snapshot that still contains it, or the document stays servable
through whichever surface was forgotten.  This module is the one-call
form of that operation:

- :func:`takedown_documents` runs the per-state deletes in the
  documented safe order — minhash index first (future dedup gates
  stop matching the ids), the components labelling second (its
  bounded re-cluster reads near-dup pairs from the POST-delete
  minhash index), BM25 last (independent of both) — with
  ``keep_old=True`` on every delete so a failure mid-cascade leaves
  each state's pre-delete snapshot intact for forensics/retry; only
  after EVERY delete has committed does the takedown-compliant
  vacuum retire the retained pre-delete generations (a
  state-by-state vacuum interleaved with the deletes would destroy
  the rollback evidence while later deletes could still fail).
- :func:`retained_occurrences` audits the result: one row per
  (state view, retained generation) with the count of rows still
  matching the taken-down ids — zero everywhere is the compliance
  certificate, and it is checked over EVERY retained generation,
  not just the live one (a retained pre-delete snapshot is exactly
  where a "deleted" document hides).

Scale shape: every per-state delete is the broadcast-anti-join
rewrite its own module documents (O(index), batched like
compaction); the vacuum is a catalog drop per generation; the audit
is one semi-join count per retained generation against the broadcast
id list — nothing corpus-sized moves.

The reference has no persisted-index lifecycle to mirror (its Python
layer is a Polars-IR evaluator, python/legate_dataframe; no storage);
this is the platform operation a 100 TB training-data deployment
performs under a deletion request.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def takedown_documents(
    spark: SparkSession,
    doc_ids: DataFrame,
    minhash_prefix: str | None = None,
    components_labels: str | None = None,
    pairs_among: Callable[[DataFrame], DataFrame] | None = None,
    bm25_prefix: str | None = None,
    num_buckets: int = 16,
    vacuum: bool = True,
) -> list[str]:
    """Delete ``doc_ids`` (1-column frame) from every named serving
    state, then (``vacuum=True``) retire all pre-delete generations of
    every touched view with the takedown-compliant
    ``vacuum_generations(keep_last=1)``.  Returns the view names
    touched, in delete order.  ``components_labels`` requires
    ``pairs_among`` (the restricted pair source its bounded
    re-cluster reads — pass the post-delete minhash index's
    ``minhash_pairs_from_index(..., restrict_ids=…)``)."""
    from legate_dataframe_spark.core.bucketing import vacuum_generations
    from legate_dataframe_spark.pipeline import components, dedup, text

    if components_labels is not None and pairs_among is None:
        raise ValueError(
            "components_labels requires pairs_among — the bounded "
            "re-cluster needs a pair source over the survivors")
    # the id frame is consumed by up to four anti-joins and the audit;
    # freeze it once so every consumer broadcasts the same tiny list
    ids = doc_ids.localCheckpoint(eager=True)
    views: list[str] = []
    if minhash_prefix is not None:
        dedup.delete_from_minhash_index(
            spark, ids, minhash_prefix, num_buckets=num_buckets,
            keep_old=True)
        views += [f"{minhash_prefix}_shingles", f"{minhash_prefix}_bands"]
    if components_labels is not None:
        components.delete_from_components_index(
            spark, ids, components_labels, pairs_among,
            num_buckets=num_buckets, keep_old=True)
        views.append(components_labels)
    if bm25_prefix is not None:
        text.delete_from_bm25_index(
            spark, ids, bm25_prefix, num_buckets=num_buckets,
            keep_old=True)
        views.append(f"{bm25_prefix}_postings")
    if vacuum:
        for v in views:
            vacuum_generations(spark, v, keep_last=1)
    return views


def retained_occurrences(
    spark: SparkSession,
    states: Mapping[str, str] | Sequence[tuple[str, str]],
    doc_ids: DataFrame,
) -> DataFrame:
    """Compliance audit: for every (view, id column) in ``states`` and
    every RETAINED generation of that view, count the rows whose id
    column matches ``doc_ids``.  Returns (state, generation,
    n_matching) — all-zero ``n_matching`` is the takedown
    certificate.  Each count is a broadcast semi-join against the id
    list over one co-located bucketed snapshot; the audit never
    shuffles state."""
    from legate_dataframe_spark.core.bucketing import (
        list_generations,
        read_generation,
    )

    items = states.items() if isinstance(states, Mapping) else states
    ids = doc_ids.toDF("__td_id").localCheckpoint(eager=True)
    parts = []
    for view, id_col in items:
        for g in list_generations(spark, view):
            snap = read_generation(spark, view, g)
            parts.append(
                snap.join(F.broadcast(ids),
                          snap[id_col] == ids["__td_id"], "left_semi")
                .agg(F.count(F.lit(1)).alias("n_matching"))
                .select(F.lit(view).alias("state"),
                        F.lit(g).cast("long").alias("generation"),
                        "n_matching"))
    if not parts:
        raise ValueError("no retained generations to audit")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
