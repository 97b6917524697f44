"""Round-11 queries — the corpus-rewrite and platform-default set.

- ``substring_span_removal`` — the DEDUPLICATED CORPUS itself: every
  document's text with cross-document duplicated spans cut (Lee et
  al., arXiv:2107.06499 §4 rewrite the corpus; r10 shipped only the
  dup_ratio SIGNAL).  Removed-token accounting reconciles exactly
  with the signal, asserted in-query and oracle-checked.

- ``substring_span_removal_raw`` — the BYTE-preserving form: the
  same cut-span set (case-insensitive detection), but original case
  and inner whitespace survive inside kept runs; lowercase+collapse
  of its output must reproduce the normalized variant (the
  raw↔normalized reconciliation law, asserted in-query).

- ``dup_span_intervals`` — the removal AUDIT MAP: merged cut
  intervals per document (islands over the covered-position set),
  with the k-guard / contiguity / non-overlap laws asserted.

- ``incremental_span_removal`` — the INGEST-time cut: batch
  documents cleaned against corpus ∪ batch off the persisted k-gram
  index, state side read in place (plan-asserted bucketed).

- ``asof_unstamped_default`` — AS-OF time travel over a state whose
  writes never passed ``committed_at``: r11 default-stamps every
  publish with the engine clock, so time travel is a property of the
  platform, not of diligent callers (VERDICT r10 task 3).

- ``stream_cdf_apply_chain`` — the cross-system MIRROR story: a
  foreachBatch drain applies successive generation_diffs to a
  replica state; after every trigger the replica must equal the
  source exactly, with per-trigger work change-sized (the diff), not
  state-sized (VERDICT r10 task 8).

Catalog hygiene matches rounds 7–10: uuid-suffixed session-temp
databases dropped (CASCADE) before returning.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from legate_dataframe_spark.plans.relational import load_table
from legate_dataframe_spark.plans.round10b import _MICRO_SQL, _temp_db


# ===================== substring span REMOVAL (the cleaned corpus)
def substring_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-rewrite operator a training pipeline actually runs:
    per document, the whitespace-normalized text with every token
    position covered by a cross-document duplicated 8-gram CUT
    (adjacent/overlapping spans merge by position-set construction;
    8 tokens is the minimum-span guard).  In-query laws asserted
    before returning: removed + kept == n_tokens on every row, and
    the cleaned text's own token count equals kept_tokens (an
    off-by-one in the rebuild, a dropped separator, or an unsorted
    collect would flip it).  The oracle reconstructs the cut text
    independently in DuckDB — string_agg ordered by position over the
    anti-joined token stream — so the value hash covers the TEXT
    itself, not just the accounting."""
    from legate_dataframe_spark.pipeline.dedup import remove_dup_spans

    d = load_table(spark, sf_dir, "documents")
    out = remove_dup_spans(d, k=8).localCheckpoint(eager=True)
    bad = out.filter(
        (F.col("removed_tokens") + F.col("kept_tokens")
         != F.col("n_tokens"))
        | ~((F.col("kept_tokens") == 0) & (F.col("text_clean") == "")
            | (F.size(F.split(F.col("text_clean"), " "))
               == F.col("kept_tokens")))).count()
    if bad:
        raise AssertionError(
            f"{bad} row(s) break the span-removal accounting laws "
            f"(removed+kept==n_tokens; token count of text_clean == "
            f"kept_tokens)")
    return out


SUBSTRING_SPAN_REMOVAL_SQL = r"""
WITH tokens AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
  FROM documents),
kg AS (
  SELECT doc_id, i AS pos, md5(array_to_string(ts[i:i+7], ' ')) AS dig
  FROM tokens, unnest(generate_series(1, greatest(len(ts)-7, 0))) AS u(i)),
dup AS (SELECT dig FROM kg GROUP BY dig HAVING count(DISTINCT doc_id) > 1),
cover AS (
  SELECT DISTINCT kg.doc_id, kg.pos + o.off AS t
  FROM kg JOIN dup USING (dig), unnest(generate_series(0, 7)) AS o(off)),
tok AS (
  SELECT doc_id, i AS pos, ts[i] AS tok
  FROM tokens, unnest(generate_series(1, len(ts))) AS u(i)),
kept AS (
  SELECT t.doc_id, t.pos, t.tok
  FROM tok t LEFT JOIN cover c ON c.doc_id = t.doc_id AND c.t = t.pos
  WHERE c.doc_id IS NULL),
clean AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean
  FROM kept GROUP BY doc_id),
cov AS (SELECT doc_id, count(*) AS removed FROM cover GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(t.ts) AS BIGINT) AS n_tokens,
       CAST(coalesce(cov.removed, 0) AS BIGINT) AS removed_tokens,
       CAST(len(t.ts) - coalesce(cov.removed, 0) AS BIGINT)
         AS kept_tokens,
       round(coalesce(cov.removed, 0) / len(t.ts), 6) AS dup_ratio,
       coalesce(clean.text_clean, '') AS text_clean
FROM tokens t
LEFT JOIN cov USING (doc_id)
LEFT JOIN clean USING (doc_id)
"""


# ===================== raw (byte-preserving) span removal
def substring_span_removal_raw(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The corpus rewrite a production pipeline actually ships:
    duplicated spans cut from the ORIGINAL text — case and inner
    whitespace byte-preserved inside kept runs, each cut collapsing
    to one space (the normalized variant lowercases the whole corpus,
    which is destructive; Lee et al.'s tool cuts raw bytes).
    Detection stays case-insensitive (lowercased k-gram digests), so
    the cut-span SET matches the normalized operator exactly — the
    reconciliation law asserted in-query: lowercasing and
    whitespace-collapsing ``text_clean_raw`` must reproduce the
    normalized ``text_clean`` doc for doc, and the per-doc accounting
    must agree.  Oracle: the identical raw rebuild in DuckDB
    (separator-aware ordered string_agg over the kept token runs)."""
    from legate_dataframe_spark.pipeline.dedup import (
        remove_dup_spans,
        remove_dup_spans_raw,
    )

    d = load_table(spark, sf_dir, "documents")
    raw = remove_dup_spans_raw(d, k=8).localCheckpoint(eager=True)
    norm = remove_dup_spans(d, k=8).select(
        "doc_id", F.col("removed_tokens").alias("norm_removed"),
        F.col("text_clean").alias("norm_clean"))
    renorm = F.lower(F.regexp_replace(F.col("text_clean_raw"),
                                      r"\s+", " "))
    bad = (raw.join(norm, "doc_id")
           .filter((F.col("removed_tokens") != F.col("norm_removed"))
                   | (renorm != F.col("norm_clean"))).count())
    if bad:
        raise AssertionError(
            f"{bad} doc(s) break the raw↔normalized reconciliation "
            f"law (same cut set, byte-preserving rebuild)")
    return raw


SUBSTRING_SPAN_REMOVAL_RAW_SQL = r"""
WITH base AS (
  -- full \s strip, not trim()'s ASCII spaces (ADVICE r11: a leading
  -- tab/newline would shift every separator index by one)
  SELECT doc_id,
         regexp_extract_all(
           regexp_replace(text, '^\s+|\s+$', '', 'g'), '\S+') AS tr,
         regexp_extract_all(
           regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS sp
  FROM documents),
kg AS (
  SELECT doc_id, i AS pos,
         md5(lower(array_to_string(tr[i:i+7], ' '))) AS dig
  FROM base, unnest(generate_series(1, greatest(len(tr)-7, 0))) AS u(i)),
dup AS (SELECT dig FROM kg GROUP BY dig HAVING count(DISTINCT doc_id) > 1),
cover AS (
  SELECT DISTINCT kg.doc_id, kg.pos + o.off AS t
  FROM kg JOIN dup USING (dig), unnest(generate_series(0, 7)) AS o(off)),
tok AS (
  SELECT b.doc_id, i AS pos, b.tr[i] AS tok
  FROM base b, unnest(generate_series(1, len(b.tr))) AS u(i)),
kept AS (
  SELECT t.doc_id, t.pos, t.tok
  FROM tok t LEFT JOIN cover c ON c.doc_id = t.doc_id AND c.t = t.pos
  WHERE c.doc_id IS NULL),
pieces AS (
  SELECT k.doc_id, k.pos,
         CASE
           WHEN lag(k.pos) OVER w IS NULL THEN k.tok
           WHEN lag(k.pos) OVER w = k.pos - 1
             THEN b.sp[k.pos - 1] || k.tok
           ELSE ' ' || k.tok
         END AS piece
  FROM kept k JOIN base b USING (doc_id)
  WINDOW w AS (PARTITION BY k.doc_id ORDER BY k.pos)),
clean AS (
  SELECT doc_id, string_agg(piece, '' ORDER BY pos) AS text_clean_raw
  FROM pieces GROUP BY doc_id),
cov AS (SELECT doc_id, count(*) AS removed FROM cover GROUP BY doc_id)
SELECT b.doc_id,
       CAST(len(b.tr) AS BIGINT) AS n_tokens,
       CAST(coalesce(cov.removed, 0) AS BIGINT) AS removed_tokens,
       CAST(len(b.tr) - coalesce(cov.removed, 0) AS BIGINT)
         AS kept_tokens,
       CASE WHEN len(b.tr) = 0 THEN 0.0
            ELSE round(coalesce(cov.removed, 0) / len(b.tr), 6)
       END AS dup_ratio,
       coalesce(clean.text_clean_raw, '') AS text_clean_raw
FROM base b
LEFT JOIN cov USING (doc_id)
LEFT JOIN clean USING (doc_id)
"""


# ===================== merged duplicated-span intervals (the audit map)
def dup_span_intervals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The span-removal AUDIT MAP: per document, the merged intervals
    (1-based inclusive token positions) that span-level dedup would
    cut — the ranges a byte-offset rewriter working on the ORIGINAL
    text needs, and what a reviewer inspects before approving a
    corpus rewrite.  In-query laws asserted: every interval carries
    ≥ 8 tokens (the k guard — a shorter island would mean the
    coverage explode leaked), interval width matches its token count
    (islands are contiguous by construction), and no two intervals of
    one document overlap or touch (adjacent runs must have merged).
    Oracle: the identical islands construction in DuckDB
    (``pos − row_number`` grouping over the covered-position set)."""
    from pyspark.sql import Window

    from legate_dataframe_spark.pipeline.dedup import dup_span_intervals

    d = load_table(spark, sf_dir, "documents")
    out = dup_span_intervals(d, k=8).localCheckpoint(eager=True)
    short = out.filter((F.col("span_tokens") < 8)
                       | (F.col("span_end") - F.col("span_start") + 1
                          != F.col("span_tokens"))).count()
    if short:
        raise AssertionError(
            f"{short} interval(s) break the k-guard/contiguity laws")
    w = Window.partitionBy("doc_id").orderBy("span_start")
    overlaps = (out.withColumn("nxt", F.lead("span_start").over(w))
                .filter(F.col("nxt").isNotNull()
                        & (F.col("nxt") <= F.col("span_end") + 1))
                .count())
    if overlaps:
        raise AssertionError(
            f"{overlaps} adjacent/overlapping interval pair(s) "
            f"failed to merge")
    return out


DUP_SPAN_INTERVALS_SQL = r"""
WITH tokens AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
  FROM documents),
kg AS (
  SELECT doc_id, i AS pos, md5(array_to_string(ts[i:i+7], ' ')) AS dig
  FROM tokens, unnest(generate_series(1, greatest(len(ts)-7, 0))) AS u(i)),
dup AS (SELECT dig FROM kg GROUP BY dig HAVING count(DISTINCT doc_id) > 1),
cover AS (
  SELECT DISTINCT kg.doc_id, kg.pos + o.off AS t
  FROM kg JOIN dup USING (dig), unnest(generate_series(0, 7)) AS o(off)),
num AS (
  SELECT doc_id, t,
         row_number() OVER (PARTITION BY doc_id ORDER BY t) AS rn
  FROM cover)
SELECT doc_id,
       CAST(min(t) AS BIGINT) AS span_start,
       CAST(max(t) AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS span_tokens
FROM num GROUP BY doc_id, t - rn
"""


# ===================== incremental span removal (the ingest-time cut)
def incremental_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span removal as an INGEST step: arriving batch documents are
    cleaned against corpus ∪ batch off the persisted k-gram index —
    the corpus is never rescanned (its digest state was paid once at
    build time).  The gate's state-side semi-join must read
    ``Bucketed: true`` with broadcast disabled (asserted — the index
    is read in place, co-located on dig).  Oracle: the full
    substring_span_removal recompute over ALL documents, restricted
    to the batch — identical for a corpus-disjoint batch by
    construction."""
    from legate_dataframe_spark.pipeline.dedup import (
        batch_remove_dup_spans,
        build_substring_index,
    )
    from legate_dataframe_spark.plans.round10b import _plan_of, _temp_db

    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)
    with _temp_db(spark, "ldf_r11_spancut") as db:
        idx = f"{db}.idx"
        build_substring_index(spark, corpus, idx, k=8)
        prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        prev_abs = spark.conf.get(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled",
                "false")
            out = batch_remove_dup_spans(spark, batch, idx, k=8)
            plan = _plan_of(out)
            if "Bucketed: true" not in plan:
                raise AssertionError(
                    "span-removal gate did not read the k-gram index "
                    "bucket-aware:\n" + plan)
            return out.localCheckpoint(eager=True)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                           prev_bc)
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled",
                prev_abs)


INCREMENTAL_SPAN_REMOVAL_SQL = (
    f"SELECT * FROM ({SUBSTRING_SPAN_REMOVAL_SQL}) WHERE doc_id % 10 = 0")


# ===================== the corpus-build last mile, end to end
def clean_corpus_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round's artifacts COMPOSED into the pipeline a training run
    actually executes: span-level cut (``remove_dup_spans``) → quality
    gate (≥10 residual tokens and ≤50% duplication — a doc that is
    mostly boilerplate is dropped, not trimmed) → size-bounded shard
    export, cap CERTIFIED from the exported files' own footers
    (metadata-only; every shard ≤ cap and shard count ≥ ⌈n/cap⌉
    asserted) → explicit-file-list readback whose row count must
    equal the gated count (a dropped or doubled shard fails here
    before the oracle ever runs).  Returns per-language corpus
    accounting over the CLEANED text (doc count, kept/removed token
    mass, clean char mass, id range); the oracle recomputes the cut,
    the gate, and the aggregates independently in DuckDB."""
    import math

    from legate_dataframe_spark.core import manifest as mf
    from legate_dataframe_spark.pipeline.dedup import remove_dup_spans
    from legate_dataframe_spark.sources.parquet import parquet_write

    d = load_table(spark, sf_dir, "documents")
    cut = remove_dup_spans(d, k=8)
    gated = (cut.join(d.select("doc_id", "lang"), "doc_id")
             .filter((F.col("kept_tokens") >= 10)
                     & (F.col("dup_ratio") <= 0.5))
             .select("doc_id", "lang", "kept_tokens",
                     "removed_tokens", "text_clean"))
    cap = 200
    out_dir = tempfile.mkdtemp(prefix="ldf_r11_cleanexp_")
    try:
        parquet_write(gated.repartition(4), out_dir,
                      max_records_per_file=cap)
        rows = mf.dir_file_rows(out_dir)
        if not rows:
            raise AssertionError("export wrote no shards")
        oversized = {p: n for p, n in rows.items() if n > cap}
        if oversized:
            raise AssertionError(
                f"shards exceed the {cap}-row cap: {oversized}")
        total = sum(rows.values())
        if len(rows) < math.ceil(total / cap):
            raise AssertionError(
                f"{len(rows)} shards cannot hold {total} rows under "
                f"the {cap}-row cap")
        back = mf.read_from_manifest(spark, out_dir, sorted(rows),
                                     schema=gated.schema)
        n_back = back.count()
        if n_back != total:
            raise AssertionError(
                f"readback saw {n_back} rows, footers certified "
                f"{total}")
        out = (back.groupBy("lang")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("kept_tokens").alias("sum_kept"),
                    F.sum("removed_tokens").alias("sum_removed"),
                    F.sum(F.length("text_clean")).cast("bigint")
                    .alias("sum_clean_chars"),
                    F.min("doc_id").alias("min_doc"),
                    F.max("doc_id").alias("max_doc")))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


CLEAN_CORPUS_EXPORT_SQL = f"""
WITH cut AS ({SUBSTRING_SPAN_REMOVAL_SQL})
SELECT d.lang,
       count(*) AS n_docs,
       CAST(sum(c.kept_tokens) AS BIGINT) AS sum_kept,
       CAST(sum(c.removed_tokens) AS BIGINT) AS sum_removed,
       CAST(sum(length(c.text_clean)) AS BIGINT) AS sum_clean_chars,
       min(c.doc_id) AS min_doc,
       max(c.doc_id) AS max_doc
FROM cut c JOIN documents d USING (doc_id)
WHERE c.kept_tokens >= 10 AND c.dup_ratio <= 0.5
GROUP BY d.lang
"""


# ===================== AS-OF over never-stamped writes (default stamps)
def asof_unstamped_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel as a PLATFORM property: a versioned rollup state is
    built and folded twice with NO ``committed_at`` anywhere — the
    r10 surface would have raised on it forever — and AS-OF must
    still work off the default engine-clock stamps: a far-future
    AS-OF resolves the live generation (the returned frame), a
    far-past AS-OF raises the clean no-generation error, and the
    timeline carries exactly one commit per publish in generation
    order (all asserted).  Oracle: the full GROUP BY over the events
    slice the folds covered."""
    from legate_dataframe_spark.core.bucketing import (
        init_versioned,
        read_asof,
        swap_versioned,
    )
    from legate_dataframe_spark.pipeline.rollup import (
        _PARTIALS,
        GROUP_KEYS,
        event_partials,
        incremental_rollup_update,
    )

    e = load_table(spark, sf_dir, "events")
    corpus = e.filter(F.col("event_id") % 3 == 0)
    batch_a = e.filter(F.col("event_id") % 3 == 1)
    with _temp_db(spark, "ldf_r11_asofdef") as db:
        view = f"{db}.state"
        init_versioned(spark, event_partials(corpus), view,
                       GROUP_KEYS, num_buckets=16)
        swap_versioned(spark,
                       incremental_rollup_update(spark, view, batch_a),
                       view, GROUP_KEYS, num_buckets=16, keep_old=True)
        timeline = (spark.table(f"{view}__commits")
                    .orderBy("committed_at").collect())
        if [r["generation"] for r in timeline] != [0, 1]:
            raise AssertionError(
                f"default stamps broke the timeline: {timeline}")
        try:
            read_asof(spark, view, "2000-01-01 00:00:00")
        except ValueError:
            pass
        else:
            raise AssertionError(
                "AS-OF before the state existed must raise")
        out = read_asof(spark, view, "9999-01-01 00:00:00")
        live_n = spark.table(view).count()
        if out.count() != live_n:
            raise AssertionError(
                "far-future AS-OF must resolve the live generation")
        return (out.select(F.col("day").cast("timestamp").alias("day"),
                           "event_type", *_PARTIALS)
                .localCheckpoint(eager=True))


ASOF_UNSTAMPED_DEFAULT_SQL = f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       event_type,
       count(*) AS n,
       {_MICRO_SQL} AS sum_micro,
       min(CAST(floor(value * 1000000.0) AS BIGINT)) AS min_micro,
       max(CAST(floor(value * 1000000.0) AS BIGINT)) AS max_micro
FROM events
WHERE event_id % 3 IN (0, 1)
GROUP BY 1, 2
"""


# ===================== streaming CDF apply (the mirror chain)
def stream_cdf_apply_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cross-system MIRROR run as a closed streaming loop: the
    SOURCE rollup state folds three staged micro-batches (each a
    keep_old swap, so every generation is retained and diffable); a
    foreachBatch drain rolls a REPLICA forward by applying each
    trigger's ``generation_diff(source, g_i, g_{i+1})`` with
    ``apply_diff`` — never by copying the state.  After every trigger
    the replica must equal the source exactly (exceptAll both ways,
    asserted inside the drain), and the per-trigger apply plan must
    read the CHANGE-sized diff of two retained generations — the
    events table is never consulted by the replica side (asserted:
    the apply plan scans no events parquet).  Exactly-once rig
    carries the r07 lessons: batch_id done-markers, per-trigger
    relation-cache refresh.  Oracle: the final state — the full GROUP
    BY over corpus ∪ all three batches; a skipped or double-applied
    diff leaves the replica short or doubled and fails the hash."""
    import glob as _glob
    import io as _io
    import os as _os
    import time as _time
    from contextlib import redirect_stdout as _redirect

    from legate_dataframe_spark.core.bucketing import (
        apply_diff,
        current_generation_table,
        generation_diff,
        init_versioned,
        swap_versioned,
    )
    from legate_dataframe_spark.pipeline.rollup import (
        _PARTIALS,
        GROUP_KEYS,
        event_partials,
        incremental_rollup_update,
    )
    from legate_dataframe_spark.plans.round4 import _stage_single_file

    e = load_table(spark, sf_dir, "events")
    corpus = e.filter(F.col("event_id") % 10 >= 3)
    todays = e.filter(F.col("event_id") % 10 < 3)
    with _temp_db(spark, "ldf_r11_cdfchain") as db:
        src, rep = f"{db}.src", f"{db}.rep"
        init_versioned(spark, event_partials(corpus), src,
                       GROUP_KEYS, num_buckets=16)
        init_versioned(spark, event_partials(corpus), rep,
                       GROUP_KEYS, num_buckets=16)
        stage = tempfile.mkdtemp(prefix="ldf_r11_cdf_stage_")
        ck = tempfile.mkdtemp(prefix="ldf_r11_cdf_ck_")
        try:
            now = _time.time()
            for i in range(3):
                _stage_single_file(
                    todays.filter(F.col("event_id") % 10 == i),
                    stage, f"b{i}.parquet", now - 300 + i * 100)
            stream = (spark.readStream.schema(todays.schema)
                      .option("maxFilesPerTrigger", 1).parquet(stage))

            def fold_and_mirror(batch_df: DataFrame,
                                batch_id: int) -> None:
                done = _os.path.join(ck, f"ldf_batch_{batch_id}.done")
                if _os.path.exists(done):
                    return
                sess = batch_df.sparkSession
                for v in (src, rep):
                    sess.catalog.refreshTable(
                        current_generation_table(sess, v))
                frozen = batch_df.localCheckpoint(eager=True)
                # producer side: fold the batch into the SOURCE
                g_old = int(current_generation_table(sess, src)
                            .rsplit("__g", 1)[1])
                swap_versioned(
                    sess,
                    incremental_rollup_update(sess, src, frozen),
                    src, GROUP_KEYS, num_buckets=16, keep_old=True)
                # consumer side: roll the replica forward by the DIFF
                diff = generation_diff(sess, src, g_old, g_old + 1,
                                       GROUP_KEYS, _PARTIALS)
                new_rep = apply_diff(sess.table(rep), diff,
                                     GROUP_KEYS, _PARTIALS)
                # the replica's refresh must be change-sized: its
                # lineage reads two retained GENERATIONS of the
                # source state, never the raw events table
                buf = _io.StringIO()
                with _redirect(buf):
                    new_rep.explain(mode="formatted")
                if "events" in buf.getvalue():
                    raise AssertionError(
                        "replica apply plan consulted the raw events "
                        "table — the mirror must ride the diff alone")
                swap_versioned(sess, new_rep, rep, GROUP_KEYS,
                               num_buckets=16)
                sess.catalog.refreshTable(
                    current_generation_table(sess, rep))
                from legate_dataframe_spark.plans.round10b import (
                    bag_diff_counts,
                )
                a, b = bag_diff_counts(sess.table(rep),
                                       sess.table(src))
                if a or b:
                    raise AssertionError(
                        f"replica drifted after trigger {batch_id}: "
                        f"{a} phantom, {b} missing rows")
                open(done, "w").close()

            q = (stream.writeStream.outputMode("append")
                 .foreachBatch(fold_and_mirror)
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            finished = q.awaitTermination(300)
            if q.exception() is not None:
                raise q.exception()
            if not finished:
                q.stop()
                raise TimeoutError("stream_cdf_apply_chain > 300s")
            markers = _glob.glob(_os.path.join(ck, "ldf_batch_*.done"))
            if len(markers) != 3:
                raise AssertionError(
                    f"expected 3 mirrored triggers, saw {len(markers)}")
            return (spark.table(rep)
                    .select(F.col("day").cast("timestamp").alias("day"),
                            "event_type", *_PARTIALS)
                    .localCheckpoint(eager=True))
        finally:
            shutil.rmtree(ck, ignore_errors=True)
            shutil.rmtree(stage, ignore_errors=True)


STREAM_CDF_APPLY_CHAIN_SQL = f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       event_type,
       count(*) AS n,
       {_MICRO_SQL} AS sum_micro,
       min(CAST(floor(value * 1000000.0) AS BIGINT)) AS min_micro,
       max(CAST(floor(value * 1000000.0) AS BIGINT)) AS max_micro
FROM events
GROUP BY 1, 2
"""
