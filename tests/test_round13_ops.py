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


def test_fixpoint_touched_only_probe_keeps_untouched_rows(spark):
    """The convergence probe recuts only the documents the previous
    pass touched (uncut docs are clean by construction — their text
    is unchanged and the predicate is fixed).  Pin the merge path:
    a junction-forming doc that needs TWO passes, mixed with clean
    docs and a doc cut once in pass 1 only — every row must come out
    exactly as the per-doc single-doc runs produce, and the clean
    rows must be byte-identical to their pass-1 form."""
    from legate_dataframe_spark.pipeline.dedup import (
        remove_contaminated_spans_fixpoint,
    )

    t = [f"t{i}" for i in range(1, 9)]
    s = [f"s{i}" for i in range(1, 9)]
    clean1 = " ".join(f"a{i}" for i in range(1, 9))
    clean2 = " ".join(f"b{i}" for i in range(1, 13))
    once = " ".join(["z0"] + s + ["z1", "z2"])  # span cut, no junction
    junction = " ".join(t[:4] + s + t[4:])      # needs pass 2
    train = _docs(spark, [(1, clean1), (2, junction),
                          (3, once), (4, clean2)])
    test = _docs(spark, [(100, " ".join(s)), (101, " ".join(t))])

    rows = {r["doc_id"]: r for r in
            remove_contaminated_spans_fixpoint(train, test, k=8)
            .collect()}
    assert rows[1]["removed_tokens"] == 0
    assert rows[1]["text_clean"] == clean1
    assert rows[4]["removed_tokens"] == 0
    assert rows[4]["text_clean"] == clean2
    assert rows[3]["removed_tokens"] == 8
    assert rows[3]["text_clean"] == "z0 z1 z2"
    assert rows[2]["removed_tokens"] == 16
    assert rows[2]["kept_tokens"] == 0
    assert rows[2]["text_clean"] == ""
    for r in rows.values():
        assert r["removed_tokens"] + r["kept_tokens"] == r["n_tokens"]


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


# ---------- composed ingest cut == full recompute ------------------
def test_clean_corpus_batch_equals_full_recompute(spark, tmp_path):
    """The index-gated composed cut must equal the full clean_corpus
    recompute over corpus ∪ batch restricted to the batch — the
    equivalence is unconditional (the index records presence of ≥1
    admitted doc; the batch occurrence supplies the second), checked
    on the real documents table including all attribution columns."""
    from pyspark.sql import functions as F

    from legate_dataframe_spark.pipeline.dedup import (
        build_substring_index,
        clean_corpus,
        clean_corpus_batch,
    )
    from legate_dataframe_spark.plans.relational import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    test = d.filter(F.col("doc_id") % 10 == 7)
    corpus = d.filter((F.col("doc_id") % 10 != 7)
                      & (F.col("doc_id") % 10 != 0))
    batch = d.filter(F.col("doc_id") % 10 == 0)
    spark.sql("CREATE DATABASE IF NOT EXISTS t13_ccb")
    try:
        build_substring_index(spark, corpus, "t13_ccb.idx", k=8)
        inc = clean_corpus_batch(spark, batch, test, "t13_ccb.idx",
                                 k=8)
        full = clean_corpus(d.filter(F.col("doc_id") % 10 != 7),
                            test, k=8) \
            .filter(F.col("doc_id") % 10 == 0)
        assert inc.exceptAll(full).isEmpty()
        assert full.exceptAll(inc).isEmpty()
        assert inc.count() == batch.count()
    finally:
        spark.sql("DROP DATABASE IF EXISTS t13_ccb CASCADE")


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


# ---------- S3 conditional-PUT commit backend (VERDICT r12 task 5)
class _StubClientError(Exception):
    """Shape-compatible with botocore's ClientError: carries the
    ``response`` dict the backend's error mapping reads."""

    def __init__(self, code: str, status: int) -> None:
        super().__init__(code)
        self.response = {"Error": {"Code": code},
                         "ResponseMetadata": {"HTTPStatusCode": status}}


class _S3StubClient:
    """Local-filesystem S3 stub speaking exactly the five calls
    S3ConditionalPutCommitBackend uses.  Conditional PUT maps to
    O_EXCL create — atomic across processes, so the 6-process race
    suite exercises the REAL error-mapping path of the backend."""

    def __init__(self, root: str) -> None:
        self._root = root

    def _p(self, bucket: str, key: str) -> str:
        return os.path.join(self._root, bucket, key)

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        p = self._p(Bucket, Key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        if IfNoneMatch == "*":
            try:
                fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                raise _StubClientError("PreconditionFailed", 412) \
                    from None
            os.write(fd, Body)
            os.close(fd)
        else:
            with open(p, "wb") as fh:
                fh.write(Body)
        return {}

    def delete_object(self, Bucket, Key):
        import contextlib

        with contextlib.suppress(OSError):
            os.remove(self._p(Bucket, Key))
        return {}

    def head_object(self, Bucket, Key):
        p = self._p(Bucket, Key)
        if not os.path.exists(p):
            raise _StubClientError("404", 404)
        return {"LastModified": os.path.getmtime(p)}

    def list_objects_v2(self, Bucket, Prefix, ContinuationToken=None):
        base = os.path.join(self._root, Bucket)
        keys = []
        for dirpath, _, files in os.walk(base):
            for f in files:
                k = os.path.relpath(os.path.join(dirpath, f), base)
                if k.startswith(Prefix):
                    keys.append(k)
        keys.sort()
        # one-key pages force the backend's pagination loop
        if ContinuationToken:
            keys = [k for k in keys if k > ContinuationToken]
        page, rest = keys[:1], keys[1:]
        out = {"Contents": [{"Key": k} for k in page],
               "IsTruncated": bool(rest)}
        if rest:
            out["NextContinuationToken"] = page[-1]
        return out

    def delete_objects(self, Bucket, Delete):
        for o in Delete["Objects"]:
            self.delete_object(Bucket, o["Key"])
        return {}


def _make_backend(kind: str, root: str):
    from legate_dataframe_spark.core.bucketing import (
        LocalDirCommitBackend,
        S3ConditionalPutCommitBackend,
    )

    if kind == "localdir":
        return "localdir", LocalDirCommitBackend("localdir", root)
    if kind == "mockstore":
        return "mockstore", LocalDirCommitBackend("mockstore", root)
    return "s3stub", S3ConditionalPutCommitBackend(
        client=_S3StubClient(root), scheme="s3stub")


def _race_contract_claim(args):
    """Top-level for multiprocessing fork: register the backend over
    the SAME backing root (as every writer host would) and race the
    conditional put through _try_create_marker."""
    kind, root, uri, barrier = args
    from legate_dataframe_spark.core.bucketing import (
        register_commit_backend,
    )

    scheme, be = _make_backend(kind, root)
    register_commit_backend(scheme, be)
    from legate_dataframe_spark.core.bucketing import (
        _try_create_marker,
    )

    barrier.wait(timeout=30)
    return _try_create_marker(uri)


@pytest.mark.parametrize("kind", ["localdir", "mockstore", "s3stub"])
def test_commit_backend_contract_race_single_winner(tmp_path, kind):
    """The 6-process single-winner race, parameterized over every
    in-repo backend (VERDICT r12 task 5): posix reference, mock
    object store, and the S3 conditional-PUT backend driven through
    a filesystem-backed stub client — same trials, same invariant:
    exactly one claimant per key, every time."""
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    root = str(tmp_path / "store")
    n_workers, n_trials = 6, 6
    scheme, _ = _make_backend(kind, root)
    for trial in range(n_trials):
        uri = f"{scheme}://wh/markers/g{trial}.commit"
        with ctx.Manager() as mgr:
            barrier = mgr.Barrier(n_workers)
            with ctx.Pool(n_workers) as pool:
                wins = pool.map(_race_contract_claim,
                                [(kind, root, uri, barrier)]
                                * n_workers)
        assert sum(wins) == 1, (kind, trial, wins)


@pytest.mark.parametrize("kind", ["localdir", "mockstore", "s3stub"])
def test_commit_backend_contract_semantics(tmp_path, kind):
    """Single-process contract grid every backend must satisfy:
    put-if-absent wins once, mtime present/absent, delete is
    idempotent, delete_prefix clears everything under the prefix
    (through the stub's one-key pages, exercising S3 pagination)."""
    import time

    root = str(tmp_path / "store")
    scheme, be = _make_backend(kind, root)
    u = f"{scheme}://bkt/markers/g1.commit"
    assert be.mtime(u) is None
    assert be.put_if_absent(u, "1@host\n") is True
    assert be.put_if_absent(u, "2@other\n") is False
    assert abs(be.mtime(u) - time.time()) < 60
    for i in range(2, 5):
        assert be.put_if_absent(
            f"{scheme}://bkt/markers/g{i}.commit", "x\n")
    be.delete(u)
    assert be.mtime(u) is None
    be.delete(u)  # absent is not an error
    assert be.put_if_absent(u, "3@host\n") is True  # slot reopened
    be.delete_prefix(f"{scheme}://bkt/markers")
    for i in range(1, 5):
        assert be.mtime(f"{scheme}://bkt/markers/g{i}.commit") is None
    be.delete_prefix(f"{scheme}://bkt/markers")  # absent prefix ok


def test_s3_backend_retries_conditional_conflict(tmp_path):
    """S3 answers 409 ConditionalRequestConflict when concurrent
    conditional writers race — outcome UNKNOWN, so the backend must
    retry the CAS until it resolves (412 = resolved lost)."""
    from legate_dataframe_spark.core.bucketing import (
        S3ConditionalPutCommitBackend,
    )

    class Flaky(_S3StubClient):
        def __init__(self, root):
            super().__init__(root)
            self.conflicts = 3

        def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
            if self.conflicts > 0:
                self.conflicts -= 1
                raise _StubClientError("ConditionalRequestConflict",
                                       409)
            return super().put_object(Bucket, Key, Body, IfNoneMatch)

    be = S3ConditionalPutCommitBackend(client=Flaky(str(tmp_path)),
                                       scheme="s3stub")
    assert be.put_if_absent("s3stub://b/k.commit", "1@h\n") is True
    # now the key exists: a fresh conflicted writer resolves to lost
    be._c.conflicts = 2
    assert be.put_if_absent("s3stub://b/k.commit", "2@h\n") is False
    # retries exhausted -> loud failure, never a silent claim
    be._c.conflicts = 10 ** 6
    with pytest.raises(RuntimeError, match="conflicted"):
        S3ConditionalPutCommitBackend(
            client=be._c, scheme="s3stub",
            conflict_retries=2).put_if_absent(
                "s3stub://b/k2.commit", "3@h\n")


def test_s3_backend_swap_end_to_end(spark, tmp_path):
    """The full swap flow with markers routed through the S3
    conditional-PUT backend (stub client): claim lands in the
    'bucket', a held claim rejects a competitor pre-write, a stale
    marker reclaims, and rebuild clears the prefix via paginated
    list+delete."""
    import os
    import time

    from legate_dataframe_spark.core import bucketing
    from legate_dataframe_spark.core.bucketing import (
        ConcurrentSwapError,
        S3ConditionalPutCommitBackend,
        _DB_LOC_CACHE,
        init_versioned,
        list_generations,
        register_commit_backend,
        swap_versioned,
    )

    root = str(tmp_path / "store")
    be = S3ConditionalPutCommitBackend(client=_S3StubClient(root),
                                       scheme="s3stub")
    register_commit_backend("s3stub", be)
    spark.sql("CREATE DATABASE IF NOT EXISTS t13_s3 "
              f"LOCATION '{tmp_path}/db'")

    def _df(rows, schema):
        return spark.createDataFrame(rows, schema)

    try:
        _DB_LOC_CACHE["t13_s3"] = "s3stub://bkt/wh1"
        v = "t13_s3.s"
        init_versioned(spark, _df([(1, 1)], "k long, n long"),
                       v, ["k"], num_buckets=2)
        swap_versioned(spark, _df([(1, 2)], "k long, n long"),
                       v, ["k"], num_buckets=2)
        marker = os.path.join(root, "bkt/wh1/_ldf_commit_markers/s",
                              "g1.commit")
        assert os.path.exists(marker), "claim did not route to store"
        assert be.put_if_absent("s3stub://bkt/wh1/_ldf_commit_markers"
                                "/s/g2.commit", "777@elsewhere\n")
        with pytest.raises(ConcurrentSwapError, match="claimed"):
            swap_versioned(spark, _df([(1, 3)], "k long, n long"),
                           v, ["k"], num_buckets=2)
        assert list_generations(spark, v) == [1]
        g2 = os.path.join(root, "bkt/wh1/_ldf_commit_markers/s",
                          "g2.commit")
        os.utime(g2, (1, 1))
        swap_versioned(spark, _df([(1, 3)], "k long, n long"),
                       v, ["k"], num_buckets=2)
        assert spark.table(v).collect()[0]["n"] == 3
        assert time.time() - os.path.getmtime(g2) < 3600
        init_versioned(spark, _df([(1, 9)], "k long, n long"),
                       v, ["k"], num_buckets=2)
        assert be.mtime("s3stub://bkt/wh1/_ldf_commit_markers"
                        "/s/g2.commit") is None
    finally:
        _DB_LOC_CACHE.pop("t13_s3", None)
        bucketing._COMMIT_BACKENDS.pop("s3stub", None)
        spark.sql("DROP DATABASE IF EXISTS t13_s3 CASCADE")


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


# ---------- bag_diff_counts == exceptAll counts, both directions ----
def test_bag_diff_counts_matches_exceptall(spark):
    """The one-pass fold-law check must count exactly what the
    two-exceptAll form counted: per-row-value multiplicity residues,
    nulls comparing equal, asymmetric multisets both ways."""
    from legate_dataframe_spark.plans.round10b import bag_diff_counts

    rows_a = [(1, "x"), (1, "x"), (2, "y"), (3, None), (None, "z")]
    rows_b = [(1, "x"), (2, "y"), (2, "y"), (3, None), (4, "w")]
    a = spark.createDataFrame(rows_a, "k int, v string")
    b = spark.createDataFrame(rows_b, "k int, v string")
    for left, right in ((a, b), (b, a), (a, a)):
        got = bag_diff_counts(left, right)
        want = (left.exceptAll(right).count(),
                right.exceptAll(left).count())
        assert got == want, (got, want)
    # column-name drift on the right side: exceptAll matches by
    # position, the helper must too
    b2 = b.toDF("kk", "vv")
    assert (bag_diff_counts(a, b2)
            == (a.exceptAll(b).count(), b.exceptAll(a).count()))
    # empty vs non-empty
    empty = a.limit(0)
    assert bag_diff_counts(a, empty) == (5, 0)
    assert bag_diff_counts(empty, a) == (0, 5)
