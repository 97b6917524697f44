"""Property tests for the span-removal family: the Spark operators
vs a brute-force pure-Python reference over small random corpora.

The reference implements Lee-et-al. semantics literally (set of
covered positions = union of all k-windows whose lowercased k-gram
appears in ≥2 distinct docs), so any Spark-side shortcut — the
semi-join, the ×k explode, array_except ordering, the raw rebuild's
separator gluing — must reproduce it exactly.  Tiny alphabets force
heavy k-gram collisions (the regime that breaks position arithmetic);
random whitespace runs and mixed case stress the raw rebuild."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

K = 3

# tiny vocab → dense cross-doc k-gram collisions
_WORDS = ["aa", "Bb", "c", "DD", "e"]
_SEPS = [" ", "  ", "\t", " \t "]


@st.composite
def corpora(draw):
    n_docs = draw(st.integers(2, 5))
    docs = []
    for i in range(n_docs):
        n_tok = draw(st.integers(0, 9))
        toks = [draw(st.sampled_from(_WORDS)) for _ in range(n_tok)]
        seps = [draw(st.sampled_from(_SEPS)) for _ in range(max(0, n_tok - 1))]
        text = "".join(
            t + (seps[j] if j < len(seps) else "")
            for j, t in enumerate(toks))
        docs.append((i, text))
    return docs


def _ref_covered(docs):
    """doc_id → set of covered 1-based token positions (brute force)."""
    toks = {i: re.findall(r"\S+", t) for i, t in docs}
    owners: dict[tuple, set] = {}
    for i, ts in toks.items():
        low = [w.lower() for w in ts]
        for p in range(len(ts) - K + 1):
            owners.setdefault(tuple(low[p:p + K]), set()).add(i)
    cov = {i: set() for i in toks}
    for i, ts in toks.items():
        low = [w.lower() for w in ts]
        for p in range(len(ts) - K + 1):
            if len(owners[tuple(low[p:p + K])]) > 1:
                cov[i].update(range(p + 1, p + K + 1))
    return toks, cov


def _ref_raw_clean(text, covered):
    toks = [(m.group(0), m.start(), m.end())
            for m in re.finditer(r"\S+", text)]
    out = []
    prev_kept = None
    for idx, (tok, s, e) in enumerate(toks, start=1):
        if idx in covered:
            continue
        if prev_kept is None:
            out.append(tok)
        elif prev_kept == idx - 1:
            prev_end = toks[idx - 2][2]
            out.append(text[prev_end:s] + tok)
        else:
            out.append(" " + tok)
        prev_kept = idx
    return "".join(out)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpora())
def test_span_family_matches_bruteforce(spark, docs):
    from legate_dataframe_spark.pipeline.dedup import (
        dup_span_intervals,
        remove_dup_spans,
        remove_dup_spans_raw,
    )

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    toks, cov = _ref_covered(docs)

    # normalized removal: counts + lowercased cut text
    got = {r["doc_id"]: r for r in
           remove_dup_spans(sdf, k=K).collect()}
    for i, text in docs:
        # the normalized op tokenizes split(trim(lower)): empty text
        # yields [''] (1 token), matching its documented convention
        norm_toks = re.split(r"\s+", text.strip().lower())
        kept = [t for j, t in enumerate(norm_toks, start=1)
                if j not in cov[i]] if toks[i] else norm_toks
        assert got[i]["removed_tokens"] == len(cov[i]), (i, text)
        if toks[i]:
            assert got[i]["text_clean"] == " ".join(kept), (i, text)

    # raw removal: byte-preserving rebuild
    raw = {r["doc_id"]: r for r in
           remove_dup_spans_raw(sdf, k=K).collect()}
    for i, text in docs:
        assert raw[i]["n_tokens"] == len(toks[i]), (i, text)
        assert raw[i]["removed_tokens"] == len(cov[i]), (i, text)
        assert raw[i]["text_clean_raw"] == \
            _ref_raw_clean(text.strip(), cov[i]), (i, text)

    # intervals: islands of the covered sets
    spans = {}
    for r in dup_span_intervals(sdf, k=K).collect():
        spans.setdefault(r["doc_id"], set()).update(
            range(r["span_start"], r["span_end"] + 1))
    for i in toks:
        assert spans.get(i, set()) == cov[i], (i,)
