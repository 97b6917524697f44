"""Property test: character-shingle span removal vs a brute-force
Lee-et-al. reference extended to char k-grams.  Tiny alphabets force
dense cross-doc collisions; the alphabet mixes ASCII, CJK (no
whitespace word boundaries — the case the word family cannot cover)
and whitespace itself (a char operator treats it as just another
codepoint)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

K = 4

_ALPHABET = list("ab 東京\tX")


@st.composite
def corpora(draw):
    n_docs = draw(st.integers(2, 5))
    return [(i, "".join(draw(st.sampled_from(_ALPHABET))
                        for _ in range(draw(st.integers(0, 15)))))
            for i in range(n_docs)]


def _ref_char_covered(docs):
    """doc_id → set of covered 1-based char positions (brute force,
    case-sensitive — the operator's byte-fidelity contract)."""
    owners: dict[str, set] = {}
    for i, t in docs:
        for p in range(len(t) - K + 1):
            owners.setdefault(t[p:p + K], set()).add(i)
    cov = {i: set() for i, _ in docs}
    for i, t in docs:
        for p in range(len(t) - K + 1):
            if len(owners[t[p:p + K]]) > 1:
                cov[i].update(range(p + 1, p + K + 1))
    return cov


_WORDS = ["aa", "bb", "c", "dd"]  # tiny vocab → dense repeats


@st.composite
def word_corpora(draw):
    n_docs = draw(st.integers(1, 4))
    return [(i, " ".join(draw(st.sampled_from(_WORDS))
                         for _ in range(draw(st.integers(0, 12)))))
            for i in range(n_docs)]


def _ref_repeat_covered(toks, k):
    """Covered 1-based positions: union of k-windows whose k-gram has
    an occurrence starting STRICTLY earlier in the same doc."""
    first: dict[tuple, int] = {}
    cov: set[int] = set()
    for p in range(len(toks) - k + 1):
        g = tuple(toks[p:p + k])
        if g in first:
            cov.update(range(p + 1, p + k + 1))
        else:
            first[g] = p
    return cov


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(word_corpora())
def test_repeated_span_removal_matches_bruteforce(spark, docs):
    from legate_dataframe_spark.pipeline.dedup import (
        remove_repeated_spans,
    )

    K = 2
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           remove_repeated_spans(sdf, k=K).collect()}
    for i, text in docs:
        toks = text.strip().lower().split() or [""]
        cov = _ref_repeat_covered(toks, K)
        kept = [t for j, t in enumerate(toks, start=1)
                if j not in cov]
        assert got[i]["removed_tokens"] == len(cov), (i, text)
        assert got[i]["text_clean"] == " ".join(kept), (i, text)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpora())
def test_char_span_removal_matches_bruteforce(spark, docs):
    from legate_dataframe_spark.pipeline.dedup import (
        remove_dup_spans_chars,
    )

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    cov = _ref_char_covered(docs)
    got = {r["doc_id"]: r for r in
           remove_dup_spans_chars(sdf, k=K).collect()}
    for i, t in docs:
        exp_clean = "".join(
            ch for p, ch in enumerate(t, start=1) if p not in cov[i])
        assert got[i]["n_chars"] == len(t), (i, t)
        assert got[i]["removed_chars"] == len(cov[i]), (i, t)
        assert got[i]["kept_chars"] == len(t) - len(cov[i]), (i, t)
        assert got[i]["text_clean_chars"] == exp_clean, (i, t)
