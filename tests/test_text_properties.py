"""Property-based differential for the tokenization/shingle layer —
the foundation every dedup/text operator builds on.

The engine contract (pinned here, matched by every DuckDB oracle):

- JAVA regex semantics: ``\\s`` matches [ \\t\\n\\x0B\\f\\r] only
  (NOT unicode spaces like \\xa0 — Python's re is unicode-aware
  there, so the reference restricts itself to the Java class);
- ``trim`` strips SPACES only (Spark AND DuckDB behave this way), so
  leading/trailing \\t\\n\\r survive and produce empty edge tokens.
  Both engines agree, which is what the oracle gate checks; a corpus
  with edge control characters should pre-clean before tokenizing.

Hypothesis drives unicode letters, emoji, ASCII/exotic whitespace,
punctuation and empties through Spark and the reference in one
batched roundtrip per example.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from legate_dataframe_spark.pipeline import dedup

_JAVA_WS = " \t\n\x0b\f\r"

ALPHABET = st.sampled_from(list(
    "abcXYZ09.,;:!?*()[]'\"-_/\\" + _JAVA_WS + "äßüñ中文🙂"))
TEXTS = st.text(alphabet=ALPHABET, max_size=40)


def _ref_tokens(text: str) -> list[str]:
    t = text.strip(" ").lower()  # trim = spaces only (engine contract)
    return re.split(f"[{re.escape(_JAVA_WS)}]+", t)


def _ref_shingles(text: str, k: int = 3) -> list[str]:
    toks = _ref_tokens(text)
    return [" ".join(toks[i:i + k]) for i in range(max(len(toks) - k + 1, 0))]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(TEXTS, min_size=1, max_size=25))
def test_word_shingles_match_python_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id: long, text: string")
    got = {r.id: list(r.sh) for r in
           df.select("id", dedup.word_shingles(F.col("text")).alias("sh"))
           .collect()}
    for i, t in enumerate(texts):
        assert got[i] == _ref_shingles(t), (
            f"text={t!r}: spark={got[i]!r} ref={_ref_shingles(t)!r}")


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(TEXTS, min_size=1, max_size=20))
def test_exact_dedup_groups_match_reference(spark, texts):
    """exact_dedup's normalized-digest grouping equals a Python
    normalize-and-group reference."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string")
    got = {r.digest: (r.keeper_id, r.n_copies)
           for r in dedup.exact_dedup(df).collect()}
    ref: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        norm = re.sub(f"[{re.escape(_JAVA_WS)}]+", " ",
                      t.strip(" ").lower())  # trim = spaces only
        ref.setdefault(norm, []).append(i)
    assert len(got) == len(ref)
    ref_groups = sorted((min(ids), len(ids)) for ids in ref.values())
    assert sorted(got.values()) == ref_groups
