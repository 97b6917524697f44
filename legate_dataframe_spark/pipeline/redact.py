"""PII redaction — scrub emails / phone numbers / IPv4 addresses from a
text column and count what was removed, the pre-training compliance
pass every large-scale corpus pipeline runs.

Patterns are deliberately restricted to the regex subset with identical
semantics in Java regex (Spark's engine) and RE2 (DuckDB's): character
classes, bounded repetition, ``\\b`` word boundaries — no lookaround,
no backreferences — so the DuckDB oracle reproduces the redaction
byte-for-byte.

Scale: pure narrow map of JVM ``regexp_replace`` / ``regexp_count``
expressions — no shuffle, no Python, whole-stage-codegen'd; linear
scan bandwidth at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# order matters: emails are redacted before IPv4 so a digits-and-dots
# mail host can't be double-matched; each token becomes <TYPE>
PII_PATTERNS: list[tuple[str, str]] = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("PHONE", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b"),
    ("IPV4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Replace each PII match with ``<EMAIL>`` / ``<PHONE>`` / ``<IPV4>``
    and report per-document match counts.

    Counts are taken on the ORIGINAL text (before any substitution) so
    they are independent of redaction order; substitutions then apply
    in PII_PATTERNS order.
    """
    t = F.col(text_col)
    # long, not Spark's int32 default: keeps the output schema identical
    # to the BIGINT the oracle's len() produces (schema-width parity
    # convention, plans/relational.py:11-13)
    counts = [F.regexp_count(t, F.lit(pat)).cast("long")
              .alias(f"n_{name.lower()}")
              for name, pat in PII_PATTERNS]
    red = t
    for name, pat in PII_PATTERNS:
        red = F.regexp_replace(red, pat, f"<{name}>")
    return docs.select(F.col(id_col), red.alias("text_redacted"), *counts)
