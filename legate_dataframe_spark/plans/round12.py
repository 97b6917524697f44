"""Round-12 queries — tokenizer-independent corpus rewrite and
object-store commit semantics.

- ``substring_span_removal_chars`` — CHARACTER-shingle span removal
  (VERDICT r11 task 3): the span family's cut semantics without the
  ``\\s+`` tokenizer, so corpora in scripts with no whitespace word
  boundaries (CJK) are covered; detection is case-sensitive over raw
  codepoints — the codepoint-level reading of Lee et al.'s
  byte-sequence dedup (arXiv:2107.06499).

Catalog hygiene matches rounds 7–11: uuid-suffixed session-temp
databases dropped (CASCADE) before returning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from legate_dataframe_spark.plans.relational import load_table

_CHAR_K = 20  # Lee et al. cut at 50 BPE tokens; 20 chars ≈ the
#               comparable minimum-span band for plain text


# ============== character-shingle span removal (tokenizer-free cut)
def substring_span_removal_chars(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The tokenizer-independent corpus rewrite: per document, the
    ORIGINAL text minus every character position covered by a
    20-char substring that appears verbatim in another document.
    In-query laws asserted before returning: removed + kept ==
    n_chars on every row, and the cleaned text's own length equals
    kept_chars (an off-by-one in the position arithmetic or an
    unsorted rebuild flips it immediately).  Oracle: the identical
    char-k-gram construction in DuckDB — per-position substr
    digests, covered-position union, ordered string_agg rebuild —
    so the value hash covers the cleaned TEXT, not just counts."""
    from legate_dataframe_spark.pipeline.dedup import (
        remove_dup_spans_chars,
    )

    d = load_table(spark, sf_dir, "documents")
    out = remove_dup_spans_chars(d, k=_CHAR_K) \
        .localCheckpoint(eager=True)
    bad = out.filter(
        (F.col("removed_chars") + F.col("kept_chars")
         != F.col("n_chars"))
        | (F.length("text_clean_chars") != F.col("kept_chars"))
    ).count()
    if bad:
        raise AssertionError(
            f"{bad} row(s) break the char span-removal accounting "
            f"laws (removed+kept==n_chars; length(text_clean_chars)"
            f"==kept_chars)")
    return out


SUBSTRING_SPAN_REMOVAL_CHARS_SQL = r"""
WITH base AS (SELECT doc_id, text, length(text) AS n FROM documents),
kg AS (
  SELECT doc_id, i AS pos, md5(substr(text, i, 20)) AS dig
  FROM base, unnest(generate_series(1, greatest(n - 19, 0))) AS u(i)),
dup AS (SELECT dig FROM kg GROUP BY dig HAVING count(DISTINCT doc_id) > 1),
cover AS (
  SELECT DISTINCT kg.doc_id, kg.pos + o.off AS t
  FROM kg JOIN dup USING (dig), unnest(generate_series(0, 19)) AS o(off)),
chars AS (
  SELECT b.doc_id, i AS pos, substr(b.text, i, 1) AS ch
  FROM base b, unnest(generate_series(1, b.n)) AS u(i)),
kept AS (
  SELECT c.doc_id, c.pos, c.ch
  FROM chars c LEFT JOIN cover v ON v.doc_id = c.doc_id AND v.t = c.pos
  WHERE v.doc_id IS NULL),
clean AS (
  SELECT doc_id, string_agg(ch, '' ORDER BY pos) AS text_clean_chars
  FROM kept GROUP BY doc_id),
cov AS (SELECT doc_id, count(*) AS removed FROM cover GROUP BY doc_id)
SELECT b.doc_id,
       CAST(b.n AS BIGINT) AS n_chars,
       CAST(coalesce(cov.removed, 0) AS BIGINT) AS removed_chars,
       CAST(b.n - coalesce(cov.removed, 0) AS BIGINT) AS kept_chars,
       CASE WHEN b.n = 0 THEN 0.0
            ELSE round(coalesce(cov.removed, 0) / b.n, 6)
       END AS dup_ratio,
       coalesce(clean.text_clean_chars, '') AS text_clean_chars
FROM base b
LEFT JOIN cov USING (doc_id)
LEFT JOIN clean USING (doc_id)
"""
