"""Row filtering and dedup.

Reference: ``apply_boolean_mask`` (stream_compaction.hpp:59, null mask
entries drop the row — same as Spark ``filter`` treating null as false)
and ``distinct(tbl, keys, high_cardinality=false)``
(stream_compaction.hpp:74): keep ONE arbitrary row per key group
(Arrow ``hash_one`` for non-key columns, cpp/src/stream_compaction.cpp:
44-96).  Spark ``dropDuplicates(keys)`` has exactly those keep-"any"
semantics, and its partial aggregation is the reference's
low-cardinality local pre-dedup optimization (:76-82) done adaptively.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame


def apply_boolean_mask(table: DataFrame, mask: Column | str) -> DataFrame:
    """Keep rows where ``mask`` is true; null mask drops the row."""
    return table.filter(mask)


def distinct(table: DataFrame, keys: Sequence[str] | None = None,
             high_cardinality: bool = False) -> DataFrame:
    """One arbitrary row per distinct key tuple (keep="any").

    ``high_cardinality`` is accepted for API parity; Spark's AQE decides
    partial-vs-direct aggregation from runtime stats instead.
    """
    del high_cardinality
    if keys is None:
        return table.dropDuplicates()
    return table.dropDuplicates(list(keys))
