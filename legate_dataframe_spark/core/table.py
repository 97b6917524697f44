"""LogicalTable — a thin, reference-shaped handle over a Spark DataFrame.

The reference's ``LogicalTable`` (cpp/include/legate_dataframe/core/
table.hpp:49-341) is an ordered list of lazily-distributed columns with a
bijective name→index map; operators are free functions taking/returning
tables.  Spark's ``DataFrame`` already *is* that (columnar, lazy,
partition-parallel, fixed schema), so this wrapper only adds the pieces of
the reference API that DataFrame spells differently:

- positional column access / ``select`` by index (table.hpp:237-267),
- ``num_rows()`` as an explicit blocking call (table.hpp:146),
- ``from_arrow`` / ``to_arrow`` scatter/gather (table.hpp:85-88, 314-336),
- unsigned-integer widening on ingest (SURVEY §1 policy: uint8→short,
  uint16→int, uint32→long, uint64→long with overflow caveat).

Everything else delegates to the wrapped DataFrame — use ``.df`` freely.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

# SURVEY §1: Spark has no unsigned ints; widen on ingest.  uint64 does not
# fit in long — the default maps it to long (overflow caveat above 2^63,
# trading exactness for arithmetic speed); ``uint64_as="decimal"`` opts in
# to exact DecimalType(20,0) semantics instead.
_UNSIGNED_WIDENING = {
    pa.uint8(): pa.int16(),
    pa.uint16(): pa.int32(),
    pa.uint32(): pa.int64(),
    pa.uint64(): pa.int64(),
}


def _widen_unsigned(table: pa.Table, uint64_as: str = "long") -> pa.Table:
    if uint64_as not in ("long", "decimal"):
        raise ValueError(f"uint64_as must be 'long' or 'decimal', got {uint64_as!r}")
    widening = dict(_UNSIGNED_WIDENING)
    if uint64_as == "decimal":
        # exact for the full uint64 range — Spark DecimalType(20,0)
        widening[pa.uint64()] = pa.decimal128(20, 0)
    fields = []
    changed = False
    for f in table.schema:
        target = widening.get(f.type)
        if target is not None:
            fields.append(pa.field(f.name, target, f.nullable))
            changed = True
        elif f.type == pa.utf8() or f.type == pa.large_utf8():
            # reference canonicalizes utf8 → large_utf8 (utils.cpp:141-145);
            # Spark StringType subsumes both.
            fields.append(pa.field(f.name, pa.large_utf8(), f.nullable))
            changed = changed or f.type == pa.utf8()
        else:
            fields.append(f)
    if not changed:
        return table
    return table.cast(pa.schema(fields))


class LogicalTable:
    """Ordered, named, lazily-evaluated distributed table."""

    def __init__(self, df: DataFrame):
        names = df.columns
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate column names: {names}")
        self._df = df

    # -- construction ---------------------------------------------------
    @classmethod
    def from_arrow(cls, spark: SparkSession, table: pa.Table,
                   uint64_as: str = "long") -> "LogicalTable":
        """Scatter a local Arrow table to the cluster (table.hpp:85-88).

        ``uint64_as="decimal"`` maps uint64 → DecimalType(20,0): exact
        above 2^63 (the reference keeps native uint64,
        cpp/src/utils.cpp:30-93) at decimal-arithmetic cost; the default
        long mapping is exact below 2^63 and integer-fast.
        """
        widened = _widen_unsigned(table, uint64_as)
        # explicit schema: createDataFrame's sampling inference guesses
        # decimal(19,0) for Decimal objects, which truncates uint64
        # values above 10^19-1
        from pyspark.sql.pandas.types import from_arrow_schema

        return cls(spark.createDataFrame(
            widened.to_pandas(), schema=from_arrow_schema(widened.schema)))

    @classmethod
    def read_parquet(cls, spark: SparkSession, *paths: str,
                     columns: Sequence[str] | None = None) -> "LogicalTable":
        df = spark.read.parquet(*paths)
        if columns is not None:
            df = df.select(*columns)
        return cls(df)

    # -- reference-shaped accessors -------------------------------------
    @property
    def df(self) -> DataFrame:
        return self._df

    def num_columns(self) -> int:
        return len(self._df.columns)

    def num_rows(self) -> int:
        """Blocking row count (table.hpp:146)."""
        return self._df.count()

    def column_names(self) -> list[str]:
        return list(self._df.columns)

    def column_name(self, idx: int) -> str:
        return self._df.columns[idx]

    def select(self, cols: Iterable[int | str]) -> "LogicalTable":
        """Subset/reorder columns by index or name (table.hpp:237-267)."""
        names = [self.column_name(c) if isinstance(c, int) else c for c in cols]
        missing = [n for n in names if n not in self._df.columns]
        if missing:
            raise KeyError(f"unknown columns: {missing}")
        return LogicalTable(self._df.select(*names))

    # -- gather ----------------------------------------------------------
    def to_arrow(self) -> pa.Table:
        """Blocking gather to the client (table.hpp:314-336)."""
        return self._df.toArrow()

    def __repr__(self) -> str:  # pragma: no cover
        return f"LogicalTable({self._df.schema.simpleString()})"
