"""Equi hash-join with the reference's surface.

Reference: ``join(lhs, rhs, lhs_keys, rhs_keys, join_type,
lhs_out_columns, rhs_out_columns, nulls_equal=true, broadcast=AUTO)``
(cpp/include/legate_dataframe/join.hpp:78-116); types INNER/LEFT/FULL/
SEMI/ANTI (join.hpp:25); null join keys equal by default (join.hpp:85).

Spark-first design notes
------------------------
- Distribution: the reference hash-repartitions both sides then runs a
  local hash join, eliding the shuffle when a side is broadcast
  (cpp/src/join.cpp:33-53).  Spark's planner + AQE does exactly this
  natively; ``broadcast=LEFT/RIGHT`` maps to an explicit
  ``F.broadcast`` hint, ``AUTO`` lets AQE decide from runtime stats.
- ``nulls_equal=True`` maps to the built-in null-safe equality
  ``eqNullSafe`` (SQL ``<=>``) — no sentinel/mask emulation needed
  (the reference's CPU path fakes this, cpp/src/join.cpp:111-228).
  NOTE: Spark cannot broadcast-hash a join whose *only* predicates are
  null-safe; it still picks sort-merge — fine, and at scale SMJ is the
  right default for large-large joins anyway.
- Output nullability (LEFT → right side nullable, FULL → both,
  cpp/src/join.cpp:354-371) is automatic in Spark.
"""

from __future__ import annotations

from enum import Enum
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class JoinType(str, Enum):
    INNER = "inner"
    LEFT = "left"
    FULL = "full"
    SEMI = "left_semi"
    ANTI = "left_anti"


class BroadcastInput(str, Enum):
    AUTO = "auto"
    LEFT = "left"
    RIGHT = "right"


def join(
    lhs: DataFrame,
    rhs: DataFrame,
    lhs_keys: Sequence[str],
    rhs_keys: Sequence[str],
    join_type: JoinType | str = JoinType.INNER,
    lhs_out_columns: Sequence[str] | None = None,
    rhs_out_columns: Sequence[str] | None = None,
    nulls_equal: bool = True,
    broadcast: BroadcastInput | str = BroadcastInput.AUTO,
    rhs_suffix: str = "_right",
) -> DataFrame:
    """Join two tables on equality of key column lists.

    Matches join.hpp:78-116 semantics: output = lhs_out_columns then
    rhs_out_columns; clashing right-side names get ``rhs_suffix``.
    """
    join_type = JoinType(join_type)
    broadcast = BroadcastInput(broadcast)
    if len(lhs_keys) != len(rhs_keys):
        raise ValueError("lhs_keys and rhs_keys must have equal length")

    if lhs_out_columns is None:
        lhs_out_columns = lhs.columns
    if join_type in (JoinType.SEMI, JoinType.ANTI):
        rhs_out_columns = []
    elif rhs_out_columns is None:
        rhs_out_columns = rhs.columns

    left = lhs.alias("__ldf_l")
    right = rhs.alias("__ldf_r")
    if broadcast is BroadcastInput.LEFT:
        left = F.broadcast(left)
    elif broadcast is BroadcastInput.RIGHT:
        right = F.broadcast(right)

    cond = None
    for lk, rk in zip(lhs_keys, rhs_keys):
        lcol, rcol = F.col(f"__ldf_l.{lk}"), F.col(f"__ldf_r.{rk}")
        c = lcol.eqNullSafe(rcol) if nulls_equal else (lcol == rcol)
        cond = c if cond is None else (cond & c)

    joined = left.join(right, on=cond, how=join_type.value)

    out = [F.col(f"__ldf_l.{c}").alias(c) for c in lhs_out_columns]
    taken = set(lhs_out_columns)
    for c in rhs_out_columns:
        name = c if c not in taken else f"{c}{rhs_suffix}"
        out.append(F.col(f"__ldf_r.{c}").alias(name))
    return joined.select(*out)
