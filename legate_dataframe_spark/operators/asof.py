"""As-of join — for each left row, the latest right row with
``right_ts <= left_ts`` within the same key (time-series point-in-time
join).  The reference has no such operator (hash equi-join only,
SURVEY §2.3); this is a beyond-reference capability.

Scalable construction (the classic distributed merge-asof): tag and
union both sides, hash-partition by key, sort within partition by
(ts, side), then a running ``last(right_payload, ignorenulls)`` window
fills each left row with the most recent right row at-or-before it.
Exactly ONE shuffle (by key) + one sort — no range join explosion, no
per-key collect; skewed keys are split by AQE like any window shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str] | None = None,
    suffix: str = "_right",
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: latest right row with ts ≤ left ts, per key.

    Unmatched left rows keep nulls (LEFT semantics).  Right payload
    columns are packed into one struct so all filled values come from
    the SAME matched row.

    ``tolerance`` (an INTERVAL string, e.g. ``"15 MINUTES"``) bounds
    how stale a match may be: a matched right row older than
    ``left_ts − tolerance`` is masked back to null — the pandas
    ``merge_asof(tolerance=...)`` semantics.  Implemented as a
    post-fill mask, so the plan shape (one shuffle + one sort) is
    unchanged.
    """
    if right_payload is None:
        right_payload = [c for c in right.columns
                         if c not in set(on) and c != right_ts]
    payload = F.struct(F.col(right_ts).alias("__ts"),
                       *[F.col(c) for c in right_payload])

    lt = left.withColumn("__side", F.lit(1)).withColumn("__p", F.lit(None).cast(
        right.select(payload.alias("__p")).schema["__p"].dataType))
    rt = (right.select(*on, F.col(right_ts).alias(left_ts), payload.alias("__p"))
          .withColumn("__side", F.lit(0)))
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = lt.select(*lt.columns).unionByName(rt.select(*lt.columns))

    # right rows sort before left rows at equal ts → ties match (<=).
    w = (W.partitionBy(*on).orderBy(F.col(left_ts), F.col("__side"))
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    filled = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    if tolerance is not None:
        fresh = (F.col("__m.__ts")
                 >= F.col(left_ts) - F.expr(f"INTERVAL {tolerance}"))
        filled = filled.withColumn("__m", F.when(fresh, F.col("__m")))
    out = filled.filter(F.col("__side") == 1).drop("__side", "__p")
    out = out.withColumn(f"{left_ts}{suffix}", F.col(f"__m.__ts"))
    for c in right_payload:
        name = c if c not in left.columns else f"{c}{suffix}"
        out = out.withColumn(name, F.col(f"__m.{c}"))
    return out.drop("__m")
