"""Skew mitigation: salted joins for pathological key distributions.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on
by default in ``session.py``) handles most skew at runtime by splitting
oversized sort-merge partitions — prefer it.  Salting is the explicit
fallback for the cases AQE does not cover:

- shuffled **hash** joins (AQE splits sort-merge partitions only);
- skew known a priori (one customer = 30% of a 100 TB fact table),
  where replicating the matching dimension rows S ways beats letting
  one task read 30 TB and get split after the fact;
- skewed ``groupBy`` with non-algebraic aggregates where partial
  aggregation can't shrink the hot key's partition.

The reference has no skew handling at all — its all-to-all
``repartition_by_hash`` (cpp/src/core/repartition_by_hash.cpp:153-247)
sends every hot-key row to one rank; this module is the Spark-scale
capability it lacks.

Mechanics: the big (skewed) side gets a uniform random salt in
``[0, S)``; the other side is replicated S times via ``explode`` so
every (key, salt) pair still meets its matches.  With ``hot_keys``
given, only those keys are salted/replicated — cold keys pay nothing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__ldf_salt"


def _join_cond(left: DataFrame, right: DataFrame,
               left_keys: Sequence[str], right_keys: Sequence[str]) -> Column:
    cond = left[_SALT] == right[_SALT]
    for lk, rk in zip(left_keys, right_keys):
        cond = cond & (left[lk] == right[rk])
    return cond


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_keys: Sequence[str],
    right_keys: Sequence[str] | None = None,
    how: str = "inner",
    salt: int = 16,
    hot_keys: Sequence | None = None,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with ``left`` treated as the skewed side.

    ``right`` rows are replicated ``salt`` times (all rows, or only
    rows whose first key is in ``hot_keys``), so keep ``right`` the
    smaller side — replication cost is ``salt ×`` its hot subset.
    Supports ``inner`` and ``left`` (the right side is duplicated, so
    right/full-outer would double-count unmatched right rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    right_keys = list(right_keys or left_keys)
    left_keys = list(left_keys)

    if hot_keys is not None:
        # fail loudly on a key/literal dtype mismatch: array_contains
        # with e.g. int literals against a string key column matches
        # nothing, silently restoring the original skew while still
        # paying the replication cost (ADVICE r01)
        import datetime
        import decimal

        def family(dtype: str) -> str:
            if dtype in ("tinyint", "smallint", "int", "bigint",
                         "float", "double") or dtype.startswith("decimal"):
                return "numeric"
            if dtype in ("date", "timestamp", "timestamp_ntz"):
                return dtype
            return dtype

        l_dtype = dict(left.dtypes)[left_keys[0]]
        r_dtype = dict(right.dtypes)[right_keys[0]]
        if family(l_dtype) != family(r_dtype):
            # same FAMILY suffices (int vs bigint widens safely); only
            # cross-family joins (string vs numeric) are rejected
            raise TypeError(
                f"salted_join hot_keys: left key {left_keys[0]!r} is "
                f"{l_dtype} but right key {right_keys[0]!r} is {r_dtype}")
        _literal_ok = {
            "numeric": lambda k: isinstance(
                k, (int, float, decimal.Decimal)) and not isinstance(k, bool),
            "string": lambda k: isinstance(k, str),
            "boolean": lambda k: isinstance(k, bool),
            "date": lambda k: isinstance(k, datetime.date)
            and not isinstance(k, datetime.datetime),
            "timestamp": lambda k: isinstance(k, datetime.datetime),
            "timestamp_ntz": lambda k: isinstance(k, datetime.datetime),
        }
        fam = family(l_dtype)
        check = _literal_ok.get(fam)
        if check is None:
            # no validated mapping for this dtype: refuse loudly rather
            # than risk the silent no-salt degradation (ADVICE r01)
            raise TypeError(
                f"salted_join hot_keys: unsupported key dtype {l_dtype}; "
                "supported families: " + ", ".join(sorted(_literal_ok)))
        integral = l_dtype in ("tinyint", "smallint", "int", "bigint")
        for k in hot_keys:
            if not check(k):
                raise TypeError(
                    f"salted_join hot_keys: literal {k!r} "
                    f"({type(k).__name__}) does not match key column "
                    f"{left_keys[0]!r} of type {l_dtype}")
            # a fractional literal against an integral key would pass the
            # family check and then cast-truncate (1.5 → 1), silently
            # salting an unintended key — the same silent-mismatch class
            # the guard exists for (ADVICE r02)
            if (integral and isinstance(k, (float, decimal.Decimal))
                    and not float(k).is_integer()):
                raise TypeError(
                    f"salted_join hot_keys: fractional literal {k!r} "
                    f"would truncate when cast to integral key column "
                    f"{left_keys[0]!r} ({l_dtype})")
        # cast literals to the key column's exact type so comparison
        # never falls back to a lossy implicit coercion
        hot = F.array(*[F.lit(k).cast(l_dtype) for k in hot_keys])
        l_salted = left.withColumn(
            _SALT,
            F.when(F.array_contains(hot, F.col(left_keys[0])),
                   (F.rand(seed) * salt).cast("int"))
            .otherwise(F.lit(0)))
        r_salted = right.withColumn(
            _SALT,
            F.when(F.array_contains(hot, F.col(right_keys[0])),
                   F.sequence(F.lit(0), F.lit(salt - 1)))
            .otherwise(F.array(F.lit(0))))
    else:
        l_salted = left.withColumn(
            _SALT, (F.rand(seed) * salt).cast("int"))
        r_salted = right.withColumn(
            _SALT, F.sequence(F.lit(0), F.lit(salt - 1)))
    r_salted = r_salted.withColumn(_SALT, F.explode(_SALT))

    joined = l_salted.join(
        r_salted, _join_cond(l_salted, r_salted, left_keys, right_keys), how)
    return joined.drop(_SALT)


def salted_groupby(
    df: DataFrame,
    keys: Sequence[str],
    exprs: dict[str, tuple[str, str]],
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase skew-proof groupBy: partial agg on (keys, salt), final
    re-agg on keys.  ``exprs``: out_name → (in_col, kind) with kind in
    sum/min/max/count — the algebraic set that re-aggregates exactly
    (mean callers decompose to sum+count).  For built-in algebraic aggs
    Spark's own partial aggregation already does this; the helper is
    for hot-key distributions so extreme that even the partial pass
    must be spread over ``salt`` tasks.
    """
    _merge = {"sum": F.sum, "min": F.min, "max": F.max, "count": F.sum}
    _first = {"sum": F.sum, "min": F.min, "max": F.max, "count": F.count}
    bad = {k for _, (_, k) in exprs.items()} - set(_merge)
    if bad:
        raise ValueError(f"non-reaggregable kinds: {sorted(bad)}")
    partial = (df.withColumn(_SALT, (F.rand(seed) * salt).cast("int"))
               .groupBy(*keys, _SALT)
               .agg(*[_first[kind](col).alias(out)
                      for out, (col, kind) in exprs.items()]))
    return (partial.groupBy(*keys)
            .agg(*[_merge[kind](out).alias(out)
                   for out, (_, kind) in exprs.items()]))
