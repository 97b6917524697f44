"""Deterministic dataset splitting — train/val/test assignment that is
reproducible across runs, partitionings, and engines.

``DataFrame.randomSplit`` is none of those (it samples per-partition
with a seed, so adding one input file reshuffles every assignment).
Hash-splitting assigns each row by a pure function of its id: stable
under re-runs, appends, repartitioning, and engine changes — the
property a training pipeline needs so yesterday's val doc can never
leak into tomorrow's train set.  md5 keeps it reproducible in DuckDB
for the oracle gate (same discipline as the minhash pipeline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def hash_bucket(id_col: Column, salt: str = "split") -> Column:
    """Uniform bucket in [0, 1e6) from md5(salt || id) — first 8 hex
    chars as an integer (F.conv), mod 1e6."""
    h = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % F.lit(_BUCKETS))


def split_by_hash(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Label each row with its split by cumulative fraction bands.

    ``fractions`` e.g. ``{"train": 0.9, "val": 0.05, "test": 0.05}``
    (must sum to 1 ± 1e-9; band edges are exact integers so the same
    row lands in the same split everywhere)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = hash_bucket(F.col(id_col), salt)
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        edge = int(round(cum * _BUCKETS))
        cond = bucket < F.lit(edge)
        expr = F.when(cond, F.lit(name)) if expr is None else \
            expr.when(cond, F.lit(name))
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(F.lit(names[-1])))
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``k`` rows per stratum, deterministic and append-aware.

    Rows rank within their stratum by md5(id) — a stable pseudo-random
    order reproducible in any engine (``df.sample`` is none of:
    exact-k, engine-stable, partition-stable).  One window pass per
    stratum; strata are the parallelism unit, so low-cardinality
    strata columns (lang, source) shuffle once and scale with the
    stratum count, not the corpus.
    """
    from pyspark.sql import Window as _W

    order = F.md5(F.col(id_col).cast("string"))
    w = _W.partitionBy(*strata_cols).orderBy(order, id_col)
    return (df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k).drop("__rk"))


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    quotas: dict[str, int],
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-mixture sampling: draw a per-stratum QUOTA of rows (e.g.
    rebalance a web corpus to a target lang/domain mixture), exact-k
    and engine-stable like :func:`stratified_sample` but with a
    different k per stratum.

    ``quotas`` maps stratum value → row budget; strata absent from the
    map contribute nothing (the "drop this domain" case).  Rows rank
    within their stratum by md5(id), so the drawn subset is stable
    under re-runs, appends, and repartitioning — the property a
    data-mixture ablation needs to be reproducible.

    Scale: one window shuffle keyed by the stratum column; the quota
    map rides the plan as a literal CASE (it is mixture-spec-sized,
    not data-sized).
    """
    from pyspark.sql import Window as _W

    expr = None
    for val, k in quotas.items():
        cond = F.col(stratum_col) == F.lit(val)
        expr = F.when(cond, F.lit(k)) if expr is None else \
            expr.when(cond, F.lit(k))
    quota = expr.otherwise(F.lit(0)) if expr is not None else F.lit(0)
    order = F.md5(F.col(id_col).cast("string"))
    w = _W.partitionBy(stratum_col).orderBy(order, id_col)
    return (df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= quota).drop("__rk"))
