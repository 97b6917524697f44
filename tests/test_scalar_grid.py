"""Exhaustive scalar-function differential grid vs DuckDB.

Mirrors the reference's dtype×null×op sweeps
(/root/reference/python/tests/test_binaryop.py's op×dtype grids): every
BINARY_OPS / UNARY_OPS entry is evaluated over a value grid covering
every integer width, float32/float64, nulls in every position, NaN,
±inf and signed zero — and must agree with DuckDB evaluating the same
expression over the same rows (both engines follow IEEE-754 + SQL
3-valued logic, incl. NaN==NaN / NaN-greatest total order).

Domain-restricted ops (sqrt/ln/asin/…) run on columns confined to
their domain — engines legitimately differ outside it (DuckDB raises,
Spark yields NaN/null); the reference restricts its grids the same way.

All Spark expressions evaluate in ONE select (single JVM roundtrip);
ditto DuckDB — the grid is ~150 expressions but wall-clock-cheap.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from legate_dataframe_spark.functions.binaryop import binary_operation
from legate_dataframe_spark.functions.unaryop import unary_operation

NAN = float("nan")
INF = float("inf")

# column → (values, duckdb type).  8 rows; row 3 = all-null, rows mix
# negatives, extremes, NaN/±inf/-0.0 where the dtype allows.
GRID: dict[str, tuple[list, str]] = {
    "t": ([1, -2, 5, None, 7, 0, -8, 3], "TINYINT"),
    "s": ([2, -3, 6, None, 100, 1, -50, 9], "SMALLINT"),
    "i": ([3, -4, 7, None, 1000, -1, 0, 12], "INTEGER"),
    "b": ([4, -5, 8, None, 100000, 0, -99999, 2], "BIGINT"),
    "f": ([1.5, -0.5, NAN, None, INF, -0.0, -INF, 2.25], "FLOAT"),
    "d": ([2.5, -1.25, NAN, None, -INF, 0.0, INF, -3.5], "DOUBLE"),
    # strictly-positive (log/sqrt domains); also zero-free divisors
    "pf": ([0.5, 2.0, 100.0, None, 1e-3, 1.0, 42.0, 7.5], "DOUBLE"),
    "pb": ([2.0, 10.0, 0.5, None, 3.0, 2.5, 8.0, 1.5], "DOUBLE"),
    # [-1, 1] (asin/acos domain)
    "ud": ([-1.0, 0.5, 1.0, None, -0.25, 0.0, 0.75, -0.5], "DOUBLE"),
    # >= 1 (acosh domain)
    "ah": ([1.0, 1.5, 3.0, None, 100.0, 2.0, 1.25, 10.0], "DOUBLE"),
    # strictly inside (-1, 1) (atanh domain)
    "th": ([-0.9, 0.5, 0.99, None, -0.25, 0.0, 0.5, -0.75], "DOUBLE"),
    # non-negative ints: DuckDB raises on shifting negatives (Spark
    # follows Java two's-complement) — shifts compare on this domain
    "u": ([3, 0, 7, None, 1000, 1, 64, 12], "INTEGER"),
    "ub": ([4, 0, 8, None, 100000, 1, 4096, 2], "BIGINT"),
    "bool1": ([True, False, True, None, False, True, None, False], "BOOLEAN"),
    "bool2": ([False, True, True, None, False, None, True, None], "BOOLEAN"),
}
N_ROWS = 8

# (op, lhs, rhs, duckdb expression) — lhs/rhs are GRID columns.
BINARY_CASES = [
    ("add", "t", "s", "t + s"),
    ("add", "i", "b", "i + b"),
    ("add", "f", "d", "f + d"),
    ("subtract", "s", "t", "s - t"),
    ("subtract", "d", "f", "d - f"),
    ("multiply", "t", "i", "t * i"),
    ("multiply", "d", "d", "d * d"),
    ("divide", "i", "s", "CAST(i AS DOUBLE) / s"),
    ("divide", "d", "pb", "d / pb"),
    ("true_divide", "b", "s", "CAST(b AS DOUBLE) / s"),
    ("floor_divide", "i", "s", "CAST(FLOOR(CAST(i AS DOUBLE) / s) AS BIGINT)"),
    ("floor_divide", "b", "pb", "CAST(FLOOR(b / pb) AS BIGINT)"),
    ("power", "pf", "s", "POW(pf, s)"),
    ("power", "ud", "i", "POW(ud, i)"),
    ("logb", "pf", "pb", "LOG(pb, pf)"),
    ("atan2", "ud", "th", "ATAN2(ud, th)"),
    ("atan2", "d", "f", "ATAN2(d, f)"),
    ("bit_wise_and", "t", "s", "t & s"),
    ("bit_wise_and", "i", "b", "i & b"),
    ("bit_wise_or", "t", "s", "t | s"),
    ("bit_wise_or", "i", "b", "i | b"),
    ("bit_wise_xor", "i", "b", "xor(i, b)"),
    ("equal", "i", "s", "i = s"),
    ("equal", "d", "f", "d = f"),
    ("not_equal", "i", "s", "i <> s"),
    ("less", "d", "f", "d < f"),
    ("less_equal", "t", "b", "t <= b"),
    ("greater", "d", "d", "d > d"),
    ("greater_equal", "f", "d", "f >= d"),
    ("and", "bool1", "bool2", "bool1 AND bool2"),
    ("or", "bool1", "bool2", "bool1 OR bool2"),
    ("and_kleene", "bool1", "bool2", "bool1 AND bool2"),
    ("or_kleene", "bool1", "bool2", "bool1 OR bool2"),
]

# literal-rhs shifts (Spark's shiftleft/right take an int literal)
SHIFT_CASES = [
    ("shift_left", "u", 3, "u << 3"),
    ("shift_left", "ub", 7, "ub << 7"),
    ("shift_right", "u", 2, "u >> 2"),
    ("shift_right", "ub", 1, "ub >> 1"),
]

UNARY_CASES = [
    ("sin", "ud", "SIN(ud)"),
    ("cos", "ud", "COS(ud)"),
    ("tan", "th", "TAN(th)"),
    ("asin", "ud", "ASIN(ud)"),
    ("acos", "ud", "ACOS(ud)"),
    ("atan", "d", "ATAN(d)"),
    # DuckDB has no hyperbolic builtins — use the defining formulas
    ("sinh", "th", "(EXP(th) - EXP(-th)) / 2"),
    ("cosh", "ud", "(EXP(ud) + EXP(-ud)) / 2"),
    ("tanh", "th", "(EXP(th) - EXP(-th)) / (EXP(th) + EXP(-th))"),
    ("asinh", "th", "LN(th + SQRT(th * th + 1))"),
    ("acosh", "ah", "LN(ah + SQRT(ah * ah - 1))"),
    ("atanh", "th", "LN((1 + th) / (1 - th)) / 2"),
    ("exp", "ud", "EXP(ud)"),
    ("sqrt", "pf", "SQRT(pf)"),
    ("ln", "pf", "LN(pf)"),
    ("log2", "pf", "LOG2(pf)"),
    ("log10", "pf", "LOG10(pf)"),
    ("ceil", "ud", "CAST(CEIL(ud) AS BIGINT)"),
    ("floor", "ud", "CAST(FLOOR(ud) AS BIGINT)"),
    ("abs", "i", "ABS(i)"),
    ("abs", "d", "ABS(d)"),
    ("negate", "s", "-s"),
    ("negate", "d", "-d"),
    ("bit_not", "t", "~t"),
    ("bit_not", "b", "~b"),
    ("invert", "bool1", "NOT bool1"),
    # engine-semantics pin: Spark's isnan(NULL) = false (DuckDB: NULL);
    # the engine exposes Spark's null-safe-false semantics
    ("is_nan", "d", "CASE WHEN d IS NULL THEN FALSE ELSE ISNAN(d) END"),
    ("is_null", "f", "f IS NULL"),
    ("is_valid", "s", "s IS NOT NULL"),
]


def _close(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, bool) or isinstance(b, bool):
        return bool(a) == bool(b)
    fa, fb = float(a), float(b)
    if math.isnan(fa) or math.isnan(fb):
        return math.isnan(fa) and math.isnan(fb)
    if math.isinf(fa) or math.isinf(fb):
        return fa == fb
    return math.isclose(fa, fb, rel_tol=1e-6, abs_tol=1e-9)


@pytest.fixture(scope="module")
def grid_results(spark):
    """Evaluate the whole grid once in each engine."""
    import pandas as pd

    pdf = pd.DataFrame({k: pd.Series(v, dtype="object")
                        for k, (v, _) in GRID.items()})
    schema = ", ".join(
        f"{k}: {t.lower().replace('integer', 'int').replace('tinyint', 'byte').replace('smallint', 'short').replace('bigint', 'long')}"
        for k, (_, t) in GRID.items())
    sdf = spark.createDataFrame(
        [tuple(row) for row in pdf.itertuples(index=False)], schema)

    exprs, duck_exprs = [], []
    for n, (op, l, r, dsql) in enumerate(BINARY_CASES):
        exprs.append(binary_operation(F.col(l), F.col(r), op).alias(f"c{n}"))
        duck_exprs.append(f"{dsql} AS c{n}")
    off = len(BINARY_CASES)
    for n, (op, l, amt, dsql) in enumerate(SHIFT_CASES):
        exprs.append(binary_operation(F.col(l), amt, op).alias(f"c{off+n}"))
        duck_exprs.append(f"{dsql} AS c{off+n}")
    off += len(SHIFT_CASES)
    for n, (op, c, dsql) in enumerate(UNARY_CASES):
        exprs.append(unary_operation(F.col(c), op).alias(f"c{off+n}"))
        duck_exprs.append(f"{dsql} AS c{off+n}")

    sdf = sdf.withColumn("__row", F.monotonically_increasing_id())
    spark_rows = (sdf.select("__row", *exprs).orderBy("__row")
                  .drop("__row").collect())

    con = duckdb.connect()
    cols = ", ".join(f"CAST(v{j} AS {t}) AS {k}"
                     for j, (k, (_, t)) in enumerate(GRID.items()))
    values = ", ".join(
        "(" + ", ".join(
            _duck_lit(GRID[k][0][row]) for k in GRID) + f", {row})"
        for row in range(N_ROWS))
    vnames = ", ".join([f"v{j}" for j in range(len(GRID))] + ["rn"])
    con.execute(f"CREATE VIEW g AS SELECT {cols}, rn FROM "
                f"(VALUES {values}) AS t({vnames})")
    duck_rows = con.execute(
        f"SELECT {', '.join(duck_exprs)} FROM g ORDER BY rn").fetchall()
    return spark_rows, duck_rows


def _duck_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('nan' AS DOUBLE)"
        if v == INF:
            return "CAST('inf' AS DOUBLE)"
        if v == -INF:
            return "CAST('-inf' AS DOUBLE)"
        return repr(v)
    return repr(v)


ALL_CASES = ([(f"c{n}", f"binary:{op}({l},{r})")
              for n, (op, l, r, _) in enumerate(BINARY_CASES)]
             + [(f"c{len(BINARY_CASES)+n}", f"shift:{op}({l},{amt})")
                for n, (op, l, amt, _) in enumerate(SHIFT_CASES)]
             + [(f"c{len(BINARY_CASES)+len(SHIFT_CASES)+n}", f"unary:{op}({c})")
                for n, (op, c, _) in enumerate(UNARY_CASES)])


@pytest.mark.parametrize("col,label", ALL_CASES, ids=[l for _, l in ALL_CASES])
def test_scalar_grid_matches_duckdb(grid_results, col, label):
    spark_rows, duck_rows = grid_results
    idx = int(col[1:])
    for row in range(N_ROWS):
        got, want = spark_rows[row][col], duck_rows[row][idx]
        assert _close(got, want), (
            f"{label} row {row}: spark={got!r} duckdb={want!r}")


# ---------------------------------------------------------------- strings
# STRING_OPS differential vs DuckDB over unicode / empty / null /
# whitespace / regex-metacharacter values.  Known divergence kept OUT
# of the grid and pinned separately below: upper('ß') is 'SS' in Spark
# (Java full case mapping) but 'ẞ' (capital sharp s) in DuckDB.
STR_VALUES = ["Hello World", "", None, "  padded  ", "ünïcödé",
              "a.b*c", "line1\nline2", "ALLCAPS", "hello"]

STRING_CASES = [
    ("starts_with", "he", None, "starts_with(s, 'he')"),
    ("ends_with", "lo", None, "ends_with(s, 'lo')"),
    ("match_substring", "l1", None, "contains(s, 'l1')"),
    ("match_substring_regex", "^[a-z]+$", None,
     "regexp_matches(s, '^[a-z]+$')"),
    ("lowercase", None, None, "lower(s)"),
    ("uppercase", None, None, "upper(s)"),
    ("strip_chars", None, None, "trim(s)"),
    ("len_chars", None, None, "CAST(length(s) AS INTEGER)"),
    ("reverse", None, None, "reverse(s)"),
    ("replace", "l+", "L", "regexp_replace(s, 'l+', 'L', 'g')"),
]


@pytest.mark.parametrize("op,pat,repl,dsql", STRING_CASES,
                         ids=[c[0] for c in STRING_CASES])
def test_string_ops_match_duckdb(spark, op, pat, repl, dsql):
    from legate_dataframe_spark.functions.strings import string_function

    sdf = spark.createDataFrame([(v,) for v in STR_VALUES], "s: string")
    got = [r["r"] for r in
           sdf.select(string_function(F.col("s"), op, pat, repl).alias("r"))
           .collect()]
    con = duckdb.connect()
    vals = ", ".join("(NULL)" if v is None else "(" + "'" + v.replace("'", "''") + "')"
                     for v in STR_VALUES)
    want = [row[0] for row in con.execute(
        f"SELECT {dsql} FROM (VALUES {vals}) AS t(s)").fetchall()]
    assert got == want, f"{op}: spark={got!r} duckdb={want!r}"


def test_uppercase_sharp_s_divergence_pinned(spark):
    """Engine-semantics pin: Java's full case mapping expands ß → SS;
    DuckDB maps ß → ẞ.  The engine exposes Spark/Java semantics — this
    test documents the divergence so a future engine change is loud."""
    from legate_dataframe_spark.functions.strings import string_function

    sdf = spark.createDataFrame([("straße",)], "s: string")
    got = sdf.select(string_function(F.col("s"), "uppercase").alias("r")) \
        .collect()[0]["r"]
    assert got == "STRASSE"
    duck = duckdb.connect().execute("SELECT upper('straße')").fetchone()[0]
    assert duck == "STRAẞE"  # what DuckDB does instead
