"""Join operator grid — 5 types × nulls_equal × broadcast modes
(mirrors the reference's exhaustive grid, python/tests/test_join.py:71-120).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from legate_dataframe_spark.operators.join import join

LHS = [(1, 10), (2, 20), (3, 30), (None, 40), (5, 50), (1, 11)]
RHS = [(1, -1), (2, -2), (None, -4), (6, -6), (2, -22)]


def _expected(join_type: str, nulls_equal: bool):
    def match(a, b):
        if a is None or b is None:
            return nulls_equal and a is None and b is None
        return a == b

    inner = [(la, pa, rb, pb) for la, pa in LHS for rb, pb in RHS if match(la, rb)]
    if join_type == "inner":
        return sorted(inner, key=str)
    if join_type == "left":
        matched = {(la, pa) for la, pa, *_ in inner}
        extra = [(la, pa, None, None) for la, pa in LHS if (la, pa) not in matched]
        return sorted(inner + extra, key=str)
    if join_type == "full":
        matched_l = {(la, pa) for la, pa, *_ in inner}
        matched_r = {(rb, pb) for *_, rb, pb in inner}
        extra_l = [(la, pa, None, None) for la, pa in LHS if (la, pa) not in matched_l]
        extra_r = [(None, None, rb, pb) for rb, pb in RHS if (rb, pb) not in matched_r]
        return sorted(inner + extra_l + extra_r, key=str)
    if join_type == "left_semi":
        return sorted({(la, pa) for la, pa, *_ in inner}, key=str)
    if join_type == "left_anti":
        matched = {(la, pa) for la, pa, *_ in inner}
        return sorted({(la, pa) for la, pa in LHS} - matched, key=str)
    raise AssertionError(join_type)


@pytest.fixture(scope="module")
def frames(spark):
    lhs = spark.createDataFrame(LHS, "a: long, payload_a: long")
    rhs = spark.createDataFrame(RHS, "b: long, payload_b: long")
    return lhs, rhs


@pytest.mark.parametrize("join_type", ["inner", "left", "full", "left_semi", "left_anti"])
@pytest.mark.parametrize("nulls_equal", [True, False])
@pytest.mark.parametrize("broadcast", ["auto", "left", "right"])
def test_join_grid(frames, join_type, nulls_equal, broadcast):
    lhs, rhs = frames
    out = join(lhs, rhs, ["a"], ["b"], join_type,
               nulls_equal=nulls_equal, broadcast=broadcast)
    got = sorted([tuple(r) for r in out.collect()], key=str)
    assert got == _expected(join_type, nulls_equal)


def test_join_multikey_column_order(spark):
    # FIXTURES F3 regression: key order != column order
    lhs = spark.createDataFrame([(i, 6 - i) for i in range(1, 6)], "a_a: long, b_a: long")
    rhs = spark.createDataFrame([(6 - i, i) for i in range(1, 6)], "a_b: long, b_b: long")
    out = join(lhs, rhs, ["a_a", "b_a"], ["b_b", "a_b"], "inner")
    got = sorted(tuple(r) for r in out.collect())
    assert got == [(i, 6 - i, 6 - i, i) for i in range(1, 6)]


def test_join_suffix_on_clash(spark):
    lhs = spark.createDataFrame([(1, "x")], "k: long, v: string")
    rhs = spark.createDataFrame([(1, "y")], "k: long, v: string")
    out = join(lhs, rhs, ["k"], ["k"], "inner")
    assert out.columns == ["k", "v", "k_right", "v_right"]
    assert out.collect() == [Row(k=1, v="x", k_right=1, v_right="y")]


def test_join_out_columns(spark):
    lhs = spark.createDataFrame([(1, "x")], "k: long, v: string")
    rhs = spark.createDataFrame([(1, "y")], "k: long, w: string")
    out = join(lhs, rhs, ["k"], ["k"], "inner",
               lhs_out_columns=["v"], rhs_out_columns=["w"])
    assert out.columns == ["v", "w"]


def test_join_duplicate_keys_multiplicity(spark):
    lhs = spark.createDataFrame([(1,), (2,), (3,), (4,), (5,)], "a: long")
    rhs = spark.createDataFrame([(1,), (1,), (2,), (2,), (5,), (6,)], "b: long")
    out = join(lhs, rhs, ["a"], ["b"], "inner")
    assert out.count() == 5  # 2 + 2 + 1
