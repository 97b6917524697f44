"""Property-based differential: operators/asof.py::asof_join vs
pandas.merge_asof (the semantics reference for as-of joins), with and
without a staleness tolerance.

Right-side (key, ts) pairs are generated UNIQUE: at equal timestamps
within a key the winning payload is tie-ambiguous in both engines (our
window orders by (ts, side) only; pandas by input order), so the
contract is defined on distinct event times — the shape real event
data has.
"""

from __future__ import annotations

import datetime

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from legate_dataframe_spark.operators.asof import asof_join

_T0 = datetime.datetime(2024, 1, 1, 12, 0)

KEYS = st.integers(min_value=0, max_value=3)
MINS = st.integers(min_value=0, max_value=120)

LEFTS = st.lists(st.tuples(KEYS, MINS), min_size=1, max_size=12)
RIGHTS = st.lists(st.tuples(KEYS, MINS), min_size=0, max_size=12,
                  unique=True)


def _ts(mins: int) -> datetime.datetime:
    return _T0 + datetime.timedelta(minutes=mins)


def _pandas_asof(lrows, rrows, tolerance_mins=None):
    left = pd.DataFrame(
        {"eid": range(len(lrows)),
         "k": [k for k, _ in lrows],
         "ts": [_ts(m) for _, m in lrows]}).sort_values("ts", kind="stable")
    # explicit dtypes: an EMPTY right side must still carry int64/
    # datetime64 keys or merge_asof raises on dtype mismatch
    right = pd.DataFrame(
        {"k": pd.Series([k for k, _ in rrows], dtype="int64"),
         "ts": pd.Series(pd.to_datetime([_ts(m) for _, m in rrows])),
         "payload": pd.Series([k * 1000 + m for k, m in rrows],
                              dtype="int64")}).sort_values("ts",
                                                           kind="stable")
    kw = {}
    if tolerance_mins is not None:
        kw["tolerance"] = pd.Timedelta(minutes=tolerance_mins)
    merged = pd.merge_asof(left, right, on="ts", by="k",
                           direction="backward", **kw)
    return {int(r.eid): (None if pd.isna(r.payload) else int(r.payload))
            for r in merged.itertuples()}


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(LEFTS, RIGHTS, st.sampled_from([None, 0, 7, 30]))
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows,
                                             tol):
    left = spark.createDataFrame(
        [(i, k, _ts(m)) for i, (k, m) in enumerate(lrows)],
        "eid: long, k: long, ts: timestamp")
    right = spark.createDataFrame(
        [(k, _ts(m), k * 1000 + m) for k, m in rrows],
        "k: long, ts: timestamp, payload: long") if rrows else \
        spark.createDataFrame([], "k: long, ts: timestamp, payload: long")
    got = {r["eid"]: r["payload"]
           for r in asof_join(
               left, right, on=["k"], left_ts="ts", right_ts="ts",
               right_payload=["payload"],
               tolerance=None if tol is None else f"{tol} MINUTES",
           ).collect()}
    want = _pandas_asof(lrows, rrows, tol)
    assert got == want
