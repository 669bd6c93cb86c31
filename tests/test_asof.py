"""As-of join semantics: inclusive ties, no-match NULLs, latest-wins."""

from __future__ import annotations

import datetime

from datawarehouseproject_spark.operators.asof import asof_join


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "e1"), (1, _ts(30), "e2"), (2, _ts(5), "e3")],
        "k long, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 100.0), (1, _ts(20), 200.0), (1, _ts(40), 300.0)],
        "k long, ts timestamp, px double",
    )
    out = {r["ev"]: r["px"] for r in
           asof_join(left, right, ["k"], "ts", "ts", ["px"]).collect()}
    assert out == {"e1": 100.0, "e2": 200.0, "e3": None}


def test_asof_tie_is_inclusive(spark):
    left = spark.createDataFrame([(1, _ts(10), "e1")], "k long, ts timestamp, ev string")
    right = spark.createDataFrame([(1, _ts(10), 7.0)], "k long, ts timestamp, px double")
    out = asof_join(left, right, ["k"], "ts", "ts", ["px"]).collect()
    assert out[0]["px"] == 7.0  # right row at equal ts is visible
