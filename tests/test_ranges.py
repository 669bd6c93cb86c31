"""Range-join semantics: containment, bucket boundaries, left path."""

from __future__ import annotations

import datetime

from datawarehouseproject_spark.operators.ranges import range_join


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def test_range_join_matches_containment(spark):
    points = spark.createDataFrame(
        [(1, _ts(1, 30), "p1"), (1, _ts(5), "p2"), (2, _ts(1), "p3")],
        "k long, ts timestamp, pid string",
    )
    # interval spans multiple 1h buckets; p2 outside; p3 wrong key row
    intervals = spark.createDataFrame(
        [(1, _ts(1), _ts(3), "i1"), (2, _ts(2), _ts(4), "i2")],
        "k long, session_start timestamp, session_end timestamp, iid string",
    )
    out = range_join(points, intervals, ["k"], "ts", "session_start",
                     "session_end", bucket_seconds=3600)
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    assert got == {("p1", "i1")}


def test_range_join_left_keeps_unmatched(spark):
    points = spark.createDataFrame(
        [(1, _ts(1, 30), "p1"), (1, _ts(12), "p2")],
        "k long, ts timestamp, pid string",
    )
    intervals = spark.createDataFrame(
        [(1, _ts(1), _ts(3), "i1")],
        "k long, session_start timestamp, session_end timestamp, iid string",
    )
    out = range_join(points, intervals, ["k"], "ts", "session_start",
                     "session_end", how="left")
    got = {r["pid"]: r["iid"] for r in out.collect()}
    assert got == {"p1": "i1", "p2": None}


def test_range_join_inclusive_boundaries(spark):
    points = spark.createDataFrame(
        [(1, _ts(1), "lo"), (1, _ts(3), "hi")], "k long, ts timestamp, pid string"
    )
    intervals = spark.createDataFrame(
        [(1, _ts(1), _ts(3), "i1")],
        "k long, session_start timestamp, session_end timestamp, iid string",
    )
    out = range_join(points, intervals, ["k"], "ts", "session_start",
                     "session_end")
    assert {r["pid"] for r in out.collect()} == {"lo", "hi"}
