"""SCD2 operator semantics (db_staging.sql:4929-4991 parity).

Covers the quirks a set-based rewrite can silently lose: member-key /
track-key asymmetry with fan-out (quirk 2), NULL-unsafe compare
(quirk 3), idempotent re-run, and the one-current-row invariant.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from datawarehouseproject_spark.functions.cleaning import SCD_OPEN
from datawarehouseproject_spark.operators.scd2 import scd2_apply

SCHEMA = (
    "TEN string, LINK string, GIA_CU decimal(18,2), GIA_MOI decimal(18,2), "
    "KICH_THUOC_MAN_HINH decimal(4,2), RAM int, BO_NHO int"
)
COMPARE = ("GIA_CU", "GIA_MOI", "KICH_THUOC_MAN_HINH", "RAM", "BO_NHO")


def _staging(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _d(x):
    return Decimal(x) if x is not None else None


def row(ten, link, gia_cu="10.00", gia_moi="9.00", ktm="6.50", ram=8, bo=256):
    return (ten, link, _d(gia_cu), _d(gia_moi), _d(ktm), ram, bo)


def _apply(st, hist, now):
    return scd2_apply(st, hist, compare_cols=COMPARE, now=now)


def current(hist):
    return hist.filter(F.col("EXPIRED_AT") == F.to_timestamp(F.lit(SCD_OPEN)))


def test_bootstrap_all_inserted(spark):
    st = _staging(spark, [row("a", "L1"), row("b", "L2")])
    res = _apply(st, None, "2024-01-01 00:00:00")
    m = res.metrics()
    assert m == {"rows_input": 2, "rows_inserted": 2, "rows_updated": 0}
    assert current(res.history).count() == 2


def test_change_expires_and_reinserts(spark):
    st1 = _staging(spark, [row("a", "L1", gia_moi="9.00")])
    r1 = _apply(st1, None, "2024-01-01 00:00:00")
    st2 = _staging(spark, [row("a", "L1", gia_moi="7.00")])
    r2 = _apply(st2, r1.history, "2024-01-02 00:00:00")
    assert r2.metrics() == {"rows_input": 1, "rows_inserted": 1, "rows_updated": 1}
    hist = r2.history.collect()
    assert len(hist) == 2
    cur = [h for h in hist if str(h["EXPIRED_AT"]).startswith("9999")]
    assert len(cur) == 1 and cur[0]["GIA_MOI"] == Decimal("7.00")


def test_unchanged_is_noop_and_idempotent(spark):
    st = _staging(spark, [row("a", "L1"), row("b", "L2")])
    r1 = _apply(st, None, "2024-01-01 00:00:00")
    r2 = _apply(st, r1.history, "2024-01-02 00:00:00")
    assert r2.metrics() == {"rows_input": 2, "rows_inserted": 0, "rows_updated": 0}
    assert r2.history.count() == 2


def test_null_unsafe_compare_skips_nulls(spark):
    # NULL attribute never registers as changed (quirk 3: `<>` is
    # NULL-unsafe in the reference's EXPIRED_KEYS scan)
    st1 = _staging(spark, [row("a", "L1", gia_moi=None)])
    r1 = _apply(st1, None, "2024-01-01 00:00:00")
    st2 = _staging(spark, [row("a", "L1", gia_moi="5.00")])
    r2 = _apply(st2, r1.history, "2024-01-02 00:00:00")
    # NULL <> 5.00 is NULL -> not changed; other attrs equal -> no-op
    assert r2.metrics() == {"rows_input": 1, "rows_inserted": 0, "rows_updated": 0}


def test_key_asymmetry_fanout(spark):
    """Same TEN on two LINKs (quirk 2): membership is by TEN, so the
    day-2 row is NOT a new member; change tracking is by (TEN, LINK),
    and cross-LINK attribute diffs expire BOTH rows — including the
    reference's sequencing where day-2's insert happens first."""
    st1 = _staging(spark, [row("a", "L1", gia_moi="9.00")])
    r1 = _apply(st1, None, "2024-01-01 00:00:00")
    # day 2: same TEN, different LINK, different attrs
    st2 = _staging(spark, [row("a", "L2", gia_moi="7.00")])
    r2 = _apply(st2, r1.history, "2024-01-02 00:00:00")
    hist = r2.history.collect()
    # L1's current row was expired (attrs differ via the TEN join);
    # L2 was never inserted (TEN already a member, and (a, L2) only
    # enters EXPIRED_KEYS from the history side -> no L2 rows at all).
    links = sorted((h["LINK"], str(h["EXPIRED_AT"])[:4]) for h in hist)
    assert links == [("L1", "2024")]


def test_one_current_row_per_track_key(spark):
    st1 = _staging(
        spark, [row("a", "L1"), row("b", "L2", gia_moi="1.00"), row("c", "L3")]
    )
    r1 = _apply(st1, None, "2024-01-01 00:00:00")
    st2 = _staging(
        spark,
        [row("a", "L1", ram=16), row("b", "L2", gia_moi="2.00"), row("d", "L4")],
    )
    r2 = _apply(st2, r1.history, "2024-01-02 00:00:00")
    cur = current(r2.history).groupBy("TEN", "LINK").count().collect()
    assert all(r["count"] == 1 for r in cur)
    # history only ever grows: 3 day-1 rows (a,b expired; c current)
    # + d inserted + a,b re-inserted = 6
    assert r2.history.count() == 6


def test_as_of_time_travel(spark):
    """State as of an instant between runs = the day-1 current set:
    day-2 expiries reappear in their day-1 version, day-2 inserts
    vanish, and probing before day 1 returns nothing."""
    from datawarehouseproject_spark.operators.scd2 import as_of, scd2_apply

    st1 = spark.createDataFrame(
        [("a", "L1", "x", 10, 20, 5, 8, 256), ("b", "L2", "y", 11, 21, 5, 8, 256)],
        "TEN string, LINK string, LINK_ANH string, GIA_CU int, GIA_MOI int, "
        "KICH_THUOC_MAN_HINH int, RAM int, BO_NHO int",
    )
    st2 = spark.createDataFrame(
        [("a", "L1", "x", 99, 20, 5, 8, 256), ("c", "L3", "z", 12, 22, 5, 8, 256)],
        st1.schema,
    )
    r1 = scd2_apply(st1, None, now="2024-01-01 00:00:00")
    r2 = scd2_apply(st2, r1.history, now="2024-01-03 00:00:00")

    mid = {(r["TEN"], r["GIA_CU"]) for r in as_of(r2.history, "2024-01-02 00:00:00").collect()}
    assert mid == {("a", 10), ("b", 11)}  # day-1 state, no 'c', old 'a'
    after = {(r["TEN"], r["GIA_CU"]) for r in as_of(r2.history, "2024-01-04 00:00:00").collect()}
    assert after == {("a", 99), ("b", 11), ("c", 12)}
    assert as_of(r2.history, "2023-12-31 00:00:00").count() == 0


def test_diff_between_classifies_changes(spark):
    from datawarehouseproject_spark.operators.scd2 import (
        diff_between,
        scd2_apply,
    )

    st1 = spark.createDataFrame(
        [("a", "L1", "x", 10, 20, 5, 8, 256), ("b", "L2", "y", 11, 21, 5, 8, 256)],
        "TEN string, LINK string, LINK_ANH string, GIA_CU int, GIA_MOI int, "
        "KICH_THUOC_MAN_HINH int, RAM int, BO_NHO int",
    )
    st2 = spark.createDataFrame(
        [("a", "L1", "x", 99, 20, 5, 8, 256), ("c", "L3", "z", 12, 22, 5, 8, 256)],
        st1.schema,
    )
    r1 = scd2_apply(st1, None, now="2024-01-01 00:00:00")
    r2 = scd2_apply(st2, r1.history, now="2024-01-03 00:00:00")
    got = {(r["TEN"], r["change_type"])
           for r in diff_between(
               r2.history, "2024-01-02 00:00:00", "2024-01-04 00:00:00"
           ).collect()}
    # 'a' changed price, 'c' added; 'b' unchanged (dropped); SCD2
    # never removes, so no 'removed' rows in this history
    assert got == {("a", "changed"), ("c", "added")}
