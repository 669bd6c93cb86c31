"""Dimension maintenance: set-based get_or_create_sk semantics
(load_dwh.py:18-44,141-227)."""

from __future__ import annotations

from datawarehouseproject_spark.operators.dims import latest_per_key, upsert_dim


def test_bootstrap_assigns_sequential_sks(spark):
    b1 = spark.createDataFrame(
        [("L2", "v1", 2), ("L1", "v1", 1)], ["LINK", "attr", "ord"]
    )
    dim = upsert_dim(None, b1, ["LINK"], "SK", order_col="ord")
    got = {r["LINK"]: r["SK"] for r in dim.collect()}
    assert got == {"L1": 1, "L2": 2}


def test_upsert_keeps_sk_overwrites_attrs_mints_new(spark):
    b1 = spark.createDataFrame([("L1", "v1", 1), ("L2", "v1", 2)], ["LINK", "attr", "ord"])
    d1 = upsert_dim(None, b1, ["LINK"], "SK", order_col="ord")
    b2 = spark.createDataFrame([("L1", "v2", 1), ("L3", "v1", 3)], ["LINK", "attr", "ord"])
    d2 = upsert_dim(d1, b2, ["LINK"], "SK", order_col="ord")
    got = {r["LINK"]: (r["SK"], r["attr"]) for r in d2.collect()}
    assert got == {"L1": (1, "v2"), "L2": (2, "v1"), "L3": (3, "v1")}


def test_last_write_wins_per_key(spark):
    # quirk 11: the reference's row loop blindly overwrites; the final
    # dim row reflects the latest processed row per natural key
    b = spark.createDataFrame(
        [("L1", "first", 1), ("L1", "last", 2)], ["LINK", "attr", "ord"]
    )
    latest = latest_per_key(b, ["LINK"], "ord")
    assert latest.collect()[0]["attr"] == "last"
    dim = upsert_dim(None, b, ["LINK"], "SK", order_col="ord")
    rows = dim.collect()
    assert len(rows) == 1 and rows[0]["attr"] == "last"


def test_nullsafe_natural_key(spark):
    # P6: NULL natural keys match NULL dim rows (IS NULL lookups)
    b1 = spark.createDataFrame([(None, "v1", 1)], "LINK string, attr string, ord int")
    d1 = upsert_dim(None, b1, ["LINK"], "SK", order_col="ord")
    b2 = spark.createDataFrame([(None, "v2", 1)], "LINK string, attr string, ord int")
    d2 = upsert_dim(d1, b2, ["LINK"], "SK", order_col="ord")
    rows = d2.collect()
    assert len(rows) == 1 and rows[0]["SK"] == 1 and rows[0]["attr"] == "v2"
