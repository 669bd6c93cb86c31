"""Cleaning-battery parity tests (db_staging.sql:4883-4920 semantics)."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from datawarehouseproject_spark.functions.cleaning import (
    clean_gb,
    clean_price,
    clean_screen_size,
    junk_row_filter,
    null_repair,
    sentinel_greatest,
    sentinel_least,
)


def _vals(spark, col_fn, inputs):
    df = spark.createDataFrame([(v,) for v in inputs], ["c"])
    return [r[0] for r in df.select(col_fn("c")).collect()]


def test_clean_price(spark):
    out = _vals(
        spark,
        clean_price,
        ["34.990.000đ", "1,299,000 ₫", "", "-1", None, "abc", "500", "12 500đ"],
    )
    assert out == [
        Decimal("34990000.00"),
        Decimal("1299000.00"),
        Decimal("-1.00"),
        Decimal("-1.00"),
        Decimal("-1.00"),
        Decimal("0.00"),  # MySQL CAST garbage -> 0 (never NULL)
        Decimal("500.00"),
        Decimal("12500.00"),
    ]


def test_clean_screen_size(spark):
    # 'inch' (non-empty, digitless): REGEXP_SUBSTR -> NULL ->
    # CAST(NULL) -> NULL -> COALESCE -> -1 (unlike the price battery's
    # plain CAST, where MySQL parses garbage to 0)
    out = _vals(spark, clean_screen_size, ["6.9 inches", '6.7"', "", None, "inch"])
    assert out == [
        Decimal("6.90"),
        Decimal("6.70"),
        Decimal("-1.00"),
        Decimal("-1.00"),
        Decimal("-1.00"),
    ]


def test_clean_gb_quirks(spark):
    # '1 TB' -> 1 (quirk 6, db_staging.sql:4907-4908 + MySQL SIGNED cast)
    out = _vals(spark, clean_gb, ["8 GB", "12GB", "1 TB", "", None, "GB"])
    assert out == [8, 12, 1, -1, -1, 0]


def test_null_repair(spark):
    out = _vals(spark, null_repair, ["x", "", None])
    assert out == ["x", "Unknown", "Unknown"]


def test_junk_row_filter(spark):
    df = spark.createDataFrame(
        [("abc", "de", "fg"), ("a-very-long-name", "link", "img"), (None, None, None)],
        ["TEN", "LINK", "LINK_ANH"],
    )
    kept = df.filter(junk_row_filter("TEN", "LINK", "LINK_ANH")).collect()
    assert len(kept) == 1 and kept[0]["TEN"] == "a-very-long-name"


def test_sentinel_minmax_branches(spark):
    # the 4-branch case of load_dwh.py:166-184
    rows = [
        (Decimal("-1.00"), Decimal("5.00"), Decimal("5.00"), Decimal("5.00")),
        (Decimal("3.00"), Decimal("5.00"), Decimal("3.00"), Decimal("5.00")),
        (Decimal("3.00"), Decimal("-1.00"), Decimal("3.00"), Decimal("3.00")),
        (Decimal("-1.00"), None, None, None),
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b, _, _ in rows],
        "a decimal(18,2), b decimal(18,2)",
    )
    got = df.select(
        sentinel_least("a", "b").alias("lo"), sentinel_greatest("a", "b").alias("hi")
    ).collect()
    for (_, _, lo, hi), r in zip(rows, got):
        assert r["lo"] == lo and r["hi"] == hi
