"""Mart rollups: midrange quirk + QQ label (load_datamart.py)."""

from __future__ import annotations

from decimal import Decimal

from datawarehouseproject_spark.operators.rollups import (
    monthly_rollup,
    quarterly_rollup,
)
from datawarehouseproject_spark.operators.snapshot import daily_snapshot


def _aggregate(spark):
    cols = (
        "DATE_SK int, PRODUCT_SK int, BRAND_SK int, ID_CONFIG int, "
        "CALENDAR_YEAR int, CALENDAR_MONTH int, MAX_PRICE decimal(18,2), "
        "MIN_PRICE decimal(18,2)"
    )
    rows = [
        (1, 100, 1, 1, 2024, 1, Decimal("10.00"), Decimal("4.00")),
        (1, 100, 1, 1, 2024, 1, Decimal("8.00"), Decimal("6.00")),
        (2, 100, 1, 1, 2024, 1, Decimal("20.00"), Decimal("2.00")),
    ]
    return spark.createDataFrame(rows, cols)


def test_monthly_midrange_not_avg(spark):
    out = monthly_rollup(_aggregate(spark)).collect()
    day1 = next(r for r in out if r["DATE_SK"] == 1)
    # midrange (max(max)+min(min))/2 == (10+4)/2 == 7, not the mean
    assert day1["MAX_PRICE"] == Decimal("10.00")
    assert day1["MIN_PRICE"] == Decimal("4.00")
    assert day1["AVG_PRICE"] == Decimal("7.00")


def test_quarterly_qq_label(spark):
    dim = spark.createDataFrame(
        [(1, "Q1"), (2, "Q1")], "DATE_SK int, QUARTER string"
    )
    out = quarterly_rollup(_aggregate(spark), dim).collect()
    assert len(out) == 1
    r = out[0]
    assert r["QUARTER_NAME"] == "QQ1"  # quirk 5: double prefix
    assert r["QUARTER_MIN_PRICE"] == Decimal("2.00")
    assert r["QUARTER_MAX_PRICE"] == Decimal("20.00")
    assert r["QUARTER_AVG_PRICE"] == Decimal("11.00")


def test_daily_snapshot_literals(spark):
    dim_product = spark.createDataFrame(
        [(1, 100, 1, Decimal("9.00"), Decimal("5.00"))],
        "BRAND_SK int, PRODUCT_SK int, ID_CONFIG int, "
        "MAX_PRICE decimal(18,2), MIN_PRICE decimal(18,2)",
    )
    snap = daily_snapshot(dim_product, date_sk=1500, calendar_year=2024,
                          calendar_month=2).collect()
    assert snap[0]["DATE_SK"] == 1500
    assert snap[0]["CALENDAR_YEAR"] == 2024
    assert snap[0]["MAX_PRICE"] == Decimal("9.00")
