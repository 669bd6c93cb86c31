"""DIM_DATE generator parity (populate_dim_date.py:36-81)."""

from __future__ import annotations

import datetime

from datawarehouseproject_spark.functions.dates import date_dim


def test_dim_shape_and_quirks(spark):
    dd = date_dim(spark)
    rows = {r["FULL_DATE"]: r for r in dd.collect()}
    assert len(rows) == 4018  # 2020-01-01 .. 2030-12-31 (quirk 9)

    jan1 = rows[datetime.date(2020, 1, 1)]
    assert jan1["DATE_SK"] == 1
    assert jan1["DAY_OF_WEEK"] == "Thứ Tư"  # Wednesday
    # week-0 quirk (quirk 8): Sunday-start week began 2019-12-29
    assert jan1["SUN_WEEK_OF_YEAR"] == 0
    assert jan1["SUN_YEAR_WEEK"] == "2020-W00 (Sun)"
    assert jan1["MON_WEEK_OF_YEAR"] == 0
    assert jan1["QUARTER"] == "Q1"
    assert jan1["QUARTER_OF_YEAR"] == datetime.date(2020, 1, 1)
    assert jan1["CALENDAR_MONTH"] == "Tháng 1"
    assert jan1["DAY_TYPE"] == "Ngày thường"
    assert jan1["HOLIDAY"] == "Không"

    sat = rows[datetime.date(2020, 1, 4)]
    assert sat["DAY_TYPE"] == "Cuối tuần"
    assert sat["DAY_OF_WEEK"] == "Thứ Bảy"

    # a mid-year date with ordinary week numbers
    mid = rows[datetime.date(2024, 7, 17)]
    assert mid["DAY_OF_WEEK"] == "Thứ Tư"
    assert mid["CALENDAR_YEAR_MONTH"] == "2024-07"
    assert mid["QUARTER"] == "Q3"
    assert mid["QUARTER_OF_YEAR"] == datetime.date(2024, 7, 1)
