"""DIM_DATE generator (reference parity).

Re-expresses ``populate_dim_date.py:36-81`` (a Python day-loop with
``executemany``) as a single distributed plan: ``spark.range`` over
the day span -> 19 derived attribute columns -> DataFrame. All
semantics preserved (SURVEY.md §2.9 quirks 8-9):

- Vietnamese weekday/month labels (populate_dim_date.py:53-55);
- **non-ISO week numbering**: ``(week_start - Jan1).days // 7 + 1``
  with Python *floor* division, so early-January days whose week
  started in the prior year get week 0 (populate_dim_date.py:58-63).
  Reproduced with ``floor(datediff/7)`` — NOT ``weekofyear()``;
- quarter label 'Q1'..'Q4' and quarter-start date
  (populate_dim_date.py:12-15,66-68);
- constant holiday 'Không'; weekend flag 'Cuối tuần'/'Ngày thường'.

Scale note: the span is ~4k rows (2020-2030) — trivially broadcast;
``spark.range`` partitions the generation so a century-scale span
would still parallelize.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VN_WEEKDAYS = ("Thứ Hai", "Thứ Ba", "Thứ Tư", "Thứ Năm", "Thứ Sáu", "Thứ Bảy", "Chủ Nhật")


def date_dim(
    spark: SparkSession,
    start: str = "2020-01-01",
    end: str = "2030-12-31",
) -> DataFrame:
    """Build the full DIM_DATE table for [start, end]."""
    d0 = _dt.date.fromisoformat(start)
    d1 = _dt.date.fromisoformat(end)
    n_days = (d1 - d0).days + 1

    df = spark.range(0, n_days).select(
        (F.col("id") + 1).cast("int").alias("DATE_SK"),
        F.date_add(F.lit(d0), F.col("id").cast("int")).alias("FULL_DATE"),
    )

    d = F.col("FULL_DATE")
    # Python weekday(): Monday=0..Sunday=6; Spark dayofweek(): Sunday=1.
    py_weekday = (F.dayofweek(d) + 5) % 7
    year_start = F.trunc(d, "year")
    sun_week_start = F.date_sub(d, ((py_weekday + 1) % 7))
    mon_week_start = F.date_sub(d, py_weekday)
    # Floor division (matches Python //, which rounds toward -inf for
    # the negative deltas of early-January days -> week 0).
    sun_week_of_year = (
        F.floor(F.datediff(sun_week_start, year_start) / 7) + 1
    ).cast("int")
    mon_week_of_year = (
        F.floor(F.datediff(mon_week_start, year_start) / 7) + 1
    ).cast("int")
    quarter_num = F.quarter(d)

    weekday_label = F.element_at(
        F.array(*[F.lit(w) for w in VN_WEEKDAYS]), (py_weekday + 1).cast("int")
    )

    return df.select(
        "DATE_SK",
        "FULL_DATE",
        F.dayofmonth(d).alias("INT_DAY"),
        F.month(d).alias("INT_MONTH"),
        weekday_label.alias("DAY_OF_WEEK"),
        F.concat(F.lit("Tháng "), F.month(d).cast("string")).alias("CALENDAR_MONTH"),
        F.year(d).alias("CALENDAR_YEAR"),
        F.date_format(d, "yyyy-MM").alias("CALENDAR_YEAR_MONTH"),
        F.dayofmonth(d).alias("DATE_OF_MONTH"),
        F.dayofyear(d).alias("DAY_OF_YEAR"),
        sun_week_of_year.alias("SUN_WEEK_OF_YEAR"),
        F.concat(
            F.year(d).cast("string"),
            F.lit("-W"),
            F.lpad(sun_week_of_year.cast("string"), 2, "0"),
            F.lit(" (Sun)"),
        ).alias("SUN_YEAR_WEEK"),
        sun_week_start.alias("SUN_WEEK"),
        mon_week_of_year.alias("MON_WEEK_OF_YEAR"),
        F.concat(
            F.year(d).cast("string"),
            F.lit("-W"),
            F.lpad(mon_week_of_year.cast("string"), 2, "0"),
            F.lit(" (Mon)"),
        ).alias("MON_YEAR_WEEK"),
        mon_week_start.alias("MON_WEEK"),
        F.concat(F.lit("Q"), quarter_num.cast("string")).alias("QUARTER"),
        F.trunc(d, "quarter").alias("QUARTER_OF_YEAR"),
        F.lit("Không").alias("HOLIDAY"),
        F.when(py_weekday >= 5, "Cuối tuần").otherwise("Ngày thường").alias("DAY_TYPE"),
    )
