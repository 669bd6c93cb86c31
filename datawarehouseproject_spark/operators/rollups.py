"""Data-mart rollups (A1/A2) with reference-exact quirks.

``load_datamart.py:110-161``: two GROUP BYs over AGGREGATE. Preserved
quirks (SURVEY.md §2.9):

- "AVG" is a **midrange** ``(MAX(max)+MIN(min))/2``, not ``avg()``;
- the quarterly label is ``CONCAT('Q', dim.QUARTER)`` where the dim
  already stores 'Q1' -> the mart shows **'QQ1'**.

Scale design: both rollups are partial-aggregatable (max/min), so
Spark's map-side combine applies; the date dim joins broadcast. The
monthly mart groups by DATE_SK so it stays partition-aligned with
AGGREGATE — at 100 TB the groupBy degenerates to a near-local
aggregation per date partition under AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def midrange(max_col: Column, min_col: Column) -> Column:
    """The reference's mislabeled AVG: (max + min) / 2."""
    return (max_col + min_col) / 2


def monthly_rollup(aggregate: DataFrame) -> DataFrame:
    """DM_PRODUCT_DAILY_PRICE (load_datamart.py:115-131)."""
    gmax = F.max("MAX_PRICE")
    gmin = F.min("MIN_PRICE")
    return aggregate.groupBy(
        "DATE_SK", "PRODUCT_SK", "BRAND_SK", "ID_CONFIG", "CALENDAR_YEAR", "CALENDAR_MONTH"
    ).agg(
        gmax.alias("MAX_PRICE"),
        gmin.alias("MIN_PRICE"),
        midrange(gmax, gmin).alias("AVG_PRICE"),
    )


def quarterly_rollup(aggregate: DataFrame, dim_date: DataFrame) -> DataFrame:
    """DM_PRODUCT_QUARTERLY_TREND (load_datamart.py:141-158).

    Joins the date dim for QUARTER (J7, broadcast) and prepends 'Q'
    to the already-prefixed label (the 'QQ1' quirk).
    """
    joined = aggregate.join(
        F.broadcast(dim_date.select("DATE_SK", "QUARTER")), "DATE_SK"
    )
    gmin = F.min("MIN_PRICE")
    gmax = F.max("MAX_PRICE")
    return joined.groupBy(
        "PRODUCT_SK", "BRAND_SK", "ID_CONFIG", "CALENDAR_YEAR", "QUARTER"
    ).agg(
        gmin.alias("QUARTER_MIN_PRICE"),
        gmax.alias("QUARTER_MAX_PRICE"),
        midrange(gmin, gmax).alias("QUARTER_AVG_PRICE"),
    ).select(
        "PRODUCT_SK",
        "BRAND_SK",
        "ID_CONFIG",
        "CALENDAR_YEAR",
        F.concat(F.lit("Q"), F.col("QUARTER")).alias("QUARTER_NAME"),
        "QUARTER_MIN_PRICE",
        "QUARTER_MAX_PRICE",
        "QUARTER_AVG_PRICE",
    )
