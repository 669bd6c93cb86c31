"""Cleaning stage: PRODUCTS_GENERAL -> PRODUCTS_TRANSFORM.

The reference's ``SP_ETL_Clean_Data`` (db_staging.sql:4883-4920) as
one declarative plan: junk filter (P2) -> cleaning projection (P1) ->
left join to the date dim (J1, broadcast) -> SK_DATE null-repair.
Catalyst pushes the junk filter into the Parquet scan and broadcasts
the 4k-row date dim; no shuffle on the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import (
    MISSING_DATE_KEY,
    clean_gb,
    clean_price,
    clean_screen_size,
    junk_row_filter,
    null_repair,
)


def clean_products(raw: DataFrame, dim_date: DataFrame) -> DataFrame:
    """Apply the full P1+P2 battery and resolve SK_DATE.

    ``raw`` must carry the landing schema (F1 in FIXTURES.md):
    ID, TEN, LINK, LINK_ANH, GIA_CU, GIA_MOI, KICH_THUOC_MAN_HINH,
    RAM, BO_NHO, NGAY, ID_CONFIG — all strings except ID/NGAY/
    ID_CONFIG. ``dim_date`` needs (DATE_SK, FULL_DATE).
    """
    filtered = raw.filter(junk_row_filter("TEN", "LINK", "LINK_ANH"))
    dd = F.broadcast(dim_date.select("DATE_SK", "FULL_DATE"))
    joined = filtered.join(
        dd, F.to_date(filtered["NGAY"]) == dd["FULL_DATE"], "left"
    )
    return joined.select(
        F.col("ID"),
        null_repair("TEN").alias("TEN"),
        null_repair("LINK").alias("LINK"),
        null_repair("LINK_ANH").alias("LINK_ANH"),
        clean_price("GIA_CU").alias("GIA_CU"),
        clean_price("GIA_MOI").alias("GIA_MOI"),
        clean_screen_size("KICH_THUOC_MAN_HINH").alias("KICH_THUOC_MAN_HINH"),
        clean_gb("RAM").alias("RAM"),
        clean_gb("BO_NHO").alias("BO_NHO"),
        F.coalesce(F.col("DATE_SK"), F.lit(MISSING_DATE_KEY)).alias("SK_DATE"),
        F.col("NGAY"),
        F.col("ID_CONFIG"),
    )
