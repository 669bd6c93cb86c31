"""Reference-surface queries (SURVEY.md §2) with DuckDB oracle twins.

Each query re-expresses one (or a composition) of the reference's
operators over the driver's synthetic tables (TESTDATA.md). The
"dirty" product fixtures are constructed *inside the query* from the
``part`` table using SQL fragments shared verbatim between the Spark
plan (``selectExpr``) and the DuckDB oracle, so both engines see
bit-identical inputs.

Determinism rules used throughout (see registry module docstring):
DECIMAL for money sums then cast DOUBLE, explicit INT casts on date
parts, explicit aliases everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.brands import BRAND_LADDER, brand_ladder
from ..functions.cleaning import sentinel_greatest, sentinel_least
from ..functions.dates import date_dim
from ..operators.clean import clean_products
from ..operators.dims import upsert_dim
from ..operators.rollups import midrange
from ..operators.scd2 import as_of, diff_between, scd2_apply
from ..operators.topk import top1_per_group
from .registry import register

DIM_START = "2020-01-01"
DIM_END = "2030-12-31"


from ..catalog import load_table as _t  # noqa: E402  (shared reader)


def _utc(spark: SparkSession) -> None:
    # Apply ALL engine runtime confs, not just the timezone: the
    # driver hands us ITS session, and without dynamic partition
    # overwrite the pipeline queries' day-2 partition write would
    # clobber day-1 (caught by driver-simulation verification).
    from ..session import tune_session

    tune_session(spark)


# --------------------------------------------------------------------
# Shared dirty-fixture fragments (identical text fed to both engines).
# Shapes mirror FIXTURES.md F1: dirty VN price strings, GB suffixes,
# junk rows, out-of-dim-range dates.
# --------------------------------------------------------------------
DIRTY_FRAGMENTS: dict[str, str] = {
    "ID": "p_partkey",
    "TEN": (
        "CASE WHEN p_partkey % 37 = 0 THEN 'x' ELSE concat(p_name, ' ', "
        "CASE CAST(p_partkey % 10 AS INTEGER) "
        "WHEN 0 THEN 'iPhone 15 Pro' WHEN 1 THEN 'Samsung Galaxy S24' "
        "WHEN 2 THEN 'Xiaomi 14' WHEN 3 THEN 'OPPO Reno11' "
        "WHEN 4 THEN 'vivo V30e' WHEN 5 THEN 'realme GT Neo' "
        "WHEN 6 THEN 'Nokia G42' WHEN 7 THEN 'ASUS ROG Phone' "
        "WHEN 8 THEN 'iPhone va Samsung combo' ELSE 'Tecno Spark 20' END) END"
    ),
    "LINK": (
        "CASE WHEN p_partkey % 23 = 0 THEN '' "
        "ELSE concat('/p/', CAST(p_partkey AS VARCHAR(20))) END"
    ),
    "LINK_ANH": "concat('img/', CAST(p_partkey AS VARCHAR(20)), '.jpg')",
    "GIA_CU": (
        "CASE CAST(p_partkey % 5 AS INTEGER) "
        "WHEN 0 THEN '' WHEN 1 THEN '-1' "
        "WHEN 2 THEN concat(CAST(CAST(floor(p_retailprice) AS BIGINT) AS VARCHAR(20)), "
        "'.990.000đ') "
        "WHEN 3 THEN concat(CAST(CAST(floor(p_retailprice) AS BIGINT) AS VARCHAR(20)), "
        "',499,000 ₫') "
        "ELSE concat(CAST(CAST(floor(p_retailprice) AS BIGINT) AS VARCHAR(20)), '000') END"
    ),
    "GIA_MOI": (
        "CASE CAST(p_partkey % 7 AS INTEGER) "
        "WHEN 0 THEN '' "
        "WHEN 1 THEN concat(CAST(CAST(floor(p_retailprice) AS BIGINT) AS VARCHAR(20)), "
        "'.490.000đ') "
        "ELSE concat(CAST(CAST(floor(p_retailprice) AS BIGINT) AS VARCHAR(20)), '900 ₫') END"
    ),
    "KICH_THUOC_MAN_HINH": (
        "CASE WHEN p_partkey % 11 = 0 THEN '' "
        "ELSE concat(CAST(p_size % 10 AS VARCHAR(4)), '.', "
        "CAST(p_partkey % 10 AS VARCHAR(4)), ' inches') END"
    ),
    "RAM": (
        "CASE CAST(p_partkey % 4 AS INTEGER) WHEN 0 THEN '8 GB' "
        "WHEN 1 THEN '12GB' WHEN 2 THEN '' ELSE '256 GB' END"
    ),
    "BO_NHO": (
        "CASE CAST(p_partkey % 4 AS INTEGER) WHEN 0 THEN '256 GB' "
        "WHEN 1 THEN '1 TB' WHEN 2 THEN '512GB' ELSE '' END"
    ),
    "NGAY": (
        "CASE WHEN p_partkey % 40 >= 35 THEN TIMESTAMP '2019-06-01 00:00:00' "
        "ELSE CAST(DATE '2024-01-01' + CAST(p_partkey % 40 AS INTEGER) "
        "AS TIMESTAMP) END"
    ),
    "ID_CONFIG": "CAST(p_partkey % 2 + 1 AS INTEGER)",
}

DIRTY_SELECT = ", ".join(f"{sql} AS {col}" for col, sql in DIRTY_FRAGMENTS.items())

def _clean_cte(dirty_cte: str, out_cte: str) -> str:
    """DuckDB-side replica of the cleaning battery over any dirty
    CTE — reused by the single-day and two-day pipeline oracles."""
    return f"""
{out_cte} AS (
  SELECT
    ID,
    coalesce(nullif(TEN, ''), 'Unknown') AS TEN,
    coalesce(nullif(LINK, ''), 'Unknown') AS LINK,
    coalesce(nullif(LINK_ANH, ''), 'Unknown') AS LINK_ANH,
    CASE WHEN GIA_CU IS NULL OR GIA_CU = '' OR GIA_CU = '-1'
         THEN CAST(-1 AS DECIMAL(18,2))
         ELSE CAST(coalesce(nullif(regexp_extract(
                regexp_replace(GIA_CU, '[.,\\s ]', '', 'g'),
                '^-?[0-9]+', 0), ''), '0') AS DECIMAL(18,2)) END AS GIA_CU,
    CASE WHEN GIA_MOI IS NULL OR GIA_MOI = '' OR GIA_MOI = '-1'
         THEN CAST(-1 AS DECIMAL(18,2))
         ELSE CAST(coalesce(nullif(regexp_extract(
                regexp_replace(GIA_MOI, '[.,\\s ]', '', 'g'),
                '^-?[0-9]+', 0), ''), '0') AS DECIMAL(18,2)) END AS GIA_MOI,
    CASE WHEN KICH_THUOC_MAN_HINH IS NULL OR KICH_THUOC_MAN_HINH = ''
         THEN CAST(-1 AS DECIMAL(4,2))
         ELSE coalesce(CAST(nullif(regexp_extract(KICH_THUOC_MAN_HINH,
                '[0-9]*\\.?[0-9]+', 0), '') AS DECIMAL(4,2)),
              CAST(-1 AS DECIMAL(4,2))) END AS KICH_THUOC_MAN_HINH,
    CASE WHEN RAM IS NULL OR RAM = '' THEN -1
         ELSE coalesce(CAST(nullif(regexp_extract(
                regexp_replace(RAM, 'GB|\\s| ', '', 'g'),
                '^-?[0-9]+', 0), '') AS INTEGER), 0) END AS RAM,
    CASE WHEN BO_NHO IS NULL OR BO_NHO = '' THEN -1
         ELSE coalesce(CAST(nullif(regexp_extract(
                regexp_replace(BO_NHO, 'GB|\\s| ', '', 'g'),
                '^-?[0-9]+', 0), '') AS INTEGER), 0) END AS BO_NHO,
    coalesce(dd.date_sk, 0) AS SK_DATE,
    NGAY,
    ID_CONFIG
  FROM {dirty_cte}
  LEFT JOIN dd ON CAST(NGAY AS DATE) = dd.full_date
  WHERE length(coalesce(TEN, '')) + length(coalesce(LINK, ''))
        + length(coalesce(LINK_ANH, '')) > 10
)"""


#: Shared date-dim CTE (DATE_SK = days since DIM_START + 1).
_DD_CTE = f"""dd AS (
  SELECT CAST(d AS DATE) AS full_date,
         CAST(row_number() OVER (ORDER BY d) AS INTEGER) AS date_sk
  FROM generate_series(DATE '{DIM_START}', DATE '{DIM_END}', INTERVAL 1 DAY) t(d)
)"""

#: Single-day form (used by several oracles): ``clean`` over the
#: standard dirty fixture.
ORACLE_CLEAN = (
    f"WITH dirty AS (SELECT {DIRTY_SELECT} FROM part),\n{_DD_CTE},\n"
    + _clean_cte("dirty", "clean")
    + "\n"
)


def _dirty_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "part").selectExpr(
        *[f"{sql} AS {col}" for col, sql in DIRTY_FRAGMENTS.items()]
    )


# ===================== scans / projections / aggregations =====================

@register(
    "pricing_summary",
    oracle="""
    SELECT p_brand,
           count(*) AS n_items,
           sum(l_quantity) AS sum_qty,
           max(l_extendedprice) AS max_price,
           min(l_extendedprice) AS min_price,
           (max(l_extendedprice) + min(l_extendedprice)) / 2 AS mid_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE CAST(l_shipdate AS DATE) <= DATE '2000-12-01'
    GROUP BY p_brand
    """,
    tags=("flagship", "A1", "J1", "scan", "agg"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: filter -> broadcast join -> groupBy max/min/midrange.

    The A1 rollup shape (load_datamart.py:115-131) on lineitem/part.
    Filter pushes to the Parquet scan; part broadcasts; max/min are
    partial-aggregated map-side.
    """
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") <= F.lit("2000-12-01")
    )
    pt = _t(spark, sf_dir, "part")
    gmax = F.max("l_extendedprice")
    gmin = F.min("l_extendedprice")
    return (
        li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("l_quantity").alias("sum_qty"),
            gmax.alias("max_price"),
            gmin.alias("min_price"),
            midrange(gmax, gmin).alias("mid_price"),
        )
    )


@register(
    "clean_products",
    oracle=ORACLE_CLEAN
    + """
SELECT ID, TEN, LINK, LINK_ANH,
       CAST(GIA_CU AS DOUBLE) AS GIA_CU,
       CAST(GIA_MOI AS DOUBLE) AS GIA_MOI,
       CAST(KICH_THUOC_MAN_HINH AS DOUBLE) AS KICH_THUOC_MAN_HINH,
       RAM, BO_NHO, SK_DATE, NGAY, ID_CONFIG
FROM clean""",
    tags=("P1", "P2", "J1", "cleaning"),
)
def q_clean_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full SP_ETL_Clean_Data battery on synthesized dirty rows.

    Junk filter (P2), null repair, price strip-cast, screen-size
    regex extract, GB strip, date-dim left join with 0 sentinel (J1)
    — db_staging.sql:4883-4920 end to end. The battery runs in
    DECIMAL (reference types); the query projects the money/size
    columns to DOUBLE on BOTH sides so the comparison is
    representation-stable (DECIMAL survives exact compare but pandas
    renders Spark Decimals vs DuckDB float64 differently).
    """
    _utc(spark)
    out = clean_products(_dirty_products(spark, sf_dir), date_dim(spark))
    return out.select(
        "ID",
        "TEN",
        "LINK",
        "LINK_ANH",
        F.col("GIA_CU").cast("double").alias("GIA_CU"),
        F.col("GIA_MOI").cast("double").alias("GIA_MOI"),
        F.col("KICH_THUOC_MAN_HINH").cast("double").alias("KICH_THUOC_MAN_HINH"),
        "RAM",
        "BO_NHO",
        "SK_DATE",
        "NGAY",
        "ID_CONFIG",
    )


_ORACLE_DATE_DIM = f"""
WITH days AS (
  SELECT CAST(d AS DATE) AS d,
         CAST(row_number() OVER (ORDER BY d) AS INTEGER) AS sk,
         CAST((dayofweek(CAST(d AS DATE)) + 6) % 7 AS INTEGER) AS py_wd
  FROM generate_series(DATE '{DIM_START}', DATE '{DIM_END}', INTERVAL 1 DAY) t(d)
),
attrs AS (
  SELECT *,
    d - CAST((py_wd + 1) % 7 AS INTEGER) AS sun_week,
    d - py_wd AS mon_week,
    make_date(CAST(year(d) AS INTEGER), 1, 1) AS jan1
  FROM days
),
weeks AS (
  SELECT *,
    CAST(floor(datediff('day', jan1, sun_week) / 7.0) + 1 AS INTEGER) AS sun_woy,
    CAST(floor(datediff('day', jan1, mon_week) / 7.0) + 1 AS INTEGER) AS mon_woy
  FROM attrs
)
SELECT
  sk AS DATE_SK,
  d AS FULL_DATE,
  CAST(day(d) AS INTEGER) AS INT_DAY,
  CAST(month(d) AS INTEGER) AS INT_MONTH,
  ['Thứ Hai','Thứ Ba','Thứ Tư','Thứ Năm','Thứ Sáu','Thứ Bảy','Chủ Nhật'][py_wd + 1]
    AS DAY_OF_WEEK,
  concat('Tháng ', CAST(month(d) AS VARCHAR(2))) AS CALENDAR_MONTH,
  CAST(year(d) AS INTEGER) AS CALENDAR_YEAR,
  strftime(d, '%Y-%m') AS CALENDAR_YEAR_MONTH,
  CAST(day(d) AS INTEGER) AS DATE_OF_MONTH,
  CAST(dayofyear(d) AS INTEGER) AS DAY_OF_YEAR,
  sun_woy AS SUN_WEEK_OF_YEAR,
  concat(CAST(year(d) AS VARCHAR(4)), '-W',
         lpad(CAST(sun_woy AS VARCHAR(2)), 2, '0'), ' (Sun)') AS SUN_YEAR_WEEK,
  sun_week AS SUN_WEEK,
  mon_woy AS MON_WEEK_OF_YEAR,
  concat(CAST(year(d) AS VARCHAR(4)), '-W',
         lpad(CAST(mon_woy AS VARCHAR(2)), 2, '0'), ' (Mon)') AS MON_YEAR_WEEK,
  mon_week AS MON_WEEK,
  concat('Q', CAST(quarter(d) AS VARCHAR(1))) AS QUARTER,
  date_trunc('quarter', d) AS QUARTER_OF_YEAR,
  'Không' AS HOLIDAY,
  CASE WHEN py_wd >= 5 THEN 'Cuối tuần' ELSE 'Ngày thường' END AS DAY_TYPE
FROM weeks
"""


@register("date_dim", oracle=_ORACLE_DATE_DIM, tags=("F4", "generator", "dates"))
def q_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIM_DATE 2020-2030: 4018 rows, 20 attributes, non-ISO week-0
    quirk (populate_dim_date.py:36-81)."""
    _utc(spark)
    return date_dim(spark, DIM_START, DIM_END)


@register(
    "events_date_join",
    oracle=f"""
    WITH dd AS (
      SELECT CAST(d AS DATE) AS full_date,
             CAST(row_number() OVER (ORDER BY d) AS INTEGER) AS date_sk
      FROM generate_series(DATE '{DIM_START}', DATE '{DIM_END}', INTERVAL 1 DAY) t(d)
    )
    SELECT event_id, coalesce(dd.date_sk, 0) AS date_sk
    FROM events LEFT JOIN dd ON CAST(ts AS DATE) = dd.full_date
    """,
    tags=("J1", "join"),
)
def q_events_date_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: fact left-joins the broadcast date dim; unmatched -> 0."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events")
    dd = F.broadcast(date_dim(spark).select("DATE_SK", "FULL_DATE"))
    return ev.join(dd, F.to_date(ev["ts"]) == dd["FULL_DATE"], "left").select(
        "event_id", F.coalesce(F.col("DATE_SK"), F.lit(0)).alias("date_sk")
    )


_CSV_STR_COLS = (
    "TEN", "LINK", "LINK_ANH", "GIA_CU", "GIA_MOI",
    "KICH_THUOC_MAN_HINH", "RAM", "BO_NHO",
)

_CSV_STR_SELECT = ",\n           ".join(
    f"coalesce({c}, '') AS {c}" for c in _CSV_STR_COLS
)


@register(
    "csv_roundtrip",
    oracle=f"""
    WITH dirty AS (SELECT {DIRTY_SELECT} FROM part)
    SELECT ID,
           {_CSV_STR_SELECT},
           NGAY, ID_CONFIG
    FROM dirty
    """,
    tags=("S2", "S4", "csv", "landing"),
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+S4: the landing CSV sink -> source round-trip.

    The dirty product fixture is written through the crawl-side CSV
    sink (crawl.py:296-306: header, UTF-8, the reference's Vietnamese
    currency strings) and read back through the explicit-schema
    landing source (load_staging.py:144-156; never inferSchema).
    CSV cannot distinguish NULL from '' — and neither does the
    reference (IFNULL(NULLIF(col,'')), db_staging.sql:4893) — so
    string columns are normalized ``coalesce(col, '')`` on BOTH
    sides; everything else (unicode, commas inside quoted fields,
    timestamps) must round-trip exactly.
    """
    import tempfile

    _utc(spark)
    from ..sources.landing import read_landing_csv, write_landing_csv

    root = tempfile.mkdtemp(prefix="dw_landing_rt_")
    path = f"{root}/products_raw_2024_01_05.csv"
    write_landing_csv(_dirty_products(spark, sf_dir), path)
    back = read_landing_csv(spark, path)
    return back.select(
        "ID",
        *[F.coalesce(F.col(c), F.lit("")).alias(c) for c in _CSV_STR_COLS],
        "NGAY",
        "ID_CONFIG",
    )


@register(
    "latest_partition",
    oracle=f"""
    WITH dirty AS (SELECT {DIRTY_SELECT} FROM part)
    SELECT ID, coalesce(TEN, '') AS TEN, coalesce(GIA_MOI, '') AS GIA_MOI,
           ID_CONFIG
    FROM dirty WHERE ID % 3 = 2
    """,
    tags=("S3", "W3", "landing", "latest-file"),
)
def q_latest_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/W3: three dated landing drops; the loader picks the newest
    file by mtime (load_staging.py:25-32) and loads only it. File
    mtimes are pinned with ``os.utime`` so the pick is deterministic,
    not write-order dependent.
    """
    import os as _os
    import tempfile

    _utc(spark)
    from ..sources.landing import (
        latest_landing_path,
        read_landing_csv,
        write_landing_csv,
    )

    root = tempfile.mkdtemp(prefix="dw_landing_lp_")
    dirty = _dirty_products(spark, sf_dir)
    for i, day in enumerate(("04", "05", "06")):
        p = f"{root}/products_raw_2024_01_{day}.csv"
        write_landing_csv(dirty.filter(F.col("ID") % 3 == i), p)
        _os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    back = read_landing_csv(spark, latest_landing_path(root))
    return back.select(
        "ID",
        F.coalesce("TEN", F.lit("")).alias("TEN"),
        F.coalesce("GIA_MOI", F.lit("")).alias("GIA_MOI"),
        "ID_CONFIG",
    )


@register(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, event_type, value FROM (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("W1", "window", "topk"),
)
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 set-based: argmax per group replaces the reference's per-row
    `ORDER BY ... LIMIT 1` N+1 loop (load_staging.py:89-102)."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events")
    return top1_per_group(
        ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    ).select("user_id", "event_id", "event_type", "value")


@register(
    "anti_join_new_keys",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
    tags=("J2", "anti-join"),
)
def q_anti_join_new_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left-anti new-key detection (db_staging.sql:4949-4953) —
    customers with no urgent order (non-empty at every sf)."""
    _utc(spark)
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_custkey").alias("c_custkey"))
    return cust.join(urgent, "c_custkey", "left_anti").select("c_custkey", "c_name")


_PROFILE_SQL = """
  SELECT user_id,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
         max(event_type) AS top_type
  FROM events {where}
  GROUP BY user_id
"""


def _profile(spark: SparkSession, sf_dir: str, upper_date: str | None) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    if upper_date:
        ev = ev.filter(F.to_date("ts") <= F.lit(upper_date))
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        F.max("event_type").alias("top_type"),
    )


@register(
    "changed_users_theta",
    oracle=(
        "WITH p1 AS ("
        + _PROFILE_SQL.format(where="WHERE CAST(ts AS DATE) <= DATE '2024-01-15'")
        + "), p2 AS ("
        + _PROFILE_SQL.format(where="")
        + """)
    SELECT p1.user_id,
           p1.n_events AS n_events_d1, p2.n_events AS n_events_d2,
           p1.total_value AS total_d1, p2.total_value AS total_d2
    FROM p1 JOIN p2 ON p1.user_id = p2.user_id
    WHERE p1.n_events <> p2.n_events OR p1.total_value <> p2.total_value
       OR p1.top_type <> p2.top_type
    """
    ),
    tags=("J3", "theta-join"),
)
def q_changed_users_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: equi-join + NULL-unsafe any-attribute-differs residual
    (db_staging.sql:4957-4969)."""
    _utc(spark)
    p1 = _profile(spark, sf_dir, "2024-01-15").alias("p1")
    p2 = _profile(spark, sf_dir, None).alias("p2")
    neq = (
        (F.col("p1.n_events") != F.col("p2.n_events"))
        | (F.col("p1.total_value") != F.col("p2.total_value"))
        | (F.col("p1.top_type") != F.col("p2.top_type"))
    )
    return (
        p1.join(p2, F.col("p1.user_id") == F.col("p2.user_id"))
        .filter(neq)
        .select(
            F.col("p1.user_id").alias("user_id"),
            F.col("p1.n_events").alias("n_events_d1"),
            F.col("p2.n_events").alias("n_events_d2"),
            F.col("p1.total_value").alias("total_d1"),
            F.col("p2.total_value").alias("total_d2"),
        )
    )


@register(
    "orders_semi_join",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 5000)
    """,
    tags=("J5", "semi-join"),
)
def q_orders_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: left-semi selection (db_staging.sql:4978-4988 pattern)."""
    _utc(spark)
    orders = _t(spark, sf_dir, "orders")
    rich = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return orders.join(
        rich, orders["o_custkey"] == rich["c_custkey"], "left_semi"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "monthly_price_rollup",
    oracle="""
    SELECT l_partkey,
           CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER) AS calendar_year,
           CAST(month(CAST(l_shipdate AS DATE)) AS INTEGER) AS calendar_month,
           count(*) AS n_obs,
           max(l_extendedprice) AS max_price,
           min(l_extendedprice) AS min_price,
           (max(l_extendedprice) + min(l_extendedprice)) / 2 AS avg_price
    FROM lineitem
    GROUP BY 1, 2, 3
    """,
    tags=("A1", "rollup"),
)
def q_monthly_price_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the monthly mart GROUP BY with the midrange-as-AVG quirk
    (load_datamart.py:115-131)."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    gmax = F.max("l_extendedprice")
    gmin = F.min("l_extendedprice")
    return li.groupBy(
        "l_partkey",
        F.year(F.to_date("l_shipdate")).alias("calendar_year"),
        F.month(F.to_date("l_shipdate")).alias("calendar_month"),
    ).agg(
        F.count("*").alias("n_obs"),
        gmax.alias("max_price"),
        gmin.alias("min_price"),
        midrange(gmax, gmin).alias("avg_price"),
    )


@register(
    "quarterly_trend_rollup",
    oracle="""
    SELECT l_partkey,
           CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER) AS calendar_year,
           concat('Q', concat('Q', CAST(quarter(CAST(l_shipdate AS DATE))
                  AS VARCHAR(1)))) AS quarter_name,
           min(l_extendedprice) AS quarter_min_price,
           max(l_extendedprice) AS quarter_max_price,
           (min(l_extendedprice) + max(l_extendedprice)) / 2 AS quarter_avg_price
    FROM lineitem
    GROUP BY 1, 2, 3
    """,
    tags=("A2", "J7", "rollup", "quirk-QQ"),
)
def q_quarterly_trend_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 incl. the 'QQ1' double-prefix label quirk
    (load_datamart.py:141-158; SURVEY §2.9 quirk 5)."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    dim_quarter = F.concat(
        F.lit("Q"), F.quarter(F.to_date("l_shipdate")).cast("string")
    )
    gmin = F.min("l_extendedprice")
    gmax = F.max("l_extendedprice")
    return li.groupBy(
        "l_partkey",
        F.year(F.to_date("l_shipdate")).alias("calendar_year"),
        F.concat(F.lit("Q"), dim_quarter).alias("quarter_name"),
    ).agg(
        gmin.alias("quarter_min_price"),
        gmax.alias("quarter_max_price"),
        midrange(gmin, gmax).alias("quarter_avg_price"),
    )


_BRAND_CASE = " ".join(
    f"WHEN position('{tok}' IN lower(TEN)) > 0 THEN '{brand}'"
    for tok, brand in BRAND_LADDER
)


@register(
    "brand_dim_ladder",
    oracle=f"""
    WITH dirty AS (SELECT {DIRTY_SELECT} FROM part)
    SELECT CASE {_BRAND_CASE} ELSE 'Khác' END AS brand_name,
           count(*) AS n_products
    FROM dirty
    GROUP BY 1
    """,
    tags=("dim-brand", "ladder", "quirk-order"),
)
def q_brand_dim_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered brand contains-ladder, first match wins
    (load_dwh.py:141-153; SURVEY §2.9 quirk 10)."""
    _utc(spark)
    dirty = _dirty_products(spark, sf_dir)
    return dirty.groupBy(brand_ladder("TEN").alias("brand_name")).agg(
        F.count("*").alias("n_products")
    )


@register(
    "sentinel_minmax",
    oracle="""
    WITH px AS (
      SELECT o_orderkey,
        CASE CAST(o_orderkey % 4 AS INTEGER)
          WHEN 0 THEN CAST(-1 AS DECIMAL(18,2))
          WHEN 1 THEN NULL
          ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS gia_cu,
        CASE CAST(o_orderkey % 3 AS INTEGER)
          WHEN 0 THEN CAST(-1 AS DECIMAL(18,2))
          ELSE CAST(o_totalprice AS DECIMAL(18,2)) - 500 END AS gia_moi
      FROM orders)
    SELECT o_orderkey,
      CAST(least(nullif(gia_cu, -1), nullif(gia_moi, -1)) AS DOUBLE) AS min_price,
      CAST(greatest(nullif(gia_cu, -1), nullif(gia_moi, -1)) AS DOUBLE)
        AS max_price,
      CAST(coalesce(least(nullif(gia_cu, -1), nullif(gia_moi, -1)),
               CAST(-1 AS DECIMAL(18,2))) AS DOUBLE) AS min_price_sentinel
    FROM px
    """,
    tags=("A6", "sentinels"),
)
def q_sentinel_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: per-row min/max with -1/NULL treated as missing — the
    4-branch case of load_dwh.py:166-184 as least/greatest algebra."""
    _utc(spark)
    orders = _t(spark, sf_dir, "orders")
    px = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 4 == 0, F.lit(-1).cast("decimal(18,2)"))
        .when(F.col("o_orderkey") % 4 == 1, F.lit(None).cast("decimal(18,2)"))
        .otherwise(F.col("o_totalprice").cast("decimal(18,2)"))
        .alias("gia_cu"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(-1).cast("decimal(18,2)"))
        .otherwise(F.col("o_totalprice").cast("decimal(18,2)") - 500)
        .alias("gia_moi"),
    )
    return px.select(
        "o_orderkey",
        sentinel_least("gia_cu", "gia_moi").cast("double").alias("min_price"),
        sentinel_greatest("gia_cu", "gia_moi").cast("double").alias("max_price"),
        F.coalesce(
            sentinel_least("gia_cu", "gia_moi"), F.lit(-1).cast("decimal(18,2)")
        ).cast("double").alias("min_price_sentinel"),
    )


@register(
    "union_dedup",
    oracle="""
    SELECT DISTINCT * FROM (
      SELECT * FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT * FROM events WHERE value > 100
    )
    """,
    tags=("U1", "U2", "union", "dedup"),
)
def q_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+U2: multi-source union then key dedup (crawl.py:303-305,
    db_staging_sql.sql:94-96)."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click")
    b = ev.filter(F.col("value") > 100)
    return a.unionByName(b).dropDuplicates(["event_id"])


@register(
    "count_guards",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
    tags=("A4", "A5", "counts"),
)
def q_count_guards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5: the status-count guards and per-stage row metrics as one
    grouped aggregation (plus a distinct-agg, free in Spark)."""
    _utc(spark)
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "total_value"
            ),
        )
    )


@register(
    "nullsafe_lookup",
    oracle="""
    WITH src AS (
      SELECT c_custkey, nullif(c_mktsegment, 'AUTOMOBILE') AS seg FROM customer),
    lookup AS (
      SELECT seg, concat('seg:', coalesce(seg, 'NULL')) AS seg_code
      FROM (SELECT DISTINCT seg FROM src))
    SELECT s.c_custkey, l.seg_code
    FROM src s JOIN lookup l ON s.seg IS NOT DISTINCT FROM l.seg
    """,
    tags=("P6", "null-safe"),
)
def q_nullsafe_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: NULL-aware point lookup as a null-safe equi-join
    (load_dwh.py:22-31 builds `IS NULL` predicates per key)."""
    _utc(spark)
    src = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif("c_mktsegment", F.lit("AUTOMOBILE")).alias("seg")
    )
    lookup = src.select("seg").distinct().select(
        "seg", F.concat(F.lit("seg:"), F.coalesce("seg", F.lit("NULL"))).alias(
            "seg_code"
        )
    )
    return src.alias("s").join(
        F.broadcast(lookup).alias("l"),
        F.col("s.seg").eqNullSafe(F.col("l.seg")),
    ).select("s.c_custkey", "l.seg_code")


@register(
    "snapshot_literals",
    oracle="""
    SELECT p_partkey AS product_sk,
           CAST(1500 AS INTEGER) AS date_sk,
           CAST(2024 AS INTEGER) AS calendar_year,
           CAST(2 AS INTEGER) AS calendar_month,
           CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS max_price,
           CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.8 AS DECIMAL(2,1))
                AS DOUBLE) AS min_price
    FROM part
    """,
    tags=("A3", "snapshot"),
)
def q_snapshot_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: the daily AGGREGATE snapshot — dim state projected with
    constant date keys (load_aggregate.py:88-112).

    Price math is decimal-native on both sides (decimal × decimal is
    exact — no double product to round, so no HALF_UP/HALF_EVEN skew)
    and the outputs are projected to DOUBLE for representation-stable
    comparison.
    """
    _utc(spark)
    from decimal import Decimal

    price_dec = F.col("p_retailprice").cast("decimal(18,2)")
    return _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("product_sk"),
        F.lit(1500).cast("int").alias("date_sk"),
        F.lit(2024).cast("int").alias("calendar_year"),
        F.lit(2).cast("int").alias("calendar_month"),
        price_dec.cast("double").alias("max_price"),
        (price_dec * F.lit(Decimal("0.8"))).cast("double").alias("min_price"),
    )


@register(
    "dim_maintenance",
    oracle=(
        "WITH b1 AS ("
        + _PROFILE_SQL.format(where="WHERE CAST(ts AS DATE) <= DATE '2024-01-15'")
        + "), b2 AS ("
        + _PROFILE_SQL.format(where="")
        + """),
    d1 AS (
      SELECT CAST(row_number() OVER (ORDER BY user_id) AS INTEGER) AS user_sk, *
      FROM b1),
    matched AS (
      SELECT d1.user_sk, b2.* FROM b2 JOIN d1 USING (user_id)),
    minted AS (
      SELECT CAST((SELECT max(user_sk) FROM d1)
             + row_number() OVER (ORDER BY user_id) AS INTEGER) AS user_sk, b2.*
      FROM b2 WHERE user_id NOT IN (SELECT user_id FROM d1))
    SELECT * FROM matched UNION ALL SELECT * FROM minted
    """
    ),
    tags=("S9", "J6", "dim-upsert"),
)
def q_dim_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9/J6: set-based get_or_create_sk — day-1 dim build, then a
    day-2 merge that keeps existing SKs, mints sequential SKs for new
    keys, and overwrites attributes (load_dwh.py:18-44,155-225)."""
    _utc(spark)
    b1 = _profile(spark, sf_dir, "2024-01-15")
    b2 = _profile(spark, sf_dir, None)
    d1 = upsert_dim(None, b1, ["user_id"], "USER_SK", order_col="user_id")
    d2 = upsert_dim(d1, b2, ["user_id"], "USER_SK", order_col="user_id")
    return d2.select(
        F.col("USER_SK").alias("user_sk"),
        "user_id",
        "n_events",
        "total_value",
        "top_type",
    )


# ===================== SCD2 (the stateful core) =====================

_STAGING_SQL = """
  SELECT concat('u', CAST(user_id AS VARCHAR(10))) AS TEN,
         concat('L', CAST(user_id % 50 AS VARCHAR(10))) AS LINK,
         concat('A', CAST(user_id AS VARCHAR(10))) AS LINK_ANH,
         CAST(max(value) AS DECIMAL(18,2)) AS GIA_CU,
         CAST(min(value) AS DECIMAL(18,2)) AS GIA_MOI,
         CAST(count(*) % 100 AS DECIMAL(4,2)) AS KICH_THUOC_MAN_HINH,
         CAST(count(*) AS INTEGER) AS RAM,
         CAST(user_id % 1024 AS INTEGER) AS BO_NHO,
         user_id AS ID,
         CAST(user_id % 2 + 1 AS INTEGER) AS ID_CONFIG
  FROM events WHERE CAST(ts AS DATE) <= DATE '{cutoff}'
  GROUP BY user_id
"""

_SCD_OPEN_TS = "TIMESTAMP '9999-12-31 00:00:00'"
_DAY1_TS = "TIMESTAMP '2024-01-15 12:00:00'"
_DAY2_TS = "TIMESTAMP '2024-01-31 12:00:00'"

_SCD_COMPARE = (
    "t.GIA_CU <> s.GIA_CU OR t.GIA_MOI <> s.GIA_MOI OR "
    "t.KICH_THUOC_MAN_HINH <> s.KICH_THUOC_MAN_HINH OR "
    "t.RAM <> s.RAM OR t.BO_NHO <> s.BO_NHO"
)

_SCD_PAYLOAD = (
    "TEN, LINK, LINK_ANH, GIA_CU, GIA_MOI, KICH_THUOC_MAN_HINH, RAM, BO_NHO, "
    "ID, ID_CONFIG"
)

_SCD2_FINAL = """
SELECT TEN, LINK, LINK_ANH,
       CAST(GIA_CU AS DOUBLE) AS GIA_CU,
       CAST(GIA_MOI AS DOUBLE) AS GIA_MOI,
       CAST(KICH_THUOC_MAN_HINH AS DOUBLE) AS KICH_THUOC_MAN_HINH,
       RAM, BO_NHO, ID, ID_CONFIG,
       CAST(CREATED_AT AS VARCHAR) AS CREATED_AT,
       CAST(UPDATED_AT AS VARCHAR) AS UPDATED_AT,
       CAST(EXPIRED_AT AS VARCHAR) AS EXPIRED_AT
FROM hist_out
"""

_ORACLE_SCD2 = f"""
WITH st1 AS ({_STAGING_SQL.format(cutoff='2024-01-15')}),
st2 AS ({_STAGING_SQL.format(cutoff='2024-02-01')}),
h1 AS (
  SELECT {_SCD_PAYLOAD}, {_DAY1_TS} AS CREATED_AT, {_DAY1_TS} AS UPDATED_AT,
         {_SCD_OPEN_TS} AS EXPIRED_AT
  FROM st1),
new2 AS (
  SELECT s.* FROM st2 s
  WHERE NOT EXISTS (SELECT 1 FROM h1 t WHERE t.TEN = s.TEN
                    AND t.EXPIRED_AT = {_SCD_OPEN_TS})),
h2pre AS (
  SELECT * FROM h1
  UNION ALL
  SELECT {_SCD_PAYLOAD}, {_DAY2_TS}, {_DAY2_TS}, {_SCD_OPEN_TS} FROM new2),
changed AS (
  SELECT DISTINCT t.TEN, t.LINK
  FROM h2pre t JOIN st2 s ON t.TEN = s.TEN AND t.EXPIRED_AT = {_SCD_OPEN_TS}
  WHERE {_SCD_COMPARE}),
cur AS (SELECT * FROM h2pre WHERE EXPIRED_AT = {_SCD_OPEN_TS}),
closed AS (SELECT * FROM h2pre WHERE EXPIRED_AT <> {_SCD_OPEN_TS}),
hist_out AS (
SELECT * FROM closed
UNION ALL
SELECT * FROM cur
WHERE NOT EXISTS (SELECT 1 FROM changed c
                  WHERE c.TEN = cur.TEN AND c.LINK = cur.LINK)
UNION ALL
SELECT {_SCD_PAYLOAD}, CREATED_AT, {_DAY2_TS} AS UPDATED_AT,
       {_DAY2_TS} AS EXPIRED_AT
FROM cur
WHERE EXISTS (SELECT 1 FROM changed c
              WHERE c.TEN = cur.TEN AND c.LINK = cur.LINK)
UNION ALL
SELECT {_SCD_PAYLOAD}, {_DAY2_TS}, {_DAY2_TS}, {_SCD_OPEN_TS}
FROM st2 s
WHERE EXISTS (SELECT 1 FROM changed c
              WHERE c.TEN = s.TEN AND c.LINK = s.LINK)
){_SCD2_FINAL}"""


def _scd_staging_both(
    spark: SparkSession, sf_dir: str, cutoff1: str, cutoff2: str
) -> tuple[DataFrame, DataFrame]:
    """Both daily staging profiles from ONE events pass: conditional
    aggregates per cutoff in a single groupBy (same values as two
    filtered groupBys — max/min skip the NULLs the condition
    produces), then two cheap projections off the cached base. Halves
    the scan+shuffle cost of the two-day SCD2 query."""
    ev = _t(spark, sf_dir, "events")

    def day(cond, tag):
        return [
            F.max(F.when(cond, F.col("value"))).cast("decimal(18,2)").alias(f"mx{tag}"),
            F.min(F.when(cond, F.col("value"))).cast("decimal(18,2)").alias(f"mn{tag}"),
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"n{tag}"),
        ]

    c1 = F.to_date("ts") <= F.lit(cutoff1)
    c2 = F.to_date("ts") <= F.lit(cutoff2)
    base = ev.groupBy("user_id").agg(*day(c1, "1"), *day(c2, "2")).cache()

    def staging(tag: str) -> DataFrame:
        return base.filter(F.col(f"n{tag}") > 0).select(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("TEN"),
            F.concat(F.lit("L"), (F.col("user_id") % 50).cast("string")).alias("LINK"),
            F.concat(F.lit("A"), F.col("user_id").cast("string")).alias("LINK_ANH"),
            F.col(f"mx{tag}").alias("GIA_CU"),
            F.col(f"mn{tag}").alias("GIA_MOI"),
            (F.col(f"n{tag}") % 100).cast("decimal(4,2)").alias("KICH_THUOC_MAN_HINH"),
            F.col(f"n{tag}").cast("int").alias("RAM"),
            (F.col("user_id") % 1024).cast("int").alias("BO_NHO"),
            F.col("user_id").alias("ID"),
            (F.col("user_id") % 2 + 1).cast("int").alias("ID_CONFIG"),
        )

    return staging("1"), staging("2")


_BRAND_CASE_CUR = " ".join(
    f"WHEN position('{tok}' IN lower(TEN)) > 0 THEN '{brand}'"
    for tok, brand in BRAND_LADDER
)

#: End-to-end oracle: the whole day-1 pipeline in SQL over the same
#: dirty fixture. Bootstrap SCD2 leaves exactly the clean rows
#: current (expire+reinsert of same-TEN fan-out rows is a no-op on
#: the current set), so dims derive straight from the clean CTE.
_ORACLE_PIPELINE_DAY = ORACLE_CLEAN + f"""
, cur AS (SELECT * FROM clean),
branded AS (
  SELECT *, CASE {_BRAND_CASE_CUR} ELSE 'Khác' END AS BRAND_NAME FROM cur),
dim_brand AS (
  SELECT BRAND_NAME,
         CAST(row_number() OVER (ORDER BY BRAND_NAME) AS INTEGER) AS BRAND_SK
  FROM (SELECT DISTINCT BRAND_NAME FROM branded)),
latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY LINK ORDER BY ID DESC) AS rn
    FROM branded) WHERE rn = 1),
dim_product AS (
  SELECT CAST(row_number() OVER (ORDER BY l.ID) AS INTEGER) AS PRODUCT_SK,
         l.LINK, l.BRAND_NAME, l.ID_CONFIG,
         least(nullif(l.GIA_CU, -1), nullif(l.GIA_MOI, -1)) AS MIN_PRICE,
         greatest(nullif(l.GIA_CU, -1), nullif(l.GIA_MOI, -1)) AS MAX_PRICE
  FROM latest l),
agg AS (
  SELECT b.BRAND_SK, p.PRODUCT_SK, p.ID_CONFIG,
         CAST(datediff('day', DATE '{DIM_START}', DATE '2024-01-05') + 1
              AS INTEGER) AS DATE_SK,
         CAST(2024 AS INTEGER) AS CALENDAR_YEAR,
         CAST(1 AS INTEGER) AS CALENDAR_MONTH,
         p.MAX_PRICE, p.MIN_PRICE
  FROM dim_product p JOIN dim_brand b USING (BRAND_NAME))
SELECT DATE_SK, PRODUCT_SK, BRAND_SK, ID_CONFIG, CALENDAR_YEAR,
       CALENDAR_MONTH,
       CAST(max(MAX_PRICE) AS DOUBLE) AS MAX_PRICE,
       CAST(min(MIN_PRICE) AS DOUBLE) AS MIN_PRICE,
       CAST((max(MAX_PRICE) + min(MIN_PRICE)) / 2 AS DOUBLE) AS AVG_PRICE
FROM agg
GROUP BY 1, 2, 3, 4, 5, 6
"""


@register(
    "pipeline_day",
    oracle=_ORACLE_PIPELINE_DAY,
    tags=("pipeline", "end-to-end", "scd2", "dims", "mart"),
)
def q_pipeline_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE END-TO-END QUERY: one full daily warehouse run — clean ->
    SCD2 bootstrap -> dim maintenance -> AGGREGATE snapshot ->
    monthly mart — executed through the real Pipeline (layered
    Parquet writes, atomic swaps, ledger) into a temp warehouse, with
    the entire dataflow replicated in one SQL oracle.
    """
    import datetime as _dtm
    import tempfile

    _utc(spark)
    from ..catalog import Catalog
    from ..plans.pipeline import Pipeline

    root = tempfile.mkdtemp(prefix="dw_pipeline_day_")
    pipe = Pipeline(Catalog(spark, root))
    raw = _dirty_products(spark, sf_dir)
    pipe.run_day(raw, _dtm.date(2024, 1, 5), now="2024-01-05 21:30:00")
    mart = pipe.cat.table("dm_product_daily_price", "mart")
    return mart.select(
        "DATE_SK",
        "PRODUCT_SK",
        "BRAND_SK",
        "ID_CONFIG",
        "CALENDAR_YEAR",
        "CALENDAR_MONTH",
        F.col("MAX_PRICE").cast("double").alias("MAX_PRICE"),
        F.col("MIN_PRICE").cast("double").alias("MIN_PRICE"),
        F.col("AVG_PRICE").cast("double").alias("AVG_PRICE"),
    )


# ---------------- two-day pipeline (update path) ----------------
# Day-2 feed: same catalog with a price drop on every third product,
# plus a batch of brand-new products. Fragments shared verbatim with
# the oracle.
DIRTY2_FRAGMENTS = dict(DIRTY_FRAGMENTS)
DIRTY2_FRAGMENTS["GIA_MOI"] = (
    "CASE WHEN p_partkey % 3 = 0 THEN "
    "concat(CAST(CAST(floor(p_retailprice) AS BIGINT) AS VARCHAR(20)), '500 ₫') "
    "ELSE " + DIRTY_FRAGMENTS["GIA_MOI"] + " END"
)
DIRTY2_SELECT = ", ".join(f"{sql} AS {col}" for col, sql in DIRTY2_FRAGMENTS.items())

NEW_PRODUCT_EXPRS = [
    "p_partkey + 1000000 AS ID",
    "concat('Moi ', p_name) AS TEN",
    "concat('/p/n/', CAST(p_partkey AS VARCHAR(20))) AS LINK",
    "concat('img/n', CAST(p_partkey AS VARCHAR(20)), '.jpg') AS LINK_ANH",
    "'5.000.000đ' AS GIA_CU",
    "'4.500.000đ' AS GIA_MOI",
    "'6.1 inches' AS KICH_THUOC_MAN_HINH",
    "'8 GB' AS RAM",
    "'128 GB' AS BO_NHO",
    "TIMESTAMP '2024-01-06 00:00:00' AS NGAY",
    "CAST(1 AS INTEGER) AS ID_CONFIG",
]
NEW_PRODUCTS_SELECT = ", ".join(NEW_PRODUCT_EXPRS)

_P1_CTES = f"""
branded1 AS (
  SELECT *, CASE {{brand_case}} ELSE 'Khác' END AS BRAND_NAME FROM clean1),
dim_brand AS (
  SELECT BRAND_NAME,
         CAST(row_number() OVER (ORDER BY BRAND_NAME) AS INTEGER) AS BRAND_SK
  FROM (SELECT DISTINCT BRAND_NAME FROM branded1)),
latest1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY LINK ORDER BY ID DESC) AS rn
    FROM branded1) WHERE rn = 1),
products1 AS (
  SELECT CAST(row_number() OVER (ORDER BY l.ID) AS INTEGER) AS PRODUCT_SK,
         l.LINK, l.BRAND_NAME, l.ID_CONFIG, l.ID,
         least(nullif(l.GIA_CU, -1), nullif(l.GIA_MOI, -1)) AS MIN_PRICE,
         greatest(nullif(l.GIA_CU, -1), nullif(l.GIA_MOI, -1)) AS MAX_PRICE
  FROM latest1 l)"""

_P2_CTES = """
branded2 AS (
  SELECT *, CASE {brand_case} ELSE 'Khác' END AS BRAND_NAME FROM clean2),
latest2 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY LINK ORDER BY ID DESC) AS rn
    FROM branded2) WHERE rn = 1),
products2 AS (
  SELECT p1.PRODUCT_SK, l.LINK, l.BRAND_NAME, l.ID_CONFIG,
         least(nullif(l.GIA_CU, -1), nullif(l.GIA_MOI, -1)) AS MIN_PRICE,
         greatest(nullif(l.GIA_CU, -1), nullif(l.GIA_MOI, -1)) AS MAX_PRICE
  FROM latest2 l JOIN products1 p1 USING (LINK)
  UNION ALL
  SELECT CAST((SELECT max(PRODUCT_SK) FROM products1)
              + row_number() OVER (ORDER BY l.ID) AS INTEGER) AS PRODUCT_SK,
         l.LINK, l.BRAND_NAME, l.ID_CONFIG,
         least(nullif(l.GIA_CU, -1), nullif(l.GIA_MOI, -1)) AS MIN_PRICE,
         greatest(nullif(l.GIA_CU, -1), nullif(l.GIA_MOI, -1)) AS MAX_PRICE
  FROM latest2 l
  WHERE NOT EXISTS (SELECT 1 FROM products1 p WHERE p.LINK = l.LINK))"""


def _two_day_base() -> str:
    date_sk = "CAST(datediff('day', DATE '{start}', DATE '{day}') + 1 AS INTEGER)"
    return (
        f"WITH dirty1 AS (SELECT {DIRTY_SELECT} FROM part),\n"
        f"dirty2 AS (SELECT {DIRTY2_SELECT} FROM part\n"
        f"           UNION ALL SELECT {NEW_PRODUCTS_SELECT} FROM part\n"
        f"           WHERE p_partkey % 20 = 0),\n"
        + _DD_CTE + ",\n"
        + _clean_cte("dirty1", "clean1") + ",\n"
        + _clean_cte("dirty2", "clean2") + ",\n"
        + _P1_CTES.format(brand_case=_BRAND_CASE_CUR) + ",\n"
        + _P2_CTES.format(brand_case=_BRAND_CASE_CUR) + ",\n"
        + f"""
agg AS (
  SELECT b.BRAND_SK, p.PRODUCT_SK, p.ID_CONFIG,
         {date_sk.format(start=DIM_START, day='2024-01-05')} AS DATE_SK,
         CAST(2024 AS INTEGER) AS CALENDAR_YEAR, CAST(1 AS INTEGER) AS CALENDAR_MONTH,
         p.MAX_PRICE, p.MIN_PRICE
  FROM products1 p JOIN dim_brand b USING (BRAND_NAME)
  UNION ALL
  SELECT b.BRAND_SK, p.PRODUCT_SK, p.ID_CONFIG,
         {date_sk.format(start=DIM_START, day='2024-01-06')} AS DATE_SK,
         CAST(2024 AS INTEGER), CAST(1 AS INTEGER),
         p.MAX_PRICE, p.MIN_PRICE
  FROM products2 p JOIN dim_brand b USING (BRAND_NAME))
"""
    )


def _two_day_oracle() -> str:
    return _two_day_base() + """
SELECT DATE_SK, PRODUCT_SK, BRAND_SK, ID_CONFIG, CALENDAR_YEAR,
       CALENDAR_MONTH,
       CAST(max(MAX_PRICE) AS DOUBLE) AS MAX_PRICE,
       CAST(min(MIN_PRICE) AS DOUBLE) AS MIN_PRICE,
       CAST((max(MAX_PRICE) + min(MIN_PRICE)) / 2 AS DOUBLE) AS AVG_PRICE
FROM agg GROUP BY 1, 2, 3, 4, 5, 6
"""


def _two_day_quarterly_oracle() -> str:
    # QUARTER_NAME = 'Q' || dim quarter label ('Q1') -> 'QQ1' quirk
    return _two_day_base() + """
SELECT PRODUCT_SK, BRAND_SK, ID_CONFIG, CALENDAR_YEAR,
       concat('QQ', CAST(1 AS VARCHAR(1))) AS QUARTER_NAME,
       CAST(min(MIN_PRICE) AS DOUBLE) AS QUARTER_MIN_PRICE,
       CAST(max(MAX_PRICE) AS DOUBLE) AS QUARTER_MAX_PRICE,
       CAST((min(MIN_PRICE) + max(MAX_PRICE)) / 2 AS DOUBLE)
         AS QUARTER_AVG_PRICE
FROM agg GROUP BY 1, 2, 3, 4
"""




#: (applicationId, sf_dir) -> warehouse root of a completed two-day
#: run.  The monthly and quarterly mart queries SHARE one ETL replay
#: (VERDICT r12 item 7: the two registry entries used to re-run the
#: identical two-day pipeline back to back — ~13 s of duplicated
#: work per registry sweep).  A real pipeline derives both marts
#: from one run; the cache reproduces that while keeping each
#: registry entry standalone (whichever runs first pays the ETL).
#: bench.py clears this between passes so every timed pass is
#: self-contained.
_TWO_DAY_ROOTS: dict = {}


def clear_two_day_cache() -> None:
    """Forget completed two-day runs (bench calls this per pass)."""
    _TWO_DAY_ROOTS.clear()


def run_two_day(spark: SparkSession, sf_dir: str) -> str:
    """Run the two-day pipeline once per (session, sf_dir) and
    return its warehouse root; both mart queries read from it."""
    import datetime as _dtm
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir)
    root = _TWO_DAY_ROOTS.get(key)
    if root is not None:
        return root
    from ..catalog import Catalog
    from ..plans.pipeline import Pipeline

    root = tempfile.mkdtemp(prefix="dw_pipeline_2day_")
    pipe = Pipeline(Catalog(spark, root))
    part = _t(spark, sf_dir, "part")
    raw1 = part.selectExpr(
        *[f"{sql} AS {col}" for col, sql in DIRTY_FRAGMENTS.items()]
    )
    raw2 = part.selectExpr(
        *[f"{sql} AS {col}" for col, sql in DIRTY2_FRAGMENTS.items()]
    ).unionByName(
        part.filter("p_partkey % 20 = 0").selectExpr(*NEW_PRODUCT_EXPRS)
    )
    pipe.run_day(raw1, _dtm.date(2024, 1, 5), now="2024-01-05 21:30:00")
    pipe.run_day(raw2, _dtm.date(2024, 1, 6), now="2024-01-06 21:30:00")
    # register only after BOTH days committed: a failed run must not
    # leave a half-built root for the sibling query to read
    _TWO_DAY_ROOTS[key] = root
    return root


@register(
    "pipeline_two_day",
    oracle=_two_day_oracle(),
    tags=("pipeline", "end-to-end", "scd2-update", "dim-update", "partition-overwrite"),
)
def q_pipeline_two_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two consecutive daily runs through the real Pipeline: day 2
    carries price changes (SCD2 expire/re-insert), brand-new products
    (dim SK minting after existing max), and a second AGGREGATE
    partition via dynamic overwrite — the monthly mart over BOTH days
    checked against one SQL oracle.  The ETL replay is SHARED with
    `pipeline_two_day_quarterly` via :func:`run_two_day` (one run
    derives both marts, as a real pipeline would)."""
    _utc(spark)
    from ..catalog import Catalog

    root = run_two_day(spark, sf_dir)
    mart = Catalog(spark, root).table("dm_product_daily_price", "mart")
    return mart.select(
        "DATE_SK",
        "PRODUCT_SK",
        "BRAND_SK",
        "ID_CONFIG",
        "CALENDAR_YEAR",
        "CALENDAR_MONTH",
        F.col("MAX_PRICE").cast("double").alias("MAX_PRICE"),
        F.col("MIN_PRICE").cast("double").alias("MIN_PRICE"),
        F.col("AVG_PRICE").cast("double").alias("AVG_PRICE"),
    )


@register(
    "pipeline_two_day_quarterly",
    oracle=_two_day_quarterly_oracle(),
    tags=("pipeline", "mart", "quarterly", "quirk-QQ"),
)
def q_pipeline_two_day_quarterly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The QUARTERLY mart from the two-day pipeline run — both
    AGGREGATE partitions rolled up per quarter with the 'QQ1' label
    quirk, checked against one SQL oracle (completing mart-layer
    oracle coverage; the monthly mart is pipeline_two_day).  The ETL
    replay is SHARED with `pipeline_two_day` via
    :func:`run_two_day`."""
    _utc(spark)
    from ..catalog import Catalog

    root = run_two_day(spark, sf_dir)
    mart = Catalog(spark, root).table("dm_product_quarterly_trend", "mart")
    return mart.select(
        "PRODUCT_SK",
        "BRAND_SK",
        "ID_CONFIG",
        "CALENDAR_YEAR",
        "QUARTER_NAME",
        F.col("QUARTER_MIN_PRICE").cast("double").alias("QUARTER_MIN_PRICE"),
        F.col("QUARTER_MAX_PRICE").cast("double").alias("QUARTER_MAX_PRICE"),
        F.col("QUARTER_AVG_PRICE").cast("double").alias("QUARTER_AVG_PRICE"),
    )


_AS_OF_TS = "2024-01-20 00:00:00"

#: Same dataflow as _ORACLE_SCD2, final select filtered to the rows
#: live at the probe instant (time travel over the identical history).
_ORACLE_SCD2_AS_OF = _ORACLE_SCD2.replace(
    "FROM hist_out",
    f"FROM hist_out WHERE CREATED_AT <= TIMESTAMP '{_AS_OF_TS}' "
    f"AND EXPIRED_AT > TIMESTAMP '{_AS_OF_TS}'",
)


@register("scd2_as_of", oracle=_ORACLE_SCD2_AS_OF, tags=("scd2", "time-travel"))
def q_scd2_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time reconstruction over the two-day SCD2 history:
    the state AS OF an instant between the runs (operators/scd2.py
    as_of — CREATED_AT <= t < EXPIRED_AT). Day-2 expiries must
    reappear in their day-1 version and day-2 inserts must vanish;
    the oracle applies the identical interval filter to the same
    SQL-rebuilt history. Same output normalization as scd2_two_day
    (sentinel timestamps as STRING, decimals as DOUBLE)."""
    _utc(spark)
    st1, st2 = _scd_staging_both(spark, sf_dir, "2024-01-15", "2024-02-01")
    r1 = scd2_apply(st1, None, now="2024-01-15 12:00:00")
    r2 = scd2_apply(
        st2, r1.history.localCheckpoint(eager=False), now="2024-01-31 12:00:00"
    )
    return as_of(r2.history, _AS_OF_TS).select(
        "TEN",
        "LINK",
        "LINK_ANH",
        F.col("GIA_CU").cast("double").alias("GIA_CU"),
        F.col("GIA_MOI").cast("double").alias("GIA_MOI"),
        F.col("KICH_THUOC_MAN_HINH").cast("double").alias("KICH_THUOC_MAN_HINH"),
        "RAM",
        "BO_NHO",
        "ID",
        "ID_CONFIG",
        F.col("CREATED_AT").cast("string").alias("CREATED_AT"),
        F.col("UPDATED_AT").cast("string").alias("UPDATED_AT"),
        F.col("EXPIRED_AT").cast("string").alias("EXPIRED_AT"),
    )


_DIFF_SQL = """
SELECT coalesce(a.TEN, b.TEN) AS TEN,
       coalesce(a.LINK, b.LINK) AS LINK,
       CASE WHEN a.TEN IS NULL THEN 'added'
            WHEN b.TEN IS NULL THEN 'removed'
            WHEN a.GIA_CU <> b.GIA_CU OR a.GIA_MOI <> b.GIA_MOI
              OR a.KICH_THUOC_MAN_HINH <> b.KICH_THUOC_MAN_HINH
              OR a.RAM <> b.RAM OR a.BO_NHO <> b.BO_NHO THEN 'changed'
       END AS change_type
FROM (SELECT * FROM hist_out
      WHERE CREATED_AT <= TIMESTAMP '2024-01-20 00:00:00'
        AND EXPIRED_AT > TIMESTAMP '2024-01-20 00:00:00') a
FULL OUTER JOIN
     (SELECT * FROM hist_out
      WHERE CREATED_AT <= TIMESTAMP '2024-02-02 00:00:00'
        AND EXPIRED_AT > TIMESTAMP '2024-02-02 00:00:00') b
  ON a.TEN = b.TEN AND a.LINK = b.LINK
WHERE (CASE WHEN a.TEN IS NULL THEN 'added'
            WHEN b.TEN IS NULL THEN 'removed'
            WHEN a.GIA_CU <> b.GIA_CU OR a.GIA_MOI <> b.GIA_MOI
              OR a.KICH_THUOC_MAN_HINH <> b.KICH_THUOC_MAN_HINH
              OR a.RAM <> b.RAM OR a.BO_NHO <> b.BO_NHO THEN 'changed'
       END) IS NOT NULL
"""

_ORACLE_SCD2_DIFF = _ORACLE_SCD2.replace(_SCD2_FINAL, _DIFF_SQL)


@register("scd2_diff", oracle=_ORACLE_SCD2_DIFF, tags=("scd2", "time-travel", "diff"))
def q_scd2_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change summary between two as-of instants over the two-day
    SCD2 history (operators/scd2.py diff_between): keys only in the
    later snapshot are 'added', only in the earlier 'removed', in
    both with any compare attribute differing (the SCD's own
    NULL-unsafe !=) 'changed'; unchanged keys drop. The oracle diffs
    the same SQL-rebuilt history with the identical interval filters."""
    _utc(spark)
    st1, st2 = _scd_staging_both(spark, sf_dir, "2024-01-15", "2024-02-01")
    r1 = scd2_apply(st1, None, now="2024-01-15 12:00:00")
    r2 = scd2_apply(
        st2, r1.history.localCheckpoint(eager=False), now="2024-01-31 12:00:00"
    )
    return diff_between(
        r2.history, "2024-01-20 00:00:00", "2024-02-02 00:00:00"
    )


@register("scd2_two_day", oracle=_ORACLE_SCD2, tags=("scd2", "J2", "J3", "J4", "J5"))
def q_scd2_two_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 over two consecutive batches: day-1 bootstrap (all
    inserts), day-2 insert/expire/re-insert with the reference's key
    asymmetry and NULL-unsafe compare (db_staging.sql:4929-4991).

    Output normalization (comparison-harness compatibility): the
    9999-12-31 open-row sentinel overflows pandas' nanosecond
    timestamps, so the audit columns are projected as STRING, and the
    DECIMAL payload columns as DOUBLE, on BOTH sides. The operator
    itself still runs on native TIMESTAMP/DECIMAL types.
    """
    _utc(spark)
    st1, st2 = _scd_staging_both(spark, sf_dir, "2024-01-15", "2024-02-01")
    r1 = scd2_apply(st1, None, now="2024-01-15 12:00:00")
    # The day-2 apply consumes day-1 history twice (current-member
    # anti scan + the hist union); checkpointing truncates the
    # 4-branch day-1 lineage so it computes once, not per consumer —
    # in production the day boundary is a real table write anyway.
    r2 = scd2_apply(
        st2, r1.history.localCheckpoint(eager=False), now="2024-01-31 12:00:00"
    )
    return r2.history.select(
        "TEN",
        "LINK",
        "LINK_ANH",
        F.col("GIA_CU").cast("double").alias("GIA_CU"),
        F.col("GIA_MOI").cast("double").alias("GIA_MOI"),
        F.col("KICH_THUOC_MAN_HINH").cast("double").alias("KICH_THUOC_MAN_HINH"),
        "RAM",
        "BO_NHO",
        "ID",
        "ID_CONFIG",
        F.col("CREATED_AT").cast("string").alias("CREATED_AT"),
        F.col("UPDATED_AT").cast("string").alias("UPDATED_AT"),
        F.col("EXPIRED_AT").cast("string").alias("EXPIRED_AT"),
    )
