"""Extended TPC-H-shaped queries over the driver's synthetic tables.

Q1/Q3/Q5 shapes already exist (``pricing_summary``,
``tpch_q3_shipping_priority``, ``tpch_q5_local_volume``); this module
adds the remaining classic plan shapes expressible with the generated
column subset (no ``partsupp``, ``l_shipmode``, ``l_commitdate``,
``c_phone`` — queries needing those are adapted to equivalent shapes
and documented as such):

- Q4  order-priority count via EXISTS semi join (late-shipment
      predicate adapted from commit/receipt dates to ship lag)
- Q6  selective scan + agg (pushdown showcase)
- Q7  bi-nation volume (two dim paths into one fact, year rollup)
- Q8  national market share (7-table snowflake, conditional ratio)
- Q9  product profit by nation/year (supplycost adapted to
      retailprice in the profit term)
- Q10 returned-item revenue top-N (fact→dims, TakeOrdered)
- Q13 customer order-count distribution (left join + double agg)
- Q14 promo revenue share (conditional agg over a part join)
- Q15 top supplier (agg view + scalar-max equality join)
- Q17 small-quantity avg-threshold (self-agg join — correlated
      subquery decorrelated into a broadcast agg)
- Q18 large-volume orders (having-filtered semi agg join)
- Q19 OR-block predicate revenue (brand/size/quantity bands)
- Q22 dormant wealthy customers (cross-multiplied avg threshold +
      anti join; phone country codes adapted to nation keys)

Scale notes: every dim side that fits an executor is broadcast; the
only shuffles are the fact-side aggregations, which all partial-agg
map-side first. Decimal sums run exact then cast to DOUBLE so the
value hash is order-insensitive (registry contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as _t
from .registry import register


def _utc(spark: SparkSession) -> None:
    from ..session import tune_session

    tune_session(spark)


def _rev():
    """Revenue term, built lazily: Column construction needs an active
    SparkContext, and this module must import session-free (test
    collection, driver import order)."""
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
    tags=("tpch", "scan-agg", "pushdown"),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure selective scan → global agg. The whole
    predicate battery (date range, discount band, quantity cap)
    should reach the parquet reader as PushedFilters; zero joins,
    one partial+final agg."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
            & F.col("l_discount").between(0.02, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER) AS l_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
               AS volume
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "multi-join"),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the fact reaches two different nation dims via
    two paths (supplier side, customer side) with a symmetric
    nation-pair predicate (synthetic names NATION_1/NATION_2), rolled up by ship year. Both nation dims
    and supplier broadcast; orders↔lineitem is the only shuffled
    join."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = F.broadcast(_t(spark, sf_dir, "supplier"))
    cust = _t(spark, sf_dir, "customer")
    n1 = F.broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    ))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(n1, F.col("s_nationkey") == F.col("s_nkey"))
        .join(n2, F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).cast("int").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS acctbal,
           n_name AS nation
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    tags=("tpch", "multi-join", "topn"),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-line revenue per customer in a
    quarter, global top-20 (TakeOrderedAndProject, no full sort)."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-07-01"))
        & (F.to_date("o_orderdate") < F.lit("1996-10-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy(
            "c_custkey",
            "c_name",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "acctbal", "nation")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "tpch_q13_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
        AND o_orderstatus <> 'F'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("tpch", "outer-join", "double-agg"),
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count histogram via LEFT join
    (customers with zero orders must appear as c_count=0) then a
    second aggregation over the first's result. The reference's Q13
    excludes special-comment orders; adapted to an o_orderstatus
    filter with the available columns."""
    _utc(spark)
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT CAST(round(
             100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
               THEN CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,4)) ELSE 0 END)
             / sum(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(18,4))), 6) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-09-01'
      AND CAST(l_shipdate AS DATE) < DATE '1996-10-01'
    """,
    tags=("tpch", "conditional-agg"),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional aggregate
    over a fact→part join, one month of shipments. Part broadcasts;
    the division runs in exact DECIMAL then rounds, so both engines
    hash identically."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-09-01"))
        & (F.to_date("l_shipdate") < F.lit("1996-10-01"))
    )
    part = F.broadcast(_t(spark, sf_dir, "part"))
    promo = F.when(
        F.col("p_type").like("PROMO%"), _rev()
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(F.lit(100.00) * F.sum(promo) / F.sum(_rev()), 6)
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q17_small_quantity",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) / 7.0
                AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
      SELECT l_partkey AS agg_partkey,
             0.5 * avg(l_quantity) AS avg_quantity
      FROM lineitem GROUP BY l_partkey
    ) part_agg ON agg_partkey = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < avg_quantity
    """,
    tags=("tpch", "self-agg-join"),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the correlated avg-quantity subquery
    decorrelated into a per-part aggregate joined back to the fact —
    the standard rewrite; the per-part agg is small (|part| rows) and
    broadcasts. Filter to one brand keeps the probe side selective."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    part = F.broadcast(
        _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    )
    part_agg = F.broadcast(
        li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
            (F.lit(0.5) * F.avg("l_quantity")).alias("avg_quantity")
        )
    )
    return (
        li.join(part, part["p_partkey"] == li["l_partkey"])
        .join(part_agg, F.col("agg_partkey") == li["l_partkey"])
        .filter(F.col("l_quantity") < F.col("avg_quantity"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,4)")) / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate,
           CAST(o_totalprice AS DOUBLE) AS totalprice,
           CAST(sum(l_quantity) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 180
    )
    GROUP BY c_custkey, c_name, o_orderkey, orderdate, totalprice
    ORDER BY totalprice DESC, o_orderkey ASC
    LIMIT 20
    """,
    tags=("tpch", "semi-agg-join", "topn"),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold (aggregate → semi join back to the fact), joined to
    customer, global top-20 by price. The qualifying-keys frame is
    tiny after the HAVING, so it broadcasts into the semi join."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = F.broadcast(
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 180)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60
      )
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "exists-semi-join"),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders that have at least
    one problematic lineitem, expressed as EXISTS → left-semi join.
    The generated schema has no commit/receipt dates, so "late" is
    adapted to "shipped more than 60 days after the order date" — the
    same orders↔lineitem semi join with a non-equi residual. The
    quarter filter prunes the probe side before the join."""
    _utc(spark)
    orders = _t(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1996-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 60)
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(round(
             sum(CASE WHEN nation = 'NATION_3' THEN volume
                 ELSE CAST(0 AS DECIMAL(18,4)) END) / sum(volume), 6)
             AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
               AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01'
                                          AND DATE '1996-12-31'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("tpch", "snowflake-join", "conditional-agg"),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a regional
    market for one part type, by order year. Seven tables; every dim
    (part-filtered part, supplier, both nation aliases, region)
    broadcasts, so the only shuffled joins are lineitem↔orders and
    ↔customer. The share divides two exact DECIMAL sums, rounded to 6
    places, so the hash is accumulation-order-proof."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    cust = _t(spark, sf_dir, "customer")
    part = F.broadcast(
        _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    )
    supp = F.broadcast(_t(spark, sf_dir, "supplier"))
    n_cust = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nkey"),
            F.col("n_regionkey").alias("c_rkey"),
        )
    )
    n_supp = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
        )
    )
    region = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(n_cust, F.col("c_nationkey") == F.col("c_nkey"))
        .join(region, F.col("c_rkey") == F.col("r_regionkey"))
        .join(n_supp, F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year(F.to_date("o_orderdate")).cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", _rev()).otherwise(zero))
                / F.sum(_rev()),
                6,
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
               - CAST(p_retailprice * l_quantity AS DECIMAL(18,4)) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%bolt%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("tpch", "multi-join"),
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a part-name-filtered product line by
    supplier nation and order year. The generated schema has no
    partsupp, so ``ps_supplycost * l_quantity`` is adapted to
    ``p_retailprice * l_quantity`` — same join tree, same arithmetic
    shape, cost sourced from the broadcast part dim instead. Both
    profit terms run in exact DECIMAL before the final cast."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = F.broadcast(
        _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    )
    supp = F.broadcast(_t(spark, sf_dir, "supplier"))
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    amount = _rev() - (F.col("p_retailprice") * F.col("l_quantity")).cast(
        "decimal(18,4)"
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.to_date("o_orderdate")).cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("tpch", "agg-view", "scalar-max"),
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, keep the
    supplier(s) hitting the maximum. The revenue aggregate is tiny
    (|supplier| rows), so the scalar max comes from a broadcast
    one-row cross join rather than a second scan-wide shuffle; the
    equality compares exact DECIMAL sums, so ties and float drift
    can't desync the two engines."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = F.broadcast(_t(spark, sf_dir, "supplier"))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_revenue")
    )
    top = F.broadcast(revenue.agg(F.max("total_revenue").alias("__max")))
    return (
        revenue.join(top, revenue["total_revenue"] == top["__max"])
        .join(supp, F.col("supplier_no") == supp["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@register(
    "tpch_q19_brand_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch", "or-predicates"),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR-ed brand/size/quantity
    predicate blocks straddling the join (part attrs + lineitem
    attrs). The schema has no shipmode/shipinstruct, so those legs
    are dropped; what remains still exercises the disjunctive
    cross-table residual that defeats naive pushdown. Part broadcasts
    and the OR evaluates post-join in codegen."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    part = F.broadcast(_t(spark, sf_dir, "part"))
    blocks = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .filter(blocks)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q22_dormant_customers",
    oracle="""
    WITH pool AS (
      SELECT c_custkey, c_nationkey,
             CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ),
    thresh AS (
      SELECT sum(bal) AS total, count(*) AS cnt
      FROM pool WHERE bal > 0
    )
    SELECT CAST(c_nationkey AS INTEGER) AS cntrycode,
           count(*) AS numcust,
           CAST(sum(bal) AS DOUBLE) AS totacctbal
    FROM pool, thresh
    WHERE bal * cnt > total
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND CAST(o_orderdate AS DATE) >= DATE '1999-01-01'
      )
    GROUP BY c_nationkey
    """,
    tags=("tpch", "anti-join", "scalar-threshold"),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers in a country
    set with no recent orders. Phone country codes don't exist in the
    generated schema, so the country bucket is the nation key
    directly, and (since every customer here has at least one order
    ever) "no orders" is adapted to "no orders since 1999". The
    avg threshold is compared cross-multiplied — ``bal * cnt >
    sum`` in exact DECIMAL — so neither engine divides and the
    boundary can't drift; the threshold row broadcasts, and recent
    orders anti-join on the customer key."""
    _utc(spark)
    pool = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        .select(
            "c_custkey",
            "c_nationkey",
            F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        )
    )
    thresh = F.broadcast(
        pool.filter(F.col("bal") > 0).agg(
            F.sum("bal").alias("total"), F.count("*").alias("cnt")
        )
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") >= F.lit("1999-01-01")
    )
    return (
        pool.crossJoin(thresh)
        .filter(F.col("bal") * F.col("cnt") > F.col("total"))
        .join(recent, pool["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").cast("int").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
    )
