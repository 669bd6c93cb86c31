"""Bucketed co-located join: assert the plan reads buckets and has
no shuffle exchange (broadcast disabled so the bucket layout, not
broadcasting, is what removes the shuffle)."""

from __future__ import annotations

import pytest

from datawarehouseproject_spark.sources.bucketed import write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_shuffle(spark, no_broadcast):
    orders = spark.range(0, 1000).selectExpr(
        "id AS o_orderkey", "cast(id * 1.5 as double) AS total"
    )
    lineitem = spark.range(0, 5000).selectExpr(
        "id % 1000 AS l_orderkey", "cast(id % 50 as double) AS qty"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8,
                   sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], n_buckets=8,
                   sort_cols=["l_orderkey"])
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            spark.table("b_orders")["o_orderkey"]
            == spark.table("b_lineitem")["l_orderkey"],
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan[:2000]
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert joined.count() == 5000

        # contrast: unbucketed frames shuffle both sides
        plain = orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plain_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_append_preserves_existing_rows(spark):
    """mode='append' must ADD to an existing bucketed table — the
    unconditional DROP used to delete the table being appended to
    (ADVICE r4), silently losing all prior rows."""
    day1 = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v")
    day2 = spark.range(100, 150).selectExpr("id AS k", "id * 2 AS v")
    write_bucketed(day1, "b_append", ["k"], n_buckets=4)
    try:
        write_bucketed(day2, "b_append", ["k"], n_buckets=4, mode="append")
        assert spark.table("b_append").count() == 150
        # overwrite still replaces
        write_bucketed(day2, "b_append", ["k"], n_buckets=4)
        assert spark.table("b_append").count() == 50
    finally:
        spark.sql("DROP TABLE IF EXISTS b_append")
