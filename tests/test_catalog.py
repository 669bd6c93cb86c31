"""Catalog layer round-trips and view registration."""

from __future__ import annotations

from datawarehouseproject_spark.catalog import Catalog


def test_layer_write_read_roundtrip(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    path = cat.write(df, "t1", "staging")
    assert path.endswith("/staging/t1")
    back = cat.table("t1", "staging")
    assert back.count() == 10
    assert {r["v"] for r in back.collect()} == {i * 2 for i in range(10)}


def test_partitioned_write_mode(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = spark.range(20).selectExpr("id", "CAST(id % 2 AS INT) AS p")
    cat.write(df, "t2", "warehouse", partition_by=["p"])
    back = cat.table("t2", "warehouse")
    assert back.filter("p = 1").count() == 10
    # dynamic partition overwrite: rewriting one partition keeps the other
    df1 = spark.range(5).selectExpr("id + 100 AS id", "CAST(1 AS INT) AS p")
    cat.write(df1, "t2", "warehouse", partition_by=["p"])
    back = cat.table("t2", "warehouse")
    assert back.filter("p = 0").count() == 10
    assert back.filter("p = 1").count() == 5


def test_register_views(spark):
    cat = Catalog(spark, "/root/testdata/sf0.001")
    cat.register_views(("region", "nation"))
    assert spark.sql("SELECT count(*) AS n FROM region").collect()[0]["n"] == 5
    assert spark.sql("SELECT count(*) AS n FROM nation").collect()[0]["n"] == 25
