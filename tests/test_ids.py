"""dense_ids: identical to a global row_number, without the
single-task window."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datawarehouseproject_spark.operators.ids import dense_ids


def test_dense_ids_match_global_row_number(spark):
    df = spark.range(0, 10_000).selectExpr(
        "cast(id * 37 % 99991 as long) AS key", "id AS payload"
    )
    got = dense_ids(df, "key", id_col="rk", num_partitions=8)
    expected = df.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("key").asc())).cast("long")
    )
    assert sorted(map(tuple, got.select("key", "rk").collect())) == sorted(
        map(tuple, expected.select("key", "rk").collect())
    )


def test_dense_ids_offset_and_density(spark):
    df = spark.createDataFrame([(c,) for c in "dcba"], ["k"])
    got = {r["k"]: r["nid"] for r in
           dense_ids(df, "k", id_col="nid", offset=100).collect()}
    assert got == {"a": 101, "b": 102, "c": 103, "d": 104}
