"""Salted-join equivalence: same result as a plain join, spread keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouseproject_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # heavily skewed fact: 90% of rows on one key
    fact = spark.createDataFrame(
        [(0 if i % 10 else i % 3 + 1, f"v{i}") for i in range(200)], ["k", "payload"]
    )
    dim = spark.createDataFrame([(0, "hot"), (1, "a"), (2, "b")], ["k", "label"])

    plain = fact.join(dim, "k").select("k", "payload", "label")
    salted = salted_join(fact, dim, ["k"], n_salts=8)

    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_keeps_unmatched(spark):
    fact = spark.createDataFrame([(1, "x"), (9, "y")], ["k", "payload"])
    dim = spark.createDataFrame([(1, "a")], ["k", "label"])
    out = salted_join(fact, dim, ["k"], n_salts=4, how="left")
    got = {r["payload"]: r["label"] for r in out.collect()}
    assert got == {"x": "a", "y": None}
