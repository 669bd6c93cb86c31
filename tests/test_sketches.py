"""HLL sketch: merge algebra, determinism, accuracy envelope."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouseproject_spark.operators.sketches import (
    hll_distinct,
    hll_estimate,
    hll_sketch,
)


def test_hll_merge_equals_whole(spark):
    """Sketching two halves and merging must equal sketching the
    union — the property that lets daily sketches roll up without
    rescanning history."""
    a = spark.range(0, 5000).select(F.col("id").alias("k"))
    b = spark.range(2500, 8000).select(F.col("id").alias("k"))
    whole = a.union(b)

    merged = (
        hll_sketch(a, "k")
        .union(hll_sketch(b, "k"))
        .groupBy("bucket")
        .agg(F.max("mrank").alias("mrank"))
    )
    est_merged = hll_estimate(merged).collect()[0]
    est_whole = hll_distinct(whole, "k").collect()[0]
    assert est_merged["hll_estimate"] == est_whole["hll_estimate"]
    assert est_merged["buckets_used"] == est_whole["buckets_used"]


def test_hll_deterministic_across_runs(spark):
    df = spark.range(0, 3000).select(F.col("id").alias("k"))
    e1 = hll_distinct(df, "k").collect()[0]["hll_estimate"]
    e2 = hll_distinct(df, "k").collect()[0]["hll_estimate"]
    assert e1 == e2


def test_hll_accuracy_envelope(spark):
    """Raw HLL with m=256 registers: relative error ~1.04/sqrt(256)
    ≈ 6.5%; allow 3 sigma. 10k distincts is inside the raw
    estimator's valid range (> 2.5m)."""
    df = spark.range(0, 10_000).select(F.col("id").alias("k"))
    est = hll_distinct(df, "k").collect()[0]["hll_estimate"]
    assert abs(est - 10_000) / 10_000 < 0.20, est


def test_hll_duplicates_ignored(spark):
    """Cardinality, not row count: 100x duplication must not move
    the estimate."""
    base = spark.range(0, 2000).select(F.col("id").alias("k"))
    dup = base.crossJoin(spark.range(0, 100)).select("k")
    e_base = hll_distinct(base, "k").collect()[0]["hll_estimate"]
    e_dup = hll_distinct(dup, "k").collect()[0]["hll_estimate"]
    assert e_base == e_dup


def test_hll_sketch_bounded_size(spark):
    """The sketch never exceeds 2^p rows no matter the input size."""
    df = spark.range(0, 50_000).select(F.col("id").alias("k"))
    assert hll_sketch(df, "k", p=8).count() <= 256
