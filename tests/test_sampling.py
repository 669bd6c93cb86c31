"""Deterministic splitting/sampling: stability and proportions."""

from __future__ import annotations

from datawarehouseproject_spark.operators.sampling import (
    deterministic_split,
    weighted_sample,
)


def _docs(spark, n=2000):
    return spark.range(n).selectExpr(
        "id AS doc_id", "concat('s', CAST(id % 3 AS STRING)) AS source"
    )


def test_split_is_stable_and_proportional(spark):
    docs = _docs(spark)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = deterministic_split(docs, "doc_id", w)
    s2 = deterministic_split(docs, "doc_id", w)
    # bit-stable across runs
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
    counts = {r["split"]: r["count"] for r in s1.groupBy("split").count().collect()}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    assert abs(counts["test"] / 2000 - 0.1) < 0.03


def test_weighted_sample_rates_and_default_drop(spark):
    docs = _docs(spark)
    out = weighted_sample(docs, "doc_id", {"s0": 1.0, "s1": 0.5}, "source")
    counts = {r["source"]: r["count"]
              for r in out.groupBy("source").count().collect()}
    assert counts["s0"] == 667  # 100% kept (ids ≡ 0 mod 3)
    assert abs(counts["s1"] / 667 - 0.5) < 0.08
    assert "s2" not in counts  # default rate 0 drops the group


def test_sample_membership_is_superset_stable(spark):
    # lowering a rate keeps a subset of the higher-rate sample
    docs = _docs(spark)
    half = {r["doc_id"] for r in
            weighted_sample(docs, "doc_id", {"s1": 0.5}, "source").collect()}
    quarter = {r["doc_id"] for r in
               weighted_sample(docs, "doc_id", {"s1": 0.25}, "source").collect()}
    assert quarter <= half


def test_training_shuffle_deterministic_and_dense(spark):
    from datawarehouseproject_spark.operators.sampling import training_shuffle

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: (r.shard, r.position) for r in
         training_shuffle(df, "doc_id", 8).collect()}
    b = {r.doc_id: (r.shard, r.position) for r in
         training_shuffle(df, "doc_id", 8).collect()}
    assert a == b  # reproducible
    # positions are dense 0..n-1 within each shard
    by_shard: dict[int, list[int]] = {}
    for shard, pos in a.values():
        by_shard.setdefault(shard, []).append(pos)
    assert set(by_shard) == set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))
    # the permutation actually scrambles ingestion order: consecutive
    # ids rarely stay consecutive in (shard, position) space
    same_shard_adjacent = sum(
        1 for i in range(499)
        if a[i][0] == a[i + 1][0] and abs(a[i][1] - a[i + 1][1]) == 1
    )
    assert same_shard_adjacent < 25
