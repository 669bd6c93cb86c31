"""ANN similarity operators."""

from __future__ import annotations

from datawarehouseproject_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucketed_topk,
)


def _emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_self_is_rank1(spark):
    emb = _emb(spark)
    q = emb.filter("vec_id = 0").selectExpr("vec_id as query_id", "embedding")
    got = brute_force_topk(emb, q, k=3).collect()
    assert [r["neighbor_id"] for r in got] == [0, 1, 2]
    assert got[0]["cosine"] == 1.0
    assert got[1]["cosine"] > 0.99 - 0.01


def test_lsh_topk_subset_of_bucket(spark):
    emb = _emb(spark)
    q = emb.filter("vec_id = 0").selectExpr("vec_id as query_id", "embedding")
    got = lsh_bucketed_topk(emb, q, dim=4, k=3, n_planes=2).collect()
    # self always lands in its own bucket -> rank 1 is the query itself
    assert got[0]["neighbor_id"] == 0 and got[0]["cosine"] == 1.0
    # opposite vector never shares a sign bucket with the query
    assert all(r["neighbor_id"] != 4 for r in got)
