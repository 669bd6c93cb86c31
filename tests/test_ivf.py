"""IVF index + k-means refinement on separable toy clusters."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouseproject_spark.operators.similarity import (
    ivf_index,
    ivf_topk,
    kmeans_refine,
)


def _clustered(spark):
    # two tight clusters around e1 and e2
    rows = []
    for i in range(20):
        eps = (i % 5) * 0.01
        rows.append((i, [1.0, eps, 0.0, 0.0]))
        rows.append((100 + i, [eps, 0.0, 1.0, 0.0]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_assignment_partitions_clusters(spark):
    emb = _clustered(spark)
    _, assigned = ivf_index(emb, n_centroids=2, centroid_stride=100)
    cells = {
        r["vec_id"]: r["centroid_id"] for r in assigned.collect()
    }
    # all cluster-A members share a cell, all cluster-B share the other
    a_cells = {cells[i] for i in range(20)}
    b_cells = {cells[100 + i] for i in range(20)}
    assert len(a_cells) == 1 and len(b_cells) == 1 and a_cells != b_cells


def test_kmeans_refine_moves_centroids_to_means(spark):
    emb = _clustered(spark)
    centroids, _ = ivf_index(emb, n_centroids=2, centroid_stride=100)
    refined = kmeans_refine(emb, centroids, iters=1)
    got = {r["centroid_id"]: r["__centroid"] for r in refined.collect()}
    # cluster A mean: [1.0, mean(eps), 0, 0] with mean(eps)=0.02
    a = [v for v in got.values() if v[0] > 0.5][0]
    assert abs(a[0] - 1.0) < 1e-9 and abs(a[1] - 0.02) < 1e-9


def test_ivf_topk_recall_on_clusters(spark):
    emb = _clustered(spark)
    q = emb.filter("vec_id = 0").selectExpr("vec_id AS query_id", "embedding")
    got = ivf_topk(emb, q, n_centroids=2, nprobe=1, k=5, centroid_stride=100)
    rows = got.collect()
    assert len(rows) == 5
    # all neighbors come from the query's own cluster
    assert all(r["neighbor_id"] < 100 for r in rows)
    assert rows[0]["neighbor_id"] == 0 and rows[0]["cosine"] == 1.0


def test_ivf_index_stride_derived_in_plan(spark):
    """No centroid_stride -> the stride comes from a count aggregate
    INSIDE the plan (scalar-subquery shape), not a driver action."""
    emb = _clustered(spark)  # 40 vectors, ids 0..19 and 100..119
    centroids, assigned = ivf_index(emb, n_centroids=4)
    # stride = max(40 // 4, 1) = 10 -> seeds at ids 0,10,100(->10? no:
    # 100/10=10 >= 4 filtered), so ids 0,10 (cells 0,1) survive
    cells = {r["centroid_id"] for r in centroids.collect()}
    assert cells == {0, 1}
    assert assigned.count() == 40  # every vector assigned


def test_ivf_kmeans_recall_vs_brute_force(spark):
    """Quantitative ANN story: recall@k of the IVF probe against the
    exact brute-force top-k on the real embeddings table; k-means
    refinement must not degrade it below threshold."""
    from datawarehouseproject_spark.catalog import load_table
    from datawarehouseproject_spark.operators.similarity import brute_force_topk

    sf_dir = "/root/testdata/sf0.001"
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    k = 5
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=k).collect()
    }

    def recall(refine_iters: int) -> float:
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                emb, queries, n_centroids=8, nprobe=4, k=k,
                refine_iters=refine_iters,
            ).collect()
        }
        return len(got & exact) / len(exact)

    r0, r2 = recall(0), recall(2)
    assert r0 >= 0.5, f"seed-centroid IVF recall@{k} too low: {r0}"
    assert r2 >= 0.5, f"k-means-refined IVF recall@{k} too low: {r2}"

def test_semantic_dedup_keep_first_within_cluster(spark):
    """Within a cell, every doc with a lower-id near-dup at or above
    the threshold drops; the lowest id of each near-dup group and all
    isolated docs survive."""
    from datawarehouseproject_spark.operators.similarity import semantic_dedup

    rows = [
        # cluster A: three near-identical vectors + one orthogonal-ish
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.01, 0.0, 0.0]),   # ~dup of 0
        (2, [1.0, 0.0, 0.02, 0.0]),   # ~dup of 0
        (3, [0.6, 0.8, 0.0, 0.0]),    # same cell, cosine 0.6 to id 0
        # cluster B: a pair of near-dups
        (100, [0.0, 0.0, 1.0, 0.0]),
        (101, [0.0, 0.0, 1.0, 0.01]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = semantic_dedup(
        emb, n_centroids=2, threshold=0.95, centroid_stride=100
    )
    assert {r["vec_id"] for r in kept.collect()} == {0, 3, 100}


def test_semantic_dedup_threshold_one_keeps_all_distinct(spark):
    from datawarehouseproject_spark.operators.similarity import semantic_dedup

    rows = [(i, [float(i + 1), float((i * 7) % 5), 1.0, 0.0]) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = semantic_dedup(emb, n_centroids=3, threshold=1.01, centroid_stride=4)
    assert kept.count() == 12  # nothing reaches an impossible threshold


def test_semantic_dedup_with_refined_centroids(spark):
    """refine_iters>0 path (float cluster means, not oracle-stable):
    the drop policy must still hold on separable clusters."""
    from datawarehouseproject_spark.operators.similarity import semantic_dedup

    rows = []
    for i in range(10):
        eps = (i % 5) * 0.01
        rows.append((i, [1.0, eps, 0.0, 0.0]))
        rows.append((100 + i, [eps, 0.0, 1.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = semantic_dedup(
        emb, n_centroids=2, threshold=0.999, centroid_stride=100,
        refine_iters=1,
    )
    ids = {r["vec_id"] for r in kept.collect()}
    # every within-cluster pair has cosine > 0.999 (eps <= 0.04 barely
    # tilts the angle), so only the lowest id of each cluster survives
    assert ids == {0, 100}


def test_int8_quantize_bounds_and_zero_vector(spark):
    from datawarehouseproject_spark.operators.similarity import int8_quantize

    emb = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r["qvec"] for r in int8_quantize(emb).collect()}
    assert out[1] == [127, -63, 31, 0]  # trunc(127*x/max), not round
    assert out[2] == [0, 0, 0, 0]       # zero vector stays zero


def test_quantized_topk_recall_vs_exact(spark):
    """Quantization noise must not break top-1 on separable clusters."""
    from datawarehouseproject_spark.operators.similarity import (
        brute_force_topk,
        quantized_topk,
    )
    from pyspark.sql import functions as F

    emb = _clustered(spark)
    queries = emb.filter(F.col("vec_id").isin(0, 100)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in brute_force_topk(emb, queries, k=1).collect()}
    quant = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in quantized_topk(emb, queries, k=1).collect()}
    assert exact == quant
