"""Product-quantization trainer/server (operators/similarity.py:
pq_train, pq_adc_topk) — engine-level invariants on top of the
oracle value check (every centroid coordinate + distortion stats are
DuckDB-replayed in the registry gate)."""

from __future__ import annotations

import pytest


def _toy_emb(spark, n=40, dim=8, spread=1000):
    """Deterministic integer-friendly embeddings: two obvious
    clusters per subspace so Lloyd's must separate them."""
    rows = []
    for i in range(n):
        base = 0.4 if i % 2 == 0 else -0.4
        vec = [base + ((i * 7 + d * 3) % spread) / 100000.0 for d in range(dim)]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


def test_codebook_shape_and_population(spark):
    from datawarehouseproject_spark.operators.similarity import pq_train

    emb = _toy_emb(spark)
    out = pq_train(emb, dim=8, m=2, k=4, rounds=2).collect()
    assert len(out) == 2 * 4 * 4  # m * k * sub_dim rows
    # every vector is assigned exactly once per subspace
    by_s = {}
    for r in out:
        by_s.setdefault(r["s"], set()).add(r["c"])
        assert r["n_vectors"] >= 0 and r["total_sqdist_mega"] >= 0
    assert set(by_s) == {0, 1}
    pop = {}
    for r in out:
        if r["dd"] == 0:
            pop[(r["s"], r["c"])] = r["n_vectors"]
    for s in (0, 1):
        assert sum(pop[(s, c)] for c in range(4)) == 40


def test_two_cluster_separation(spark):
    """With two well-separated value clusters, final distortion must
    be far below the 1-centroid baseline (k-means actually moved)."""
    from datawarehouseproject_spark.operators.similarity import pq_train

    emb = _toy_emb(spark)
    out = pq_train(emb, dim=8, m=1, k=2, rounds=3).collect()
    total = sum(r["total_sqdist_mega"] for r in out if r["dd"] == 0)
    # cluster means are ~0.8 apart = 8e5 micro-units; 40 vecs * 8 dims
    # at that offset would be ~40*8*(4e5)^2 raw = ~5.1e7 in the
    # DIV-1e6 mega units the stat reports
    assert total < 40 * 8 * (4 * 10**5) ** 2 // 1_000_000 // 10


def test_adc_query_ranks_itself_first(spark):
    from datawarehouseproject_spark.operators.similarity import pq_adc_topk

    emb = _toy_emb(spark)
    out = pq_adc_topk(emb, dim=8, m=2, k=4, rounds=2, query_id=0, topk=5).collect()
    assert len(out) == 5
    assert out[0]["rank"] == 1
    # the query's own code cells are its nearest centroids, so no
    # vector can beat it (ADC distance of the query = its own
    # quantization error, minimal by construction of the argmin)
    ids = [r["vec_id"] for r in out]
    assert 0 in ids and out[0]["vec_id"] == 0


def test_dim_not_divisible_raises(spark):
    from datawarehouseproject_spark.operators.similarity import pq_train

    with pytest.raises(ValueError, match="not divisible"):
        pq_train(_toy_emb(spark), dim=8, m=3)


def test_sparse_id_space_seeds_by_rank(spark):
    """1-based / offset id spaces must seed from the k smallest ids,
    not silently produce an empty codebook (review r7)."""
    from datawarehouseproject_spark.operators.similarity import pq_train

    emb = _toy_emb(spark)
    shifted = emb.selectExpr("vec_id + 1000 AS vec_id", "embedding")
    out = pq_train(shifted, dim=8, m=2, k=4, rounds=2).collect()
    assert len(out) == 2 * 4 * 4
    assert sum(r["n_vectors"] for r in out if r["dd"] == 0) == 2 * 40


def test_too_few_vectors_raises(spark):
    from datawarehouseproject_spark.operators.similarity import pq_train

    emb = _toy_emb(spark, n=3)
    with pytest.raises(ValueError, match="distinct vectors to seed"):
        pq_train(emb, dim=8, m=2, k=4, rounds=1)


def test_ivf_pq_probes_and_ranks(spark):
    """IVF-PQ invariants on the toy corpus: results come only from
    probed cells (at most nprobe distinct), the query ranks first
    (its per-cell ADC table is minimized by its own codes), and
    ranking is (distance, id)-deterministic."""
    from datawarehouseproject_spark.operators.similarity import ivf_pq_topk

    emb = _toy_emb(spark)
    out = ivf_pq_topk(
        emb, dim=8, m=2, k=4, nlist=3, nprobe=2,
        coarse_rounds=2, fine_rounds=2, query_id=0, topk=10,
    ).collect()
    assert len(out) == 10
    assert out[0]["vec_id"] == 0 and out[0]["rank"] == 1
    assert len({r["cell"] for r in out}) <= 2  # nprobe bound
    dists = [r["adc_sqdist"] for r in out]
    assert dists == sorted(dists)
