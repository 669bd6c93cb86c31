"""Approximate-nearest-neighbor similarity search over embeddings.

Two paths:

- :func:`brute_force_topk` — the exact baseline: broadcast the
  (small) query set against the corpus, score cosine with built-in
  higher-order functions, window top-k. One pass over the corpus,
  no corpus self-shuffle; at 100 TB the corpus scan parallelizes and
  the only shuffle is (query_id, k) rows.
- :func:`lsh_bucketed_topk` — the scale path: sign-LSH bucket the
  corpus once (reusable index DataFrame), probe only matching
  buckets. Trades recall for a ``~2^-planes`` candidate fraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hyperplane_coeffs
from ..functions.vectors import cosine_similarity, dot_product, l2_norm


def _cosine_pair(a: str, b: str, na: str, nb: str) -> Column:
    """Pair-level cosine with PREcomputed norms: the same
    ``dot/(na*nb)`` float path as the inline form and the SQL
    oracles, but each norm is evaluated once per vector instead of
    once per candidate pair."""
    denom = F.col(na) * F.col(nb)
    return F.when(denom == 0, F.lit(0.0)).otherwise(
        dot_product(F.col(a), F.col(b)) / denom
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` must be small enough to broadcast (the usual ANN
    serving shape). Ties broken by neighbor id for determinism.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qv"),
            l2_norm(F.col(vec_col)).alias("__qn"),
        )
    )
    # norms are per-vector, so compute them once per side; the pair
    # expression is one dot product + the oracle's exact
    # dot/(nq*nc) formula (identical float path, identical values)
    scored = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    ).crossJoin(q).select(
        query_id_col,
        "neighbor_id",
        F.round(_cosine_pair("__qv", "__cv", "__qn", "__cn"), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def sign_lsh_bucket(
    vec_col: Column, dim: int, n_planes: int = 8, salt: str = ""
) -> Column:
    """Deterministic random-hyperplane bucket id in [0, 2^n_planes).

    Plane coefficients are ±1 from md5(salt, plane, dim-index)
    (:func:`..functions.hashing.hyperplane_coeffs`) — precomputed on
    the driver so the per-row work is a fused multiply-add chain, and
    engine-portable so SQL oracles rebuild identical planes.
    """
    coeffs = hyperplane_coeffs(dim, n_planes, salt)
    v = vec_col.cast("array<double>")

    def sign(p: int) -> Column:
        # zip_with + aggregate keeps the expression tree O(1) in dim
        # (a 64-term element_at chain cripples analysis/codegen) and
        # accumulates left-to-right — bit-identical to the SQL
        # oracle's literal term-by-term sum. One lit() for the whole
        # plane: per-element lit chains cost a py4j call each and
        # dominate plan-build time.
        plane = F.lit(coeffs[p])
        s = F.aggregate(
            F.zip_with(v, plane, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        return F.when(s >= 0, F.lit(1)).otherwise(F.lit(0))

    out = sign(0)
    for p in range(1, n_planes):
        out = out + sign(p) * F.lit(2 ** p)
    return out


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: probe only the query's sign-LSH bucket.

    The bucketed corpus is an index you would persist (partitioned by
    bucket) and reuse across query batches; the probe join is an
    equi-join on the bucket id, so each query touches ~1/2^planes of
    the corpus instead of all of it.
    """
    indexed = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
        sign_lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    probes = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qv"),
            l2_norm(F.col(vec_col)).alias("__qn"),
            sign_lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
        )
    )
    scored = indexed.join(probes, "bucket").select(
        query_id_col,
        "neighbor_id",
        F.round(_cosine_pair("__qv", "__cv", "__qn", "__cn"), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )
