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
from ..functions.vectors import dot_product, l2_norm
from .topk import global_topk


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


def ivf_index(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_stride: int | None = None,
    refine_iters: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """IVF (inverted-file) index: assign every vector to its nearest
    centroid.

    Seed centroids are picked deterministically from the corpus
    (``id % stride == 0``); ``refine_iters`` Lloyd iterations
    (:func:`kmeans_refine`) optionally move them to cluster means
    before the final assignment. Assignment is one broadcast join +
    argmin over ``n_centroids`` dot products — a single corpus pass;
    the result is the persistent index you partition by
    ``centroid_id``.

    When ``centroid_stride`` is None the stride is derived from the
    corpus size INSIDE the plan (a 1-row count aggregate cross-joined
    in — the same scalar-subquery shape as the SQL oracle), so the
    index build stays one declarative plan with no driver-side
    action. Pass an explicit stride to skip the extra count scan.

    Returns (centroids, assigned) — ``assigned`` carries
    (id, vec, norm, centroid_id).
    """
    if centroid_stride is not None:
        seed_src = corpus
        stride = F.lit(centroid_stride).cast("long")
    else:
        stride_df = corpus.agg(
            F.greatest(
                F.floor(F.count(F.lit(1)) / n_centroids), F.lit(1).cast("long")
            ).alias("__stride")
        )
        seed_src = corpus.crossJoin(F.broadcast(stride_df))
        stride = F.col("__stride")
    centroids = F.broadcast(
        seed_src.filter((F.col(id_col) % stride == 0))
        .select(
            (F.col(id_col) / stride).cast("int").alias("centroid_id"),
            F.col(vec_col).alias("__centroid"),
        )
        .filter(F.col("centroid_id") < n_centroids)
    )
    if refine_iters > 0:
        centroids = kmeans_refine(
            corpus, centroids, iters=refine_iters, id_col=id_col, vec_col=vec_col
        )
    scored = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(F.col(vec_col)).alias("__norm"),
    ).crossJoin(centroids).select(
        id_col,
        vec_col,
        "__norm",
        "centroid_id",
        dot_product(F.col(vec_col), F.col("__centroid")).alias("__sim"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    assigned = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, F.col("__norm").alias("norm"), "centroid_id")
    )
    return centroids, assigned


def kmeans_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd iterations over the IVF centroids.

    Each iteration = the IVF assignment join (argmax dot product
    against broadcast centroids) + an element-wise mean per cell:
    vectors explode to (centroid, dim, value), mean per (centroid,
    dim), re-assemble with ``sort_array(collect_list(struct))`` —
    every step linear in corpus size, centroids stay broadcastable.
    Returns refined centroids (centroid_id, __centroid).
    """
    v = F.col(vec_col).cast("array<double>")
    for _ in range(iters):
        scored = corpus.select(F.col(id_col), v.alias("__v")).crossJoin(
            F.broadcast(centroids)
        ).select(
            id_col,
            "__v",
            "centroid_id",
            dot_product(F.col("__v"), F.col("__centroid")).alias("__sim"),
        )
        w = Window.partitionBy(id_col).orderBy(
            F.col("__sim").desc(), F.col("centroid_id").asc()
        )
        assigned = (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(id_col, "__v", "centroid_id")
        )
        exploded = assigned.select(
            "centroid_id", F.posexplode("__v").alias("dim", "val")
        )
        means = exploded.groupBy("centroid_id", "dim").agg(F.avg("val").alias("m"))
        centroids = F.broadcast(
            means.groupBy("centroid_id")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("__centroid")
            )
        )
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 8,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroid_stride: int | None = None,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF-style approximate top-k: score only the ``nprobe`` nearest
    centroid cells per query.

    The scale path complementary to sign-LSH: the index is one
    assignment pass (reusable, partitioned by cell), each query
    probes nprobe/n_centroids of the corpus, recall grows with
    nprobe (and with ``refine_iters`` k-means refinement of the
    centroids). Deterministic end to end — SQL-oracle checkable at
    refine_iters=0; refined centroids are cluster means, whose
    floating-point sums are not oracle-stable, so the k-means path is
    validated by a recall-vs-brute-force test instead.
    """
    centroids, assigned = ivf_index(
        corpus, n_centroids, id_col, vec_col, centroid_stride, refine_iters
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    q_scored = q.crossJoin(centroids).select(
        query_id_col,
        "__qv",
        "__qn",
        "centroid_id",
        dot_product(F.col("__qv"), F.col("__centroid")).alias("__sim"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    probes = F.broadcast(
        q_scored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select(query_id_col, "__qv", "__qn", "centroid_id")
    )
    scored = assigned.join(probes, "centroid_id").select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        F.round(
            F.when(F.col("__qn") * F.col("norm") == 0, F.lit(0.0)).otherwise(
                dot_product(F.col("__qv"), F.col(vec_col))
                / (F.col("__qn") * F.col("norm"))
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def int8_quantize(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "qvec"
) -> DataFrame:
    """Per-vector int8 scalar quantization: ``q_i = trunc(x_i * 127 /
    max|x|)`` (zero vectors quantize to zeros).

    The standard 4× storage/bandwidth lever for vector search at
    scale — the quantized index is what ships to disk and over the
    shuffle. Truncation (not rounding) is deliberate: double→int
    truncates identically in every engine, while round() half-case
    behavior differs, so the SQL oracle reproduces every code
    bit-for-bit.
    """
    v = F.col(vec_col).cast("array<double>")
    m = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.when(m == 0, F.transform(v, lambda x: F.lit(0).cast("long"))).otherwise(
        F.transform(v, lambda x: (x * 127.0 / m).cast("long"))
    )
    return df.withColumn(out_col, q)


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Cosine top-k over int8-QUANTIZED vectors: integer dot products
    (exact in any engine — |q| ≤ 127, sums ≪ 2^53) with one final
    float division per pair. Same shape as :func:`brute_force_topk`
    but the scored payload is a quarter the bytes — at 100 TB the
    quantized index is the resident set and full-precision vectors
    stay in cold storage for optional re-ranking."""
    qc = int8_quantize(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qvec").alias("__cq"),
        F.sqrt(
            F.aggregate(
                F.transform("qvec", lambda x: x * x),
                F.lit(0).cast("long"),
                lambda acc, t: acc + t,
            ).cast("double")
        ).alias("__cn"),
    )
    qq = F.broadcast(
        int8_quantize(queries, vec_col).select(
            F.col(query_id_col),
            F.col("qvec").alias("__qq"),
            F.sqrt(
                F.aggregate(
                    F.transform("qvec", lambda x: x * x),
                    F.lit(0).cast("long"),
                    lambda acc, t: acc + t,
                ).cast("double")
            ).alias("__qn"),
        )
    )
    dot = F.aggregate(
        F.zip_with("__qq", "__cq", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    denom = F.col("__qn") * F.col("__cn")
    scored = qc.crossJoin(qq).select(
        query_id_col,
        "neighbor_id",
        F.round(
            F.when(denom == 0, F.lit(0.0)).otherwise(
                dot.cast("double") / denom
            ),
            6,
        ).alias("qcosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("qcosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "qcosine", "rank")
    )


def semantic_dedup(
    corpus: DataFrame,
    n_centroids: int = 8,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_stride: int | None = None,
    refine_iters: int = 0,
) -> DataFrame:
    """SemDeDup-style embedding-cluster deduplication: keep one
    representative per group of semantically-near documents.

    Completes the dedup ladder (exact → fuzzy-text → embedding-pair →
    embedding-CLUSTER): cluster the corpus into IVF cells
    (:func:`ivf_index`, optionally k-means-refined), compare pairs
    only WITHIN a cell, and drop every document whose cosine to a
    lower-id document in its cell reaches ``threshold`` (deterministic
    keep-first policy — same drop rule as the text LSH dedup). Returns
    the kept rows ``(id, centroid_id)``.

    100 TB posture: the only quadratic work is within cells, so
    ``n_centroids`` scales with the corpus to hold expected cell size
    constant (SemDeDup's published setting is ~100k clusters for
    web-scale corpora); the cell join is an equi-join on centroid_id,
    and the drop is one left-anti join. With ``refine_iters=0`` the
    whole plan is oracle-deterministic; refined centroids are float
    cluster means, validated by tests instead.
    """
    _, assigned = ivf_index(
        corpus, n_centroids, id_col, vec_col, centroid_stride, refine_iters
    )
    a = assigned.select(
        F.col(id_col).alias("__id_a"),
        F.col(vec_col).alias("__va"),
        F.col("norm").alias("__na"),
        "centroid_id",
    )
    b = assigned.select(
        F.col(id_col).alias("__id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("norm").alias("__nb"),
        "centroid_id",
    )
    dup_ids = (
        a.join(b, "centroid_id")
        .filter(F.col("__id_a") < F.col("__id_b"))
        .filter(
            F.round(_cosine_pair("__va", "__vb", "__na", "__nb"), 6)
            >= F.lit(threshold)
        )
        .select(F.col("__id_b").alias(id_col))
        .distinct()
    )
    return assigned.join(dup_ids, id_col, "left_anti").select(
        id_col, "centroid_id"
    )


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


def _pq_explode(
    emb, dim: int, m: int, id_col: str, vec_col: str
):
    """(vid, s, dd, q) micro-unit coordinate rows (shared by train,
    encode, and the ADC query table)."""
    sub = dim // m
    return emb.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("d", "x"),
    ).select(
        "vid",
        (F.col("d") / sub).cast("int").alias("s"),
        (F.col("d") % sub).cast("int").alias("dd"),
        F.floor((F.col("x") + F.lit(1.0)) * F.lit(1_000_000.0))
        .cast("long")
        .alias("q"),
    )


def _pq_assign(expl: DataFrame, centroids: DataFrame):
    """Deterministic argmin assignment vs a broadcast codebook:
    (best, mind) = per-(vid, subspace) chosen centroid and its
    squared distance. Ties break (min sqdist, then min centroid)."""
    dist = (
        expl.join(F.broadcast(centroids), ["s", "dd"])
        .groupBy("vid", "s", "c")
        .agg(
            F.sum(
                (F.col("q") - F.col("val")) * (F.col("q") - F.col("val"))
            ).alias("sq")
        )
    )
    mind = dist.groupBy("vid", "s").agg(F.min("sq").alias("md"))
    best = (
        dist.join(mind, ["vid", "s"])
        .filter(F.col("sq") == F.col("md"))
        .groupBy("vid", "s")
        .agg(F.min("c").alias("c"))
    )
    return best, mind


def _pq_seed_ids(emb: DataFrame, k: int, id_col: str) -> list[int]:
    """The k SMALLEST distinct ids (rank-based, not ``id < k``:
    sparse or 1-based id spaces would silently yield an empty
    codebook — review r7); k ids collect to the driver, always
    tiny. Raises if fewer than k exist."""
    seed_ids = [
        int(r[0])
        for r in emb.select(F.col(id_col).alias("vid"))
        .distinct()
        .orderBy("vid")
        .limit(k)
        .collect()
    ]
    if len(seed_ids) < k:
        raise ValueError(
            f"need at least k={k} distinct vectors to seed, got {len(seed_ids)}"
        )
    return seed_ids


def _pq_seed_map(
    emb: DataFrame, k: int, id_col: str, seed_ids: list[int] | None = None
) -> DataFrame:
    """(vid, c) seed assignment; pass ``seed_ids`` (from
    :func:`_pq_seed_ids`, possibly over-collected and sliced) to
    avoid repeating the distinct-sort collect (review r7 pass 2 —
    ivf_pq_topk paid it twice)."""
    if seed_ids is None:
        seed_ids = _pq_seed_ids(emb, k, id_col)
    return emb.sparkSession.createDataFrame(
        [(v, c) for c, v in enumerate(seed_ids[:k])], "vid long, c int"
    )


def _pq_lloyd(expl: DataFrame, seed_map: DataFrame, rounds: int):
    """The Lloyd loop over an arbitrary (vid, s, dd, q) coordinate
    frame (plain coordinates for the coarse quantizer, RESIDUAL
    coordinates for the fine PQ of IVF-PQ). Returns (centroids,
    final best, final mind) — the LAST assignment pass is returned
    so callers never recompute it."""
    # lazy checkpoints throughout the loop: there is no driver action
    # between rounds, so eager materialization added one job per
    # round purely to persist blocks the next round would compute
    # anyway.  Lazy keeps the Catalyst plan truncated per round (the
    # LogicalRDD leaf) while folding all round computations into the
    # caller's first real action; each marked RDD still persists on
    # first compute, so nothing is evaluated twice.
    cent = (
        expl.join(F.broadcast(seed_map), "vid")
        .select("s", "c", "dd", F.col("q").alias("val"))
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        best, _mind = _pq_assign(expl, cent)
        upd = (
            expl.join(best, ["vid", "s"])
            .groupBy("s", "c", "dd")
            .agg(F.expr("sum(q) DIV count(*)").alias("nval"))
        )
        cent = (
            cent.join(upd, ["s", "c", "dd"], "left")
            .select("s", "c", "dd", F.coalesce("nval", "val").alias("val"))
            .localCheckpoint(eager=False)
        )
    best, mind = _pq_assign(expl, cent)
    return cent, best, mind


def _pq_fit(
    emb: DataFrame,
    dim: int,
    m: int,
    k: int,
    rounds: int,
    id_col: str,
    vec_col: str,
):
    """Shared explode + seed + Lloyd: returns (expl, centroids,
    final best, final mind) so callers reuse the LAST assignment
    pass instead of recomputing it (review r7 — pq_adc_topk used to
    pay the most expensive shuffles twice)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    expl = _pq_explode(emb, dim, m, id_col, vec_col).localCheckpoint(
        eager=False
    )
    cent, best, mind = _pq_lloyd(
        expl, _pq_seed_map(emb, k, id_col), rounds
    )
    return expl, cent, best, mind


def pq_train(
    emb: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train a PRODUCT-QUANTIZATION codebook (Jégou et al. 2011, the
    other half of the FAISS serving stack next to IVF): split the
    ``dim``-dimensional space into ``m`` subspaces and run ``rounds``
    Lloyd iterations of k-means with ``k`` centroids per subspace —
    in INTEGER micro-unit arithmetic, so the trained codebook is
    bit-identical on any engine and partitioning:

    - coordinates quantize once to non-negative micro-units
      ``floor((x + 1.0) * 1e6)`` (the +1 offset keeps every later
      DIV on non-negative operands, where floor == truncate on both
      engines; constant offsets cancel in distances);
    - distances are exact BIGINT sums of squared differences;
    - assignment ties break by centroid index (min sqdist, then
      min c) — the deterministic argmin;
    - centroid update is ``sum(coord) DIV count`` per dimension;
      empty clusters keep their previous centroid;
    - seeds are the vectors with the ``k`` SMALLEST ids
      (deterministic under any id space; raises if fewer than k
      distinct vectors exist).

    Scale shape: each round is two shuffles — assignment keyed on
    (subspace, sub-dim) against the BROADCAST codebook (m·k·dim/m =
    dim·k rows, always tiny), update keyed on (subspace, centroid,
    sub-dim) with map-side partial sums. State between rounds is the
    codebook, not the data: the classic Lloyd's-on-Spark shape.
    ``localCheckpoint`` truncates lineage per round.

    Returns the flattened codebook with quality stats, one row per
    (subspace, centroid, sub-dimension): ``(s, c, dd, centroid_val,
    n_vectors, total_sqdist_mega)`` — distortion pre-scaled per
    vector by DIV 1e6 so the BIGINT cluster sum cannot overflow at
    scale — where the stats come from the final assignment pass
    against the trained codebook.
    """
    _expl, cent, best, mind = _pq_fit(
        emb, dim, m, k, rounds, id_col, vec_col
    )
    stats = (
        best.join(mind, ["vid", "s"])
        .groupBy("s", "c")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            # distortion is pre-scaled PER VECTOR (md DIV 1e6 —
            # mega-micro-units^2) before summing: per-pair sqdist is
            # ~1e13, so a raw BIGINT cluster sum overflows past ~1e5
            # vectors per cluster (hit in tools/stress_pq.py at 200k
            # vectors), while the scaled sum stays in BIGINT to
            # ~5e11 vectors/cluster and replays exactly in any
            # engine (a DECIMAL(38,0) column was tried first but its
            # repr differs between engines in the value compare)
            F.sum(F.expr("md DIV 1000000")).alias("total_sqdist_mega"),
        )
    )
    return cent.join(stats, ["s", "c"], "left").select(
        "s",
        "c",
        "dd",
        F.col("val").cast("bigint").alias("centroid_val"),
        F.coalesce("n_vectors", F.lit(0)).cast("bigint").alias("n_vectors"),
        F.coalesce("total_sqdist_mega", F.lit(0))
        .cast("bigint")
        .alias("total_sqdist_mega"),
    )


def pq_adc_topk(
    emb: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    rounds: int = 3,
    query_id: int = 0,
    topk: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes — the SERVING half of
    the product-quantization pair (:func:`pq_train` trains the
    codebook): every vector\'s m centroid codes come from the
    trainer\'s FINAL assignment pass (reused, not recomputed — review
    r7), the query keeps its RAW coordinates and precomputes the
    per-(subspace, centroid) squared-distance lookup TABLE (that
    asymmetry is the \'A\' in ADC — the query is never quantized,
    halving the error), and every vector scores as the sum of m
    table lookups. All integer: the same micro-unit coordinates,
    exact BIGINT distances, deterministic (distance, id) ranking.

    Scale shape at serving time: codes are m bytes per vector; the
    lookup table is m·k BIGINTs broadcast per query; scoring is one
    map-side join + sum — no per-pair d-dimensional arithmetic at
    all, which is why IVF-PQ serves billion-vector corpora. Here the
    train → encode → serve chain runs as one DAG."""
    expl, cent, codes, _mind = _pq_fit(
        emb, dim, m, k, rounds, id_col, vec_col
    )
    qtab = (
        expl.filter(F.col("vid") == query_id)
        .join(F.broadcast(cent), ["s", "dd"])
        .groupBy("s", "c")
        .agg(
            F.sum(
                (F.col("q") - F.col("val")) * (F.col("q") - F.col("val"))
            ).alias("t")
        )
    )
    scored = (
        codes.join(F.broadcast(qtab), ["s", "c"])
        .groupBy("vid")
        .agg(F.sum("t").cast("bigint").alias("adc_sqdist"))
    )
    return global_topk(
        scored, [F.col("adc_sqdist").asc(), F.col("vid").asc()], topk
    ).select(F.col("vid").alias(id_col), "adc_sqdist", "rank")


def ivf_pq_topk(
    emb: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    nlist: int = 4,
    nprobe: int = 2,
    coarse_rounds: int = 2,
    fine_rounds: int = 2,
    query_id: int = 0,
    topk: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ — the full billion-vector ANN serving architecture
    (Jégou et al. 2011, the FAISS ``IVFx,PQy`` index) as one
    integer-deterministic DAG:

    1. COARSE quantizer: k-means over whole vectors (``nlist``
       cells, the Lloyd loop with m=1) partitions the corpus;
    2. RESIDUAL encoding: each vector's offset from its cell
       centroid (shifted +2e6 to stay non-negative for the DIV
       centroid updates; constant shifts cancel in distances) is
       product-quantized — residuals are tighter than raw vectors,
       which is why IVF-PQ beats flat PQ at equal code size;
    3. SEARCH: the query ranks cells by exact integer L2 to the
       coarse centroids, probes the best ``nprobe``, builds a
       PER-CELL ADC lookup table from its residual against that
       cell (the query's residual differs per cell — the detail
       naive implementations get wrong), and scores only vectors in
       probed cells as the sum of m table lookups.

    Everything is the same micro-unit integer arithmetic as
    :func:`pq_train` (deterministic argmins, DIV updates), so the
    entire index build AND the probed search replay exactly in the
    SQL oracle. Scale shape: both quantizers broadcast; candidates
    are bounded by the probed cells' population (nprobe/nlist of the
    corpus on average); per-candidate cost is m lookups, not d
    multiplications."""
    if dim % m != 0:
        # the fine stage calls _pq_lloyd directly, bypassing
        # _pq_fit's guard — without this a non-divisible m silently
        # mis-decomposes the subspaces (review r7 pass 2)
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    # one seed collect covers both quantizers (review r7 pass 2)
    seed_ids = _pq_seed_ids(emb, max(nlist, k), id_col)
    expl1 = _pq_explode(emb, dim, 1, id_col, vec_col).localCheckpoint(
        eager=False
    )
    coarse_cent, coarse_best, _cm = _pq_lloyd(
        expl1, _pq_seed_map(emb, nlist, id_col, seed_ids), coarse_rounds
    )
    cells = coarse_best.select("vid", F.col("c").alias("cell"))
    cc = coarse_cent.select(
        F.col("c").alias("cell"), "dd", F.col("val").alias("cval")
    )
    fine_expl = (
        expl1.join(cells, "vid")
        .join(F.broadcast(cc), ["cell", "dd"])
        .select(
            "vid",
            (F.col("dd") / sub).cast("int").alias("s"),
            (F.col("dd") % sub).cast("int").alias("dd_f"),
            (F.col("q") - F.col("cval") + F.lit(2_000_000)).alias("q"),
        )
        .withColumnRenamed("dd_f", "dd")
        .localCheckpoint(eager=False)
    )
    fine_cent, fine_codes, _mind = _pq_lloyd(
        fine_expl, _pq_seed_map(emb, k, id_col, seed_ids), fine_rounds
    )
    # probe: exact integer L2 from the query to every coarse centroid
    qcoords = expl1.filter(F.col("vid") == query_id)
    cell_dist = (
        qcoords.join(F.broadcast(cc), "dd")
        .groupBy("cell")
        .agg(
            F.sum(
                (F.col("q") - F.col("cval")) * (F.col("q") - F.col("cval"))
            ).alias("cdist")
        )
    )
    wp = Window.orderBy(F.col("cdist").asc(), F.col("cell").asc())
    probed = (
        cell_dist.withColumn("prank", F.row_number().over(wp))
        .filter(F.col("prank") <= nprobe)
        .select("cell")
    )
    # per-cell ADC table from the query's PER-CELL residual
    qres = (
        qcoords.join(F.broadcast(cc.join(probed, "cell")), "dd")
        .select(
            "cell",
            (F.col("dd") / sub).cast("int").alias("s"),
            (F.col("dd") % sub).cast("int").alias("ddf"),
            (F.col("q") - F.col("cval") + F.lit(2_000_000)).alias("qr"),
        )
    )
    qtab = (
        qres.join(
            F.broadcast(fine_cent.withColumnRenamed("dd", "ddf")),
            ["s", "ddf"],
        )
        .groupBy("cell", "s", "c")
        .agg(
            F.sum(
                (F.col("qr") - F.col("val")) * (F.col("qr") - F.col("val"))
            ).alias("t")
        )
    )
    cand = cells.join(F.broadcast(probed), "cell")
    scored = (
        fine_codes.join(cand, "vid")
        .join(F.broadcast(qtab), ["cell", "s", "c"])
        .groupBy("vid", "cell")
        .agg(F.sum("t").cast("bigint").alias("adc_sqdist"))
    )
    return global_topk(
        scored, [F.col("adc_sqdist").asc(), F.col("vid").asc()], topk
    ).select(
        F.col("vid").alias(id_col),
        F.col("cell").cast("int").alias("cell"),
        "adc_sqdist",
        "rank",
    )


def pq_encode(
    emb: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Train a PQ codebook and ENCODE the corpus against it: returns
    (codes, codebook) where codes is the WIDE per-vector code row —
    ``(id, code0..code{m-1})``, the m-bytes-per-vector artifact a
    100 TB embedding store actually persists (the floats are 256x
    larger) — and codebook is the (s, c, dd, val) centroid table.
    The codes come from the trainer's final assignment pass, so
    encode is free on top of training."""
    _expl, cent, best, _mind = _pq_fit(
        emb, dim, m, k, rounds, id_col, vec_col
    )
    codes = best.groupBy("vid").agg(
        *[
            F.max(F.when(F.col("s") == s, F.col("c")))
            .cast("int")
            .alias(f"code{s}")
            for s in range(m)
        ]
    )
    return codes.withColumnRenamed("vid", id_col), cent


def pq_code_dedup(
    emb: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic near-dup detection over PQ CODES (the compressed
    representation, not the floats): vectors that quantize to the
    SAME m-byte code word sit in the same cell of the k^m-cell
    product grid — the coarse semantic-dedup a real embedding store
    runs directly on its persisted codes table, touching 1/256th of
    the bytes `semantic_dedup` reads. Returns one row per duplicate
    code word: (rep_<id> = min id, n_members, member_ids sorted
    comma-joined). Deterministic end-to-end (integer trainer +
    argmin encode), so the full train → encode → group pipeline
    replays in the SQL oracle.

    Scale shape: train as :func:`pq_train`; the dedup itself is ONE
    groupBy over m-byte keys — no pairs, no LSH banding, no
    verification joins. Precision is tunable by k and m (k^m cells);
    at the registry's 8^4 = 4096 cells it's a candidate generator
    with the same contract as `simhash`: exact-match buckets."""
    codes, _cent = pq_encode(emb, dim, m, k, rounds, id_col, vec_col)
    key = [f"code{s}" for s in range(m)]
    return (
        codes.groupBy(*key)
        .agg(
            F.min(id_col).alias(f"rep_{id_col}"),
            F.count("*").cast("int").alias("n_members"),
            F.array_join(
                F.sort_array(F.collect_list(F.col(id_col))), ","
            ).alias("member_ids"),
        )
        .filter(F.col("n_members") >= 2)
        .select(f"rep_{id_col}", "n_members", "member_ids")
    )


class PQCodeStore:
    """Persisted PQ index: the (codebook, codes) parquet pair an
    embedding store keeps INSTEAD of raw vectors — write once after
    training, serve ADC probes forever without the floats. Mirrors
    :class:`..operators.incremental.DedupIndex`: single-writer
    parquet artifacts, loaded fresh per session.

    Layout under ``path``: ``codebook/`` = (s, c, dd, val),
    ``codes/`` = (id, code0..code{m-1}) partitioned however the
    writer was partitioned. Serving joins the m-byte codes against a
    broadcast per-query lookup table — the raw corpus vectors are
    never read again."""

    def __init__(self, spark, path: str, id_col: str = "vec_id") -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.id_col = id_col

    def write(self, codes: DataFrame, codebook: DataFrame) -> None:
        codebook.write.mode("overwrite").parquet(f"{self.path}/codebook")
        codes.write.mode("overwrite").parquet(f"{self.path}/codes")

    def load(self) -> tuple[DataFrame, DataFrame]:
        return (
            self.spark.read.parquet(f"{self.path}/codes"),
            self.spark.read.parquet(f"{self.path}/codebook"),
        )

    def adc_topk(
        self,
        query: DataFrame,
        dim: int,
        m: int,
        topk: int = 20,
        vec_col: str = "embedding",
    ) -> DataFrame:
        """ADC top-k served FROM THE STORE: the query row (one
        vector, raw coordinates) builds the (s, c) lookup table
        against the persisted codebook; the persisted codes score as
        the sum of m lookups. No raw corpus vectors involved —
        byte-for-byte what :func:`pq_adc_topk` computes in-DAG, but
        against the durable artifact."""
        codes, cent = self.load()
        qexpl = _pq_explode(query, dim, m, self.id_col, vec_col)
        qtab = (
            qexpl.join(F.broadcast(cent), ["s", "dd"])
            .groupBy("s", "c")
            .agg(
                F.sum(
                    (F.col("q") - F.col("val")) * (F.col("q") - F.col("val"))
                ).alias("t")
            )
        )
        long_codes = codes.select(
            F.col(self.id_col).alias("vid"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("s"),
                            F.col(f"code{s}").alias("c"),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("sc"),
        ).select("vid", "sc.s", "sc.c")
        scored = (
            long_codes.join(F.broadcast(qtab), ["s", "c"])
            .groupBy("vid")
            .agg(F.sum("t").cast("bigint").alias("adc_sqdist"))
        )
        return global_topk(
            scored, [F.col("adc_sqdist").asc(), F.col("vid").asc()], topk
        ).select(F.col("vid").alias(self.id_col), "adc_sqdist", "rank")
