"""Deduplication operators for large-scale training-data pipelines.

Five families, all partition-parallel with no driver-side loops:

- :func:`exact_dedup` — hash-groupBy exact dedup (content md5).
- :func:`fingerprint_dedup` — dedup on a normalized 64-bit
  fingerprint (cheap shuffle key: 8 bytes instead of full text).
- :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — MinHash
  over character shingles + banded LSH candidate pairs (the
  standard near-dup pipeline: shingle -> minhash -> band -> bucket
  join).
- :func:`simhash64` — per-document SimHash from token hashes.
- :func:`ngram_jaccard_pairs` — exact n-gram Jaccard verification
  for candidate pairs.
- :func:`embedding_near_dup_pairs` — cosine near-dup over an
  embedding column, LSH-bucketed (random-hyperplane signs) so the
  pair join never goes quadratic in the corpus.

Hashing is md5-based (:mod:`..functions.hashing`) so every step is
bit-reproducible in the ANSI-SQL oracles. At 100 TB the dominant
costs are the shingle explode (bounded by ``max_shingles``) and the
band-bucket self-join (bounded by band cardinality); both shuffle
compact integer keys, never raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long
from ..functions.text import char_ngrams, normalize_text, word_tokens, fingerprint64


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id document per exact (md5) content hash.

    groupBy on a 16-byte hash, not the raw text — the shuffle moves
    hashes + ids only. Equivalent oracle: ``GROUP BY md5(text)`` with
    ``min(id)`` then semi-join.
    """
    hashed = df.withColumn("__h", F.md5(F.col(text_col)))
    keep = hashed.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return (
        hashed.join(keep, [ "__h", id_col], "left_semi").drop("__h")
    )


def fingerprint_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on the normalized 64-bit fingerprint (whitespace/
    case-insensitive)."""
    hashed = df.withColumn("__fp", fingerprint64(text_col))
    keep = hashed.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return hashed.join(keep, ["__fp", id_col], "left_semi").drop("__fp")


def _shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, shingle_len: int
) -> DataFrame:
    """(id, base-hash) of each distinct shingle — the Jaccard set
    elements, hashed to one 60-bit md5 integer so the distinct
    shuffles 8-byte keys instead of raw shingle strings.

    The text is normalized into a materialized column BEFORE shingle
    generation (see :func:`..functions.text.char_ngrams` perf note),
    and the input is rebalanced across the cluster first: shingling
    is ~300× row amplification, so an extra shuffle of the raw
    documents is cheap insurance against a few huge input splits
    gating the whole stage (on tiny local files it's the difference
    between 1 core and all of them).
    """
    spread = df.sparkSession.sparkContext.defaultParallelism
    normed = df.repartition(spread).select(
        F.col(id_col), normalize_text(F.col(text_col)).alias("__t")
    )
    return (
        normed.select(
            id_col,
            F.explode(
                char_ngrams(F.col("__t"), shingle_len, pre_normalized=True)
            ).alias("shingle"),
        )
        .select(id_col, md5_long(F.col("shingle")).alias("base"))
        .distinct()
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    shingle_len: int = 5,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per document: ``num_perm`` min-agg columns
    ``h0..h{n-1}``.

    ONE md5 per distinct shingle; each permutation is a universal
    hash ``(a*x_lo + b*x_hi + c) mod 2^31-1`` over the md5's 30-bit
    halves (:func:`..functions.hashing.universal_coeffs`) — integer
    ops inside codegen, ~num_perm× cheaper than salted re-hashing.
    One explode + one groupBy; every ``min()`` combines map-side.
    """
    from ..functions.hashing import MERSENNE31, universal_coeffs

    if shingles is None:
        shingles = _shingle_hashes(df, id_col, text_col, shingle_len)
    # base < 2^60, so the halves are exact in 64-bit integer math
    x_lo = F.col("base") % F.lit(1 << 30)
    x_hi = F.shiftright(F.col("base"), 30)
    coeffs = universal_coeffs(num_perm)
    aggs = [
        F.min((F.lit(a) * x_lo + F.lit(b) * x_hi + F.lit(c)) % F.lit(MERSENNE31)).alias(f"h{i}")
        for i, (a, b, c) in enumerate(coeffs)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def stacked_band_keys(
    sig: DataFrame, id_col: str, num_perm: int, bands: int
) -> DataFrame:
    """Long-form LSH band keys (id, band_idx, band_key) from a
    signature frame.

    This is the persistable LSH *index* layout: one 64-bit key per
    (doc, band), so probe joins shuffle 3 longs per row and the index
    parquet is tiny relative to the corpus. Shared by the batch pair
    generator (:func:`minhash_lsh_pairs`) and the incremental probe
    (:mod:`.incremental`), so index and probe always agree on the key
    construction.
    """
    rows_per_band = num_perm // bands
    band_cols = []
    for b in range(bands):
        parts = [
            F.col(f"h{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        band_cols.append(
            md5_long(F.concat_ws("|", *parts), salt=f"band{b}:").alias(f"band{b}")
        )
    return sig.select(
        id_col,
        F.posexplode(F.array(*band_cols)).alias("band_idx", "band_key"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    shingle_len: int = 5,
    bands: int = 4,
    max_bucket_size: int | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    Signature split into ``bands`` bands of ``num_perm//bands`` rows;
    documents sharing any band key become a candidate pair
    (id_a < id_b, with the estimated Jaccard = fraction of equal
    signature components). Pair join happens per-band on a single
    64-bit band key — the scale-safe layout (no all-pairs join).

    ``max_bucket_size``: skip band buckets larger than this (a
    k-member bucket emits k² pairs — degenerate mega-clusters, e.g.
    boilerplate-dominated corpora, belong to exact/fingerprint dedup
    first; this cap is the standard production guard). None = no cap
    (exact LSH semantics, what the SQL oracle replicates).
    """
    # cache(), not localCheckpoint (measured): sig feeds band
    # stacking plus the two signature re-joins, but converting it to
    # a checkpoint measured corpus_dedup 7.2s -> 12.7s — the eager
    # materialization serializes work that the cached variant overlaps
    # inside one AQE run, and the small signature table re-plans
    # cheaply
    sig = minhash_signatures(
        df, id_col, text_col, num_perm, shingle_len, shingles=shingles
    ).cache()

    # long-form (id, band_index, band_key); the self-join shuffles
    # only 3 longs per row, signatures are re-joined onto the (small)
    # distinct pair set afterwards.
    stacked = stacked_band_keys(sig, id_col, num_perm, bands)
    if max_bucket_size is not None:
        small = (
            stacked.groupBy("band_idx", "band_key")
            .count()
            .filter(F.col("count") <= max_bucket_size)
            .drop("count")
        )
        stacked = stacked.join(small, ["band_idx", "band_key"], "left_semi")
    left = stacked.select(F.col(id_col).alias("id_a"), "band_idx", "band_key")
    right = stacked.select(F.col(id_col).alias("id_b"), "band_idx", "band_key")
    pairs = (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    sig_a = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"h{i}").alias(f"a_h{i}") for i in range(num_perm)],
    )
    sig_b = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"h{i}").alias(f"b_h{i}") for i in range(num_perm)],
    )
    matches = sum(
        (F.when(F.col(f"a_h{i}") == F.col(f"b_h{i}"), 1).otherwise(0)
         for i in range(num_perm)),
        F.lit(0),
    )
    return (
        pairs.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .select(
            "id_a", "id_b", (matches / F.lit(float(num_perm))).alias("est_jaccard")
        )
    )


def simhash64(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """Per-document SimHash over word tokens (default 32 bits so the
    value stays oracle-portable in signed 64-bit arithmetic).

    Classic construction: each token hashes to ``bits`` bits; bit b of
    the document hash is 1 iff the (+1/-1) vote sum over tokens is
    positive. Implemented as ``bits`` conditional sums in one groupBy
    — map-side combinable, shuffle carries ``bits`` ints per doc.
    """
    toks = df.select(
        F.col(id_col), F.explode(word_tokens(text_col)).alias("tok")
    )
    h = md5_long(F.col("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    per_doc = toks.groupBy(id_col).agg(*votes)
    sim = sum(
        (F.when(F.col(f"v{b}") > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))
         for b in range(bits)),
        F.lit(0).cast("long"),
    )
    return per_doc.select(id_col, sim.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (id_a, id_b).

    Verification stage after LSH: |A∩B| via a shingle-hash equi-join
    restricted to candidate pairs, |A∪B| = |A|+|B|−|A∩B|. All joins
    are equi-joins on ids/hashes — no quadratic blowup beyond the
    candidate set.
    """
    sh = (
        shingles
        if shingles is not None
        else _shingle_hashes(df, id_col, text_col, shingle_len)
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))

    a_sh = sh.select(F.col(id_col).alias("id_a"), F.col("base").alias("ha"))
    b_sh = sh.select(F.col(id_col).alias("id_b"), F.col("base").alias("hb"))
    inter = (
        candidates.select("id_a", "id_b")
        .join(a_sh, "id_a")
        .join(b_sh.withColumnRenamed("id_b", "rb"), (F.col("id_b") == F.col("rb")) & (F.col("ha") == F.col("hb")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        candidates.select("id_a", "id_b")
        .join(inter, ["id_a", "id_b"], "left")
        .na.fill({"n_inter": 0})
        .join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


def corpus_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
    num_perm: int = 16,
    shingle_len: int = 5,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """The packaged training-corpus dedup pipeline: exact dedup ->
    MinHash LSH candidates -> exact Jaccard verify -> drop near-dups.

    Keeps, per duplicate cluster, the lowest-id representative:
    exact dups collapse first (identity clusters never reach the
    LSH stage), then any document whose verified Jaccard with a
    LOWER-id survivor is >= threshold is dropped. One shingle pass
    feeds both LSH and verification.

    Returns the surviving rows of ``df`` (all columns).
    """
    # survivors and the shingle frame are localCheckpoint-ed, not
    # cache()d: survivors feeds three branches (shingling, the verify
    # join, the returned anti join) and sh feeds both LSH and verify;
    # cached frames keep full lineage in every consumer plan, and the
    # assembled query measured 105 AQE stage-jobs at sf0.1 — the
    # checkpoints truncate at the stage boundaries (same pattern as
    # incremental_dedup, measured 237 -> 96 jobs there)
    survivors = exact_dedup(df, text_col=text_col, id_col=id_col).localCheckpoint()
    sh = _shingle_hashes(
        survivors, id_col, text_col, shingle_len
    ).localCheckpoint()
    cand = minhash_lsh_pairs(
        survivors,
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        shingle_len=shingle_len,
        bands=bands,
        max_bucket_size=max_bucket_size,
        shingles=sh,
    )
    verified = ngram_jaccard_pairs(
        survivors, cand, id_col=id_col, text_col=text_col,
        shingle_len=shingle_len, shingles=sh,
    )
    # id_a < id_b by construction: dropping every id_b with a
    # qualifying lower-id partner keeps exactly one representative
    # per connected near-dup cluster reachable via lower ids.
    drop = (
        verified.filter(F.col("jaccard") >= jaccard_threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return survivors.join(drop, id_col, "left_anti")


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    threshold: float = 0.9,
) -> DataFrame:
    """Cosine near-duplicates via random-hyperplane LSH buckets.

    Hyperplane coefficients are deterministic ±1 derived from
    md5(plane, dim-index) — reproducible in SQL oracles. Vectors
    sharing the full sign-pattern bucket are exact-cosine checked;
    with ``n_planes`` planes the expected bucket fraction is
    ``2^-n_planes`` of the corpus, keeping the self-join subquadratic.
    Recall is approximate (sign-LSH), which is the documented
    trade-off of the scale path; the brute-force operator in
    :mod:`.similarity` is the exact baseline.
    """
    from ..functions.vectors import l2_norm
    from .similarity import _cosine_pair, sign_lsh_bucket

    bucket = sign_lsh_bucket(F.col(vec_col), dim, n_planes)
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(F.col(vec_col)).alias("norm"),  # once per vector
        bucket.alias("bucket"),
    )
    a = bucketed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        F.col("norm").alias("na"), "bucket",
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        F.col("norm").alias("nb"), "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(_cosine_pair("va", "vb", "na", "nb"), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def simhash_hamming_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup PAIRS via Hamming-ball search — the pair
    finder SimHash exists for (:func:`simhash64` alone only produces
    the hashes).

    Pigeonhole candidate generation: split the hash into ``bands``
    equal bit-bands; two hashes within Hamming distance
    ``max_hamming < bands`` MUST agree on at least one band, so an
    equi-join on (band_idx, band_value) finds every true pair while
    touching only same-band buckets (never all pairs). The verify
    step is exact: ``bit_count(a XOR b) <= max_hamming`` — integer
    ops both engines share. Returns (id_a, id_b, hamming).
    """
    assert bits % bands == 0 and max_hamming < bands
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    # localCheckpoint: the simhash computation (shingling + per-bit
    # majority aggregation) feeds BOTH sides of the band self-join;
    # the two sides project different aliases so AQE exchange reuse
    # cannot dedupe them and the hash subtree runs twice without it
    hashes = simhash64(df, id_col, text_col, bits=bits).localCheckpoint()
    banded = hashes.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", i * band_bits).bitwiseAND(F.lit(mask))
                    for i in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a = banded.select(
        F.col(id_col).alias("id_a"),
        F.col("simhash").alias("__ha"),
        "band_idx",
        "band_val",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"),
        F.col("simhash").alias("__hb"),
        "band_idx",
        "band_val",
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(
                F.expr("__ha").bitwiseXOR(F.expr("__hb"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def prefix_filtered_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 5,
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> DataFrame:
    """All document pairs with shingle-Jaccard ≥ num/den, found via
    PPJoin-style prefix filtering instead of the quadratic all-pairs
    join (Xiao et al., "Efficient Similarity Joins for Near Duplicate
    Detection", WWW'08 — public algorithm).

    Sort every document's shingle set by GLOBAL document frequency
    (rarest first, hash as tie-break); two sets with Jaccard ≥ t must
    share at least one element among each one's first
    ``n - ceil(t·n) + 1`` elements under any common total order, so
    only prefix shingles generate candidates. With rarest-first
    ordering the prefixes hold exactly the shingles with the fewest
    partners, collapsing the candidate count; exact Jaccard then
    verifies candidates only.

    The threshold is a rational (num/den) and every comparison is
    integer cross-multiplied (``den·|∩| ≥ num·|∪|``) — no float
    boundary anywhere. Scale: the only quadratic risk is a shingle
    shared by many PREFIXES; rarest-first ordering makes that the
    rarest shingles, and the document-frequency join is keyed on the
    8-byte shingle hash (never strings). Returns (id_a, id_b,
    n_inter, n_union) with id_a < id_b.
    """
    from pyspark.sql import Window

    t_num, t_den = threshold_num, threshold_den
    sh = _shingle_hashes(df, id_col, text_col, shingle_len).cache()
    dfreq = sh.groupBy("base").agg(F.count("*").alias("df"))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    w = Window.partitionBy(id_col).orderBy("df", "base")
    ranked = (
        sh.join(dfreq, "base")
        .withColumn("rk", F.row_number().over(w))
        .join(sizes, id_col)
    )
    # L = n - ceil(t*n) + 1, computed in integers:
    # ceil(num*n/den) = floor((num*n + den - 1) / den)
    ceil_tn = F.floor((t_num * F.col("n") + (t_den - 1)) / t_den)
    prefix = ranked.filter(F.col("rk") <= F.col("n") - ceil_tn + 1).select(
        F.col(id_col).alias("pid"), "base"
    )
    cand = (
        prefix.alias("pa")
        .join(
            prefix.alias("pb"),
            (F.col("pa.base") == F.col("pb.base"))
            & (F.col("pa.pid") < F.col("pb.pid")),
        )
        .select(F.col("pa.pid").alias("id_a"), F.col("pb.pid").alias("id_b"))
        .distinct()
    )
    # PPJoin's length filter: Jaccard ≥ t forces |∩| ≤ min(na, nb)
    # and |∪| ≥ max(na, nb), so den·min ≥ num·max is NECESSARY —
    # prune candidates on two broadcast joins before paying the
    # full-shingle intersection join for them (pure pruning: the
    # final threshold re-checks the exact counts, results unchanged)
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    cand = (
        cand.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .filter(
            t_den * F.least("na", "nb") >= t_num * F.greatest("na", "nb")
        )
        .select("id_a", "id_b")
    )
    inter = (
        cand.join(sh.alias("sa"), F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(
            sh.alias("sb"),
            (F.col("id_b") == F.col(f"sb.{id_col}"))
            & (F.col("sa.base") == F.col("sb.base")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .withColumn("n_union", F.col("na") + F.col("nb") - F.col("n_inter"))
        .filter(t_den * F.col("n_inter") >= t_num * F.col("n_union"))
        .select("id_a", "id_b", "n_inter", "n_union")
    )
