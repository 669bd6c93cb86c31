"""Mergeable distinct-count sketches (HyperLogLog), oracle-exact.

``approx_count_distinct`` (Spark's native HLL++) is the right call
inside one engine, but its register layout is implementation-defined —
no other system can verify or merge it. This module implements HLL
with every step in *portable integer arithmetic* on the engine's md5
hash (:mod:`..functions.hashing`), so:

- a DuckDB SQL oracle reproduces the estimate BIT-FOR-BIT (the
  registry's hash-compare gate applies to the sketch, not just to an
  exact count), and
- the sketch frame (bucket, max-rank) is a plain DataFrame — mergeable
  across days/partitions with ``groupBy(bucket).max()``, persistable
  as parquet, and inspectable.

Design for exactness across engines (no float accumulation anywhere
until one final division):

- base hash: 60-bit md5 integer; bucket = low ``p`` bits, the
  remaining ``60-p`` bits feed the rank.
- rank = leading-zero count + 1, computed as ``(60-p+1) -
  length(binary_repr(z))`` — string length of the base-2 repr, no
  ``log2`` (float) anywhere; identical in Spark (``conv``) and DuckDB
  (``bin``).
- register sum: ``sum(2^(W+1-rank))`` in BIGINT — the harmonic-mean
  denominator scaled by ``2^(W+1)`` so every term is an exact
  integer (max ``m * 2^(W+1)`` << 2^63). Empty registers contribute
  ``2^(W+1)`` each.
- estimate: ONE double division of two exactly-derived numbers —
  IEEE-deterministic, so both engines print the identical value.

At 100 TB the sketch is the point: per-partition partial max()
combines map-side, the shuffle carries ≤ 2^p rows of two longs, and
daily sketches union+merge without rescanning history.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

#: Hash width consumed by the rank (md5_long is < 2^60).
_HASH_BITS = 60


def _alpha(m: int) -> float:
    """Standard HLL bias constant for m >= 128 registers."""
    return 0.7213 / (1 + 1.079 / m)


def hll_sketch(
    df: DataFrame, col: str, p: int = 8, salt: str = "hll:"
) -> DataFrame:
    """Build the mergeable sketch: one row per non-empty register,
    ``(bucket, mrank)``.

    Map-side combinable (it's a plain max agg) and tiny on the wire:
    at most ``2^p`` rows of two longs regardless of input size.
    Merge sketches from different inputs with
    ``union().groupBy("bucket").agg(max("mrank"))`` — exactly what
    this returns, so merging is closed over the format.

    NULL values are ignored (standard HLL semantics; ADVICE r4 — a
    NULL used to hash into a register and perturb the estimate). The
    SQL oracle twin filters identically.
    """
    m = 1 << p
    w = _HASH_BITS - p  # bits feeding the rank
    h = md5_long(F.col(col).cast("string"), salt=salt)
    zlen = F.length(F.conv(F.col("__z").cast("string"), 10, 2))
    rank = F.when(F.col("__z") == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - zlen
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(h.alias("__h"))
        .select(
            (F.col("__h") % m).alias("bucket"),
            F.expr(f"__h div {m}").alias("__z"),
        )
        .select("bucket", rank.alias("__rank"))
        .groupBy("bucket")
        .agg(F.max("__rank").alias("mrank"))
    )


def hll_estimate(sketch: DataFrame, p: int = 8) -> DataFrame:
    """One-row estimate frame from a sketch:
    ``(buckets_used, hll_estimate)``.

    The harmonic denominator is summed as exact scaled integers
    (``2^(W+1-mrank)`` per register, ``2^(W+1)`` per empty register);
    the only floating-point op is the final division by the
    precomputed double constant ``alpha * m^2 * 2^(W+1)`` — both
    engines perform the identical single IEEE division, so the
    estimate hash-matches the SQL oracle. Raw HLL estimator (no
    small/large-range correction): below ~2.5m distincts prefer an
    exact count — the sketch's use case is the billions-of-keys range
    where exact counting is the thing that doesn't scale.
    """
    m = 1 << p
    w = _HASH_BITS - p
    scale = 1 << (w + 1)  # 2^(W+1), exact in BIGINT and in double
    numerator = _alpha(m) * m * m * scale  # one double literal
    return sketch.agg(
        F.count("*").alias("buckets_used"),
        # shiftleft with a COLUMN bit count needs expr() — the PySpark
        # wrapper only accepts a literal int
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {w + 1} - mrank)"))
        .alias("__present"),
    ).select(
        "buckets_used",
        (
            F.lit(numerator)
            / (
                F.col("__present")
                + (F.lit(m) - F.col("buckets_used")) * F.lit(scale)
            ).cast("double")
        ).alias("hll_estimate"),
    )


def hll_distinct(
    df: DataFrame, col: str, p: int = 8, salt: str = "hll:"
) -> DataFrame:
    """Convenience: sketch + estimate in one plan."""
    return hll_estimate(hll_sketch(df, col, p, salt), p)


def sql_hll_oracle(
    table: str, col: str, p: int = 8, salt: str = "hll:"
) -> str:
    """DuckDB twin of :func:`hll_distinct` — same buckets, same ranks,
    same scaled-integer sum, same single division."""
    m = 1 << p
    w = _HASH_BITS - p
    scale = 1 << (w + 1)
    numerator = _alpha(m) * m * m * scale
    return f"""
    WITH h AS (
      SELECT CAST('0x' || substring(md5('{salt}' || CAST({col} AS VARCHAR)), 1, 15)
                  AS BIGINT) AS hv
      FROM {table}
      WHERE {col} IS NOT NULL
    ),
    r AS (
      SELECT hv % {m} AS bucket,
             CASE WHEN hv // {m} = 0 THEN {w + 1}
                  ELSE {w + 1} - length(bin(hv // {m})) END AS rnk
      FROM h
    ),
    s AS (SELECT bucket, max(rnk) AS mrank FROM r GROUP BY bucket),
    agg AS (
      SELECT count(*) AS buckets_used,
             sum(1::BIGINT << ({w + 1} - mrank)) AS present
      FROM s
    )
    SELECT buckets_used,
           {numerator!r} / CAST(present + ({m} - buckets_used) * {scale}::BIGINT
                                AS DOUBLE) AS hll_estimate
    FROM agg
    """


# ---------------------------------------------------------------------------
# Count-min sketch: heavy-hitter frequency estimation, same portability
# contract as the HLL above — md5 positions, integer counters, no floats.
# ---------------------------------------------------------------------------


def _cms_position_cols(depth: int, width: int) -> list:
    """``depth`` position columns over ``__lo``/``__hi`` (the two
    30-bit halves of one md5): ``(a_i*lo + b_i*hi + c_i) mod (2^31-1)
    mod width``. One md5 per row instead of ``depth`` salted md5s —
    at trillions of rows the hashing is the dominant sketch-build
    cost. All products < 2^62, so the arithmetic is exact in any
    engine (and in the SQL oracle twin)."""
    from ..functions.hashing import MERSENNE31, universal_coeffs

    return [
        (
            (F.col("__lo") * F.lit(a) + F.col("__hi") * F.lit(b) + F.lit(c))
            % MERSENNE31
            % width
        ).alias(f"p{i}")
        for i, (a, b, c) in enumerate(universal_coeffs(depth, salt="cms"))
    ]


def _cms_halves(df: DataFrame, col: str) -> DataFrame:
    """Project the two exact 30-bit halves of md5('cms:' || col),
    keeping all original columns (integer div — float division would
    lose bits above 2^53)."""
    h = md5_long(F.col(col).cast("string"), salt="cms:")
    return df.withColumn("__h", h).selectExpr(
        "*", "__h % 1073741824 AS __lo", "__h div 1073741824 AS __hi"
    ).drop("__h")


def cms_sketch(
    df: DataFrame, col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Count-min sketch as a DataFrame: ``(row_idx, pos, cnt)``.

    Each input value increments one counter per hash row; the
    ``depth`` positions derive from ONE md5 via universal hashing
    (``(a_i*h_lo + b_i*h_hi + c_i) mod (2^31-1) mod width`` over the
    two 30-bit halves — the minhash many-permutations trick), so the
    per-row hashing cost is constant in depth. The frame is at most
    ``depth*width`` rows — map-side combinable (it's a count agg),
    mergeable across inputs with ``groupBy(row_idx, pos).sum(cnt)``,
    persistable as parquet. Point estimates (:func:`cms_estimate`)
    upper-bound true counts; the overestimate shrinks as width grows
    (ε ≈ e/width).
    """
    base = _cms_halves(df.select(col), col)
    return (
        base.select(*_cms_position_cols(depth, width))
        .select(F.posexplode(F.array(*[f"p{i}" for i in range(depth)])).alias(
            "row_idx", "pos"
        ))
        .groupBy("row_idx", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-estimate the frequency of each value in ``items[col]``:
    min over that value's ``depth`` counters (the classic CM upper
    bound; missing counters mean a true zero). Joins on the tiny
    (row_idx, pos) key — the sketch side is ≤ depth*width rows, so it
    broadcasts."""
    base = _cms_halves(items.select(col), col)
    probes = base.select(F.col(col), *_cms_position_cols(depth, width)).select(
        col,
        F.posexplode(F.array(*[f"p{i}" for i in range(depth)])).alias(
            "row_idx", "pos"
        ),
    )
    return (
        probes.join(F.broadcast(sketch), ["row_idx", "pos"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def _sql_cms_rows(depth: int) -> str:
    """(row_idx, a, b, c) VALUES rows matching
    :func:`_cms_position_cols`'s universal-hash coefficients."""
    from ..functions.hashing import universal_coeffs

    return ", ".join(
        f"({i}, {a}, {b}, {c})"
        for i, (a, b, c) in enumerate(universal_coeffs(depth, salt="cms"))
    )


#: SQL fragment: the 60-bit md5 base hash of a column expression.
def _sql_cms_hash(col: str) -> str:
    return (
        f"CAST('0x' || substring(md5('cms:' || CAST({col} AS VARCHAR)), 1, 15) "
        "AS BIGINT)"
    )


_SQL_CMS_POS = (
    "(((h % 1073741824) * a + (h // 1073741824) * b + c) % 2147483647) % {width}"
)


def sql_cms_oracle(
    table: str, col: str, depth: int = 4, width: int = 64
) -> str:
    """DuckDB twin of sketch+estimate over the distinct values of
    ``col`` in ``table`` — identical one-md5 universal-hash positions
    and counters."""
    pos = _SQL_CMS_POS.format(width=width)
    return f"""
    WITH rows_t(row_idx, a, b, c) AS (VALUES {_sql_cms_rows(depth)}),
    hashed AS (SELECT {col}, {_sql_cms_hash(col)} AS h FROM {table}),
    sk AS (
      SELECT row_idx, {pos} AS pos, count(*) AS cnt
      FROM hashed CROSS JOIN rows_t
      GROUP BY row_idx, pos
    ),
    probe AS (
      SELECT DISTINCT {col}, row_idx, {pos} AS pos
      FROM hashed CROSS JOIN rows_t
    )
    SELECT p.{col}, min(coalesce(s.cnt, 0)) AS est_count
    FROM probe p LEFT JOIN sk s ON p.row_idx = s.row_idx AND p.pos = s.pos
    GROUP BY p.{col}
    """


def cms_join_size(
    sketch_a: DataFrame, sketch_b: DataFrame, depth: int = 4
) -> DataFrame:
    """Join-cardinality estimate from two count-min sketches built on
    the SAME (col, depth, width): the classic CM inner-product
    estimator ``|A ⋈ B| ≈ min_row Σ_pos cntA·cntB`` (an upper bound
    that tightens as width grows, like the point estimates).

    The optimizer question this answers at 100 TB: "how big is this
    join going to be?" — WITHOUT scanning either table again. Each
    side's sketch is ≤ depth×width counter rows (persistable,
    mergeable across shards by summing counters); the estimate is one
    tiny equi-join on (row_idx, pos) + a depth-row min. Same
    portability contract as every sketch here: pure integer
    arithmetic, so the SQL oracle reproduces the estimate exactly.
    """
    prod = (
        sketch_a.alias("a")
        .join(
            sketch_b.alias("b"),
            (F.col("a.row_idx") == F.col("b.row_idx"))
            & (F.col("a.pos") == F.col("b.pos")),
        )
        .select(
            F.col("a.row_idx").alias("row_idx"),
            (F.col("a.cnt") * F.col("b.cnt")).alias("__p"),
        )
    )
    per_row = prod.groupBy("row_idx").agg(F.sum("__p").alias("__dot"))
    return per_row.agg(F.min("__dot").alias("est_join_size"))


def sql_cms_join_size_oracle(
    table_a: str,
    col_a: str,
    table_b: str,
    col_b: str,
    depth: int = 4,
    width: int = 64,
) -> str:
    """DuckDB twin of two cms_sketch builds + :func:`cms_join_size`,
    with the exact join size alongside."""
    pos = _SQL_CMS_POS.format(width=width)
    return f"""
    WITH rows_t(row_idx, a, b, c) AS (VALUES {_sql_cms_rows(depth)}),
    ha AS (SELECT {_sql_cms_hash(col_a)} AS h FROM {table_a}),
    hb AS (SELECT {_sql_cms_hash(col_b)} AS h FROM {table_b}),
    ska AS (
      SELECT row_idx, {pos} AS pos, count(*) AS cnt
      FROM ha CROSS JOIN rows_t GROUP BY row_idx, pos),
    skb AS (
      SELECT row_idx, {pos} AS pos, count(*) AS cnt
      FROM hb CROSS JOIN rows_t GROUP BY row_idx, pos),
    dots AS (
      SELECT a.row_idx, sum(a.cnt * b.cnt) AS dot
      FROM ska a JOIN skb b ON a.row_idx = b.row_idx AND a.pos = b.pos
      GROUP BY a.row_idx),
    ex AS (
      SELECT count(*) AS exact_join_size
      FROM {table_a} a JOIN {table_b} b ON a.{col_a} = b.{col_b}),
    est AS (SELECT CAST(min(dot) AS BIGINT) AS est_join_size FROM dots)
    SELECT est.est_join_size, CAST(ex.exact_join_size AS BIGINT) AS exact_join_size
    FROM est, ex
    """


def hll_sketch_by(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    p: int = 8,
    salt: str = "hll:",
) -> DataFrame:
    """Group-wise HLL sketch: ``(*group_cols, bucket, mrank)``.

    One shuffle keyed on (group, bucket) — at most ``2^p`` rows per
    group survive, so per-dimension uniques over billions of rows
    reduce to |groups| * 2^p two-long rows. Merges exactly like the
    global sketch (max per (group, bucket)); a day's sketches roll up
    into month/quarter uniques without touching raw data — the thing
    COUNT(DISTINCT) per dimension fundamentally can't do.
    """
    m = 1 << p
    w = _HASH_BITS - p
    h = md5_long(F.col(col).cast("string"), salt=salt)
    zlen = F.length(F.conv(F.col("__z").cast("string"), 10, 2))
    rank = F.when(F.col("__z") == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - zlen
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(*group_cols, h.alias("__h"))
        .select(
            *group_cols,
            (F.col("__h") % m).alias("bucket"),
            F.expr(f"__h div {m}").alias("__z"),
        )
        .select(*group_cols, "bucket", rank.alias("__rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__rank").alias("mrank"))
    )


def hll_estimate_by(
    sketch: DataFrame, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Per-group estimates from a group-wise sketch:
    ``(*group_cols, buckets_used, hll_estimate)`` — same exactness
    contract as :func:`hll_estimate` (scaled-integer register sums,
    one IEEE division per group)."""
    m = 1 << p
    w = _HASH_BITS - p
    scale = 1 << (w + 1)
    numerator = _alpha(m) * m * m * scale
    return sketch.groupBy(*group_cols).agg(
        F.count("*").alias("buckets_used"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {w + 1} - mrank)"))
        .alias("__present"),
    ).select(
        *group_cols,
        "buckets_used",
        (
            F.lit(numerator)
            / (
                F.col("__present")
                + (F.lit(m) - F.col("buckets_used")) * F.lit(scale)
            ).cast("double")
        ).alias("hll_estimate"),
    )


def sql_hll_by_oracle(
    table: str, group_expr: str, col: str, p: int = 8, salt: str = "hll:"
) -> str:
    """DuckDB twin of group-wise sketch+estimate; ``group_expr`` must
    alias to ``grp``."""
    m = 1 << p
    w = _HASH_BITS - p
    scale = 1 << (w + 1)
    numerator = _alpha(m) * m * m * scale
    return f"""
    WITH h AS (
      SELECT {group_expr} AS grp,
             CAST('0x' || substring(md5('{salt}' || CAST({col} AS VARCHAR)), 1, 15)
                  AS BIGINT) AS hv
      FROM {table}
      WHERE {col} IS NOT NULL
    ),
    r AS (
      SELECT grp, hv % {m} AS bucket,
             CASE WHEN hv // {m} = 0 THEN {w + 1}
                  ELSE {w + 1} - length(bin(hv // {m})) END AS rnk
      FROM h
    ),
    s AS (SELECT grp, bucket, max(rnk) AS mrank FROM r GROUP BY grp, bucket)
    SELECT grp, count(*) AS buckets_used,
           {numerator!r} / CAST(sum(1::BIGINT << ({w + 1} - mrank))
                + ({m} - count(*)) * {scale}::BIGINT AS DOUBLE)
             AS hll_estimate
    FROM s GROUP BY grp
    """


# ---------------------------------------------------------------------------
# Quantile sketch: deterministic bottom-k-by-hash sampling, same
# portability contract as HLL/CMS — the DuckDB oracle reproduces every
# estimate bit-for-bit.
#
# Why not literal KLL: KLL's compaction outcome depends on coin flips
# AND on element arrival order, so two engines (or two shard orders)
# legitimately produce different sketches — unverifiable by a
# value-hash oracle and not even self-consistent across Spark task
# retries. The deterministic alternative with the same shape
# (bounded size, mergeable, rank-error O(1/sqrt(k))): keep the k rows
# whose md5(row key) is smallest. Selection is per-row and
# order-independent, so bottom_k(A union B) ==
# bottom_k(bottom_k(A) union bottom_k(B)) — merge is union + re-take,
# associative and exact. Rank selection over the sample uses integer
# arithmetic only ((p * (n-1)) // 100 with (val, hv) tie-breaks), so
# Spark and SQL agree on every estimated value. KLL's O(1/k) error
# needs ~sqrt factor fewer rows; this trades that constant for
# engine-portable determinism, the property this module is for.
# ---------------------------------------------------------------------------


def quantile_sketch(
    df: DataFrame, value_col: str, key_col: str, k: int = 256, salt: str = "qs:"
) -> DataFrame:
    """Mergeable quantile sketch: the ``k`` rows ``(hv, val)`` with the
    smallest ``md5(salt || key)``.

    ``key_col`` must identify rows (a primary key); hashing the KEY
    rather than the value keeps duplicate values independently
    sampleable, so the sample is uniform over ROWS. Compiles to
    TakeOrderedAndProject — per-partition top-k then a k-row merge on
    the driver-side single reducer; nothing resembling a global sort.
    Merge sketches from different shards/days with
    ``union().orderBy('hv').limit(k)`` — closed over the format.
    """
    hv = md5_long(F.col(key_col).cast("string"), salt=salt)
    return (
        df.select(hv.alias("hv"), F.col(value_col).alias("val"))
        .orderBy("hv")
        .limit(k)
    )


def quantile_merge(sketches: list[DataFrame], k: int = 256) -> DataFrame:
    """Merge per-shard sketches: union then re-take the k smallest
    hashes. Associative/commutative; identical to sketching the
    concatenated input (tested)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.orderBy("hv").limit(k)


def quantile_estimate(
    sketch: DataFrame, percents: list[int]
) -> DataFrame:
    """Estimate the ``p``-th percentile for each integer ``p`` in
    ``percents`` from a sketch: order the sample by ``(val, hv)``
    (fully deterministic under ties), take the element at integer
    rank ``(p * (n-1)) // 100``. Returns ``(p, est_val)``. Runs
    entirely on the ≤k-row sketch frame."""
    from pyspark.sql.window import Window

    w = Window.orderBy("val", "hv")
    ranked = sketch.select(
        "val",
        (F.row_number().over(w) - 1).alias("rk"),
        F.count("*").over(Window.partitionBy(F.lit(1))).alias("n"),
    )
    ps = F.explode(F.array(*[F.lit(int(p)) for p in percents])).alias("p")
    probes = ranked.select(ps, "val", "rk", "n")
    return probes.filter(F.expr("rk = (p * (n - 1)) div 100")).select(
        "p", F.col("val").alias("est_val")
    )


def sql_quantile_oracle(
    table: str,
    value_col: str,
    key_col: str,
    percents: list[int],
    k: int = 256,
    salt: str = "qs:",
) -> str:
    """DuckDB twin of sketch+estimate — same bottom-k sample, same
    integer rank selection."""
    pvals = ", ".join(f"({int(p)})" for p in percents)
    return f"""
    WITH s AS (
      SELECT hv, val FROM (
        SELECT CAST('0x' || substring(md5('{salt}' || CAST({key_col} AS VARCHAR)), 1, 15)
                    AS BIGINT) AS hv,
               {value_col} AS val
        FROM {table}
      ) ORDER BY hv LIMIT {k}
    ),
    r AS (
      SELECT val, row_number() OVER (ORDER BY val, hv) - 1 AS rk,
             count(*) OVER () AS n
      FROM s
    )
    SELECT p.p, r.val AS est_val
    FROM r JOIN (VALUES {pvals}) AS p(p)
      ON r.rk = (p.p * (r.n - 1)) // 100
    """


def equi_depth_bounds(sketch: DataFrame, n_buckets: int) -> DataFrame:
    """Equi-depth bucket boundaries from a bottom-k quantile sketch:
    a 1-row frame with ``bs`` = array of ``n_buckets - 1`` boundary
    values (the sample elements at integer ranks
    ``(j * (n-1)) div n_buckets``, sample ordered by ``(val, hv)`` —
    the same deterministic rank convention as
    :func:`quantile_estimate`).

    This is the 100 TB path for equi-depth histograms: the full-data
    exact ``percentile()`` aggregate buffers EVERY value in one
    aggregation state (a single-point memory hazard), while the
    sketch shuffles ≤k rows no matter the input size and the boundary
    selection runs on that k-row frame. Determinism makes the bounds
    oracle-twinnable (see :func:`sql_equi_depth_bounds`)."""
    if n_buckets < 2:
        # sequence(1, 0) in Spark counts DOWN ([1, 0]) — a 1-bucket
        # request would emit two phantom boundaries instead of none
        raise ValueError("n_buckets must be >= 2")
    arr = sketch.agg(
        F.array_sort(F.collect_list(F.struct("val", "hv"))).alias("s")
    )
    return arr.select(
        F.expr(
            f"transform(sequence(1, {int(n_buckets) - 1}), "
            f"j -> element_at(s, CAST((j * (size(s) - 1)) DIV "
            f"{int(n_buckets)} AS INT) + 1).val)"
        ).alias("bs")
    )


def sql_equi_depth_bounds(
    table: str,
    value_col: str,
    key_expr: str,
    n_buckets: int,
    k: int = 256,
    salt: str = "qs:",
) -> str:
    """DuckDB twin of ``quantile_sketch`` + :func:`equi_depth_bounds`:
    a CTE body (``SELECT bs``) producing the identical boundary
    array. ``key_expr`` is the row-key SQL expression (VARCHAR)."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    return f"""
    SELECT list_transform(range(1, {int(n_buckets)}),
             j -> vs[CAST((j * (n - 1)) // {int(n_buckets)} AS INT) + 1]) AS bs
    FROM (
      SELECT list(val ORDER BY val, hv) AS vs, count(*) AS n
      FROM (
        SELECT hv, val FROM (
          SELECT CAST('0x' || substring(md5('{salt}' || {key_expr}), 1, 15)
                      AS BIGINT) AS hv,
                 {value_col} AS val
          FROM {table}
        ) ORDER BY hv LIMIT {int(k)}
      )
    )
    """


# ---------------------------------------------------------------------------
# Bloom filter: set membership, completing the sketch family (HLL =
# distinct count, CMS = frequency, bottom-k = quantiles, Bloom =
# membership). Same portability contract: one md5, universal-hash bit
# positions, integer arithmetic only.
# ---------------------------------------------------------------------------


def _bloom_position_cols(k: int, m_bits: int) -> list:
    """``k`` bit positions over ``__lo``/``__hi`` (see
    :func:`_cms_position_cols`); salt differs so Bloom and CMS
    positions are independent."""
    from ..functions.hashing import MERSENNE31, universal_coeffs

    return [
        (
            (F.col("__lo") * F.lit(a) + F.col("__hi") * F.lit(b) + F.lit(c))
            % MERSENNE31
            % m_bits
        ).alias(f"b{i}")
        for i, (a, b, c) in enumerate(universal_coeffs(k, salt="bloom"))
    ]


def _bloom_halves(df: DataFrame, col: str, native: bool = False) -> DataFrame:
    """``native=False``: md5-based 60-bit hash — portable, so SQL
    oracles reproduce bit positions (membership queries).
    ``native=True``: ``xxhash64`` masked to 60 bits — engine-private
    but pure codegen integer ops, ~10x cheaper per row. Legitimate
    wherever the RESULT doesn't depend on which bits are set (the
    join-prefilter: false positives die in the join), illegitimate
    wherever positions themselves are checked."""
    if native:
        h = F.xxhash64(F.col(col)).bitwiseAND(F.lit((1 << 60) - 1))
    else:
        h = md5_long(F.col(col).cast("string"), salt="bloom:")
    return df.withColumn("__h", h).selectExpr(
        "*", "__h % 1073741824 AS __lo", "__h div 1073741824 AS __hi"
    ).drop("__h")


def bloom_build(
    df: DataFrame, col: str, k: int = 5, m_bits: int = 256,
    native: bool = False,
) -> DataFrame:
    """Build the Bloom filter as a DataFrame of DISTINCT set bit
    positions ``(bit_idx)`` — at most ``m_bits`` rows however large
    the input. Merge filters from different shards/days with
    ``union().distinct()`` (bitwise OR); persist as parquet;
    broadcast into probes. The false-positive rate is the classic
    ``(1 - e^(-k·n/m))^k``.

    The (k, m_bits, native) build parameters are stamped into the
    ``bit_idx`` field metadata so probes can detect a parameter
    mismatch — probing with a different hash/k/m than the build
    would cause FALSE NEGATIVES (silently dropped matching rows),
    the one failure mode a Bloom filter must never have."""
    base = _bloom_halves(df.select(col), col, native=native)
    meta = {"bloom_k": k, "bloom_m_bits": m_bits, "bloom_native": native}
    return (
        base.select(*_bloom_position_cols(k, m_bits))
        .select(F.explode(F.array(*[f"b{i}" for i in range(k)])).alias("bit_idx"))
        .distinct()
        .select(F.col("bit_idx").alias("bit_idx", metadata=meta))
    )


def _check_bloom_params(
    bloom: DataFrame, k: int, m_bits: int, native: bool, where: str
) -> None:
    """Raise if the filter frame's stamped build parameters disagree
    with the probe parameters (metadata survives union/persist; a
    frame without the stamp — e.g. read back from a bare format —
    is accepted as-is)."""
    try:
        meta = bloom.schema["bit_idx"].metadata or {}
    except (KeyError, TypeError):
        return
    want = {"bloom_k": k, "bloom_m_bits": m_bits, "bloom_native": native}
    stamped = {k_: meta[k_] for k_ in want if k_ in meta}
    bad = {k_: (v, want[k_]) for k_, v in stamped.items() if v != want[k_]}
    if bad:
        raise ValueError(
            f"{where}: bloom probe parameters disagree with the build "
            f"(built vs probed): {bad} — this would cause false "
            "negatives (silently dropped rows)"
        )


def bloom_probe(
    bloom: DataFrame, items: DataFrame, col: str, k: int = 5, m_bits: int = 256
) -> DataFrame:
    """Probe: an item is "maybe present" iff ALL ``k`` of its bit
    positions are set (count of matched bits == k); definitely absent
    otherwise — the Bloom guarantee of no false negatives. One
    explode + broadcast join on the ≤m_bits-row filter."""
    _check_bloom_params(bloom, k, m_bits, False, "bloom_probe")
    base = _bloom_halves(items, col)
    probes = base.select(
        "*", F.explode(F.array(*_bloom_position_cols(k, m_bits))).alias("bit_idx")
    ).drop("__lo", "__hi")
    marked = probes.join(
        F.broadcast(bloom.withColumn("__set", F.lit(1))), "bit_idx", "left"
    )
    keep = [c for c in items.columns]
    return (
        marked.groupBy(*keep)
        .agg((F.count("__set") == k).alias("in_bloom"))
    )


def sql_bloom_oracle(
    member_pred: str, k: int = 5, m_bits: int = 256
) -> str:
    """DuckDB twin of build-over-members + probe-all-documents,
    aggregated to membership/false-positive counts. ``member_pred``
    is the SQL predicate selecting the member docs."""
    from ..functions.hashing import universal_coeffs

    rows = ", ".join(
        f"({i}, {a}, {b}, {c})"
        for i, (a, b, c) in enumerate(universal_coeffs(k, salt="bloom"))
    )
    h = ("CAST('0x' || substring(md5('bloom:' || CAST(doc_id AS VARCHAR)), 1, 15) "
         "AS BIGINT)")
    pos = f"(((h % 1073741824) * a + (h // 1073741824) * b + c) % 2147483647) % {m_bits}"
    return f"""
    WITH coeffs(i, a, b, c) AS (VALUES {rows}),
    hashed AS (SELECT doc_id, {h} AS h, ({member_pred}) AS is_member
               FROM documents),
    bloom AS (
      SELECT DISTINCT {pos} AS bit_idx
      FROM hashed CROSS JOIN coeffs WHERE is_member),
    probes AS (
      SELECT doc_id, is_member, {pos} AS bit_idx
      FROM hashed CROSS JOIN coeffs),
    verdict AS (
      SELECT p.doc_id, p.is_member,
             count(b.bit_idx) = {k} AS in_bloom
      FROM probes p LEFT JOIN bloom b ON p.bit_idx = b.bit_idx
      GROUP BY p.doc_id, p.is_member)
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_members,
           CAST(sum(CASE WHEN in_bloom THEN 1 ELSE 0 END) AS BIGINT)
             AS n_maybe,
           CAST(sum(CASE WHEN in_bloom AND NOT is_member THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_positives,
           CAST(sum(CASE WHEN is_member AND NOT in_bloom THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_negatives
    FROM verdict
    """


def quantile_sketch_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    k: int = 256,
    salt: str = "qs:",
) -> DataFrame:
    """Group-wise quantile sketch: the k smallest-hash rows PER GROUP
    ``(*group_cols, hv, val)`` — the quantile analogue of
    :func:`hll_sketch_by`. One shuffle keyed on the group; the
    per-group window keeps ≤k rows each, so per-dimension percentiles
    over billions of rows reduce to |groups|·k rows. Merges like the
    global sketch (union + re-take per group)."""
    from pyspark.sql import Window

    hv = md5_long(F.col(key_col).cast("string"), salt=salt)
    w = Window.partitionBy(*group_cols).orderBy("hv")
    return (
        df.select(*group_cols, hv.alias("hv"), F.col(value_col).alias("val"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def quantile_estimate_by(
    sketch: DataFrame, group_cols: list[str], percents: list[int]
) -> DataFrame:
    """Per-group percentile estimates from a group-wise sketch:
    ``(*group_cols, p, est_val)`` — same integer rank selection as
    :func:`quantile_estimate`, windowed per group."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("val", "hv")
    ranked = sketch.select(
        *group_cols,
        "val",
        (F.row_number().over(w) - 1).alias("rk"),
        F.count("*").over(Window.partitionBy(*group_cols)).alias("n"),
    )
    ps = F.explode(F.array(*[F.lit(int(p)) for p in percents])).alias("p")
    probes = ranked.select(*group_cols, ps, "val", "rk", "n")
    return probes.filter(F.expr("rk = (p * (n - 1)) div 100")).select(
        *group_cols, "p", F.col("val").alias("est_val")
    )


# ---------------------------------------------------------------------------
# HLL set algebra: union via register max-merge, intersection via
# inclusion-exclusion — the reason sketches beat exact counts at
# 100 TB: segment overlaps come from merging two <=2^p-row frames,
# never from re-shuffling the raw keys.
# ---------------------------------------------------------------------------


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union of HLL sketches: register-wise max over the unioned
    frames. Closed over the sketch format (returns another
    ``(bucket, mrank)`` frame), so daily/per-segment sketches merge
    associatively without touching the raw data."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("bucket").agg(F.max("mrank").alias("mrank"))


def hll_set_ops(
    df_a: DataFrame, df_b: DataFrame, col: str, p: int = 8
) -> DataFrame:
    """One-row frame of segment-overlap estimates from two inputs:
    ``(est_a, est_b, est_union, est_overlap)``.

    ``est_union`` comes from the max-merged registers (the HLL union
    is exact over sketch states); ``est_overlap`` is
    inclusion-exclusion ``est_a + est_b - est_union`` — the standard
    HLL intersection estimator. All three estimates are the
    deterministic single-division values of :func:`hll_estimate`, so
    a DuckDB oracle (:func:`sql_hll_setops_oracle`) reproduces every
    output bit-for-bit. At scale the inputs are typically per-segment
    sketches persisted by earlier jobs; this recomputes them inline
    so the query is self-contained."""
    a = hll_sketch(df_a, col, p)
    b = hll_sketch(df_b, col, p)
    u = hll_merge(a, b)

    def est(sk: DataFrame, name: str) -> DataFrame:
        return hll_estimate(sk, p).select(F.col("hll_estimate").alias(name))

    return (
        est(a, "est_a")
        .crossJoin(est(b, "est_b"))
        .crossJoin(est(u, "est_union"))
        .select(
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
                "est_overlap"
            ),
        )
    )


def sql_hll_setops_oracle(
    table: str, col: str, pred_a: str, pred_b: str, p: int = 8,
    salt: str = "hll:",
) -> str:
    """DuckDB twin of :func:`hll_set_ops` over ``table`` rows split by
    two SQL predicates — same buckets, ranks, max-merge, and the same
    left-associated inclusion-exclusion arithmetic."""
    m = 1 << p
    w = _HASH_BITS - p
    scale = 1 << (w + 1)
    numerator = _alpha(m) * m * m * scale

    def regs(pred: str, name: str) -> str:
        return f"""
    {name}_r AS (
      SELECT hv % {m} AS bucket,
             max(CASE WHEN hv // {m} = 0 THEN {w + 1}
                 ELSE {w + 1} - length(bin(hv // {m})) END) AS mrank
      FROM (
        SELECT CAST('0x' || substring(
                 md5('{salt}' || CAST({col} AS VARCHAR)), 1, 15)
               AS BIGINT) AS hv
        FROM {table} WHERE ({pred}) AND {col} IS NOT NULL)
      GROUP BY bucket)"""

    def est(src: str, name: str) -> str:
        return f"""
    {name} AS (
      SELECT {numerator!r} / CAST(
               sum(1::BIGINT << ({w + 1} - mrank))
               + ({m} - count(*)) * {scale}::BIGINT AS DOUBLE) AS v
      FROM {src})"""

    return f"""
    WITH {regs(pred_a, 'a')},
    {regs(pred_b, 'b')},
    u_r AS (
      SELECT bucket, max(mrank) AS mrank
      FROM (SELECT * FROM a_r UNION ALL SELECT * FROM b_r)
      GROUP BY bucket),
    {est('a_r', 'ea')},
    {est('b_r', 'eb')},
    {est('u_r', 'eu')}
    SELECT ea.v AS est_a, eb.v AS est_b, eu.v AS est_union,
           ea.v + eb.v - eu.v AS est_overlap
    FROM ea, eb, eu
    """


def bloom_prefilter(
    bloom: DataFrame, items: DataFrame, col: str, k: int = 5,
    m_bits: int = 256, native: bool = False,
) -> DataFrame:
    """Filter ``items`` to rows whose ``col`` is *maybe* in the Bloom
    filter — the join-prefilter shape (à la Spark's own runtime
    bloom-filter join pushdown, expressed as an explicit operator).

    The filter is packed into ``m_bits/64`` bitmap longs COLLECTED to
    the driver (a Bloom filter is sketch metadata — kilobytes however
    large the build side, same class as IVF centroids or DQ rule
    counts) and folded into the probe plan as a LITERAL array:
    Catalyst constant-folds it once and the probe is a pure
    whole-stage-codegen scan + filter with O(1) ``element_at`` +
    bit-test per probe — no join node, no shuffle, no per-row
    broadcast-array copying. (Both alternatives measured 15-45x
    slower at m_bits=8192 on 600k probe rows: ``array_contains`` over
    a set-bit array is a linear scan per probe, and shipping the
    bitmap through a broadcast nested-loop join re-copies the array
    per row.) Pass ``native=True`` here AND in :func:`bloom_build`
    for the xxhash64 position hash: filter pushdown inlines the
    position expressions into every short-circuit conjunct, so with
    the md5 hash each surviving row pays ~10 md5+conv evaluations —
    measured 4x the whole probe cost. Eager: calling this
    materializes ``bloom``.

    No false negatives (Bloom guarantee): downstream equi-joins
    produce exactly the rows they would without the prefilter, minus
    most non-matching input.
    """
    from functools import reduce

    _check_bloom_params(bloom, k, m_bits, native, "bloom_prefilter")
    n_words = (m_bits + 63) // 64
    words = [0] * n_words
    # pack bits into words ENGINE-SIDE first: the collect is then
    # <= m_bits/64 rows however many bits are set (a raw bit_idx
    # collect is up to m_bits rows — millions for a fact-sized build)
    packed = bloom.groupBy(F.expr("bit_idx div 64").alias("__w")).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT),"
            " CAST(bit_idx % 64 AS INT)))"
        ).alias("__bits")
    )
    # Arrow transfer: at fact-sized filters the word frame is
    # m_bits/64 rows (500k+ for a 3M-key build) and row-at-a-time
    # py4j collect() is minutes; toPandas is sub-second
    pdf = packed.toPandas()
    for w_idx, bits in zip(pdf["__w"], pdf["__bits"]):
        words[int(w_idx)] = int(bits) & ((1 << 64) - 1)
    # Java longs are signed: wrap the unsigned python ints. ONE
    # Literal array object (F.lit(list)), not an array(...) SQL text:
    # k inlined 128-literal CreateArrays blow the generated-code size
    # past the codegen method limit and drop the stage to interpreted
    # mode (measured 5x slower).
    arr = F.lit(
        [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    )
    keep = list(items.columns)
    base = _bloom_halves(items, col, native=native)
    probed = base.select(
        *keep,
        *[
            c.alias(f"__p{i}")
            for i, c in enumerate(_bloom_position_cols(k, m_bits))
        ],
    )

    def probe(i: int):
        word = F.element_at(arr, (F.col(f"__p{i}") / 64).cast("int") + 1)
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(__p{i} % 64 AS INT))"
        )
        return word.bitwiseAND(mask) != 0

    cond = reduce(lambda acc, i: acc & probe(i), range(k), F.lit(True))
    return probed.filter(cond).select(*keep)


# ---------------------------------------------------------------------------
# Large-build Bloom prefilter: numpy bitmap + Arrow-batched probe.
# The literal-array variant above is right for SMALL filters (the
# python->Literal conversion and plan size are O(m_bits/64); fine to
# ~2^16 bits). For fact-sized builds (millions of keys, megabyte
# bitmaps) the bitmap must travel as DATA, not as plan text: pack it
# engine-side, materialize m/64 words on the driver via Arrow, and
# probe inside a pandas UDF whose closure holds the numpy bitmap —
# vectorized splitmix64 hashing, zero py4j per-element costs, task
# binary grows by exactly the bitmap's bytes.
# ---------------------------------------------------------------------------

#: splitmix64 finalizer constants (public domain, Steele et al.) —
#: identical avalanche mixing in numpy uint64 (wraparound) on both
#: the build and probe paths, so there are no false negatives.
_SM64_C1 = 0xBF58476D1CE4E5B9
_SM64_C2 = 0x94D049BB133111EB
_SM64_GOLDEN = 0x9E3779B97F4A7C15


def _np_mix64(arr):
    """Vectorized splitmix64 over a numpy int64/uint64 array."""
    import numpy as np

    z = arr.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z = z + np.uint64(_SM64_GOLDEN)
        z ^= z >> np.uint64(30)
        z *= np.uint64(_SM64_C1)
        z ^= z >> np.uint64(27)
        z *= np.uint64(_SM64_C2)
        z ^= z >> np.uint64(31)
    return z


def _np_bloom_positions(keys, k: int, m_bits: int):
    """k position arrays for integer keys; m_bits must be a power of
    two (positions via double-mix + high-bits take)."""
    import numpy as np

    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
    shift = np.uint64(64 - m_bits.bit_length() + 1)
    h = _np_mix64(keys)
    out = []
    with np.errstate(over="ignore"):
        for i in range(k):
            salt = np.uint64((_SM64_GOLDEN * (i + 1)) & ((1 << 64) - 1))
            hi = _np_mix64(h ^ salt)
            out.append((hi >> shift).astype(np.int64))
    return out


def bloom_prefilter_large(
    build: DataFrame,
    items: DataFrame,
    build_col: str,
    probe_col: str,
    k: int = 5,
    m_bits: int = 1 << 25,
) -> DataFrame:
    """Filter ``items`` to rows whose integer ``probe_col`` is maybe
    among ``build[build_col]`` — the fact-scale Bloom join prefilter.

    Build: each partition packs its keys into a local numpy bitmap
    inside ``mapInPandas`` and emits only its NONZERO (word, bits)
    rows; a ``bit_or`` groupBy merges partitions and Arrow delivers
    the ≤ m_bits/64-word bitmap to the driver — driver traffic is
    bounded by the bitmap, never the build cardinality. Probe: an
    Arrow-batched pandas UDF holds the bitmap as a numpy closure and
    tests all k positions vectorized. The same splitmix64 mixing runs
    on both sides, so the no-false-negative guarantee holds and
    downstream equi-joins return exactly the unfiltered result.

    Integer keys only (the join-key case); ~10 bits/key for ~1% FP
    at k=5. Eager: materializes the build side once.
    """
    import numpy as np

    from pyspark.sql import types as T

    n_words = m_bits // 64

    def pack(it):
        for pdf in it:
            local = np.zeros(n_words, dtype=np.uint64)
            keys = pdf[build_col].to_numpy(dtype=np.int64)
            for pos in _np_bloom_positions(keys, k, m_bits):
                np.bitwise_or.at(
                    local,
                    pos >> 6,
                    np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)),
                )
            nz = np.nonzero(local)[0]
            yield pd.DataFrame(
                {
                    "word": nz.astype("int64"),
                    "bits": local[nz].view(np.int64),
                }
            )

    packed = (
        build.select(build_col)
        .mapInPandas(
            pack,
            T.StructType(
                [
                    T.StructField("word", T.LongType()),
                    T.StructField("bits", T.LongType()),
                ]
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
        .toPandas()
    )
    bitmap = np.zeros(n_words, dtype=np.uint64)
    bitmap[packed["word"].to_numpy(dtype=np.int64)] = packed[
        "bits"
    ].to_numpy(dtype=np.int64).view(np.uint64)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def maybe_member(keys: pd.Series) -> pd.Series:
        kv = keys.to_numpy(dtype=np.int64)
        ok = np.ones(len(kv), dtype=bool)
        for pos in _np_bloom_positions(kv, k, m_bits):
            word = bitmap[pos >> 6]
            bit = np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
            ok &= (word & bit) != 0
        return pd.Series(ok)

    return items.filter(maybe_member(F.col(probe_col)))
