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
    """
    m = 1 << p
    w = _HASH_BITS - p  # bits feeding the rank
    h = md5_long(F.col(col).cast("string"), salt=salt)
    zlen = F.length(F.conv(F.col("__z").cast("string"), 10, 2))
    rank = F.when(F.col("__z") == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - zlen
    )
    return (
        df.select(h.alias("__h"))
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
