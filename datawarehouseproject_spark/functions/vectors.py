"""Vector math over ``array<float>`` embedding columns.

Built-in higher-order functions (``zip_with`` + ``aggregate``) keep
the arithmetic JVM-side — no Python UDF, no serialization. Arithmetic
is done in DOUBLE (after casting the float elements) with strict
left-to-right accumulation, which matches DuckDB's list kernels
closely enough that rounded scores are oracle-stable.

Scale note: brute-force cosine top-k is a cross join; the
:mod:`..operators.similarity` module bounds it via broadcast of the
(small) query side and LSH bucketing for the all-pairs case.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ a_i * b_i in double precision."""
    prod = F.zip_with(_as_double(_c(a)), _as_double(_c(b)), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    sq = F.transform(_as_double(_c(a)), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)
