"""Portable deterministic hashing.

All dedup/LSH operators hash through md5 so Spark results are
bit-identical to the ANSI-SQL oracles (DuckDB computes the same md5;
``xxhash64``/``hash`` are engine-specific and deliberately avoided in
anything that must be oracle-checkable). md5 is computed JVM-side and
is plenty fast relative to shuffle cost at 100 TB.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def py_md5_long(s: str) -> int:
    """Driver-side twin of :func:`md5_long` for constants (e.g.
    hyperplane seeds): identical value, computed once instead of
    per-row."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


#: Mersenne prime 2^31-1: modulus of the universal-hash family used
#: to derive many MinHash permutations from ONE md5 per shingle.
MERSENNE31 = (1 << 31) - 1


def universal_coeffs(n: int, salt: str = "minhash") -> list[tuple[int, int, int]]:
    """(a, b, c) coefficient triples for ``n`` universal hash
    functions over the two 30-bit halves of an md5-derived base:
    ``h_i(x) = (a_i*x_lo + b_i*x_hi + c_i) mod (2^31-1)``.

    One md5 per input + n cheap integer ops replaces n salted md5s —
    the standard many-permutations MinHash trick. All products stay
    below 2^62, so 64-bit arithmetic is exact in any engine and the
    SQL oracle reproduces values bit-for-bit.
    """
    out = []
    for i in range(n):
        a = py_md5_long(f"{salt}-a:{i}") % MERSENNE31 or 1
        b = py_md5_long(f"{salt}-b:{i}") % MERSENNE31 or 1
        c = py_md5_long(f"{salt}-c:{i}") % MERSENNE31
        out.append((a, b, c))
    return out


def hyperplane_coeffs(
    dim: int, n_planes: int, salt: str = ""
) -> list[list[float]]:
    """Deterministic ±1 random-hyperplane coefficients.

    ``coeffs[p][i]`` is the sign for plane ``p``, dimension ``i`` —
    derived from md5 so any engine (or the SQL oracle) can reproduce
    the same planes from the same salt.
    """
    return [
        [
            1.0 if py_md5_long(f"{salt}plane{p}:dim{i}") % 2 == 0 else -1.0
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def md5_long(col: Column | str, salt: str = "") -> Column:
    """First 15 hex chars of md5 as a non-negative BIGINT (< 2^60).

    Oracle-SQL twin: ``CAST('0x' || substring(md5(salt || x),1,15) AS
    BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(salt), c) if salt else c
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def hash_bucket(col: Column | str, n_buckets: int, salt: str = "") -> Column:
    """Stable bucket id in [0, n_buckets) from the md5 integer."""
    return md5_long(col, salt) % n_buckets
