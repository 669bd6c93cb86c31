"""Skew-aware join utilities.

AQE's skew-join splitting (enabled in :func:`..session.get_spark`)
handles most runtime skew; :func:`salted_join` is the explicit tool
for the pathological case AQE can't fix — a shuffle join where ONE
key holds a huge share of the fact side (the classic 'null key' /
'default config' hot spot of warehouse feeds, e.g. the reference's
``SK_DATE = 0`` sentinel rows concentrating on one date key).

Mechanics: the fact side gets a random-but-deterministic salt in
[0, n_salts); the (small-ish) build side is exploded n_salts× so
every (key, salt) bucket finds its match. The hot key's rows spread
over n_salts reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting to spread hot keys.

    ``dim`` is replicated ``n_salts``× (keep it the smaller side).
    The salt is derived from a hash of the fact row's whole tuple —
    deterministic, no RNG, so re-runs shuffle identically.
    """
    fact_cols = fact.columns
    dim_cols = [c for c in dim.columns if c not in on]

    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact_cols]), F.lit(n_salts))
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_fact.join(salted_dim, on=[*on, "__salt"], how=how)
    return out.select(*fact_cols, *dim_cols)
