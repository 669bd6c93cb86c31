"""Deterministic sampling & splitting for training corpora.

RNG-based sampling (``df.sample``) is irreproducible across engines
and cluster layouts; training pipelines need splits that are stable
under re-runs, backfills, and engine migrations. Both operators key
off the md5 of a stable id — the same row lands in the same
split/sample everywhere, forever (and the SQL oracle reproduces it
bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

#: granularity of sampling rates (1/10000)
RATE_DENOM = 10_000


def split_column(
    id_col: Column | str,
    weights: dict[str, float],
    salt: str = "split:",
) -> Column:
    """Assign a deterministic split label by hash bucket.

    ``weights`` maps label -> fraction (must sum to ~1); assignment
    is by cumulative ranges over ``md5(id) % RATE_DENOM`` — adding a
    new split at the end never reshuffles existing members.
    """
    bucket = md5_long(
        F.col(id_col).cast("string") if isinstance(id_col, str) else id_col.cast("string"),
        salt=salt,
    ) % RATE_DENOM
    expr = None
    acc = 0
    items = list(weights.items())
    for label, w in items[:-1]:
        acc += int(w * RATE_DENOM)
        cond = bucket < acc
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last_label = items[-1][0]
    return (expr.otherwise(last_label) if expr is not None else F.lit(last_label))


def deterministic_split(
    df: DataFrame, id_col: str, weights: dict[str, float], salt: str = "split:"
) -> DataFrame:
    """Attach a ``split`` column (train/val/test style)."""
    return df.withColumn("split", split_column(id_col, weights, salt))


def weighted_sample(
    df: DataFrame,
    id_col: str,
    rates: dict[str, float],
    group_col: str,
    default_rate: float = 0.0,
    salt: str = "sample:",
) -> DataFrame:
    """Per-group deterministic sampling (corpus mixture shaping).

    ``rates`` maps group value -> keep fraction; rows keep iff
    ``md5(id) % RATE_DENOM < rate*RATE_DENOM`` for their group — the
    standard reproducible way to up/down-weight sources in a
    training mixture.
    """
    bucket = md5_long(F.col(id_col).cast("string"), salt=salt) % RATE_DENOM
    rate = None
    for value, r in sorted(rates.items()):
        cond = F.col(group_col) == value
        thr = F.lit(int(r * RATE_DENOM))
        rate = F.when(cond, thr) if rate is None else rate.when(cond, thr)
    rate = rate.otherwise(F.lit(int(default_rate * RATE_DENOM)))
    return df.filter(bucket < rate)


def training_shuffle(
    df: DataFrame, id_col: str, n_shards: int, salt: str = "shuffle:"
) -> DataFrame:
    """Deterministic global pseudo-random permutation for training
    order: every row gets a ``(shard, position)`` address.

    A training job must read documents in an order uncorrelated with
    ingestion order, yet reproducible across re-runs and engines.
    ``ORDER BY rand()`` is neither; a single global
    ``row_number() OVER (ORDER BY hash)`` would pull the whole corpus
    through one task. Instead: ``shard = md5(id) % n_shards`` (the
    md5 also serves as the permutation key), ``position`` =
    row_number within the shard ordered by (md5, id). Each window
    partition is one shard (~corpus/n_shards rows), so the sort
    parallelizes; readers stream shard files sequentially and the
    concatenation order shard 0..n-1 × position is the permutation.
    """
    key = md5_long(F.col(id_col).cast("string"), salt=salt)
    w = Window.partitionBy("shard").orderBy("__key", id_col)
    return (
        df.withColumn("__key", key)
        .withColumn("shard", (F.col("__key") % n_shards).cast("int"))
        .withColumn("position", (F.row_number().over(w) - 1).cast("long"))
        .drop("__key")
    )
