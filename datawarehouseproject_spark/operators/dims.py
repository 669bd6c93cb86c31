"""Set-based dimension maintenance.

Replaces the reference's row-at-a-time ``get_or_create_sk`` loop
(``load_dwh.py:18-44`` called per staging row at ``:141-227`` — two
MySQL round-trips per row) with three joins:

1. last-write-wins per natural key over the incoming batch (the loop
   processes rows in ID_SR order and blindly overwrites, so the final
   dim row reflects the *latest* processed row — SURVEY.md §2.9
   quirk 11);
2. existing-key join to reuse surrogate keys;
3. left-anti + ``row_number() + max(sk)`` to mint new surrogate keys
   deterministically.

Scale design: the dim is small relative to the fact feed; the
existing dim is broadcast. The only shuffle is the window over the
incoming batch's natural key. Surrogate minting needs the current max
SK — computed with an agg + cross-broadcast of one row, never a
``collect()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .topk import top1_per_group


def latest_per_key(
    df: DataFrame, natural_key: list[str], order_col: str
) -> DataFrame:
    """Last-write-wins: keep the row with max ``order_col`` per key."""
    return top1_per_group(df, natural_key, [F.col(order_col).desc()])


def upsert_dim(
    dim: DataFrame | None,
    updates: DataFrame,
    natural_key: list[str],
    sk_col: str,
    order_col: str | None = None,
    null_safe: bool = True,
) -> DataFrame:
    """Merge ``updates`` into ``dim``; returns the new dim.

    - Existing natural keys keep their surrogate key but take ALL
      attribute values from the update row (the reference's UPDATE
      overwrites every column, ``load_dwh.py:187-207``).
    - New natural keys are appended with ``sk = max(sk) + rank`` in
      deterministic ``order_col`` order (AUTO_INCREMENT parity).
    - Rows of ``dim`` with no update are carried over unchanged.
    - ``null_safe``: the reference builds ``IS NULL`` predicates for
      NULL lookup values (``load_dwh.py:22-31``) — matched here with
      null-safe join equality (P6).
    """
    if order_col is None:
        order_col = natural_key[0]
    latest = latest_per_key(updates, natural_key, order_col)

    if dim is None or not dim.columns:
        # bootstrap path: same range-partitioned rank as the minting
        # path below — one window implementation, no partition-less
        # WindowExec even on a huge first load
        from .ids import dense_ids

        return (
            dense_ids(latest, order_col, id_col="__rank")
            .withColumn(sk_col, F.col("__rank").cast("int"))
            .select(sk_col, *[c for c in latest.columns])
        )

    def key_cond(left: DataFrame, right: DataFrame) -> Column:
        conds = None
        for k in natural_key:
            c = left[k].eqNullSafe(right[k]) if null_safe else (left[k] == right[k])
            conds = c if conds is None else conds & c
        return conds

    dim_keys = F.broadcast(dim.select(sk_col, *natural_key))

    matched = latest.join(dim_keys, key_cond(latest, dim_keys), "inner").select(
        dim_keys[sk_col].alias(sk_col), *[latest[c] for c in latest.columns]
    )

    new_rows = latest.join(dim_keys, key_cond(latest, dim_keys), "left_anti")
    max_sk = dim.agg(F.coalesce(F.max(sk_col), F.lit(0)).alias("__max_sk"))
    # dense sequential SKs without a global single-task window — the
    # two-stage range-partition rank (operators/ids.py) parallelizes
    # arbitrarily large key backfills
    from .ids import dense_ids

    minted = (
        dense_ids(new_rows, order_col, id_col="__rank")
        .crossJoin(F.broadcast(max_sk))
        .withColumn(sk_col, (F.col("__max_sk") + F.col("__rank")).cast("int"))
        .select(sk_col, *[c for c in latest.columns])
    )

    untouched = dim.join(
        latest.select(*natural_key).distinct(),
        key_cond(dim, latest.select(*natural_key).distinct()),
        "left_anti",
    ).select(sk_col, *[c for c in latest.columns])

    return untouched.unionByName(matched).unionByName(minted)
