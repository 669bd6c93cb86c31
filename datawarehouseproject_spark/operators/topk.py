"""Per-group top-k / argmax operators.

The reference's lone "argmax per group" is the latest-run-date lookup
executed once per CSV row — a classic N+1 loop
(``load_staging.py:89-102``, SURVEY.md §2.5 W1). Here it is the
set-based form: one window, one shuffle on the group key, then a
broadcastable lookup DataFrame. Also used by dim maintenance for the
last-write-wins semantics (SURVEY §2.9 quirk 11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group by ``order_by`` (deterministic: include a
    tiebreaker column in ``order_by``)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def top1_per_group(
    df: DataFrame, group_cols: list[str], order_by: list[Column]
) -> DataFrame:
    """Argmax per group (W1: latest crawl-log row per ID_CONFIG)."""
    return topk_per_group(df, group_cols, order_by, 1)
