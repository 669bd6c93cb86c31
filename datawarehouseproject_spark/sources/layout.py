"""Write-side file layout for scan locality.

Parquet/ORC readers prune with two levers: partition directories
(coarse) and per-file/row-group min-max statistics (fine). The second
lever only bites if values are CLUSTERED — a column scattered
uniformly across files has every file's [min, max] spanning the whole
domain, and zone maps prune nothing.

:func:`layout_for_scans` clusters before the write:
``repartitionByRange`` puts disjoint key ranges in disjoint files
(range-partitioned shuffle with a sampled boundary pass), and
``sortWithinPartitions`` orders rows inside each file so row-group
stats tighten further. After writing, a predicate on the layout key
touches O(matching files), not O(all files) — the poor man's
clustered index, no table format required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def layout_for_scans(
    df: DataFrame,
    range_cols: list[str | Column],
    sort_cols: list[str | Column] | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` for min-max pruning on ``range_cols``.

    Returns a frame ready for ``.write`` — one output file per range
    partition (pass ``n_partitions`` to control file count/size).
    ``sort_cols`` defaults to ``range_cols`` (tight row-group stats);
    pass a superset for secondary sort locality.
    """
    parts = (
        df.repartitionByRange(n_partitions, *range_cols)
        if n_partitions
        else df.repartitionByRange(*range_cols)
    )
    return parts.sortWithinPartitions(*(sort_cols or range_cols))
