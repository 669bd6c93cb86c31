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


def zorder_key(
    x: Column | str, y: Column | str, bits: int = 16
) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` of two
    non-negative integer columns — ``x`` in even positions, ``y`` in
    odd.

    Feed this to :func:`layout_for_scans` as the range column to
    cluster files on TWO dimensions at once: a range of the Z-key is
    a tile in (x, y) space, so min-max pruning bites for predicates
    on EITHER column — single-column range layout can only serve one.
    Pure shifts/masks (codegen, no UDF), and the identical expression
    is writable in any SQL dialect, so oracle checks are exact.
    """
    from pyspark.sql import functions as F

    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(cx.cast("long"), i).bitwiseAND(1), 2 * i)
            + F.shiftleft(
                F.shiftright(cy.cast("long"), i).bitwiseAND(1), 2 * i + 1
            )
        )
    return out


def sql_zorder_key(x: str, y: str, bits: int = 16) -> str:
    """SQL twin of :func:`zorder_key` (same shifts, same masks)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
