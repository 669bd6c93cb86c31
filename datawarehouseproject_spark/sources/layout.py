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


def zorder_key_n(cols: list, bits: int = 8) -> Column:
    """Morton (Z-order) key over 1-4 integer columns: bit j of
    column i lands at position ``j * n_cols + i`` (column 0 in the
    lowest lane).  Pure shifts/masks (codegen, no UDF); the
    identical expression is writable in any SQL dialect, so oracle
    checks are exact.  Only the LOW ``bits`` bits of each column are
    read (values are effectively taken modulo ``2^bits``) —
    quantize before calling; negative inputs are undefined."""
    from pyspark.sql import functions as F

    n = len(cols)
    if not 1 <= n <= 4:
        raise ValueError("zorder interleaves 1-4 columns")
    if not 1 <= bits <= 16:
        raise ValueError("zorder bits out of range")
    if bits * n > 62:
        # bit 63 is the long's sign bit and bucket span products
        # multiply up to 2^(bits*n): past 62 the key (or the profile
        # arithmetic) silently wraps negative
        raise ValueError("zorder key wider than a signed long")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        for j in range(bits):
            out = out + F.shiftleft(
                F.shiftright(col.cast("long"), j).bitwiseAND(1),
                j * n + i,
            )
    return out


def zorder_key(
    x: Column | str, y: Column | str, bits: int = 16
) -> Column:
    """Two-column Morton key — ``x`` in even positions, ``y`` in
    odd (the ``zorder_key_n([x, y], bits)`` special case kept for
    the original call sites).

    Feed this to :func:`layout_for_scans` as the range column to
    cluster files on TWO dimensions at once: a range of the Z-key is
    a tile in (x, y) space, so min-max pruning bites for predicates
    on EITHER column — single-column range layout can only serve one.
    """
    return zorder_key_n([x, y], bits)


def sql_zorder_key(x: str, y: str, bits: int = 16) -> str:
    """SQL twin of :func:`zorder_key` (same shifts, same masks)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
