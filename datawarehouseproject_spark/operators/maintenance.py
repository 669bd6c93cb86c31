"""Table-maintenance PLANNING as distributed DataFrame computation.

The lakehouse readers (``functions/iceberg_scan.py``,
``functions/delta_log.py``) surface file inventories as DataFrames;
the planners here turn an inventory into maintenance WORK — which
files to compact together, which partitions are fragmented — without
ever touching data bytes.  At 100 TB an OPTIMIZE planner must itself
be distributed: one window per table/partition (never a global
sort), so 10^6 tables plan in parallel and the driver only sees the
plan's aggregate shape.

Reference scope: the reference repo rebuilds MySQL tables wholesale
(SURVEY §2 S6 truncate-reload) and has no file-level maintenance;
this is beyond-reference surface, same family as the inspection
tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# one z-order implementation repo-wide: the general interleave lives
# with the layout helpers (sources/layout.py) next to its 2-column
# special case and SQL twin
from ..sources.layout import zorder_key_n as zorder_key  # noqa: F401


def plan_compaction(
    inventory: DataFrame,
    target_rows: int,
    table_col: str = "media_id",
    path_col: str = "file_path",
    weight_col: str = "record_count",
) -> DataFrame:
    """Sequential bin-packing of a file inventory into compaction
    groups of ~``target_rows`` each, per table.

    The classic first-fit-DECREASING packer is inherently sequential;
    the distributed equivalent every lakehouse OPTIMIZE implements is
    SEQUENTIAL packing over a deterministic order: running-sum the
    weights within each table (window partitioned BY TABLE — the
    parallelism unit), then ``group_id = floor((running - w) /
    target)``.  A file larger than the target gets its own group
    (the floor arithmetic does this naturally).  Adds
    ``group_id`` / ``group_files`` / ``group_rows`` and
    ``needs_compaction`` (multi-file groups only — a group that is
    already one right-sized file is a no-op the planner must not
    churn)."""
    if target_rows <= 0:
        raise ValueError("target_rows must be positive")
    w = Window.partitionBy(table_col).orderBy(path_col)
    running = F.sum(weight_col).over(w)
    with_groups = inventory.withColumn(
        "group_id",
        F.floor(
            (running - F.col(weight_col)) / F.lit(target_rows)
        ).cast("int"),
    )
    gw = Window.partitionBy(table_col, "group_id")
    return (
        with_groups
        .withColumn("group_files", F.count("*").over(gw).cast("int"))
        .withColumn("group_rows", F.sum(weight_col).over(gw))
        .withColumn("needs_compaction", F.col("group_files") > 1)
    )


def fragmentation_report(
    inventory: DataFrame,
    target_rows: int,
    table_col: str = "media_id",
    weight_col: str = "record_count",
) -> DataFrame:
    """Per-table fragmentation summary over a file inventory: file
    count, total rows, files smaller than half the target ("small
    files"), and the file count OPTIMIZE would leave behind
    (``ceil(total/target)``) — the before/after a maintenance
    scheduler ranks tables by.  One groupBy on the table key; no
    window, no sort."""
    if target_rows <= 0:
        raise ValueError("target_rows must be positive")
    return inventory.groupBy(table_col).agg(
        F.count("*").cast("int").alias("n_files"),
        F.sum(weight_col).alias("total_rows"),
        F.sum(
            (F.col(weight_col) < target_rows / 2).cast("int")
        ).cast("int").alias("small_files"),
        F.ceil(F.sum(weight_col) / F.lit(target_rows))
         .cast("int").alias("files_after_optimize"),
    )


def zorder_bucket_profile(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    bucket_shift: int = 8,
) -> DataFrame:
    """Assign each row a FIXED-WIDTH z-order bucket (``z >>
    bucket_shift`` — no global sort, no partition-less window; at
    100 TB this is one map + one groupBy) and profile each bucket's
    per-dimension min/max span.  The span product is the data-
    skipping bound a reader gets from file-level min/max stats after
    a ZORDER rewrite: small products on every dimension are the
    whole point of the curve."""
    z = zorder_key(cols, bits)
    bucketed = df.withColumn("z_value", z).withColumn(
        "z_bucket", F.shiftright(F.col("z_value"), bucket_shift)
    )
    aggs = [F.count("*").alias("n_rows")]
    span_product = F.lit(1)
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    out = bucketed.groupBy("z_bucket").agg(*aggs)
    for c in cols:
        span_product = span_product * (
            F.col(f"max_{c}") - F.col(f"min_{c}") + F.lit(1)
        )
    return out.withColumn("span_product", span_product)
