"""Scalable dense ID assignment.

``row_number()`` over a global (unpartitioned) window funnels every
row through ONE task — fine for a day's worth of new dim keys,
deadly for a large backfill. ``dense_ids`` produces the identical
1..N dense ranks with two stages that both parallelize:

1. range-repartition by the order column; rank locally per partition;
2. count rows per partition, prefix-sum the (tiny) counts on the
   driver-side plan, broadcast the offsets back.

The output rank depends only on the global ordering (ties broken by
the caller providing a unique order column), not on where the range
boundaries land, so results are deterministic across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_ids(
    df: DataFrame,
    order_col: str,
    id_col: str = "__id",
    offset: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach ``id_col`` = offset + dense rank of ``order_col``.

    ``order_col`` must be unique (it defines the total order).
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid").orderBy(F.col(order_col).asc())
    local = ranged.withColumn("__lrank", F.row_number().over(w_local))

    counts = local.groupBy("__pid").agg(F.count("*").alias("__n"))
    w_prefix = (
        Window.orderBy(F.col("__pid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__n").over(w_prefix), F.lit(0)).alias("__offset"),
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(id_col, (F.col("__offset") + F.col("__lrank") + offset).cast("long"))
        .drop("__pid", "__lrank", "__offset")
    )
