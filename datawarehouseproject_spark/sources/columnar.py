"""ORC source/sink — the second columnar format next to Parquet.

The reference's storage layer is MySQL InnoDB tables; this engine's
native layer is Parquet, and ORC is the interchange format a consumer
warehouse (Hive/Trino ecosystems) most often asks for. Spark's ORC
reader supports the same scan-level optimizations as Parquet —
predicate pushdown, column pruning, vectorized decode — so a table
exported here stays efficiently queryable without a rewrite
(`spark.sql.orc.impl=native`, the default since Spark 2.4).

Scale notes: writes inherit the DataFrame's partitioning (one file
per task — repartition first to control file count); pushdown is
verified by plan-shape test (``tests/test_plans.py``), not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> str:
    """Write ``df`` as ORC (zlib, the ORC default codec)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
    return path


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
