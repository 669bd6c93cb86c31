"""SparkSession factory with scale-appropriate defaults.

The reference delegates all execution to a single MySQL server
(SURVEY.md §4); here every knob that matters on a real cluster is set
explicitly so the same code runs on local[32] for tests and on a
1000-executor cluster unchanged:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting).
- Dynamic partition overwrite (the upsert replacement — SURVEY §2.1 S8).
- Arrow enabled for the (rare) Pandas-UDF paths.
- Session timezone pinned to UTC so date/timestamp derivations are
  deterministic across environments.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "datawarehouseproject_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master``/``shuffle_partitions`` default from env
    (``SPARK_GRAFT_CPUS``) so tests and bench share one entry point.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce partitions of cached plans too (SCD2 and
        # dim maintenance cache small scratch frames; without this the
        # cache pins every exchange at the static partition count)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply engine runtime confs to an externally-created session.

    The correctness driver hands us *its* SparkSession; these are
    runtime-settable confs that make results deterministic (UTC) and
    plans scale-appropriate (AQE, dynamic partition overwrite).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        spark.conf.set(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
        )
    except Exception:
        pass  # static conf on some builds; best-effort
    return spark
