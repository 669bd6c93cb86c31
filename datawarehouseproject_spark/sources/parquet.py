"""Parquet layer sinks: atomic overwrite and partition upsert.

Parquet is immutable — the reference's in-place UPDATE/upsert
(db_staging.sql:4971; load_aggregate.py:103) becomes either a
dynamic partition overwrite (partitioned tables) or a rewrite with a
temp-path swap (the SCD2 history). The swap keeps a reader-consistent
table at all times and makes re-runs idempotent; on a production
filesystem/catalog this is the standard staging-dir + atomic-rename
(or metastore pointer-swap) commit.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def overwrite_atomic(df: DataFrame, path: str) -> None:
    """Rewrite ``path`` with the contents of ``df`` via temp + swap.

    Needed when ``df``'s lineage READS from ``path`` (the SCD2
    read-modify-write): Spark cannot overwrite a path it is reading
    within one job, so we materialize to ``<path>.__tmp_*`` first and
    swap directories afterwards.
    """
    tmp = f"{path}.__tmp_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    old = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def upsert_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Replace only the partitions present in ``df`` (S8 upsert).

    Relies on ``spark.sql.sources.partitionOverwriteMode=dynamic``
    (set in :func:`..session.get_spark`)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
