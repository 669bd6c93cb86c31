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


def compact(
    spark: SparkSession,
    path: str,
    target_files: int | None = None,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a table into ~target-size files.

    Append-heavy tables (the run ledger, streaming sinks) accumulate
    one file per micro-batch; scan cost then scales with file count,
    not data size. Compaction reads, coalesces to
    ``max(bytes/target_bytes, 1)`` files (or an explicit count), and
    swaps atomically. Returns the new file count.
    """
    import glob

    df = spark.read.parquet(path)
    if target_files is None:
        n_bytes = sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        target_files = max(n_bytes // target_bytes, 1)
    overwrite_atomic(df.coalesce(int(target_files)), path)
    return len(glob.glob(os.path.join(path, "*.parquet")))


def upsert_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Replace only the partitions present in ``df`` (S8 upsert).

    Relies on ``spark.sql.sources.partitionOverwriteMode=dynamic``
    (set in :func:`..session.get_spark`)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
