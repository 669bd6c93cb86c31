"""Incremental landing -> staging ingestion (Trigger.AvailableNow).

Replaces the reference's once-per-day batch trigger + "already done
today" guards (check_status.py:19-36, crawl.py:58-66) with Spark's
native incremental contract: the file-stream source tracks processed
files in the checkpoint, so re-runs are no-ops and each file is
ingested exactly once — the same idempotency, without a control-table
dance.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..sources.landing import LANDING_SCHEMA


def landing_to_staging_stream(
    spark: SparkSession,
    landing_dir: str,
    staging_path: str,
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    schema: T.StructType = LANDING_SCHEMA,
):
    """Ingest all unseen landing CSVs, then stop (AvailableNow).

    ``transform`` (e.g. the cleaning projection) runs inside
    ``foreachBatch`` so the sink write stays an ordinary batch
    Parquet append with exactly-once commit semantics.

    Returns the finished StreamingQuery (already awaited).
    """
    stream = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 64)
        .csv(landing_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df) if transform else batch_df
        out.write.mode("append").parquet(staging_path)

    query = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
