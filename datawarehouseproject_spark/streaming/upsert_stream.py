"""Streaming upsert sink and exactly-once event dedup.

Two pieces the reference's daily-batch world gets from MySQL
(``INSERT ... ON DUPLICATE KEY UPDATE``, primary-key uniqueness —
load_staging.py upsert loops; SURVEY §2.1 S8/U2) re-expressed on a
streaming source:

- :func:`stream_upsert_partitions` — each micro-batch recomputes the
  partitions it touches and dynamic-partition-overwrites ONLY those
  through ``foreachBatch``. Late re-deliveries of a partition's data
  converge to last-write-wins per partition, closed partitions stay
  byte-untouched, and the checkpoint makes replays idempotent: the
  streaming twin of the batch upsert (``sources/parquet.py``).
- :func:`stream_dedup_events` — ``dropDuplicatesWithinWatermark``:
  at-least-once sources (Kafka redeliveries, file re-drops) are
  reduced to exactly-once rows while keeping BOUNDED state — keys
  older than the watermark are evicted, so state holds only the
  de-dup horizon, not all history (at 100 TB/day an unbounded
  ``dropDuplicates`` would OOM the state store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..sources.parquet import upsert_partitions


def stream_upsert_partitions(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    table_path: str,
    partition_cols: list[str],
    checkpoint_dir: str,
):
    """Ingest all unseen source files (AvailableNow) and upsert each
    micro-batch into ``table_path`` by partition.

    The sink is a plain batch dynamic-partition-overwrite inside
    ``foreachBatch`` — exactly-once per micro-batch via the
    checkpoint, partition-granular via the overwrite mode.
    Returns the finished StreamingQuery.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        upsert_partitions(batch_df, table_path, partition_cols)

    query = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def stream_hll_maintenance(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    sketch_path: str,
    checkpoint_dir: str,
    col: str,
    p: int = 8,
):
    """Streaming sketch maintenance: fold each micro-batch's HLL into
    a PERSISTED register table via ``foreachBatch``.

    The composition that makes sketches pay off operationally: the
    distinct-count state is a ≤2^p-row parquet table, each batch
    costs one partial sketch + a register-wise max-merge (never a
    rescan of history), and the checkpoint makes replays idempotent
    because max-merge is idempotent — re-folding the same batch
    changes nothing. Query the live estimate any time with
    ``hll_estimate(spark.read.parquet(sketch_path))``.
    """
    import os

    from ..operators.sketches import hll_sketch
    from ..sources.parquet import overwrite_atomic

    stream = spark.readStream.schema(schema).parquet(source_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_sketch = hll_sketch(batch_df, col, p=p)
        if os.path.exists(sketch_path):
            merged = (
                spark.read.parquet(sketch_path)
                .unionByName(batch_sketch)
                .groupBy("bucket")
                .agg({"mrank": "max"})
                .withColumnRenamed("max(mrank)", "mrank")
            )
        else:
            merged = batch_sketch
        overwrite_atomic(merged, sketch_path)

    query = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def stream_dedup_events(
    events: DataFrame,
    id_col: str = "event_id",
    ts_col: str = "ts",
    horizon: str = "1 hour",
) -> DataFrame:
    """Exactly-once rows from an at-least-once stream, bounded state.

    ``withWatermark(ts, horizon)`` + ``dropDuplicatesWithinWatermark``
    keeps a key in state only until the watermark passes it: a
    duplicate arriving within ``horizon`` of the original is dropped,
    and the state store never grows beyond the horizon's key count.
    On a batch frame this degrades to plain ``dropDuplicates`` (the
    oracle-checkable semantics; the eviction behavior is
    streaming-only and covered by test).
    """
    if not events.isStreaming:
        return events.dropDuplicates([id_col])
    return events.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        [id_col]
    )


def stream_merge_delta(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    table_path: str,
    key_col: str,
    checkpoint_dir: str,
    now_ms_base: int = 0,
):
    """Streaming UPSERT into a NATIVE Delta table (round 14): each
    micro-batch MERGEs into the table through the engine's own
    copy-on-write merge (``sources/delta_native.merge_delta``) —
    the most common production landing pattern (CDC topic -> Delta
    table) wired end-to-end through this engine's writer instead of
    a foreign library.

    Exactly-once composition: the checkpoint makes each batch
    delivered once per query lifetime, and a crash BETWEEN the sink
    and the offset commit replays a batch whose MERGE is
    content-idempotent (same keys -> same rewrite), so the table
    converges.  Batches must carry unique keys — the merge's
    duplicate-key fence stays loud; dedupe upstream with
    ``stream_dedup_events`` when the source is at-least-once.
    ``now_ms_base + batch_id`` stamps each commit deterministically.
    Returns the finished StreamingQuery."""
    from ..sources.delta_native import merge_delta, write_delta

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        import os

        if not os.path.isdir(os.path.join(table_path, "_delta_log")):
            write_delta(batch_df, table_path,
                        now_ms=now_ms_base + batch_id)
        else:
            merge_delta(table_path, batch_df, key_col,
                        now_ms=now_ms_base + batch_id)

    query = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
