"""Streaming upsert sink + watermarked dedup behavior."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datawarehouseproject_spark.streaming.upsert_stream import (
    stream_dedup_events,
    stream_upsert_partitions,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("day", T.IntegerType()),
    ]
)


def test_stream_upsert_converges_to_last_write(spark, tmp_path):
    """Drop 1: days 1+2. Drop 2 (after the first run): day 2 revised.
    The second run must replace ONLY day 2; day 1 files stay
    byte-untouched."""
    import glob
    import os

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, "d1-a", 1), (2, "d1-b", 1), (3, "d2-old", 2)], SCHEMA
    ).write.parquet(src)
    stream_upsert_partitions(spark, src, SCHEMA, table, ["day"], ckpt)

    day1_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{table}/day=1/*.parquet")
    }
    assert day1_files

    spark.createDataFrame(
        [(3, "d2-new", 2), (4, "d2-extra", 2)], SCHEMA
    ).write.mode("append").parquet(src)
    stream_upsert_partitions(spark, src, SCHEMA, table, ["day"], ckpt)

    out = {
        (r["k"], r["day"]): r["v"]
        for r in spark.read.parquet(table).collect()
    }
    assert out == {
        (1, 1): "d1-a",
        (2, 1): "d1-b",
        (3, 2): "d2-new",
        (4, 2): "d2-extra",
    }
    # closed partition byte-untouched (same files, same mtimes)
    assert {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{table}/day=1/*.parquet")
    } == day1_files


def test_stream_upsert_rerun_is_noop(spark, tmp_path):
    """AvailableNow + checkpoint: a re-run with no new files must not
    rewrite anything."""
    import glob
    import os

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(1, "a", 1)], SCHEMA).write.parquet(src)
    stream_upsert_partitions(spark, src, SCHEMA, table, ["day"], ckpt)
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{table}/**/*.parquet", recursive=True)
    }
    stream_upsert_partitions(spark, src, SCHEMA, table, ["day"], ckpt)
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{table}/**/*.parquet", recursive=True)
    }
    assert before == after


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate event_ids delivered in a later file are dropped;
    distinct ids all survive. Runs as a real stream into a memory
    sink."""
    src = str(tmp_path / "src")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rows1 = [(1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-01 10:00:30", 2.0)]
    rows2 = [(1, "2024-01-01 10:00:00", 1.0), (3, "2024-01-01 10:01:00", 3.0)]
    base = spark.createDataFrame(
        rows1 + rows2, "event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    base.write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    deduped = stream_dedup_events(stream, horizon="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_id"]: r["value"]
        for r in spark.sql("select * from dedup_out").collect()
    }
    assert got == {1: 1.0, 2: 2.0, 3: 3.0}


def test_stream_dedup_batch_degrades_to_drop_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:00:00"),
         (2, "2024-01-01 11:00:00")],
        "event_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = stream_dedup_events(df)
    assert out.count() == 2
