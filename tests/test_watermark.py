"""Watermark semantics under a real streaming query: late events
beyond the watermark are dropped across restarts (checkpointed
watermark), on-time events aggregate normally."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from datawarehouseproject_spark.streaming.windows import windowed_event_counts


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).coalesce(1).write.mode("append").parquet(path)


def _run(spark, src, sink, ckpt):
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).parquet(src)
    out = windowed_event_counts(stream, "1 hour", watermark="1 hour")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_late_events_dropped_after_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def ts(h, m=0):
        return datetime.datetime(2024, 1, 1, h, m)

    # run 1: events at 06:30 and 10:15 -> watermark advances to 09:15;
    # append mode finalizes every window older than the watermark.
    _write(spark, src, [(1, ts(6, 30), "click", 1.0), (2, ts(10, 15), "click", 1.0)])
    _run(spark, src, sink, ckpt)

    # run 2 (same checkpoint): one LATE event for the already-closed
    # 06:00 window and one on-time event.
    _write(spark, src, [(3, ts(6, 45), "click", 1.0), (4, ts(11, 0), "click", 1.0)])
    _run(spark, src, sink, ckpt)
    # run 3: push the watermark far ahead so all open windows close.
    _write(spark, src, [(5, ts(23, 0), "click", 1.0)])
    _run(spark, src, sink, ckpt)

    got = {
        r["window_start"].hour: r["n_events"]
        for r in spark.read.parquet(sink).collect()
    }
    # the 06:00 window finalized with ONE event — the late 06:45
    # arrival was dropped by the checkpointed watermark
    assert got[6] == 1
    assert got[10] == 1 and got[11] == 1
