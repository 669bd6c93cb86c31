"""Empirical pins for the two streaming boundary semantics the
round-13 oracle queries (`stream_windowed_counts`,
`stream_session_windows`) encode.  These are SEMANTIC pins against
Spark itself: if a Spark upgrade flips either boundary, these fail
before the oracle gate does, pointing at the exact predicate."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T


def _run_stream(spark, tmp_path, rows, agg_builder):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    schema = T.StructType([
        T.StructField("user_id", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
    ])
    stream = agg_builder(spark.readStream.schema(schema).parquet(src))
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).collect()


def test_window_at_watermark_boundary_emits(spark, tmp_path):
    """Eviction predicate is ``window.end <= watermark``: a session
    whose end EQUALS the final watermark is emitted."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(1, t0), (2, t0 + dt.timedelta(seconds=900))]
    got = _run_stream(
        spark, tmp_path, rows,
        lambda s: s.withWatermark("ts", "10 minutes")
                   .groupBy(F.session_window("ts", "5 minutes"),
                            "user_id").count(),
    )
    # wm = t0+900s-600s = t0+300s == user 1's session end -> emitted
    assert [(r["user_id"], r["count"]) for r in got] == [(1, 1)]


def test_session_merges_at_exact_gap(spark, tmp_path):
    """Merge predicate is ``gap <= 5 minutes``: an event at EXACTLY
    gap distance extends the session instead of starting a new one."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(seconds=300)),
        (2, t0 + dt.timedelta(seconds=5000)),
    ]
    got = _run_stream(
        spark, tmp_path, rows,
        lambda s: s.withWatermark("ts", "10 minutes")
                   .groupBy(F.session_window("ts", "5 minutes"),
                            "user_id").count(),
    )
    ones = [r for r in got if r["user_id"] == 1]
    assert len(ones) == 1 and ones[0]["count"] == 2
    assert str(ones[0]["session_window"]["end"]) == "2024-01-01 00:10:00"
