"""stream_interval_join: real streaming execution + batch parity."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datawarehouseproject_spark.streaming.joins import stream_interval_join

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
    ]
)


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts string, event_id long"
    ).withColumn("ts", F.to_timestamp("ts"))


ERRORS = [
    (1, "2024-01-01 10:10:00", 100),  # has a click 5 min before
    (1, "2024-01-01 12:00:00", 101),  # nearest click 115 min before: out
    (2, "2024-01-01 10:10:00", 102),  # other user's click: no match
]
CLICKS = [
    (1, "2024-01-01 10:05:00", 900),
    (3, "2024-01-01 10:05:00", 901),
]


def test_interval_join_batch_semantics(spark):
    out = stream_interval_join(
        _rows(spark, ERRORS),
        _rows(spark, CLICKS),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        lookback="10 minutes",
    ).collect()
    assert [(r["event_id"], r["r_event_id"]) for r in out] == [(100, 900)]


def test_interval_join_streaming_end_to_end(spark, tmp_path):
    """Both sides as real file streams; the joined output through a
    memory sink must equal the batch result."""
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    _rows(spark, ERRORS).write.parquet(ldir)
    _rows(spark, CLICKS).write.parquet(rdir)

    lstream = spark.readStream.schema(SCHEMA).parquet(ldir)
    rstream = spark.readStream.schema(SCHEMA).parquet(rdir)
    joined = stream_interval_join(
        lstream, rstream, on="user_id", left_ts="ts", right_ts="ts",
        lookback="10 minutes",
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("ij_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [
        (r["event_id"], r["r_event_id"])
        for r in spark.sql("select * from ij_out").collect()
    ]
    assert got == [(100, 900)]


DIM = [
    (1, "BUILDING"),
    (2, "MACHINERY"),
]


def test_stream_static_enrich_end_to_end(spark, tmp_path):
    """Events as a real file stream enriched against a static dim;
    memory-sink output must equal the batch left join (including the
    NULL for the dimless user)."""
    from datawarehouseproject_spark.streaming.joins import (
        stream_static_enrich,
    )

    sdir = str(tmp_path / "s")
    _rows(spark, ERRORS).write.parquet(sdir)
    dim = spark.createDataFrame(DIM, "user_id long, segment string")

    batch = stream_static_enrich(
        _rows(spark, ERRORS), dim, on="user_id", dim_cols=["segment"]
    )
    want = {(r.event_id, r.segment) for r in batch.collect()}
    assert want == {(100, "BUILDING"), (101, "BUILDING"), (102, "MACHINERY")}

    stream = spark.readStream.schema(SCHEMA).parquet(sdir)
    out = stream_static_enrich(
        stream, dim, on="user_id", dim_cols=["segment"]
    )
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_id, r.segment)
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    assert got == want


def test_left_outer_watermark_boundary(spark, tmp_path):
    """Outer-null emission is STRICTLY l_ts < global watermark
    (min over both streams of max event time - delay): a row one
    second before the watermark emits its null, a row exactly AT it
    is discarded with the state — the boundary the registry oracle
    (stream_left_outer_join) recomputes."""
    left = [
        (1, "2024-01-01 01:59:59", 200),   # < wm 02:00 -> null row
        (1, "2024-01-01 02:00:00", 201),   # == wm -> discarded
        (1, "2024-01-01 02:00:01", 202),   # > wm -> discarded
        (7, "2024-01-01 02:15:00", 205),   # sets left max ts
    ]
    right = [
        (9, "2024-01-01 02:15:00", 902),   # sets right max ts
    ]
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    _rows(spark, left).write.parquet(ldir)
    _rows(spark, right).write.parquet(rdir)
    ls = spark.readStream.schema(SCHEMA).parquet(ldir)
    rs = spark.readStream.schema(SCHEMA).parquet(rdir)
    joined = stream_interval_join(
        ls, rs, on="user_id", left_ts="ts", right_ts="ts",
        lookback="10 minutes", watermark="15 minutes",
        how="left_outer",
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName("loj_boundary")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    got = sorted(
        (r["event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM loj_boundary").collect()
    )
    assert got == [(200, None)]


def test_left_outer_matched_and_unmatched(spark, tmp_path):
    """Matched pairs emit like the inner join; unmatched rows past
    the watermark emit exactly one null row each."""
    left = [
        (1, "2024-01-01 00:00:00", 100),   # unmatched (click after)
        (1, "2024-01-01 00:10:00", 101),   # matched by 900
        (2, "2024-01-01 00:20:00", 102),   # unmatched
        (7, "2024-01-01 02:15:00", 105),   # inside horizon: dropped
    ]
    right = [
        (1, "2024-01-01 00:08:00", 900),
        (9, "2024-01-01 02:15:00", 902),
    ]
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    _rows(spark, left).write.parquet(ldir)
    _rows(spark, right).write.parquet(rdir)
    ls = spark.readStream.schema(SCHEMA).parquet(ldir)
    rs = spark.readStream.schema(SCHEMA).parquet(rdir)
    joined = stream_interval_join(
        ls, rs, on="user_id", left_ts="ts", right_ts="ts",
        lookback="10 minutes", watermark="15 minutes",
        how="left_outer",
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName("loj_mixed")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    got = sorted(
        (r["event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM loj_mixed").collect()
    )
    assert got == [(100, None), (101, 900), (102, None)]


def test_interval_join_rejects_unknown_how(spark):
    import pytest

    with pytest.raises(ValueError, match="unsupported"):
        stream_interval_join(
            _rows(spark, ERRORS), _rows(spark, CLICKS),
            on="user_id", left_ts="ts", right_ts="ts",
            how="full_outer",
        )
