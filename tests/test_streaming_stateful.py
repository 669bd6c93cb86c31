"""Stateful streaming sessionization: the applyInPandasWithState
operator running under a real StreamingQuery."""

from __future__ import annotations

import datetime

from datawarehouseproject_spark.streaming.windows import sessionize


def test_sessionize_streaming_emits_closed_sessions(spark, tmp_path):
    src = str(tmp_path / "events")
    ts = datetime.datetime(2024, 1, 1, 0, 0)

    def t(minutes):
        return ts + datetime.timedelta(minutes=minutes)

    # user 1: burst at :00-:10, then :59 (gap > 30 min closes session 1)
    spark.createDataFrame(
        [(1, t(0)), (1, t(10)), (1, t(59)), (2, t(5))],
        "user_id long, ts timestamp",
    ).write.parquet(src)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    out = sessionize(stream, gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r["user_id"], r["n_events"]) for r in
            spark.sql("SELECT * FROM sessions").collect()}
    # only sessions CLOSED inside the batch are emitted; user 1's
    # first burst closed when the :59 event arrived. user 2's single
    # session and user 1's :59 session stay open in state.
    assert rows == {(1, 2)}
