"""Streaming-native operators: watermarked windows & sessionization.

Beyond the reference (it has no streaming runtime, SURVEY.md §2.8)
but first-class for an events feed at scale. Both operators run
identically over a batch DataFrame (tests/oracles) and a streaming
one (watermark applies only in streaming mode).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling/sliding window counts + value sum per event_type.

    With a streaming source the watermark bounds state and admits
    late data up to 2h; on a batch frame the same plan is an ordinary
    window aggregation.
    """
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    return events.groupBy(win.alias("win"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
            "total_value"
        ),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "event_type",
        "n_events",
        "total_value",
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.DoubleType()),
        T.StructField("last", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize(
    events: DataFrame, gap_seconds: int = 1800, ts_col: str = "ts"
) -> DataFrame:
    """Gap-based sessionization via ``applyInPandasWithState``.

    The custom-stateful-operator extension point
    (SURVEY.md §7 step 8): per-user state carries the open session;
    an event beyond the gap closes it. Streaming-only (state +
    timeouts); the batch twin for tests is a window/lag plan in
    :func:`sessionize_batch`.
    """

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="s")],
                    "session_end": [pd.Timestamp(last, unit="s")],
                    "n_events": [n],
                }
            )
            return
        rows = pd.concat(list(pdf_iter)).sort_values("ts")
        out = []
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        for t in rows["ts"]:
            sec = t.timestamp()
            if start is None:
                start, last, n = sec, sec, 1
            elif sec - last > gap_seconds:
                out.append((user_id, start, last, n))
                start, last, n = sec, sec, 1
            else:
                last, n = sec, n + 1
        state.update((float(start), float(last), int(n)))
        state.setTimeoutDuration(gap_seconds * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [pd.Timestamp(o[1], unit="s") for o in out],
                    "session_end": [pd.Timestamp(o[2], unit="s") for o in out],
                    "n_events": [o[3] for o in out],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessionize_batch(
    events: DataFrame, gap_seconds: int = 1800, ts_col: str = "ts"
) -> DataFrame:
    """Batch twin of :func:`sessionize`: lag/cumsum session ids.

    Pure built-ins (two windows over user_id), used to oracle-check
    the stateful streaming operator on the same input.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(ts_col)
    flagged = events.withColumn(
        "__new_sess",
        (
            F.coalesce(
                F.col(ts_col).cast("long")
                - F.lag(F.col(ts_col).cast("long")).over(w),
                F.lit(gap_seconds + 1),
            )
            > gap_seconds
        ).cast("long"),
    ).withColumn("__sess_id", F.sum("__new_sess").over(w))
    return flagged.groupBy("user_id", "__sess_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    ).drop("__sess_id")
