"""Stream-stream interval join with bounded state.

The remaining Structured Streaming primitive next to windowed aggs
(:mod:`.windows`) and watermark dedup (:mod:`.upsert_stream`): join
two live streams where a right-side event must fall inside a time
interval around the left-side event (clicks attributed to a later
error, impressions to conversions, …).

Why the interval + watermarks matter at scale: an unconstrained
stream-stream equi-join must buffer EVERY past row of both sides
forever. The watermark pair plus the time-range predicate lets Spark
prove when a buffered row can no longer match and evict it — state
size becomes O(rate × interval), independent of stream age.

The batch twin of this plan is the `session_range_join` registry
query (same join condition on static frames, DuckDB-oracled); this
module contributes the genuinely-streaming execution path, tested
end-to-end through file streams into a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join right-side events occurring in ``[left_ts - lookback,
    left_ts]`` for the same ``on`` key.

    Both inputs get a watermark (required for state eviction on a
    stream-stream join); on batch frames the same plan runs with
    the watermarks ignored, so unit tests and the batch oracle
    share this code path.

    ``how='left_outer'``: unmatched left rows emit with NULL right
    columns — but only once the GLOBAL watermark (min over both
    sides of max event time - delay) passes the point where the row
    provably cannot match anymore; rows still inside the watermark
    horizon when the stream ends are discarded with the state, NOT
    emitted.  That trailing-edge semantics is the documented
    Structured Streaming outer-join contract, and the registry
    oracle recomputes the cutoff explicitly.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"join type {how!r} unsupported")
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = (
        right.withWatermark(right_ts, watermark)
        if right.isStreaming
        else right
    )
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] <= lw[left_ts])
        & (
            rw[right_ts]
            >= lw[left_ts] - F.expr(f"INTERVAL {lookback}")
        )
    )
    return lw.join(rw, cond, how).select(
        lw["*"],
        *[
            rw[c].alias(f"r_{c}")
            for c in right.columns
            if c != on
        ],
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    dim_cols: list[str],
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the stream
    joins against a STATIC (batch) dimension — the star-schema
    lookup inside a live pipeline (events × customer, clicks ×
    catalog).

    Stream-static joins are stateless on the stream side (no
    watermark, no buffered state — Spark re-plans the static side
    per micro-batch, so a broadcast-sized dim is broadcast every
    batch and dim REFRESHES between batches are picked up), which is
    why this is the preferred enrichment shape over stream-stream
    whenever one side is slowly-changing. Left join keeps unmatched
    stream rows (late dim arrival shows as NULLs, not dropped
    facts).

    Works identically on batch frames (plain left join) — the parity
    the tests pin.
    """
    from pyspark.sql import functions as F

    keep = dim.select(on, *dim_cols)
    return stream.join(F.broadcast(keep), on, "left")
