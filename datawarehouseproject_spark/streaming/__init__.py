"""Structured Streaming execution of the daily pipeline.

The reference's "streaming" is a once-per-day batch trigger with
idempotency guards (run_all.bat:20-68; SURVEY.md §2.8). The native
Spark shape is ``readStream`` over the landing directory with
``Trigger.AvailableNow`` + ``foreachBatch`` — same batch semantics,
incremental file discovery, exactly-once sink commits via
checkpointing. Plus genuinely streaming operators (windowed aggs
with watermarks, stateful sessionization) the reference lacks.
"""

from .landing_stream import landing_to_staging_stream  # noqa: F401
from .windows import windowed_event_counts, sessionize  # noqa: F401
from .upsert_stream import (  # noqa: F401
    stream_dedup_events,
    stream_upsert_partitions,
)
from .joins import stream_interval_join  # noqa: F401
