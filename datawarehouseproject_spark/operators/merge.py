"""Set-based MERGE INTO (CDC upsert with deletes).

The reference's closest tool is ``INSERT ... ON DUPLICATE KEY
UPDATE`` (load_staging.py upsert loops; SURVEY §2.1 S8) — update-or-
insert, no delete, one row at a time. This operator is the full ANSI
MERGE contract as one distributed plan:

- matched + delete flag        → row removed
- matched, no flag             → update columns take the source value
- source-only (not matched)    → row inserted
- target-only                  → row kept byte-identical

The source is a CDC-style frame: key columns, replacement values for
the update columns, and an optional boolean delete marker — the shape
Debezium/Fivetran-class feeds compact to.

Scale mechanics: ONE full-outer shuffle join on the merge key; no
window, no driver loop. For a partitioned target, merge per affected
partition — semi-join the target to the source's partition keys
first, then write the result with
:func:`..sources.parquet.upsert_partitions` so untouched partitions
stay byte-identical (the SCD2/pipeline pattern,
``plans/pipeline.py``).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    update_cols: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Merge ``source`` into ``target`` by the ``on`` key columns.

    ``update_cols``: target columns replaced by the source's value on
    a match (and populating inserts). Source must carry every ``on`` +
    ``update_cols`` column (plus ``delete_col`` if given) and be
    key-unique — compact multi-event CDC feeds to last-per-key first
    (e.g. ``latest_event_per_user``'s argmax pattern). Target columns
    absent from the source are NULL on inserted rows.

    Returns the merged frame with the target's schema.
    """
    missing = [c for c in [*on, *update_cols] if c not in source.columns]
    if missing:
        raise ValueError(f"merge source lacks columns: {missing}")

    s = source.select(
        *[F.col(c).alias(f"__s_{c}") for c in source.columns]
    )
    # merge keys must be non-null (side presence after the full outer
    # is detected by key nullity — the standard MERGE precondition)
    cond = reduce(
        lambda a, b: a & b,
        [target[k] == F.col(f"__s_{k}") for k in on],
    )
    j = target.join(s, cond, "full_outer")
    matched = target[on[0]].isNotNull() & F.col(f"__s_{on[0]}").isNotNull()
    insert = target[on[0]].isNull()

    if delete_col is not None:
        j = j.filter(
            ~(matched & F.coalesce(F.col(f"__s_{delete_col}"), F.lit(False)))
        )

    out = []
    for c in target.columns:
        if c in on:
            out.append(F.coalesce(target[c], F.col(f"__s_{c}")).alias(c))
        elif c in update_cols:
            out.append(
                F.when(matched | insert, F.col(f"__s_{c}"))
                .otherwise(target[c])
                .alias(c)
            )
        elif f"__s_{c}" in j.columns:
            # not an update column, but the source can still seed it
            # on inserted rows
            out.append(
                F.when(insert, F.col(f"__s_{c}")).otherwise(target[c]).alias(c)
            )
        else:
            out.append(F.when(insert, F.lit(None)).otherwise(target[c]).alias(c))
    return j.select(*out)
