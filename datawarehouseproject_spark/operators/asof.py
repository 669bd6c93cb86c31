"""As-of (time-travel) join — a time-series operator Spark lacks.

``asof_join(left, right, ...)`` attaches to every left row the
latest right-side row with the same key and ``right_ts <= left_ts``
(LEFT semantics: no match -> NULLs).

Implementation is the scale-correct union trick, NOT a pair join:
tag both sides, union, and carry the right-side values forward with
``last(..., ignorenulls=True)`` over a (key, time) window. One
shuffle of each side on the key, zero pair blowup — a per-user
clicks×errors pair join would be quadratic in active users' history,
this is linear. Ties (equal timestamps) resolve right-before-left,
matching ``ON l.ts >= r.ts`` inclusive semantics (and DuckDB's
native ASOF JOIN, used as the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "",
) -> DataFrame:
    """Left as-of join; right_cols are carried onto left rows.

    Column layout: all left columns, plus ``right_cols`` (suffixed if
    requested) holding the as-of values.
    """
    out_right = [c + suffix for c in right_cols]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in on and c != left_ts],
        *[F.lit(None).alias(f"__r_{c}") for c in right_cols],
    ).withColumn("__lts", F.col("__ts"))
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on and c != left_ts
        ],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    ).withColumn("__lts", F.lit(None).cast(left.schema[left_ts].dataType))

    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *on,
        "__side",
        F.col("__lts"),
        *[c for c in left.columns if c not in on and c != left_ts],
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(oc)
            for c, oc in zip(right_cols, out_right)
        ],
    )
    return filled.filter(F.col("__side") == 1).select(
        *on,
        F.col("__lts").alias(left_ts),
        *[c for c in left.columns if c not in on and c != left_ts],
        *out_right,
    )
