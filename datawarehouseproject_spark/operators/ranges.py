"""Range (interval) join — scale-correct bucketized implementation.

``range_join(left, right, ...)`` matches left rows (a point
timestamp) into right rows (an interval) on a shared key. A naive
non-equi join plans as BroadcastNestedLoop (quadratic, broadcast-
bound); instead we discretize time into coarse buckets: the interval
side explodes into every bucket it spans, the point side maps to its
single bucket, and the join becomes an equi-join on (key, bucket)
with a residual between-filter. Each true match surfaces exactly
once (the point's bucket is always within the interval's bucket
span). Bucket size trades explode amplification vs join selectivity
— pick ~the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Inner (or left) join of point rows into interval rows.

    Output: all left columns + all right columns (minus join keys).
    """
    b = F.lit(bucket_seconds)
    lb = left.withColumn("__b", F.floor(F.unix_timestamp(F.col(ts_col)) / b))
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b),
                F.floor(F.unix_timestamp(F.col(end_col)) / b),
            )
        ),
    )
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    out = lb.join(rb, on=[*on, "__b"], how="inner").filter(cond).drop("__b")
    if how == "left":
        matched = out.select(*[F.col(c) for c in left.columns])
        unmatched = left.join(matched, on=left.columns, how="left_anti")
        for c in right.columns:
            if c not in on and c not in (start_col, end_col):
                unmatched = unmatched.withColumn(c, F.lit(None))
        out = out.unionByName(unmatched, allowMissingColumns=True)
    return out
