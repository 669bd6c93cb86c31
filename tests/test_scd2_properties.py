"""Property-based SCD2 invariants (SURVEY.md §5 strategy 3).

Hypothesis drives randomized batch sequences through scd2_apply and
asserts the structural invariants that must survive ANY run order:

1. at most one current row per track key after each run (given
   track-key-unique staging batches, as the reference's clean stage
   produces);
2. expired rows are immutable — once closed, a version never changes;
3. re-running the same batch is a no-op;
4. history only grows, by exactly the inserted count.

Examples are kept small (Spark job per example); the point is the
invariant, not the volume.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datawarehouseproject_spark.functions.cleaning import SCD_OPEN
from datawarehouseproject_spark.operators.scd2 import scd2_apply

import pytest

SCHEMA = "TEN string, LINK string, GIA_CU decimal(18,2), RAM int"

# a batch: up to 4 products (key k0..k3), each with a price level
batch_strategy = st.dictionaries(
    keys=st.integers(min_value=0, max_value=3),
    values=st.integers(min_value=1, max_value=3),
    min_size=1,
    max_size=4,
)


def _staging(spark, batch: dict[int, int]):
    rows = [
        (f"p{k}", f"L{k % 2}", Decimal(v * 100), v) for k, v in sorted(batch.items())
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(batch_strategy, min_size=1, max_size=3))
def test_scd2_invariants(sp, batches):
    open_ts = F.to_timestamp(F.lit(SCD_OPEN))
    history = None
    prev_count = 0
    for day, batch in enumerate(batches, start=1):
        st_df = _staging(sp, batch)
        res = scd2_apply(
            st_df,
            history,
            compare_cols=("GIA_CU", "RAM"),
            now=f"2024-01-{day:02d} 00:00:00",
        )
        metrics = res.metrics()
        history = res.history.localCheckpoint()

        # 1. at most one current row per track key
        cur_counts = (
            history.filter(F.col("EXPIRED_AT") == open_ts)
            .groupBy("TEN", "LINK")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert cur_counts == 0

        # 4. history grows by exactly the inserted count
        new_count = history.count()
        assert new_count == prev_count + metrics["rows_inserted"]
        prev_count = new_count

    # 2+3. re-running the last batch: expired rows unchanged, no-op
    last = _staging(sp, batches[-1])
    closed_before = sorted(
        map(tuple, history.filter(F.col("EXPIRED_AT") != open_ts).collect())
    )
    res2 = scd2_apply(
        last, history, compare_cols=("GIA_CU", "RAM"), now="2024-02-01 00:00:00"
    )
    m2 = res2.metrics()
    assert m2["rows_updated"] == 0 and m2["rows_inserted"] == 0
    closed_after = sorted(
        map(tuple, res2.history.filter(F.col("EXPIRED_AT") != open_ts).collect())
    )
    assert closed_before == closed_after
