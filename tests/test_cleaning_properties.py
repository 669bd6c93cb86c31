"""Property tests: the cleaning battery never crashes and always
lands in its contract range, for ANY input string."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datawarehouseproject_spark.functions.cleaning import (
    clean_gb,
    clean_price,
    clean_screen_size,
)

import pytest

# include the junk the reference actually sees: VN currency, NBSP,
# GB/TB suffixes, separators, plus arbitrary unicode
dirty = st.one_of(
    st.none(),
    st.text(max_size=30),
    st.text(alphabet="0123456789.,₫đ GBTB- ", max_size=20),
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=st.lists(dirty, min_size=1, max_size=30))
def test_cleaning_total_and_in_range(sp, values):
    df = sp.createDataFrame([(v,) for v in values], "c string")
    rows = df.select(
        clean_price("c").alias("price"),
        clean_screen_size("c").alias("screen"),
        clean_gb("c").alias("gb"),
    ).collect()
    for r in rows:
        # totality: the battery never raises (ANSI overflow) and never
        # yields NULL — every input lands on a concrete value. Note
        # negative inputs pass through (MySQL parity: only '-1' is the
        # missing sentinel).
        assert r["price"] is not None
        assert r["screen"] is not None and Decimal("-1.00") <= r["screen"] <= Decimal("99.99")
        assert r["gb"] is not None
