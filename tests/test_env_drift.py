"""Environment-drift smoke test (round-3 postmortem, VERDICT.md §Next #3).

Round 3 lost 11/50 driver rows to a single loader bug: the driver
regenerated ``/root/testdata`` with ``events.ts`` as TIMESTAMP(MICROS)
and ``catalog.load_table`` unconditionally applied the old
nanos-as-long shim. ``pytest`` stayed green because every test built
its own fixtures — nothing exercised the loader against the REAL
testdata.

These tests close that gap: they load every real table through
``load_table`` and *construct* (analyze, not execute) every registry
query's DataFrame at sf0.001. Plan construction alone raises
``AnalysisException`` on loader/schema drift, so this suite fails the
moment a testdata regeneration breaks an entry point — before the
driver's gate ever runs.
"""

from __future__ import annotations

import os

import pytest

from datawarehouseproject_spark.catalog import TESTDATA_TABLES, load_table
from datawarehouseproject_spark.plans import registry

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)


@needs_testdata
@pytest.mark.parametrize("name", TESTDATA_TABLES)
def test_load_table_real_testdata(spark, name):
    """Every table loads through load_table and has rows + columns."""
    if not os.path.exists(f"{SF_DIR}/{name}.parquet"):
        pytest.skip(f"{name} not generated at {SF_DIR}")
    df = load_table(spark, SF_DIR, name)
    assert df.columns, f"{name}: no columns"
    assert df.limit(1).count() == 1, f"{name}: empty table"


@needs_testdata
def test_events_ts_normalized(spark):
    """events.ts must arrive as a plain microsecond timestamp whatever
    physical type the generator wrote (bigint nanos or timestamp_ntz)."""
    df = load_table(spark, SF_DIR, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


@needs_testdata
@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_registry_query_constructs(spark, name):
    """Building each registry query's plan against real testdata must
    not raise. ``df.schema`` forces full analysis (column resolution,
    type checks) without executing — exactly the failure mode that took
    down round 3 would surface here as an AnalysisException."""
    fn = registry.queries()[name]
    df = fn(spark, SF_DIR)
    assert df.schema.fields, f"{name}: empty schema"


def test_schema_drift_raises_named_column(spark, tmp_path):
    """A regenerated table with a retyped column must fail with ONE
    clear error naming the drifted column — not an opaque failure in
    every downstream query (the round-3 postmortem contract)."""
    import pytest as _pytest

    drifted = str(tmp_path)
    # orders with o_totalprice as STRING instead of double
    spark.createDataFrame(
        [(1, 1, "O", "9.99", "2024-01-01 00:00:00", "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice string, o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate", "o_orderpriority",
    ).write.parquet(f"{drifted}/orders.parquet")
    with _pytest.raises(ValueError, match="orders.o_totalprice.*string"):
        load_table(spark, drifted, "orders")


def test_schema_drift_missing_column(spark, tmp_path):
    drifted = str(tmp_path)
    spark.createDataFrame([(1,)], "r_regionkey int").write.parquet(
        f"{drifted}/region.parquet"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing expected column 'r_name'"):
        load_table(spark, drifted, "region")
