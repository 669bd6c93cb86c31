"""The reference's own utility sql_commands, executed by the engine
with parameter binding (SURVEY §3.2 lifecycle)."""

from __future__ import annotations

import pytest

from datawarehouseproject_spark.plans.commands import CommandRegistry


@pytest.fixture()
def control_views(spark):
    spark.createDataFrame(
        [(1, "transform"), (2, "load_dwh")], ["ID", "TEN_PROCESS"]
    ).createOrReplaceTempView("PROCESS")
    spark.createDataFrame(
        [(10, 1, "Running"), (11, 1, "WAITING"), (12, 2, "SUCCESS")],
        ["ID", "ID_PROCESS", "STATUS"],
    ).createOrReplaceTempView("PROCESS_LOG")


def test_reference_utility_commands(spark, control_views):
    reg = CommandRegistry(spark)
    assert reg.run("COUNT_RUNNING_PROCESS_LOG").collect()[0][
        "running_count"
    ] == 1
    assert reg.run("SELECT_PROCESS_ID", "load_dwh").collect()[0]["ID"] == 2
    waiting = reg.run("SELECT_PROCESS_LOG_WAITING", 1).collect()
    assert [r["ID"] for r in waiting] == [11]


def test_parameter_binding_escapes(spark, control_views):
    reg = CommandRegistry(spark)
    # quote injection neutralized by escaping
    assert reg.run("SELECT_PROCESS_ID", "x' OR '1'='1").count() == 0
    with pytest.raises(ValueError):
        reg.sql_for("SELECT_PROCESS_ID")  # missing param
