"""check_expectations / assert_expectations semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouseproject_spark.operators.quality_gate import (
    assert_expectations,
    check_expectations,
)


def test_null_rule_result_counts_as_violation(spark):
    """x > 5 over a NULL x is SQL-unknown; the gate must count it as
    a violation, not let it slip through."""
    df = spark.createDataFrame([(10,), (None,), (3,)], "x int")
    out = {
        r["rule"]: (r["n_violations"], r["pass"])
        for r in check_expectations(df, {"big": F.col("x") > 5}).collect()
    }
    assert out["big"] == (2, False)  # NULL + 3


def test_one_pass_multiple_rules(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], "x int, s string")
    rules = {
        "x_pos": F.col("x") > 0,
        "s_set": F.col("s").isNotNull(),
    }
    out = {r["rule"]: r for r in check_expectations(df, rules).collect()}
    assert out["x_pos"]["pass"] and out["x_pos"]["n_rows"] == 2
    assert not out["s_set"]["pass"] and out["s_set"]["n_violations"] == 1


def test_empty_input_passes_vacuously(spark):
    """sum() over an empty frame is NULL; the gate must report
    n_violations=0 / pass=true for every rule on a no-new-data day
    instead of a NULL-filled failure (ADVICE r4)."""
    df = spark.createDataFrame([], "x int, s string")
    rules = {"x_pos": F.col("x") > 0, "s_set": F.col("s").isNotNull()}
    out = {r["rule"]: r for r in check_expectations(df, rules).collect()}
    for name in rules:
        assert out[name]["n_rows"] == 0
        assert out[name]["n_violations"] == 0
        assert out[name]["pass"] is True
    assert_expectations(df, rules)  # must not raise


def test_assert_expectations_raises_with_rule_names(spark):
    df = spark.createDataFrame([(0,)], "x int")
    with pytest.raises(AssertionError, match="x_pos"):
        assert_expectations(df, {"x_pos": F.col("x") > 0})
    # and passes silently when clean
    assert_expectations(df, {"x_zero": F.col("x") == 0})
