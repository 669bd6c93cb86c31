"""merge_into: the four MERGE outcomes and schema handling."""

from __future__ import annotations

import pytest

from datawarehouseproject_spark.operators.merge import merge_into


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )


def test_merge_four_outcomes(spark):
    src = spark.createDataFrame(
        [
            (2, "b2", 99.0, False),   # matched update
            (3, "c", 30.0, True),     # matched delete
            (4, "d", 40.0, False),    # not matched -> insert
        ],
        "k long, name string, bal double, is_del boolean",
    )
    out = {
        r["k"]: (r["name"], r["bal"])
        for r in merge_into(
            _target(spark), src, on=["k"],
            update_cols=["name", "bal"], delete_col="is_del",
        ).collect()
    }
    assert out == {
        1: ("a", 10.0),    # target-only kept
        2: ("b2", 99.0),   # updated
        4: ("d", 40.0),    # inserted
    }


def test_merge_without_delete_col(spark):
    src = spark.createDataFrame([(1, 11.0)], "k long, bal double")
    out = {
        r["k"]: (r["name"], r["bal"])
        for r in merge_into(
            _target(spark), src, on=["k"], update_cols=["bal"]
        ).collect()
    }
    # name is NOT an update column: the matched row keeps its name
    assert out[1] == ("a", 11.0)
    assert out[2] == ("b", 20.0) and out[3] == ("c", 30.0)


def test_merge_insert_missing_cols_null(spark):
    """A source without some target columns inserts NULL there."""
    src = spark.createDataFrame([(9, 90.0)], "k long, bal double")
    row = {
        r["k"]: r
        for r in merge_into(
            _target(spark), src, on=["k"], update_cols=["bal"]
        ).collect()
    }[9]
    assert row["bal"] == 90.0 and row["name"] is None


def test_merge_missing_source_column_raises(spark):
    src = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="lacks columns"):
        merge_into(_target(spark), src, on=["k"], update_cols=["bal"])


def test_merge_result_schema_is_target_schema(spark):
    src = spark.createDataFrame(
        [(1, "z", 1.0, False)], "k long, name string, bal double, is_del boolean"
    )
    out = merge_into(
        _target(spark), src, on=["k"],
        update_cols=["name", "bal"], delete_col="is_del",
    )
    assert out.columns == ["k", "name", "bal"]
