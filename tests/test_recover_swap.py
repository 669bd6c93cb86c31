"""recover_swap: crash-window recovery for the atomic-rename sink."""

from __future__ import annotations

import os

from datawarehouseproject_spark.sources.parquet import (
    overwrite_atomic,
    recover_swap,
)


def _write(spark, path, vals):
    spark.createDataFrame([(v,) for v in vals], "x int").write.mode(
        "overwrite"
    ).parquet(path)


def test_recover_drops_orphan_tmp(spark, tmp_path):
    """A crash BEFORE the first rename leaves only a _tmp scratch dir;
    recovery removes it and the live table is untouched."""
    path = str(tmp_path / "t")
    _write(spark, path, [1, 2])
    orphan = str(tmp_path / "_t.__tmp_deadbeef")
    os.makedirs(orphan)
    msg = recover_swap(path)
    assert msg and "dropped" in msg
    assert not os.path.exists(orphan)
    assert {r["x"] for r in spark.read.parquet(path).collect()} == {1, 2}


def test_recover_restores_backup_when_table_missing(spark, tmp_path):
    """A crash INSIDE the two-rename window (old moved away, new not
    yet moved in) leaves no live table but an _old backup; recovery
    restores the backup."""
    path = str(tmp_path / "t")
    _write(spark, path, [7])
    backup = str(tmp_path / "_t.__old_deadbeef")
    os.rename(path, backup)
    msg = recover_swap(path)
    assert msg and "restored" in msg
    assert {r["x"] for r in spark.read.parquet(path).collect()} == {7}
    assert not os.path.exists(backup)


def test_recover_noop_on_healthy_table(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path, [1])
    assert recover_swap(path) is None


def test_overwrite_atomic_then_recover_roundtrip(spark, tmp_path):
    """Normal operation leaves nothing for recovery to do."""
    path = str(tmp_path / "t")
    _write(spark, path, [1])
    overwrite_atomic(
        spark.createDataFrame([(9,)], "x int"), path
    )
    assert recover_swap(path) is None
    assert [r["x"] for r in spark.read.parquet(path).collect()] == [9]
