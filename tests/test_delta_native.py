"""Native Delta write/read — sources/delta_native.py."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from datawarehouseproject_spark.sources.delta_native import (
    read_delta,
    write_delta,
)


def _tbl(tmp_path):
    return str(tmp_path / "tbl")


def test_roundtrip_and_overwrite(spark, tmp_path):
    root = _tbl(tmp_path)
    d0 = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    assert write_delta(d0, root, now_ms=1) == 0
    d1 = spark.range(100, 150).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    assert write_delta(d1, root, now_ms=2) == 1
    got = read_delta(spark, root)
    assert got.count() == 150
    assert got.agg(F.sum("v")).first()[0] == sum(i * 3 for i in range(150))
    d2 = spark.range(10).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("v"))
    assert write_delta(d2, root, mode="overwrite", now_ms=3) == 2
    assert read_delta(spark, root).count() == 10
    # time travel reads earlier versions unchanged
    assert read_delta(spark, root, 1).count() == 150
    assert read_delta(spark, root, 0).count() == 100
    with pytest.raises(ValueError, match="does not exist"):
        read_delta(spark, root, 9)


def test_pushdown_reaches_scan(spark, tmp_path):
    root = _tbl(tmp_path)
    write_delta(
        spark.range(1000).select(F.col("id").alias("k")), root, now_ms=1
    )
    plan = read_delta(spark, root).filter("k = 7")._jdf \
        .queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,7)]" in plan


def test_log_is_valid_delta_json(spark, tmp_path):
    """The committed log parses as the protocol expects: one action
    per line, protocol/metaData at v0, footer-derived numRecords."""
    root = _tbl(tmp_path)
    write_delta(
        spark.range(57).select(F.col("id").alias("k")), root, now_ms=5
    )
    lines = open(
        os.path.join(root, "_delta_log", f"{0:020d}.json")
    ).read().splitlines()
    acts = [json.loads(ln) for ln in lines if ln.strip()]
    kinds = [next(iter(a)) for a in acts]
    assert kinds[:3] == ["commitInfo", "protocol", "metaData"]
    adds = [a["add"] for a in acts if "add" in a]
    assert adds and sum(
        json.loads(a["stats"])["numRecords"] for a in adds
    ) == 57
    for a in adds:
        assert os.path.exists(os.path.join(root, a["path"]))
        st = json.loads(a["stats"])
        assert st["minValues"]["k"] >= 0
        assert st["maxValues"]["k"] <= 56


def test_checkpoint_from_other_engine_is_loud(spark, tmp_path):
    root = _tbl(tmp_path)
    write_delta(
        spark.range(5).select(F.col("id").alias("k")), root, now_ms=1
    )
    open(os.path.join(root, "_delta_log", "_last_checkpoint"),
         "w").write("{}")
    with pytest.raises(ValueError, match="checkpoint"):
        read_delta(spark, root)


def test_version_gap_rejects(spark, tmp_path):
    root = _tbl(tmp_path)
    write_delta(
        spark.range(5).select(F.col("id").alias("k")), root, now_ms=1
    )
    write_delta(
        spark.range(5).select(F.col("id").alias("k")), root, now_ms=2
    )
    os.remove(os.path.join(root, "_delta_log", f"{0:020d}.json"))
    with pytest.raises(ValueError, match="version gaps"):
        read_delta(spark, root)
