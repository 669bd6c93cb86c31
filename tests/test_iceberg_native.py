"""Native Iceberg write/read — sources/iceberg_native.py."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from datawarehouseproject_spark.sources.iceberg_native import (
    read_iceberg,
    write_iceberg,
)


def _tbl(tmp_path):
    return str(tmp_path / "tbl")


def test_roundtrip_append_overwrite_time_travel(spark, tmp_path):
    root = _tbl(tmp_path)
    d0 = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    s0 = write_iceberg(d0, root, now_ms=1)
    d1 = spark.range(100, 150).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    s1 = write_iceberg(d1, root, mode="append", now_ms=2)
    assert read_iceberg(spark, root).count() == 150
    d2 = spark.range(10).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("v"))
    s2 = write_iceberg(d2, root, mode="overwrite", now_ms=3)
    assert read_iceberg(spark, root).count() == 10
    assert read_iceberg(spark, root, s1).count() == 150
    assert read_iceberg(spark, root, s0).count() == 100
    assert len({s0, s1, s2}) == 3
    with pytest.raises(ValueError, match="does not exist"):
        read_iceberg(spark, root, 424242)


def test_metadata_layout_is_spec_shaped(spark, tmp_path):
    root = _tbl(tmp_path)
    write_iceberg(
        spark.range(30).select(F.col("id").alias("k")), root, now_ms=5
    )
    hint = open(os.path.join(root, "metadata",
                             "version-hint.text")).read()
    assert hint == "1"
    meta = json.loads(open(os.path.join(
        root, "metadata", "v1.metadata.json")).read())
    assert meta["format-version"] == 2
    assert meta["refs"]["main"]["snapshot-id"] \
        == meta["current-snapshot-id"]
    # spark.range yields a non-nullable id -> required carries over
    assert meta["schemas"][0]["fields"][0] == {
        "id": 1, "name": "k", "required": True, "type": "long",
    }
    snap = meta["snapshots"][0]
    assert os.path.exists(os.path.join(root, snap["manifest-list"]))


def test_schema_drift_and_unsupported_types_are_loud(spark, tmp_path):
    root = _tbl(tmp_path)
    write_iceberg(
        spark.range(5).select(F.col("id").alias("k")), root, now_ms=1
    )
    with pytest.raises(ValueError, match="schema drift"):
        write_iceberg(
            spark.range(5).select(F.col("id").alias("other")),
            root, mode="append", now_ms=2,
        )
    with pytest.raises(ValueError, match="unsupported"):
        write_iceberg(
            spark.range(5).select(
                F.array(F.col("id")).alias("a")),
            str(tmp_path / "tbl2"), now_ms=1,
        )


def test_manifest_length_drift_rejects(spark, tmp_path):
    root = _tbl(tmp_path)
    write_iceberg(
        spark.range(5).select(F.col("id").alias("k")), root, now_ms=1
    )
    # corrupt the manifest on disk: the declared length must catch it
    mdir = os.path.join(root, "metadata")
    m = next(n for n in os.listdir(mdir) if n.startswith("m-"))
    with open(os.path.join(mdir, m), "ab") as fh:
        fh.write(b"x")
    with pytest.raises(ValueError, match="manifest_length"):
        read_iceberg(spark, root)
