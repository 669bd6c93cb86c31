"""Compaction/fragmentation planners — operators/maintenance.py."""

from __future__ import annotations

import pytest

from datawarehouseproject_spark.operators.maintenance import (
    fragmentation_report,
    plan_compaction,
)


def test_sequential_packing_groups(spark):
    rows = [
        (1, "a", 10), (1, "b", 10), (1, "c", 30), (1, "d", 100),
        (2, "a", 5),
    ]
    inv = spark.createDataFrame(
        rows, "media_id int, file_path string, record_count long"
    )
    got = {
        (r["media_id"], r["file_path"]): r
        for r in plan_compaction(inv, target_rows=40).collect()
    }
    # table 1 running sums: a 10, b 20, c 50, d 150
    # group = floor((running - w)/40): a 0, b 0, c 0, d 1
    assert got[(1, "a")]["group_id"] == 0
    assert got[(1, "c")]["group_id"] == 0
    assert got[(1, "d")]["group_id"] == 1
    assert got[(1, "a")]["group_files"] == 3
    assert got[(1, "a")]["group_rows"] == 50
    assert got[(1, "a")]["needs_compaction"] is True
    # the oversized file sits alone and is NOT churn
    assert got[(1, "d")]["group_files"] == 1
    assert got[(1, "d")]["needs_compaction"] is False
    # a second table packs independently (window partitioned by table)
    assert got[(2, "a")]["group_id"] == 0
    assert got[(2, "a")]["needs_compaction"] is False


def test_fragmentation_report_counts(spark):
    inv = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 25), (1, "c", 100)],
        "media_id int, file_path string, record_count long",
    )
    row = fragmentation_report(inv, target_rows=40).collect()[0]
    assert row["n_files"] == 3
    assert row["total_rows"] == 135
    assert row["small_files"] == 1  # only 10 < 20
    assert row["files_after_optimize"] == 4  # ceil(135/40)


def test_target_rows_fence(spark):
    inv = spark.createDataFrame(
        [(1, "a", 10)],
        "media_id int, file_path string, record_count long",
    )
    with pytest.raises(ValueError, match="positive"):
        plan_compaction(inv, target_rows=0)
    with pytest.raises(ValueError, match="positive"):
        fragmentation_report(inv, target_rows=-1)


def test_zorder_key_bit_positions(spark):
    from datawarehouseproject_spark.operators.maintenance import (
        zorder_key,
    )

    df = spark.createDataFrame(
        [(0b11, 0b00), (0b10, 0b01), (0, 0), (255, 255)],
        "x long, y long",
    )
    got = [r["z"] for r in
           df.select(zorder_key(["x", "y"], 8).alias("z")).collect()]
    def ref(x, y):
        z = 0
        for j in range(8):
            z |= ((x >> j) & 1) << (2 * j)
            z |= ((y >> j) & 1) << (2 * j + 1)
        return z
    assert got == [ref(0b11, 0), ref(0b10, 1), 0, ref(255, 255)]
    assert got[3] == 65535  # full 16-bit key

    with pytest.raises(ValueError, match="1-4 columns"):
        zorder_key([], 8)
    with pytest.raises(ValueError, match="bits"):
        zorder_key(["x"], 0)


def test_zorder_buckets_bound_both_dims(spark):
    """The curve property: a 256-z-value bucket spans at most 16 in
    EACH dimension (a linear sort bucket would span the full 256 on
    the non-leading key)."""
    from datawarehouseproject_spark.operators.maintenance import (
        zorder_bucket_profile,
    )

    rows = [(x, y) for x in range(0, 256, 5) for y in range(0, 256, 7)]
    df = spark.createDataFrame(rows, "x long, y long")
    prof = zorder_bucket_profile(df, ["x", "y"], 8, 8).collect()
    for r in prof:
        assert r["max_x"] - r["min_x"] <= 15, r
        assert r["max_y"] - r["min_y"] <= 15, r
        assert r["span_product"] <= 256
