"""Metadata-only Delta -> Iceberg conversion — sources/uniform.py."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datawarehouseproject_spark.sources.delta_native import (
    dv_delete_delta,
    merge_delta,
    optimize_delta,
    read_delta,
    write_delta,
)
from datawarehouseproject_spark.sources.iceberg_native import (
    read_iceberg,
)
from datawarehouseproject_spark.sources.uniform import (
    convert_delta_to_iceberg,
)


def _tbl(tmp_path):
    return str(tmp_path / "tbl")


def _mk(spark, root, n=300, files=3):
    base = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    write_delta(
        base.repartitionByRange(files, "k").sortWithinPartitions("k"),
        root, now_ms=1_000,
    )


def _rows(df):
    return sorted(
        ((r["k"], r["v"]) for r in df.collect()), key=lambda t: t[0])


def test_both_readers_serve_identical_rows(spark, tmp_path):
    root = _tbl(tmp_path)
    _mk(spark, root)
    r = convert_delta_to_iceberg(root, now_ms=1_500)
    assert r["files_added"] == 3 and not r["noop"]
    assert _rows(read_delta(spark, root)) \
        == _rows(read_iceberg(spark, root))
    # ZERO data copy: the table holds exactly the delta parquet set
    parquets = [
        f for f in os.listdir(root) if f.endswith(".parquet")
    ]
    assert len(parquets) == 3


def test_incremental_sync_diffs_files(spark, tmp_path):
    root = _tbl(tmp_path)
    _mk(spark, root)
    r1 = convert_delta_to_iceberg(root, now_ms=1_500)
    upd = spark.range(50, 60).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v"))
    merge_delta(root, upd, "k", now_ms=2_000)
    r2 = convert_delta_to_iceberg(root, now_ms=2_500)
    # merge touched ONE file: the other two carry over untouched
    assert r2["files_carried"] == 2
    assert r2["files_dropped"] == 1
    assert _rows(read_delta(spark, root)) \
        == _rows(read_iceberg(spark, root))
    # iceberg time travel reaches the pre-merge sync
    assert read_iceberg(
        spark, root, snapshot_id=r1["snapshot_id"]).count() == 300
    # already synced -> no-op
    assert convert_delta_to_iceberg(root, now_ms=3_000)["noop"]


def test_carried_entries_keep_original_snapshot(spark, tmp_path):
    from datawarehouseproject_spark.sources.iceberg_native import (
        _current_meta,
        _snapshot_entries_mor,
    )

    root = _tbl(tmp_path)
    _mk(spark, root)
    r1 = convert_delta_to_iceberg(root, now_ms=1_500)
    upd = spark.range(50, 60).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v"))
    merge_delta(root, upd, "k", now_ms=2_000)
    convert_delta_to_iceberg(root, now_ms=2_500)
    _v, meta = _current_meta(root)
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"])
    data, deletes = _snapshot_entries_mor(root, cur)
    assert not deletes
    carried = [
        e for e in data if e["snapshot_id"] == r1["snapshot_id"]]
    assert len(carried) == 2


def test_dv_table_is_a_loud_boundary(spark, tmp_path):
    root = _tbl(tmp_path)
    _mk(spark, root)
    dv_delete_delta(root, "k", 0, 9, now_ms=2_000)
    with pytest.raises(ValueError, match="deletion vectors"):
        convert_delta_to_iceberg(root, now_ms=2_500)
    # the sanctioned path: purge, then convert
    optimize_delta(root, target_rows=10_000, now_ms=3_000)
    convert_delta_to_iceberg(root, now_ms=3_500)
    assert _rows(read_delta(spark, root)) \
        == _rows(read_iceberg(spark, root))
    assert read_iceberg(spark, root).count() == 290


def test_partitioned_conversion_prunes_at_manifests(spark, tmp_path):
    root = _tbl(tmp_path)
    base = spark.range(200).select(
        (F.col("id") % 2).cast("string").alias("p"),
        F.col("id").alias("k"))
    write_delta(base.repartition(2, "p"), root, now_ms=1_000,
                partition_by=["p"])
    convert_delta_to_iceberg(root, now_ms=1_500)
    pr = read_iceberg(spark, root, where={"p": "1"})
    assert sorted(r["k"] for r in pr.collect()) == [
        k for k in range(200) if k % 2 == 1]
    assert all("p=1" in f for f in pr.inputFiles())


def test_foreign_metadata_is_never_overwritten(spark, tmp_path):
    from datawarehouseproject_spark.sources.iceberg_native import (
        write_iceberg,
    )

    root = _tbl(tmp_path)
    _mk(spark, root)
    # a REAL iceberg table written into the same directory
    write_iceberg(
        spark.range(5).select(
            F.col("id").alias("k"), F.col("id").alias("v")),
        root, now_ms=1_200,
    )
    with pytest.raises(ValueError, match="foreign metadata"):
        convert_delta_to_iceberg(root, now_ms=1_500)


def test_reverse_sync_iceberg_to_delta(spark, tmp_path):
    from datawarehouseproject_spark.sources.iceberg_native import (
        merge_iceberg,
        mor_delete_iceberg,
        purge_deletes_iceberg,
        write_iceberg,
    )
    from datawarehouseproject_spark.sources.uniform import (
        convert_iceberg_to_delta,
    )

    root = _tbl(tmp_path)
    b = spark.range(300).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 3).cast("long").alias("v"))
    write_iceberg(b.repartitionByRange(3, "k"), root, now_ms=1_000)
    r = convert_iceberg_to_delta(root, now_ms=1_500)
    assert r["files_added"] == 3 and not r["noop"]
    assert _rows(read_delta(spark, root)) \
        == _rows(read_iceberg(spark, root))
    u = spark.range(5).select(
        F.col("id").cast("long").alias("k"),
        F.lit(-1).cast("long").alias("v"))
    merge_iceberg(root, u, "k", now_ms=2_000)
    r2 = convert_iceberg_to_delta(root, now_ms=2_500)
    assert r2["files_removed"] == 1
    assert _rows(read_delta(spark, root)) \
        == _rows(read_iceberg(spark, root))
    # delta time travel reaches the first sync
    assert read_delta(spark, root, version=0).count() == 300
    assert convert_iceberg_to_delta(root, now_ms=3_000)["noop"]
    # live MOR deletes fence the conversion; purge unblocks
    mor_delete_iceberg(root, "k", 0, 9, now_ms=4_000)
    with pytest.raises(ValueError, match="position-delete"):
        convert_iceberg_to_delta(root, now_ms=4_500)
    purge_deletes_iceberg(root, now_ms=5_000)
    convert_iceberg_to_delta(root, now_ms=5_500)
    assert _rows(read_delta(spark, root)) \
        == _rows(read_iceberg(spark, root))


def test_reverse_sync_partitioned_prunes(spark, tmp_path):
    from datawarehouseproject_spark.sources.iceberg_native import (
        write_iceberg,
    )
    from datawarehouseproject_spark.sources.uniform import (
        convert_iceberg_to_delta,
    )

    root = _tbl(tmp_path)
    bp = spark.range(200).select(
        (F.col("id") % 2).cast("long").alias("p"),
        F.col("id").cast("long").alias("k"))
    write_iceberg(bp, root, now_ms=1_000, partition_by=["p"])
    convert_iceberg_to_delta(root, now_ms=1_500)
    pr = read_delta(spark, root, where={"p": "1"})
    assert sorted(r["k"] for r in pr.collect()) \
        == [k for k in range(200) if k % 2 == 1]
    assert all("p=1" in f for f in pr.inputFiles())


def test_reverse_sync_foreign_delta_log_is_loud(spark, tmp_path):
    from datawarehouseproject_spark.sources.iceberg_native import (
        write_iceberg,
    )
    from datawarehouseproject_spark.sources.uniform import (
        convert_iceberg_to_delta,
    )

    root = _tbl(tmp_path)
    b = spark.range(10).select(
        F.col("id").cast("long").alias("k"),
        F.col("id").cast("long").alias("v"))
    write_delta(b, root, now_ms=1_000)       # a REAL delta table
    write_iceberg(b, root, now_ms=1_100)     # plus iceberg metadata
    with pytest.raises(ValueError, match="foreign"):
        convert_iceberg_to_delta(root, now_ms=1_500)
