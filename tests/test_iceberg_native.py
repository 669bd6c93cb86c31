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


def test_v2_required_field_set_is_emitted(spark, tmp_path):
    """ADVICE r13: data_file.partition (empty struct when
    unpartitioned), manifest_file.min_sequence_number + the
    existing/deleted file- and row-count fields, and the metadata
    JSON's required keys are all present in what the writer emits."""
    from datawarehouseproject_spark.functions.avro_scan import (
        decode_avro_blocks,
    )

    root = _tbl(tmp_path)
    write_iceberg(
        spark.range(30).select(F.col("id").alias("k")), root, now_ms=5
    )
    meta = json.loads(open(os.path.join(
        root, "metadata", "v1.metadata.json")).read())
    for key in ("location", "last-updated-ms", "last-column-id",
                "last-partition-id", "sort-orders",
                "default-sort-order-id", "properties",
                "partition-specs", "last-sequence-number"):
        assert key in meta, key
    ml_rel = meta["snapshots"][0]["manifest-list"]
    (mf,) = decode_avro_blocks(
        open(os.path.join(root, ml_rel), "rb").read())
    for key in ("min_sequence_number", "existing_data_files_count",
                "deleted_data_files_count", "added_rows_count",
                "existing_rows_count", "deleted_rows_count",
                "partition_spec_id", "content"):
        assert key in mf, key
    assert mf["min_sequence_number"] == mf["sequence_number"] == 1
    assert mf["added_rows_count"] == 30
    entries = decode_avro_blocks(
        open(os.path.join(root, mf["manifest_path"]), "rb").read())
    for e in entries:
        assert e["data_file"]["partition"] == {}  # empty struct
    # field-ids ride in the embedded avro schema
    raw = open(os.path.join(root, mf["manifest_path"]), "rb").read()
    assert b'"field-id": 102' in raw or b'"field-id":102' in raw


def test_partitioned_write_and_manifest_pruning(spark, tmp_path):
    """Round 14 (VERDICT item 5): identity-partitioned writes — the
    manifest entries carry the typed partition struct and
    read_iceberg(where=...) prunes files AT THE MANIFEST LAYER."""
    root = _tbl(tmp_path)
    df = spark.range(1000).select(
        (F.col("id") % 8).alias("p"), F.col("id").alias("k"))
    write_iceberg(df, root, now_ms=1, partition_by=["p"])
    got = read_iceberg(spark, root)
    assert got.count() == 1000
    assert set(got.columns) == {"p", "k"}
    pruned = read_iceberg(spark, root, where={"p": 3})
    assert pruned.count() == 125
    files = pruned.inputFiles()
    assert files and all("/p=3/" in f for f in files)
    with pytest.raises(ValueError, match="not a partition field"):
        read_iceberg(spark, root, where={"typo": 1})
    # appends keep the layout; drift rejects
    write_iceberg(
        spark.range(1000, 1008).select(
            (F.col("id") % 8).alias("p"), F.col("id").alias("k")),
        root, mode="append", now_ms=2,
    )
    assert read_iceberg(spark, root, where={"p": 0}).count() == 126
    with pytest.raises(ValueError, match="partition_by drift"):
        write_iceberg(df, root, mode="append", now_ms=3,
                      partition_by=["k"])
    # string partition fields round-trip the struct typed
    root2 = str(tmp_path / "tbl2")
    sdf = spark.range(100).select(
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string"))
        .alias("g"),
        F.col("id").alias("k"),
    )
    write_iceberg(sdf, root2, now_ms=1, partition_by=["g"])
    assert read_iceberg(spark, root2, where={"g": "g1"}).count() == 33


def test_expire_snapshots_executes_retention_contract(
    spark, tmp_path
):
    """Round 14 (VERDICT item 6): executed expire — old snapshots'
    unreachable manifest lists / manifests / data files are
    physically deleted, post-expire time travel loud-fails, the
    current snapshot and refs are always retained, and re-running is
    idempotent."""
    from datawarehouseproject_spark.sources.iceberg_native import (
        expire_iceberg,
    )

    root = _tbl(tmp_path)
    d = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("k"))
    s0 = write_iceberg(d(0, 10), root, now_ms=1000)
    s1 = write_iceberg(d(10, 20), root, mode="append", now_ms=2000)
    # overwrite at t=3000 orphans s0/s1's data files from the
    # current snapshot
    s2 = write_iceberg(d(20, 25), root, mode="overwrite", now_ms=3000)
    s3 = write_iceberg(d(25, 30), root, mode="append", now_ms=4000)
    n_data_before = sum(
        len(fn) for _dp, _dn, fn in os.walk(os.path.join(root, "data"))
    )
    r = expire_iceberg(root, older_than_ms=2500, now_ms=5000)
    assert r["expired"] == 2 and r["retained"] == 2
    assert r["deleted_data_files"] >= 1
    assert r["deleted_manifest_lists"] == 2
    # current reads unaffected; expired snapshots loud-fail
    assert read_iceberg(spark, root).count() == 10
    assert read_iceberg(spark, root, s2).count() == 5
    for sid in (s0, s1):
        with pytest.raises(ValueError, match="does not exist"):
            read_iceberg(spark, root, sid)
    n_data_after = sum(
        len(fn) for _dp, _dn, fn in os.walk(os.path.join(root, "data"))
    )
    assert n_data_after == n_data_before - r["deleted_data_files"]
    # idempotent: nothing left to expire at the same horizon
    r2 = expire_iceberg(root, older_than_ms=2500, now_ms=6000)
    assert r2["expired"] == 0
    # the current snapshot survives even an all-covering horizon
    r3 = expire_iceberg(root, older_than_ms=10_000, now_ms=7000)
    assert read_iceberg(spark, root).count() == 10
    assert read_iceberg(spark, root, s3).count() == 10
    del r3


def test_missing_manifest_quarantines_as_valueerror(spark, tmp_path):
    """Round 14 quarantine-escape class: a manifest (or manifest
    list) deleted out from under the table must land as ValueError,
    never FileNotFoundError."""
    root = _tbl(tmp_path)
    write_iceberg(
        spark.range(10).select(F.col("id").alias("k")), root, now_ms=1
    )
    mdir = os.path.join(root, "metadata")
    m = next(n for n in os.listdir(mdir) if n.startswith("m-"))
    os.remove(os.path.join(mdir, m))
    with pytest.raises(ValueError, match="missing"):
        read_iceberg(spark, root)
    # an append only copies the manifest-LIST records (it never
    # opens prior manifests), so it still commits; the missing
    # manifest list itself IS fenced
    ml = next(n for n in os.listdir(mdir) if n.startswith("snap-"))
    os.remove(os.path.join(mdir, ml))
    with pytest.raises(ValueError, match="missing"):
        write_iceberg(
            spark.range(3).select(F.col("id").alias("k")),
            root, mode="append", now_ms=2,
        )


def test_as_of_timestamp(spark, tmp_path):
    """Round 14: read_iceberg(as_of_ms=...) resolves through the
    snapshot-log; expired snapshots stop resolving."""
    from datawarehouseproject_spark.sources.iceberg_native import (
        expire_iceberg,
    )

    root = _tbl(tmp_path)
    for i, ms in enumerate((1000, 2000, 3000)):
        write_iceberg(
            spark.range(i * 10, (i + 1) * 10).select(
                F.col("id").alias("k")),
            root, mode="append", now_ms=ms,
        )
    assert read_iceberg(spark, root, as_of_ms=1500).count() == 10
    assert read_iceberg(spark, root, as_of_ms=2000).count() == 20
    assert read_iceberg(spark, root, as_of_ms=9999).count() == 30
    with pytest.raises(ValueError, match="precedes"):
        read_iceberg(spark, root, as_of_ms=1)
    with pytest.raises(ValueError, match="at most one"):
        read_iceberg(spark, root, snapshot_id=107, as_of_ms=2000)
    expire_iceberg(root, older_than_ms=2500, now_ms=9000)
    with pytest.raises(ValueError, match="precedes"):
        read_iceberg(spark, root, as_of_ms=1500)


def test_merge_iceberg_cow(spark, tmp_path):
    """Round 14: Iceberg COW MERGE — bound-window + partition
    routing picks the exact rewrite set; the new snapshot's manifest
    carries added/existing/deleted entries; time travel to the
    pre-merge snapshot still reads the old rows."""
    from datawarehouseproject_spark.sources.iceberg_native import (
        merge_iceberg,
    )

    root = _tbl(tmp_path)
    base = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    s0 = write_iceberg(
        base.repartitionByRange(8, "k").sortWithinPartitions("k"),
        root, now_ms=1000,
    )
    ups = spark.range(100, 140).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    ).union(spark.range(2000, 2010).select(
        F.col("id").alias("k"), F.lit(7).cast("long").alias("v")))
    m = merge_iceberg(root, ups, "k", now_ms=2000)
    assert m["files_rewritten"] <= 2
    assert m["files_untouched"] >= 6
    got = read_iceberg(spark, root)
    assert got.count() == 1010
    assert got.filter("k >= 100 and k < 140").agg(
        F.sum("v")).first()[0] == -40
    assert got.filter("k = 500").first()["v"] == 1000
    # pre-merge snapshot unchanged (COW isolation)
    assert read_iceberg(spark, root, s0).count() == 1000
    assert read_iceberg(spark, root, s0).filter(
        "k = 100").first()["v"] == 200
    # fences
    dup = spark.range(2).select(
        F.lit(5).cast("long").alias("k"),
        F.col("id").alias("v"))
    with pytest.raises(ValueError, match="duplicate merge keys"):
        merge_iceberg(root, dup, "k", now_ms=3000)


def test_merge_iceberg_partitioned_routing(spark, tmp_path):
    """Partitioned Iceberg MERGE: same key universe in every
    partition — only the matched partition's files rewrite."""
    from datawarehouseproject_spark.sources.iceberg_native import (
        merge_iceberg,
    )

    root = _tbl(tmp_path)
    base = spark.range(1000).select(
        (F.col("id") / 250).cast("long").alias("p"),
        (F.col("id") % 250).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    write_iceberg(base, root, now_ms=1000, partition_by=["p"])
    ups = spark.range(100, 110).select(
        F.lit(0).cast("long").alias("p"),
        F.col("id").alias("k"),
        F.lit(-1).cast("long").alias("v"),
    )
    m = merge_iceberg(root, ups, "k", now_ms=2000)
    got = read_iceberg(spark, root)
    assert got.count() == 1000
    assert got.filter("p = 0 and k between 100 and 109").agg(
        F.sum("v")).first()[0] == -10
    # p=1 rows with the SAME keys untouched
    assert got.filter("p = 1 and k = 100").first()["v"] \
        == (250 + 100) * 2
    # rewrite stayed inside p=0
    pruned = read_iceberg(spark, root, where={"p": 1})
    assert all("/p=1/" in f for f in pruned.inputFiles())
    assert m["files_rewritten"] >= 1
    with pytest.raises(ValueError, match="partition field"):
        merge_iceberg(root, ups, "p", now_ms=3000)


def test_delete_iceberg_range_and_partition_drop(spark, tmp_path):
    """Iceberg range DELETE rewrites only bound-overlapping files;
    partition-field delete is a zero-rewrite metadata drop."""
    from datawarehouseproject_spark.sources.iceberg_native import (
        delete_iceberg,
    )

    root = _tbl(tmp_path)
    base = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    write_iceberg(
        base.repartitionByRange(8, "k").sortWithinPartitions("k"),
        root, now_ms=1000,
    )
    d = delete_iceberg(root, "k", 100, 299, now_ms=2000)
    assert d["files_rewritten"] <= 3
    assert d["files_untouched"] >= 5
    got = read_iceberg(spark, root)
    assert got.count() == 800
    assert got.filter("k between 100 and 299").count() == 0
    # partitioned table: partition-field delete = metadata drop
    root2 = str(tmp_path / "tbl2")
    pdf = spark.range(1000).select(
        (F.col("id") % 5).alias("p"), F.col("id").alias("k"))
    write_iceberg(pdf, root2, now_ms=1000, partition_by=["p"])
    d2 = delete_iceberg(root2, "p", 1, 2, now_ms=2000)
    assert d2["files_added"] == 0 and d2["files_dropped"] >= 2
    got2 = read_iceberg(spark, root2)
    assert got2.count() == 600
    assert got2.filter("p in (1, 2)").count() == 0


def test_optimize_iceberg_row_invariant(spark, tmp_path):
    """Round 14: Iceberg compaction via plan_compaction — rows
    invariant, file count collapses, packing never crosses a
    partition, prior snapshots untouched."""
    from datawarehouseproject_spark.sources.iceberg_native import (
        optimize_iceberg,
    )

    root = _tbl(tmp_path)
    base = spark.range(1000).select(
        (F.col("id") % 4).alias("p"), F.col("id").alias("k"))
    s0 = write_iceberg(base.repartition(8), root, now_ms=1000,
                       partition_by=["p"])
    before = read_iceberg(spark, root)
    n_before = len(before.inputFiles())
    sum_before = before.agg(F.sum("k")).first()[0]
    m = optimize_iceberg(root, target_rows=500, now_ms=2000)
    after = read_iceberg(spark, root)
    assert after.count() == 1000
    assert after.agg(F.sum("k")).first()[0] == sum_before
    assert len(after.inputFiles()) == m["files_after"] < n_before
    # rewritten files stay inside one partition dir
    for f in after.inputFiles():
        assert "/p=" in f
    # pre-optimize snapshot unchanged; pruning still exact
    assert read_iceberg(spark, root, s0).count() == 1000
    assert read_iceberg(spark, root, where={"p": 3}).count() == 250
    # second run at the same target is a near-no-op
    m2 = optimize_iceberg(root, target_rows=500, now_ms=3000)
    assert m2["files_removed"] <= m["files_after"]
