"""Merge-on-read position deletes on native Iceberg tables —
sources/iceberg_native.py:mor_delete_iceberg / purge_deletes_iceberg
and the MOR-aware read.  The delete parquet is cross-decoded by the
independent forensics reader
(functions/iceberg_scan.py:_load_positional_deletes)."""

from __future__ import annotations

import io
import os

import pytest
from pyspark.sql import functions as F

from datawarehouseproject_spark.sources.iceberg_native import (
    delete_iceberg,
    expire_iceberg,
    merge_iceberg,
    mor_delete_iceberg,
    optimize_iceberg,
    purge_deletes_iceberg,
    read_iceberg,
    write_iceberg,
)


def _tbl(tmp_path):
    return str(tmp_path / "tbl")


def _mk(spark, root, n=400, files=4):
    base = spark.range(n).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 3).cast("long").alias("v"))
    write_iceberg(
        base.repartitionByRange(files, "k").sortWithinPartitions("k"),
        root, now_ms=1_000,
    )


def _datafiles(root):
    return sorted(
        f for f in os.listdir(os.path.join(root, "data"))
        if f.startswith("part-")
    )


def test_mor_delete_rewrites_nothing(spark, tmp_path):
    root = _tbl(tmp_path)
    _mk(spark, root)
    before = {
        f: os.path.getsize(os.path.join(root, "data", f))
        for f in _datafiles(root)
    }
    m = mor_delete_iceberg(root, "k", 50, 149, now_ms=2_000)
    assert m["files_rewritten"] == 0
    assert m["files_with_candidates"] == 2
    assert m["delete_rows"] == 100
    after = {
        f: os.path.getsize(os.path.join(root, "data", f))
        for f in _datafiles(root)
    }
    assert before == after
    got = sorted(r["k"] for r in read_iceberg(spark, root).collect())
    assert got == [k for k in range(400) if not 50 <= k <= 149]


def test_mor_second_delete_unions(spark, tmp_path):
    """Duplicate positions across delete files are legal — readers
    union; the second delete file carries only its own matches."""
    root = _tbl(tmp_path)
    _mk(spark, root)
    mor_delete_iceberg(root, "k", 50, 149, now_ms=2_000)
    m2 = mor_delete_iceberg(root, "k", 120, 220, now_ms=3_000)
    # 120..149 rematch (dupes, legal) + 150..220 fresh = 101 rows
    assert m2["delete_rows"] == 101
    got = sorted(r["k"] for r in read_iceberg(spark, root).collect())
    assert got == [k for k in range(400) if not 50 <= k <= 220]


def test_mor_time_travel(spark, tmp_path):
    root = _tbl(tmp_path)
    _mk(spark, root)
    m1 = mor_delete_iceberg(root, "k", 50, 149, now_ms=2_000)
    mor_delete_iceberg(root, "k", 150, 199, now_ms=3_000)
    assert read_iceberg(
        spark, root, snapshot_id=m1["snapshot_id"]).count() == 300
    assert read_iceberg(spark, root).count() == 250


def test_mor_fences_cow_dml(spark, tmp_path):
    """Every copy-on-write path loud-rejects while live position
    deletes exist — a raw rewrite would resurrect deleted rows."""
    root = _tbl(tmp_path)
    _mk(spark, root)
    mor_delete_iceberg(root, "k", 50, 149, now_ms=2_000)
    upd = spark.range(10).select(
        F.col("id").cast("long").alias("k"),
        F.lit(-1).cast("long").alias("v"))
    with pytest.raises(ValueError, match="position-delete"):
        merge_iceberg(root, upd, "k", now_ms=3_000)
    with pytest.raises(ValueError, match="position-delete"):
        delete_iceberg(root, "k", 0, 5, now_ms=3_000)
    with pytest.raises(ValueError, match="position-delete"):
        optimize_iceberg(root, target_rows=1_000, now_ms=3_000)


def test_mor_purge_applies_and_unblocks(spark, tmp_path):
    root = _tbl(tmp_path)
    _mk(spark, root)
    mor_delete_iceberg(root, "k", 50, 149, now_ms=2_000)
    before = sorted(
        r["k"] for r in read_iceberg(spark, root).collect())
    p = purge_deletes_iceberg(root, now_ms=3_000)
    assert p["delete_files_dropped"] == 1
    assert p["files_rewritten"] == 2
    after = sorted(
        r["k"] for r in read_iceberg(spark, root).collect())
    assert before == after
    # COW DML unblocked
    upd = spark.range(300, 305).select(
        F.col("id").cast("long").alias("k"),
        F.lit(-1).cast("long").alias("v"))
    merge_iceberg(root, upd, "k", now_ms=4_000)
    got = {r["k"]: r["v"] for r in read_iceberg(spark, root).collect()}
    assert got[301] == -1 and 70 not in got
    # purge with no deletes is a no-op
    p2 = purge_deletes_iceberg(root, now_ms=5_000)
    assert p2["snapshot_id"] is None


def test_mor_untouched_files_have_no_candidates(spark, tmp_path):
    root = _tbl(tmp_path)
    _mk(spark, root)
    m = mor_delete_iceberg(root, "k", 0, 49, now_ms=2_000)
    assert m["files_with_candidates"] == 1


def test_mor_no_match_no_delete_file(spark, tmp_path):
    root = _tbl(tmp_path)
    _mk(spark, root)
    m = mor_delete_iceberg(root, "k", 10_000, 20_000, now_ms=2_000)
    assert m["delete_file"] is None and m["delete_rows"] == 0
    assert read_iceberg(spark, root).count() == 400


def test_mor_forensics_cross_decode(spark, tmp_path):
    """The independent positional-delete decoder reads the native
    writer's delete parquet to the exact (file, position) set."""
    import pyarrow.parquet as pq

    from datawarehouseproject_spark.functions.iceberg_scan import (
        _load_positional_deletes,
    )

    root = _tbl(tmp_path)
    _mk(spark, root, n=100, files=2)
    m = mor_delete_iceberg(root, "k", 10, 19, now_ms=2_000)
    files = {}
    for dp, _dn, fns in os.walk(root):
        for fn in fns:
            full = os.path.join(dp, fn)
            with open(full, "rb") as fh:
                files[os.path.relpath(full, root)] = fh.read()
    rel = m["delete_file"]
    nrows = pq.read_table(io.BytesIO(files[rel])).num_rows
    decoded = _load_positional_deletes(files, [(rel, nrows)])
    assert len(decoded) == 1
    (positions,) = decoded.values()
    assert sorted(positions) == list(range(10, 20))


def test_mor_expire_reclaims_superseded_deletes(spark, tmp_path):
    root = _tbl(tmp_path)
    _mk(spark, root)
    mor_delete_iceberg(root, "k", 50, 149, now_ms=2_000)
    purge_deletes_iceberg(root, now_ms=3_000)
    keep = sorted(r["k"] for r in read_iceberg(spark, root).collect())
    ex = expire_iceberg(root, older_than_ms=2_500, now_ms=4_000)
    assert ex["expired"] >= 1
    assert not [
        f for f in os.listdir(os.path.join(root, "data"))
        if f.startswith("pos-delete")
    ]
    assert sorted(
        r["k"] for r in read_iceberg(spark, root).collect()) == keep


def test_mor_partitioned_global_deletes(spark, tmp_path):
    """Partitioned tables use GLOBAL position deletes: one delete
    file under the unpartitioned spec (id 1, registered on first
    use and preserved by later writes), data files untouched,
    manifest-layer partition pruning intact, purge rewrites only
    the affected partitions' files."""
    from datawarehouseproject_spark.sources.iceberg_native import (
        _current_meta,
    )

    root = _tbl(tmp_path)
    base = spark.range(400).select(
        (F.col("id") % 4).cast("long").alias("p"),
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 3).cast("long").alias("v"))
    write_iceberg(base.repartition(4, "p"), root, now_ms=1_000,
                  partition_by=["p"])
    m = mor_delete_iceberg(root, "k", 100, 199, now_ms=2_000)
    assert m["files_rewritten"] == 0 and m["delete_rows"] == 100
    got = sorted(r["k"] for r in read_iceberg(spark, root).collect())
    assert got == [k for k in range(400) if not 100 <= k <= 199]
    pr = read_iceberg(spark, root, where={"p": 1})
    assert sorted(r["k"] for r in pr.collect()) == [
        k for k in range(400)
        if k % 4 == 1 and not 100 <= k <= 199]
    _v, meta = _current_meta(root)
    assert {s["spec-id"] for s in meta["partition-specs"]} == {0, 1}
    # a partition-column delete stays the metadata drop
    with pytest.raises(ValueError, match="metadata drop"):
        mor_delete_iceberg(root, "p", 0, 0, now_ms=2_500)
    p2 = purge_deletes_iceberg(root, now_ms=3_000)
    assert p2["files_rewritten"] == 4
    assert read_iceberg(spark, root).count() == 300
    # spec 1 survives later writes
    write_iceberg(
        spark.range(400, 404).select(
            (F.col("id") % 4).cast("long").alias("p"),
            F.col("id").cast("long").alias("k"),
            (F.col("id") * 3).cast("long").alias("v")),
        root, now_ms=4_000)
    _v, meta = _current_meta(root)
    assert {s["spec-id"] for s in meta["partition-specs"]} == {0, 1}
    assert read_iceberg(spark, root).count() == 304


def test_mor_missing_delete_file_is_loud(spark, tmp_path):
    root = _tbl(tmp_path)
    _mk(spark, root)
    m = mor_delete_iceberg(root, "k", 50, 149, now_ms=2_000)
    os.remove(os.path.join(root, m["delete_file"]))
    with pytest.raises(ValueError, match="missing"):
        read_iceberg(spark, root).collect()


def test_rollback_and_tags(spark, tmp_path):
    from datawarehouseproject_spark.sources.iceberg_native import (
        rollback_iceberg,
        tag_iceberg,
    )

    root = _tbl(tmp_path)
    _mk(spark, root, n=200, files=2)
    from datawarehouseproject_spark.sources.iceberg_native import (
        _current_meta,
    )

    _v, meta = _current_meta(root)
    s1 = meta["current-snapshot-id"]
    tag_iceberg(root, "golden")
    upd = spark.range(5).select(
        F.col("id").cast("long").alias("k"),
        F.lit(-1).cast("long").alias("v"))
    merge_iceberg(root, upd, "k", now_ms=2_000)
    assert read_iceberg(spark, root).filter("v = -1").count() == 5
    # tags survive commits
    assert read_iceberg(spark, root, ref="golden").count() == 200
    rb = rollback_iceberg(root, s1, now_ms=3_000)
    assert rb["rolled_back"]
    assert read_iceberg(spark, root).filter("v = -1").count() == 0
    # rollback is idempotent; unknown targets and dup tags are loud
    assert not rollback_iceberg(root, s1, now_ms=4_000)["rolled_back"]
    with pytest.raises(ValueError, match="does not exist"):
        rollback_iceberg(root, 999_999, now_ms=4_000)
    with pytest.raises(ValueError, match="already exists"):
        tag_iceberg(root, "golden")
    with pytest.raises(ValueError, match="does not exist"):
        read_iceberg(spark, root, ref="nope")
    # expire retains every ref target
    expire_iceberg(root, older_than_ms=10**13, now_ms=5_000)
    assert read_iceberg(spark, root, ref="golden").count() == 200


def test_schema_evolution_add_column(spark, tmp_path):
    """Trailing nullable ADD COLUMN: field ids stable, old files
    read null for the new column, time travel resolves the OLD
    schema, post-evolution appends need no flag, and illegal
    evolutions (drop / retype) stay loud."""
    from datawarehouseproject_spark.sources.iceberg_native import (
        _current_meta,
    )

    root = _tbl(tmp_path)
    b = spark.range(100).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 3).cast("long").alias("v"))
    s1 = write_iceberg(b, root, now_ms=1_000)
    b2 = spark.range(100, 150).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 3).cast("long").alias("v"),
        F.concat(F.lit("t-"), F.col("id").cast("string"))
        .alias("label"))
    with pytest.raises(ValueError, match="allow_schema_change"):
        write_iceberg(b2, root, now_ms=2_000)
    write_iceberg(b2, root, now_ms=2_000, allow_schema_change=True)
    cur = read_iceberg(spark, root)
    assert cur.columns == ["k", "v", "label"]
    assert cur.count() == 150
    assert cur.filter("label IS NULL").count() == 100
    old = read_iceberg(spark, root, snapshot_id=s1)
    assert old.columns == ["k", "v"] and old.count() == 100
    _v, meta = _current_meta(root)
    assert meta["current-schema-id"] == 1
    assert meta["last-column-id"] == 3
    assert [f["id"] for f in meta["schemas"][1]["fields"]] \
        == [1, 2, 3]
    assert meta["schemas"][1]["fields"][2]["required"] is False
    # merge over the evolved table carries the new column
    u = spark.range(5).select(
        F.col("id").cast("long").alias("k"),
        F.lit(-1).cast("long").alias("v"),
        F.lit("upd").alias("label"))
    merge_iceberg(root, u, "k", now_ms=3_000)
    got = read_iceberg(spark, root).filter("v = -1")
    assert got.count() == 5
    assert got.filter("label = 'upd'").count() == 5
    # drop / retype are not evolution
    with pytest.raises(ValueError, match="trailing"):
        write_iceberg(
            spark.range(5).select(F.col("id").cast("long").alias("k")),
            root, now_ms=4_000, allow_schema_change=True)
    with pytest.raises(ValueError, match="trailing"):
        write_iceberg(
            spark.range(5).select(
                F.col("id").cast("string").alias("k"),
                F.lit(1).cast("long").alias("v"),
                F.lit("x").alias("label")),
            root, now_ms=4_000, allow_schema_change=True)


def test_write_audit_publish(spark, tmp_path):
    """Branch writes are invisible to main until publish; publish
    validates fast-forward ancestry; tags stay immutable."""
    from datawarehouseproject_spark.sources.iceberg_native import (
        publish_iceberg,
        tag_iceberg,
    )

    root = _tbl(tmp_path)
    _mk(spark, root, n=100, files=1)
    day = spark.range(100, 150).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 3).cast("long").alias("v"))
    write_iceberg(day, root, now_ms=2_000, branch="audit")
    assert read_iceberg(spark, root).count() == 100      # main isolated
    assert read_iceberg(spark, root, ref="audit").count() == 150
    write_iceberg(
        spark.range(150, 160).select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") * 3).cast("long").alias("v")),
        root, now_ms=2_500, branch="audit")
    p = publish_iceberg(root, "audit", now_ms=3_000)
    assert p["fast_forwarded_commits"] == 2
    assert read_iceberg(spark, root).count() == 160
    with pytest.raises(ValueError, match="does not exist"):
        read_iceberg(spark, root, ref="audit")           # dropped
    # main advancing mid-audit makes publish refuse
    write_iceberg(
        spark.range(200, 210).select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") * 3).cast("long").alias("v")),
        root, now_ms=4_000, branch="audit2")
    merge_iceberg(
        root,
        spark.range(3).select(
            F.col("id").cast("long").alias("k"),
            F.lit(-1).cast("long").alias("v")),
        "k", now_ms=5_000)
    with pytest.raises(ValueError, match="descend"):
        publish_iceberg(root, "audit2", now_ms=6_000)
    # tags are immutable: neither a branch write nor a publish target
    tag_iceberg(root, "release")
    with pytest.raises(ValueError, match="tag"):
        write_iceberg(day, root, now_ms=7_000, branch="release")
    with pytest.raises(ValueError, match="tag"):
        publish_iceberg(root, "release", now_ms=7_000)
