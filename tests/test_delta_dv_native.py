"""Merge-on-read deletion vectors on native Delta tables —
sources/delta_native.py:dv_delete_delta and the DV-aware read/DML
surface.  Format cross-checked against the independent forensics
reader (functions/delta_log.py — the module that decodes the
published PROTOCOL.md deletion-vector layout)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from datawarehouseproject_spark.sources.delta_native import (
    _dv_of,
    _replay_state,
    checkpoint_delta,
    clean_log_delta,
    delta_table_changes,
    dv_delete_delta,
    merge_delta,
    optimize_delta,
    read_delta,
    vacuum_delta,
    write_delta,
)


def _tbl(tmp_path):
    return str(tmp_path / "tbl")


def _mk(spark, root, n=400, files=4):
    base = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    write_delta(
        base.repartitionByRange(files, "k").sortWithinPartitions("k"),
        root, now_ms=1_000,
    )


def _parquets(root):
    return sorted(f for f in os.listdir(root) if f.endswith(".parquet"))


def _bins(root):
    return sorted(f for f in os.listdir(root) if f.endswith(".bin"))


def test_dv_delete_rewrites_nothing(spark, tmp_path):
    """The whole point: a DV delete leaves every data file
    byte-identical on disk and adds exactly one .bin."""
    root = _tbl(tmp_path)
    _mk(spark, root)
    before = {
        f: os.path.getsize(os.path.join(root, f))
        for f in _parquets(root)
    }
    m = dv_delete_delta(root, "k", 50, 149, now_ms=2_000)
    assert m["files_dv"] == 2          # spans files [0,99] and [100,199]
    assert m["files_fully_removed"] == 0
    assert m["files_untouched"] == 2
    assert m["rows_deleted"] == 100
    after = {
        f: os.path.getsize(os.path.join(root, f))
        for f in _parquets(root)
    }
    assert before == after
    assert len(_bins(root)) == 1
    got = sorted(r["k"] for r in read_delta(spark, root).collect())
    assert got == [k for k in range(400) if not 50 <= k <= 149]


def test_dv_untouched_files_carry_no_descriptor(spark, tmp_path):
    root = _tbl(tmp_path)
    _mk(spark, root)
    dv_delete_delta(root, "k", 50, 149, now_ms=2_000)
    snap = _replay_state(root, None)
    with_dv = sorted(
        rel for rel, b in snap["live"].items() if _dv_of(b)
    )
    assert len(with_dv) == 2
    for rel, body in snap["live"].items():
        if rel not in with_dv:
            assert _dv_of(body) is None


def test_dv_supersede_unions_positions(spark, tmp_path):
    """A second DV delete over an already-DV'd file replaces the
    descriptor with the union — the superseding-descriptor
    semantics the forensics fixtures pin."""
    root = _tbl(tmp_path)
    _mk(spark, root)
    dv_delete_delta(root, "k", 50, 149, now_ms=2_000)
    m2 = dv_delete_delta(root, "k", 120, 220, now_ms=3_000)
    # 120..149 were already deleted: only 150..220 count as new
    assert m2["rows_deleted"] == 71
    # file [100,199] is now FULLY deleted -> pure remove
    assert m2["files_fully_removed"] == 1
    assert m2["files_dv"] == 1         # file [200,299] gets a DV
    got = sorted(r["k"] for r in read_delta(spark, root).collect())
    assert got == [k for k in range(400) if not 50 <= k <= 220]
    snap = _replay_state(root, None)
    assert len(snap["live"]) == 3      # the emptied file is gone


def test_dv_protocol_upgrade_once(spark, tmp_path):
    root = _tbl(tmp_path)
    _mk(spark, root)
    dv_delete_delta(root, "k", 0, 9, now_ms=2_000)
    dv_delete_delta(root, "k", 10, 19, now_ms=3_000)
    protos = []
    log = os.path.join(root, "_delta_log")
    for name in sorted(os.listdir(log)):
        if not name.endswith(".json"):
            continue
        for line in open(os.path.join(log, name)):
            act = json.loads(line)
            if "protocol" in act:
                protos.append(act["protocol"])
    assert protos[0] == {"minReaderVersion": 1, "minWriterVersion": 2}
    assert protos[1] == {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }
    assert len(protos) == 2            # second delete upgrades nothing


def test_dv_time_travel_below_the_delete(spark, tmp_path):
    root = _tbl(tmp_path)
    _mk(spark, root)
    dv_delete_delta(root, "k", 50, 149, now_ms=2_000)
    dv_delete_delta(root, "k", 150, 199, now_ms=3_000)
    assert read_delta(spark, root, version=0).count() == 400
    assert read_delta(spark, root, version=1).count() == 300
    assert read_delta(spark, root, version=2).count() == 250


def test_dv_merge_does_not_resurrect(spark, tmp_path):
    """MERGE rewriting a DV'd file must read it merge-on-read: the
    deleted rows stay deleted, and the rewritten file drops the
    descriptor (copy-on-write clean)."""
    root = _tbl(tmp_path)
    _mk(spark, root)
    dv_delete_delta(root, "k", 50, 59, now_ms=2_000)
    upd = spark.range(60, 70).select(
        F.col("id").alias("k"),
        F.lit(-1).cast("long").alias("v"))
    merge_delta(root, upd, "k", now_ms=3_000)
    got = {r["k"]: r["v"] for r in read_delta(spark, root).collect()}
    assert len(got) == 390
    assert 55 not in got
    assert got[65] == -1
    snap = _replay_state(root, None)
    assert all(_dv_of(b) is None for b in snap["live"].values())


def test_dv_optimize_purges(spark, tmp_path):
    """OPTIMIZE over DV'd files purges the vectors (REORG ... APPLY
    (PURGE) effect): rows invariant, no live descriptor remains."""
    root = _tbl(tmp_path)
    _mk(spark, root)
    dv_delete_delta(root, "k", 50, 149, now_ms=2_000)
    before = sorted(r["k"] for r in read_delta(spark, root).collect())
    optimize_delta(root, target_rows=1_000, now_ms=3_000)
    after = sorted(r["k"] for r in read_delta(spark, root).collect())
    assert before == after
    snap = _replay_state(root, None)
    assert all(_dv_of(b) is None for b in snap["live"].values())


def test_dv_checkpoint_carries_descriptor(spark, tmp_path):
    """Replay from a checkpoint written after a DV delete still
    masks the deleted rows (a dropped descriptor would resurrect
    them silently)."""
    root = _tbl(tmp_path)
    _mk(spark, root)
    dv_delete_delta(root, "k", 50, 149, now_ms=2_000)
    checkpoint_delta(root)
    got = sorted(r["k"] for r in read_delta(spark, root).collect())
    assert got == [k for k in range(400) if not 50 <= k <= 149]
    # and a DV delete on top of checkpoint-restored state unions
    dv_delete_delta(root, "k", 140, 159, now_ms=3_000)
    got = sorted(r["k"] for r in read_delta(spark, root).collect())
    assert got == [k for k in range(400) if not 50 <= k <= 159]


def test_dv_table_changes_reports_new_deletions_only(spark, tmp_path):
    root = _tbl(tmp_path)
    _mk(spark, root)
    dv_delete_delta(root, "k", 50, 149, now_ms=2_000)
    dv_delete_delta(root, "k", 120, 220, now_ms=3_000)
    ch = {
        r[0]: r[1]
        for r in delta_table_changes(spark, root, 1, 2)
        .groupBy("_change_type").count().collect()
    }
    assert ch == {"delete": 71}
    ch02 = {
        r[0]: r[1]
        for r in delta_table_changes(spark, root, 0, 2)
        .groupBy("_change_type").count().collect()
    }
    assert ch02 == {"delete": 171}
    # an OPTIMIZE purge between versions cancels exactly
    optimize_delta(root, target_rows=1_000, now_ms=4_000)
    snap = _replay_state(root, None)
    assert delta_table_changes(
        spark, root, 2, snap["version"]
    ).count() == 0


def test_dv_vacuum_reclaims_unreferenced_bins(spark, tmp_path):
    """A .bin referenced by ANY retained log action is protected
    (time travel still needs it); after OPTIMIZE purge + checkpoint
    + log cleanup it is unreferenced == unreachable -> reclaimed."""
    root = _tbl(tmp_path)
    _mk(spark, root)
    dv_delete_delta(root, "k", 50, 149, now_ms=2_000)
    optimize_delta(root, target_rows=1_000, now_ms=3_000)
    r = vacuum_delta(root, 0, now_ms=10**13, dry_run=False)
    assert r["dv_bins"] == 1 and r["dv_eligible"] == 0
    assert len(_bins(root)) == 1
    checkpoint_delta(root)
    clean_log_delta(root)
    r = vacuum_delta(root, 0, now_ms=10**13, dry_run=True)
    assert r["dv_eligible"] == 1 and r["dv_deleted"] == 0
    assert len(_bins(root)) == 1       # dry run touches nothing
    r = vacuum_delta(root, 0, now_ms=10**13, dry_run=False)
    assert r["dv_deleted"] == 1
    assert not _bins(root)
    assert read_delta(spark, root).count() == 300


def test_dv_forensics_reader_cross_decodes(spark, tmp_path):
    """The INDEPENDENT bundle reader (functions/delta_log.py, the
    module pinned against PROTOCOL.md fixtures) replays the native
    writer's table and decodes its descriptor to the exact
    positions — writer and reader validate each other."""
    from datawarehouseproject_spark.functions.delta_log import (
        _dv_positions,
        _replay_log,
    )

    root = _tbl(tmp_path)
    write_delta(
        spark.range(100).select(
            F.col("id").alias("k"), F.col("id").alias("v"))
        .repartitionByRange(2, "k").sortWithinPartitions("k"),
        root, now_ms=1_000,
    )
    dv_delete_delta(root, "k", 10, 19, now_ms=2_000)
    checkpoint_delta(root)            # bundle reader needs one
    files = {}
    for dp, _dn, fns in os.walk(root):
        for fn in fns:
            full = os.path.join(dp, fn)
            with open(full, "rb") as fh:
                files[os.path.relpath(full, root)] = fh.read()
    state, _cpv, _cur, _replayed, _f = _replay_log(
        files, require_stats=True, allow_dv=True)
    assert state.min_reader == 3
    decoded = {
        pth: _dv_positions(files, dv)
        for pth, (_st, _pv, dv) in state.adds.items()
        if dv is not None
    }
    assert len(decoded) == 1
    assert list(decoded.values())[0] == list(range(10, 20))


def test_dv_partitioned_table(spark, tmp_path):
    """DVs on a Hive-partitioned table: the descriptor lands on the
    right partition's file and log-level partition pruning still
    skips the other partitions entirely."""
    root = _tbl(tmp_path)
    base = spark.range(200).select(
        (F.col("id") % 2).cast("string").alias("p"),
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"))
    write_delta(base.repartition(2, "p"), root, now_ms=1_000,
                partition_by=["p"])
    dv_delete_delta(root, "k", 0, 99, now_ms=2_000)
    got = sorted(r["k"] for r in read_delta(spark, root).collect())
    assert got == list(range(100, 200))
    pruned = read_delta(spark, root, where={"p": "1"})
    assert sorted(r["k"] for r in pruned.collect()) == [
        k for k in range(100, 200) if k % 2 == 1]
    # pruning stays log-level: only partition p=1 files in the plan
    assert all("p=1" in f for f in pruned.inputFiles())


def test_dv_fences(spark, tmp_path):
    root = _tbl(tmp_path)
    base = spark.range(100).select(
        (F.col("id") % 2).cast("string").alias("p"),
        F.col("id").alias("k"))
    write_delta(base, root, now_ms=1_000, partition_by=["p"])
    with pytest.raises(ValueError, match="log-level drop"):
        dv_delete_delta(root, "p", "0", "0", now_ms=2_000)
    with pytest.raises(ValueError, match="range malformed"):
        dv_delete_delta(root, "k", 10, 5, now_ms=2_000)


def test_dv_delete_with_no_matches_commits_noop(spark, tmp_path):
    root = _tbl(tmp_path)
    _mk(spark, root)
    m = dv_delete_delta(root, "k", 10_000, 20_000, now_ms=2_000)
    assert m["files_dv"] == 0 and m["files_fully_removed"] == 0
    assert m["rows_deleted"] == 0
    assert read_delta(spark, root).count() == 400
    # no protocol upgrade for a no-op
    snap = _replay_state(root, None)
    assert snap["proto"]["minReaderVersion"] == 1


def test_reader_protocol_fence(spark, tmp_path):
    """A foreign table demanding a reader feature this module does
    not implement loud-rejects instead of serving corrupt rows."""
    root = _tbl(tmp_path)
    _mk(spark, root, n=10, files=1)
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"commitInfo": {
            "operation": "UPGRADE", "timestamp": 2_000,
        }}) + "\n")
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5,
        }}) + "\n")
    with pytest.raises(ValueError, match="reader protocol"):
        read_delta(spark, root)


def test_dv_missing_or_truncated_bin_is_loud(spark, tmp_path):
    """Quarantine fences: a vanished or truncated .bin surfaces as
    ValueError at PLAN time (driver-side), not an opaque task
    failure mid-scan."""
    root = _tbl(tmp_path)
    _mk(spark, root)
    dv_delete_delta(root, "k", 50, 149, now_ms=2_000)
    (bin_name,) = _bins(root)
    full = os.path.join(root, bin_name)
    blob = open(full, "rb").read()
    with open(full, "wb") as fh:
        fh.write(blob[: len(blob) // 2])
    with pytest.raises(ValueError, match="truncated"):
        read_delta(spark, root).collect()
    os.remove(full)
    with pytest.raises(ValueError, match="missing"):
        read_delta(spark, root).collect()


def test_restore_is_metadata_only_and_dv_aware(spark, tmp_path):
    """RESTORE re-points the live set (original stats + DV
    descriptors) without moving a byte; history above the restore
    stays readable."""
    from datawarehouseproject_spark.sources.delta_native import (
        restore_delta,
    )

    root = _tbl(tmp_path)
    _mk(spark, root)                                   # v0
    dv_delete_delta(root, "k", 10, 19, now_ms=2_000)   # v1
    upd = spark.range(50, 60).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v"))
    merge_delta(root, upd, "k", now_ms=3_000)          # v2
    files_before = _parquets(root)
    r = restore_delta(root, 1, now_ms=4_000)           # v3
    assert r["restored_to"] == 1
    assert _parquets(root) == files_before             # zero data moved
    a = sorted(r["k"] for r in read_delta(spark, root).collect())
    b = sorted(
        r["k"] for r in read_delta(spark, root, version=1).collect())
    assert a == b and len(a) == 390                    # DV still applies
    assert read_delta(spark, root, version=2).count() == 390
    # restore to v0 brings the DV-deleted rows back
    restore_delta(root, 0, now_ms=5_000)
    assert read_delta(spark, root).count() == 400


def test_restore_after_vacuum_is_loud(spark, tmp_path):
    from datawarehouseproject_spark.sources.delta_native import (
        delete_delta,
        restore_delta,
    )

    root = _tbl(tmp_path)
    _mk(spark, root)                                    # v0
    delete_delta(root, "k", 0, 99, now_ms=2_000)        # v1 (COW)
    vacuum_delta(root, 0, now_ms=10**13, dry_run=False)
    with pytest.raises(ValueError, match="vacuumed"):
        restore_delta(root, 0, now_ms=3_000)


def test_dv_merge_low_shuffle(spark, tmp_path):
    """merge_delta(use_dv=True): matched rows are MASKED, never
    rewritten — original files stay byte-identical, update/insert
    images land as new files, and a second DV merge over an
    already-masked file unions."""
    root = _tbl(tmp_path)
    _mk(spark, root)
    files0 = set(_parquets(root))
    upd = spark.range(95, 105).select(
        F.col("id").alias("k"), F.lit(-7).cast("long").alias("v")
    ).unionByName(spark.range(1000, 1010).select(
        F.col("id").alias("k"), F.lit(9).cast("long").alias("v")))
    m = merge_delta(root, upd.coalesce(1), "k", now_ms=2_000,
                    use_dv=True)
    assert m["files_rewritten"] == 0
    assert m["files_dv"] == 2          # keys 95..104 span two files
    assert m["rows_updated"] == 10
    assert files0 <= set(_parquets(root))
    got = {r["k"]: r["v"] for r in read_delta(spark, root).collect()}
    assert len(got) == 410
    assert got[100] == -7 and got[1005] == 9 and got[50] == 150
    assert read_delta(spark, root, version=0).count() == 400
    # union with a prior DV delete
    dv_delete_delta(root, "k", 0, 9, now_ms=3_000)
    m2 = merge_delta(
        root,
        spark.range(5, 12).select(
            F.col("id").alias("k"),
            F.lit(-1).cast("long").alias("v")).coalesce(1),
        "k", now_ms=4_000, use_dv=True)
    assert m2["rows_updated"] == 2     # only 10 and 11 were live
    got = {r["k"]: r["v"] for r in read_delta(spark, root).collect()}
    assert len(got) == 405             # -10 deleted, -2 masked, +7 images
    assert got[7] == -1 and got[11] == -1 and 3 not in got


def test_dv_commit_race_cleans_the_bin(spark, tmp_path, monkeypatch):
    """A lost commit race removes the already-placed .bin (and any
    staged update files) — no orphans outlive a conflict.  The race
    is simulated by freezing the snapshot at version 0 and landing a
    concurrent version-1 commit underneath it."""
    import datawarehouseproject_spark.sources.delta_native as dn

    root = _tbl(tmp_path)
    _mk(spark, root)
    frozen = dn._replay_state(root, None)
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"commitInfo": {
            "operation": "WRITE", "timestamp": 1_500,
        }}) + "\n")
    monkeypatch.setattr(
        dn, "_replay_state", lambda _p, _v: frozen)
    with pytest.raises(ValueError, match="already committed"):
        dv_delete_delta(root, "k", 50, 149, now_ms=2_000)
    monkeypatch.undo()
    assert not _bins(root)             # the placed bin was removed
    assert read_delta(spark, root, version=0).count() == 400
