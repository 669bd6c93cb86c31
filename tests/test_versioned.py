"""Tests for the versioned parquet table (snapshot isolation, time
travel, vacuum) — sources/versioned.py."""

from __future__ import annotations

import os

import pytest

from datawarehouseproject_spark.sources.versioned import (
    current_version,
    read_version,
    vacuum,
    write_version,
)


def test_versions_commit_and_read_back(spark, tmp_path):
    path = str(tmp_path / "t")
    assert current_version(path) == 0
    assert write_version(spark.range(0, 3), path) == 1
    assert write_version(spark.range(0, 5), path) == 2
    assert current_version(path) == 2
    assert read_version(spark, path).count() == 5  # latest
    assert read_version(spark, path, version=1).count() == 3
    assert read_version(spark, path, version=2).count() == 5


def test_snapshot_isolation_old_reader_unaffected(spark, tmp_path):
    """A DataFrame resolved at v1 keeps returning v1's rows after v2
    commits — the writer never touches v1's files."""
    path = str(tmp_path / "t")
    write_version(spark.range(0, 4), path)
    v1 = read_version(spark, path, version=1)
    assert v1.count() == 4
    write_version(spark.range(0, 9), path)
    assert v1.count() == 4  # re-executed AFTER the v2 commit
    assert read_version(spark, path).count() == 9


def test_read_missing_version_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    with pytest.raises(ValueError, match="no committed versions"):
        read_version(spark, path)
    write_version(spark.range(2), path)
    with pytest.raises(ValueError, match="not available"):
        read_version(spark, path, version=2)
    with pytest.raises(ValueError, match="not available"):
        read_version(spark, path, version=0)


def test_vacuum_retains_last_k(spark, tmp_path):
    path = str(tmp_path / "t")
    for n in (1, 2, 3, 4):
        write_version(spark.range(n), path)
    dropped = vacuum(path, keep_last=2)
    assert dropped == [1, 2]
    assert read_version(spark, path, version=4).count() == 4
    assert read_version(spark, path, version=3).count() == 3
    with pytest.raises(ValueError, match="not available"):
        read_version(spark, path, version=1)


def test_uncommitted_orphan_invisible_and_nonblocking(spark, tmp_path):
    """A crash between data write and commit-link leaves only an
    unreferenced uuid data dir: readers never see it, subsequent
    commits are NOT blocked (no name collision — the round-6 defect),
    and vacuum clears it."""
    path = str(tmp_path / "t")
    write_version(spark.range(3), path)
    orphan = os.path.join(path, "d-deadbeef0000")
    spark.range(99).write.parquet(orphan)  # simulated uncommitted write
    assert current_version(path) == 1
    assert read_version(spark, path).count() == 3
    with pytest.raises(ValueError, match="not available"):
        read_version(spark, path, version=2)
    # the orphan does not block the next commit
    assert write_version(spark.range(7), path) == 2
    assert read_version(spark, path, version=2).count() == 7
    assert vacuum(path, keep_last=2) == []  # nothing committed dropped
    assert not os.path.exists(orphan)  # ...but the orphan is gone


def test_concurrent_writers_cas_exactly_one_winner(spark, tmp_path):
    """Two-writer race (VERDICT r6 item 5): N threads commit
    concurrently; the os.link CAS guarantees every version number
    1..N is won by exactly one writer and every writer's snapshot is
    committed under SOME version — no lost updates, no duplicate
    version numbers, no silent last-rename-wins."""
    import threading

    path = str(tmp_path / "t")
    n_writers = 6
    barrier = threading.Barrier(n_writers)
    results: dict[int, int] = {}
    errors: list[Exception] = []

    def writer(i: int) -> None:
        try:
            barrier.wait()
            results[i] = write_version(spark.range(i * 10, i * 10 + i + 1), path)
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    # every writer got a distinct version, covering 1..N exactly
    assert sorted(results.values()) == list(range(1, n_writers + 1))
    assert current_version(path) == n_writers
    # and every writer's payload is readable under its version
    counts = {
        results[i]: i + 1 for i in range(n_writers)
    }  # writer i committed i+1 rows
    for v, expect in counts.items():
        assert read_version(spark, path, version=v).count() == expect


def test_rollback_is_manifest_only(spark, tmp_path):
    """Restoring an old version = reading it and committing it as the
    new head; the bytes of v1 are never copied by the manifest
    machinery itself."""
    path = str(tmp_path / "t")
    write_version(spark.range(4), path)
    write_version(spark.range(9), path)
    restored = read_version(spark, path, version=1)
    write_version(restored, path)
    assert current_version(path) == 3
    assert read_version(spark, path).count() == 4


def test_streaming_commits_versions_per_batch(spark, tmp_path):
    """Composition with Structured Streaming: a foreachBatch sink
    that commits one table version per micro-batch — the CDC shape
    where every ingest tick yields an auditable, time-travelable
    snapshot. Two source drops → two versions; v1 stays readable
    (and unchanged) after v2 commits."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(1, "a"), (2, "b")], schema).write.parquet(src)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        (
            stream.writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda df, _bid: write_version(df, table) and None)
            .start()
            .awaitTermination()
        )

    run_once()
    assert current_version(table) == 1
    assert read_version(spark, table, version=1).count() == 2

    spark.createDataFrame([(3, "c")], schema).write.mode("append").parquet(src)
    run_once()
    assert current_version(table) == 2
    assert read_version(spark, table, version=1).count() == 2
    assert read_version(spark, table, version=2).count() == 1  # the delta batch


# ---------------------------------------------------------------------------
# Compaction / OPTIMIZE (round 8 — VERDICT r7 item 6).
# ---------------------------------------------------------------------------


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    from datawarehouseproject_spark.sources.versioned import (
        compact_version,
        snapshot_file_count,
    )

    path = str(tmp_path / "t")
    write_version(spark.range(0, 100).repartition(8), path)
    assert snapshot_file_count(path, 1) == 8  # the small-file problem
    v = compact_version(spark, path, target_files=1)
    assert v == 2
    assert snapshot_file_count(path, 2) == 1
    # no semantic change: row sets identical across the commit...
    before = {r["id"] for r in read_version(spark, path, 1).collect()}
    after = {r["id"] for r in read_version(spark, path, 2).collect()}
    assert before == after == set(range(100))
    # ...and time travel to the pre-compaction snapshot still works
    assert read_version(spark, path, version=1).count() == 100


def test_compact_conflict_aborts_never_reverts(spark, tmp_path, monkeypatch):
    """If a real write lands between the compactor's read and its
    commit, the compaction must ABORT (ConflictError) — a blind CAS
    retry at N+2 would silently revert the intervening write."""
    import os

    import datawarehouseproject_spark.sources.versioned as V

    path = str(tmp_path / "t")
    write_version(spark.range(0, 10).repartition(4), path)
    # a real writer commits version 2 "during" the compaction of
    # version 1: pin the compactor's head read to the stale base
    write_version(spark.range(0, 999), path)
    monkeypatch.setattr(V, "current_version", lambda p: 1)
    with pytest.raises(V.ConflictError, match="re-run against the new head"):
        V.compact_version(spark, path)
    monkeypatch.undo()
    # the intervening write is intact, never reverted
    assert read_version(spark, path).count() == 999
    # and its orphaned compacted dir doesn't block the retry
    v = V.compact_version(spark, path)
    assert v == 3
    assert read_version(spark, path).count() == 999
    # exactly the live dirs remain: v1, v2, v3 (conflict dir removed)
    dirs = [n for n in os.listdir(path) if n.startswith("d-")]
    assert len(dirs) == 3


def test_compact_then_vacuum_drops_small_file_snapshots(spark, tmp_path):
    """The OPTIMIZE+VACUUM lifecycle: compaction leaves both
    snapshots readable; vacuum(keep_last=1) then drops the
    small-file version AND its now-unreferenced data dir, while the
    compacted head keeps serving."""
    import os

    from datawarehouseproject_spark.sources.versioned import (
        compact_version,
        snapshot_file_count,
        vacuum,
    )

    path = str(tmp_path / "t")
    write_version(spark.range(0, 50).repartition(6), path)
    compact_version(spark, path, target_files=1)
    assert read_version(spark, path, version=1).count() == 50
    dropped = vacuum(path, keep_last=1)
    assert dropped == [1]
    with pytest.raises(ValueError, match="not available"):
        read_version(spark, path, version=1)
    assert read_version(spark, path).count() == 50
    assert snapshot_file_count(path, 2) == 1
    # exactly one data dir remains on disk
    dirs = [n for n in os.listdir(path) if n.startswith("d-")]
    assert len(dirs) == 1


def test_data_skipping_prunes_files_and_loses_no_rows(spark, tmp_path):
    """Min/max stats prune: a range-clustered write + a narrow
    predicate must open a strict subset of files, and the pruned
    read + exact predicate must equal the full-scan answer."""
    from pyspark.sql import functions as F

    from datawarehouseproject_spark.sources.versioned import (
        read_version_pruned,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 1000).withColumn("k", F.col("id"))
    write_version(
        df.repartitionByRange(8, "k"), path, stats_columns=("k",)
    )
    pruned, scanned, total = read_version_pruned(
        spark, path, "k", lower=100, upper=199
    )
    assert total == 8
    assert 1 <= scanned < total
    got = pruned.filter((F.col("k") >= 100) & (F.col("k") <= 199))
    assert got.count() == 100
    assert got.agg(F.sum("k")).first()[0] == sum(range(100, 200))


def test_data_skipping_half_open_and_empty_ranges(spark, tmp_path):
    from pyspark.sql import functions as F

    from datawarehouseproject_spark.sources.versioned import (
        read_version_pruned,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 400).withColumn("k", F.col("id"))
    write_version(df.repartitionByRange(4, "k"), path, stats_columns=("k",))
    hi_only, scanned, total = read_version_pruned(
        spark, path, "k", upper=50
    )
    assert scanned < total
    assert hi_only.filter(F.col("k") <= 50).count() == 51
    empty, scanned0, _ = read_version_pruned(
        spark, path, "k", lower=10_000
    )
    assert scanned0 == 0
    assert empty.count() == 0
    assert empty.columns == ["id", "k"]


def test_data_skipping_statless_snapshot_full_scans(spark, tmp_path):
    """A snapshot committed WITHOUT stats (or compacted without
    them) must fall back to scanning every file — conservative, not
    an error."""
    from datawarehouseproject_spark.sources.versioned import (
        read_version_pruned,
    )

    path = str(tmp_path / "t")
    write_version(spark.range(0, 100).repartition(4), path)
    df, scanned, total = read_version_pruned(
        spark, path, "id", lower=5, upper=10
    )
    assert scanned == total == 4
    assert df.count() == 100


def test_data_skipping_survives_compaction_with_stats(spark, tmp_path):
    from pyspark.sql import functions as F

    from datawarehouseproject_spark.sources.versioned import (
        compact_version,
        read_version_pruned,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 600).withColumn("k", F.col("id"))
    write_version(df.repartitionByRange(6, "k"), path, stats_columns=("k",))
    v2 = compact_version(spark, path, target_files=2, stats_columns=("k",))
    assert v2 == 2
    pruned, scanned, total = read_version_pruned(
        spark, path, "k", lower=0, upper=10
    )
    assert total == 2 and scanned == 1
    assert pruned.filter(F.col("k") <= 10).count() == 11


def test_data_skipping_timestamp_column(spark, tmp_path):
    """Date/timestamp stats serialize to ISO-8601, whose string
    order is chronological — prune on a date range."""
    from pyspark.sql import functions as F

    from datawarehouseproject_spark.sources.versioned import (
        read_version_pruned,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 365).select(
        F.col("id"),
        F.expr("timestampadd(DAY, CAST(id AS INT), timestamp'2024-01-01')")
        .alias("ts"),
    )
    write_version(df.repartitionByRange(6, "ts"), path, stats_columns=("ts",))
    import datetime

    pruned, scanned, total = read_version_pruned(
        spark,
        path,
        "ts",
        lower=datetime.datetime(2024, 6, 1),
        upper=datetime.datetime(2024, 6, 30),
    )
    assert scanned < total
    got = pruned.filter(
        (F.col("ts") >= F.lit("2024-06-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-07-01").cast("timestamp"))
    )
    assert got.count() == 30
