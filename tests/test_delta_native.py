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


def test_partitioned_write_and_log_pruning(spark, tmp_path):
    root = _tbl(tmp_path)
    df = spark.range(1000).select(
        (F.col("id") % 10).alias("p"), F.col("id").alias("k"))
    write_delta(df, root, now_ms=1, partition_by=["p"])
    from datawarehouseproject_spark.sources.delta_native import (
        _replay_full,
    )

    live, _, pcols = _replay_full(root, None)
    assert pcols == ["p"]
    assert all(rel.startswith("p=") for rel in live)
    pruned = read_delta(spark, root, where={"p": 3})
    assert pruned.count() == 100
    # LOG-level pruning: only partition-3 files enter the scan
    files = pruned.inputFiles()
    assert files and all("/p=3/" in f for f in files)
    with pytest.raises(ValueError, match="not a partition column"):
        read_delta(spark, root, where={"typo": 1})
    # drifting layout on append rejects
    with pytest.raises(ValueError, match="partition_by drift"):
        write_delta(df, root, mode="append", now_ms=2,
                    partition_by=["k"])


def test_merge_plans_exact_rewrite_set(spark, tmp_path):
    from datawarehouseproject_spark.sources.delta_native import (
        merge_delta,
    )

    root = _tbl(tmp_path)
    base = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    write_delta(
        base.repartitionByRange(8, "k").sortWithinPartitions("k"),
        root, now_ms=1,
    )
    ups = spark.range(100, 140).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    ).union(
        spark.range(2000, 2010).select(
            F.col("id").alias("k"), F.lit(7).cast("long").alias("v"))
    )
    m = merge_delta(root, ups, "k", now_ms=2)
    # keys 100-139 live in at most 2 of the 8 range files; the
    # insert-only keys (2000+) must not inflate the rewrite set
    assert m["files_rewritten"] <= 2
    assert m["files_untouched"] >= 6
    got = read_delta(spark, root)
    assert got.count() == 1010
    assert got.filter("k >= 100 and k < 140").agg(
        F.sum("v")).first()[0] == -40
    assert got.filter("k >= 2000").count() == 10
    assert got.filter("k = 500").first()["v"] == 1000
    # merge into a partitioned table is a declared boundary
    root2 = str(tmp_path / "tbl2")
    write_delta(
        spark.range(10).select(
            (F.col("id") % 2).alias("p"), F.col("id").alias("k"),
            F.lit(0).cast("long").alias("v")),
        root2, now_ms=1, partition_by=["p"],
    )
    with pytest.raises(ValueError, match="partitioned table"):
        merge_delta(root2, ups, "k", now_ms=2)


def test_optimize_compacts_without_changing_rows(spark, tmp_path):
    from datawarehouseproject_spark.sources.delta_native import (
        optimize_delta,
    )

    root = _tbl(tmp_path)
    base = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    write_delta(base.repartition(16), root, now_ms=1)
    before = read_delta(spark, root).agg(
        F.sum("v"), F.count("*")).first()
    m = optimize_delta(root, target_rows=300, now_ms=2)
    assert m["files_before"] == 16
    assert m["files_after"] < 16 // 2
    after = read_delta(spark, root)
    assert after.agg(F.sum("v"), F.count("*")).first() == before
    assert len(after.inputFiles()) == m["files_after"]
    # every OPTIMIZE action carries dataChange=false
    import json as _json
    import os as _os

    log = open(_os.path.join(
        root, "_delta_log", f"{1:020d}.json")).read().splitlines()
    for ln in log:
        act = _json.loads(ln)
        kind = next(iter(act))
        if kind in ("add", "remove"):
            assert act[kind]["dataChange"] is False
    # a second optimize at the same target is a near-no-op: no
    # multi-file group remains at this packing
    m2 = optimize_delta(root, target_rows=300, now_ms=3)
    assert m2["files_removed"] <= m["files_after"]


def test_delete_range_and_vacuum(spark, tmp_path):
    from datawarehouseproject_spark.sources.delta_native import (
        delete_delta,
        vacuum_delta,
    )

    root = _tbl(tmp_path)
    base = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    write_delta(
        base.repartitionByRange(8, "k").sortWithinPartitions("k"),
        root, now_ms=1000,
    )
    d = delete_delta(root, "k", 100, 299, now_ms=2000)
    # keys 100-299 live in at most 3 of the 8 range files
    assert d["files_rewritten"] <= 3
    assert d["files_untouched"] >= 5
    got = read_delta(spark, root)
    assert got.count() == 800
    assert got.filter("k between 100 and 299").count() == 0
    # a fully-deleted file is a pure remove: adds < removes is legal
    # dry run deletes nothing
    v = vacuum_delta(root, retention_hours=0, now_ms=10_000_000_000)
    assert v["deleted"] == 0 and v["eligible"] == d["files_rewritten"]
    v2 = vacuum_delta(root, retention_hours=0, now_ms=10_000_000_000,
                      dry_run=False)
    assert v2["deleted"] == v["eligible"]
    # the latest version is unaffected; version 0 now fails LOUDLY
    assert read_delta(spark, root).count() == 800
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import AnalysisException

    with pytest.raises((AnalysisException, Py4JJavaError)):
        read_delta(spark, root, 0).count()
    # unaged tombstones stay
    root2 = str(tmp_path / "tbl2")
    write_delta(base, root2, now_ms=1000)
    delete_delta(root2, "k", 0, 10, now_ms=5_000_000_000)
    v3 = vacuum_delta(root2, retention_hours=168,
                      now_ms=5_000_000_001)
    assert v3["eligible"] == 0
