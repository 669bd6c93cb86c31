"""Compaction: many small appends -> few files, data intact."""

from __future__ import annotations

import glob

from datawarehouseproject_spark.sources.parquet import compact


def test_compact_preserves_data(spark, tmp_path):
    path = str(tmp_path / "ledger")
    for i in range(10):
        spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode("append").parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 10

    n_files = compact(spark, path, target_files=2)
    assert n_files == 2
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert back.agg({"id": "sum"}).collect()[0][0] == sum(range(100))
