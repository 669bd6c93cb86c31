"""Merge-on-read economics at scale: deletion-vector / position-
delete DML vs copy-on-write, plus UniForm sync throughput.

Scenario: an UNCLUSTERED table (round-robin layout, so every file's
key window spans the full range — the shape where stats pruning
cannot help a thin delete) takes a 0.5 % range delete.  Copy-on-write
must rewrite EVERY file; merge-on-read writes one bitmap/delete file.

    python tools/stress_mor.py [rows] [files]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _dir_bytes(root, suffix=".parquet"):
    total = 0
    for dp, _dn, fns in os.walk(root):
        if "_delta_log" in dp or "metadata" in dp:
            continue
        for fn in fns:
            if fn.endswith(suffix):
                total += os.path.getsize(os.path.join(dp, fn))
    return total


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "12g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from datawarehouseproject_spark.sources.delta_native import (
        delete_delta,
        dv_delete_delta,
        read_delta,
        write_delta,
    )
    from datawarehouseproject_spark.sources.iceberg_native import (
        mor_delete_iceberg,
        read_iceberg,
        write_iceberg,
    )
    from datawarehouseproject_spark.sources.uniform import (
        convert_delta_to_iceberg,
    )

    base = spark.range(rows).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
        F.sha1(F.col("id").cast("string")).alias("pad"),
    ).repartition(files)  # round-robin: every file spans [0, rows)
    lo, hi = 0, rows // 200 - 1  # 0.5 % of rows, hits every file

    out = {"rows": rows, "files": files}

    root_cow = tempfile.mkdtemp(prefix="mor_cow_") + "/tbl"
    write_delta(base, root_cow, now_ms=1_000)
    bytes0 = _dir_bytes(root_cow)
    t0 = time.time()
    m = delete_delta(root_cow, "k", lo, hi, now_ms=2_000)
    out["cow_delete_s"] = round(time.time() - t0, 2)
    out["cow_files_rewritten"] = m["files_rewritten"]
    out["cow_bytes_written"] = _dir_bytes(root_cow) - bytes0 \
        + m["files_rewritten"] * 0  # new adds only (old not yet vacuumed)

    root_dv = tempfile.mkdtemp(prefix="mor_dv_") + "/tbl"
    write_delta(base, root_dv, now_ms=1_000)
    t0 = time.time()
    m = dv_delete_delta(root_dv, "k", lo, hi, now_ms=2_000)
    out["dv_delete_s"] = round(time.time() - t0, 2)
    out["dv_files_touched"] = m["files_dv"]
    out["dv_bin_bytes"] = _dir_bytes(root_dv, ".bin")

    t0 = time.time()
    n = read_delta(spark, root_dv).count()
    out["dv_read_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    n2 = read_delta(spark, root_cow).count()
    out["cow_read_s"] = round(time.time() - t0, 2)
    assert n == n2 == rows - (hi - lo + 1), (n, n2)

    root_ice = tempfile.mkdtemp(prefix="mor_ice_") + "/tbl"
    write_iceberg(base, root_ice, now_ms=1_000)
    t0 = time.time()
    m = mor_delete_iceberg(root_ice, "k", lo, hi, now_ms=2_000)
    out["ice_mor_delete_s"] = round(time.time() - t0, 2)
    out["ice_delete_rows"] = m["delete_rows"]
    t0 = time.time()
    n3 = read_iceberg(spark, root_ice).count()
    out["ice_mor_read_s"] = round(time.time() - t0, 2)
    assert n3 == rows - (hi - lo + 1), n3

    t0 = time.time()
    r = convert_delta_to_iceberg(root_cow, now_ms=3_000)
    dt = time.time() - t0
    out["uniform_sync_s"] = round(dt, 2)
    out["uniform_files"] = r["files_added"]
    out["uniform_files_per_s"] = round(r["files_added"] / dt, 1)

    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
