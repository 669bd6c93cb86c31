"""Round-14 lakehouse stress: native Delta checkpoint replay vs
full-JSON replay on a long log, partitioned-MERGE rewrite-set
exactness at many partitions, and executed Iceberg expiry over a
deep snapshot chain.

Usage: python tools/stress_lakehouse.py [n_commits] [n_partitions]
(defaults 200 / 64). Prints one line per measurement; numbers are
recorded in STRESS.md."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datawarehouseproject_spark.session import get_spark  # noqa: E402
from datawarehouseproject_spark.sources.delta_native import (  # noqa: E402
    _replay_state,
    checkpoint_delta,
    merge_delta,
    read_delta,
    write_delta,
)
from datawarehouseproject_spark.sources.iceberg_native import (  # noqa: E402
    expire_iceberg,
    read_iceberg,
    write_iceberg,
)


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("stress-lakehouse")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="dw_stress_lake_")

    # --- 1. checkpoint replay vs full-JSON replay -----------------
    tbl = f"{base}/long_log"
    rows_per = 50
    t0 = time.time()
    for i in range(n_commits):
        write_delta(
            spark.range(i * rows_per, (i + 1) * rows_per).select(
                F.col("id").alias("k")),
            tbl, now_ms=1_700_000_000_000 + i,
        )
    t_build = time.time() - t0

    def replay_secs(reps: int = 5) -> float:
        best = float("inf")
        for _ in range(reps):
            t = time.time()
            _replay_state(tbl, None)
            best = min(best, time.time() - t)
        return best

    t_json = replay_secs()
    checkpoint_delta(tbl)
    t_cp = replay_secs()
    n_rows = read_delta(spark, tbl).count()
    assert n_rows == n_commits * rows_per
    print(f"delta long log: {n_commits} commits built in "
          f"{t_build:.1f}s; metadata replay full-JSON {t_json*1000:.0f}ms"
          f" -> from checkpoint {t_cp*1000:.0f}ms "
          f"({t_json / max(t_cp, 1e-9):.1f}x)")

    # --- 2. partitioned MERGE rewrite-set exactness ---------------
    ptbl = f"{base}/partitioned"
    n_rows_p = n_parts * 4000
    dfp = spark.range(n_rows_p).select(
        (F.col("id") % n_parts).alias("p"),
        (F.col("id") / n_parts).cast("long").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    write_delta(dfp.repartition(n_parts * 2), ptbl,
                now_ms=1_700_000_000_000, partition_by=["p"])
    snap = _replay_state(ptbl, None)
    n_files = len(snap["live"])
    ups = spark.range(100).select(
        F.lit(3).cast("long").alias("p"),
        F.col("id").alias("k"),
        F.lit(-1).cast("long").alias("v"),
    )
    t0 = time.time()
    m = merge_delta(ptbl, ups, "k", now_ms=1_700_000_060_000)
    t_merge = time.time() - t0
    per_part = n_files // n_parts
    print(f"partitioned merge: {n_parts} partitions / {n_files} files;"
          f" 100 keys in ONE partition -> rewrote "
          f"{m['files_rewritten']} files (<= {per_part} in-partition),"
          f" untouched {m['files_untouched']}, {t_merge:.1f}s")
    assert m["files_rewritten"] <= per_part

    # --- 3. iceberg deep snapshot chain + executed expiry ---------
    itbl = f"{base}/ice"
    n_snaps = 50
    for i in range(n_snaps):
        write_iceberg(
            spark.range(i * 20, (i + 1) * 20).select(
                F.col("id").alias("k")),
            itbl,
            mode="overwrite" if i % 10 == 0 else "append",
            now_ms=1000 * (i + 1),
        )
    t0 = time.time()
    r = expire_iceberg(itbl, older_than_ms=1000 * (n_snaps - 5),
                       now_ms=10_000_000)
    t_exp = time.time() - t0
    n_live = read_iceberg(spark, itbl).count()
    print(f"iceberg expire: {n_snaps} snapshots -> expired "
          f"{r['expired']} in {t_exp:.1f}s, deleted "
          f"{r['deleted_data_files']} data files / "
          f"{r['deleted_manifests']} manifests / "
          f"{r['deleted_manifest_lists']} lists; current read "
          f"{n_live} rows intact")

    shutil.rmtree(base)


if __name__ == "__main__":
    main()
