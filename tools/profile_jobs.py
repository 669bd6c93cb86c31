"""Per-query Spark job/stage counts + wall time (guide §1.1/§7 —
every AQE stage materialization is a scheduled job at ~50-90 ms of
fixed overhead on local[32]; job count is the cheap proxy for plan
restructuring wins that per-pass wall noise hides).

For each named query (or the full registry), runs the query once
warm (untimed) then once timed, and reports the delta of
``sc.statusTracker`` job ids plus wall seconds.

Usage: python tools/profile_jobs.py [--top K] [NAME ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datawarehouseproject_spark.session import get_spark  # noqa: E402
from datawarehouseproject_spark.plans.registry import queries  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--top", type=int, default=0,
                    help="print only the K highest-job-count queries")
    ap.add_argument("--warm", action="store_true",
                    help="run each query once untimed before measuring")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_jobs")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    fns = queries()
    names = args.names or list(fns)

    from datawarehouseproject_spark.plans.queries_ref import (
        clear_two_day_cache,
    )

    rows = []
    for name in names:
        if name not in fns:
            print(f"{name}: NOT REGISTERED", flush=True)
            continue
        if args.warm:
            clear_two_day_cache()
            fns[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            spark.catalog.clearCache()
            gc.collect()
        clear_two_day_cache()
        before = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.time()
        fns[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.time() - t0
        after = set(tracker.getJobIdsForGroup(None) or [])
        n_jobs = len(after - before)
        rows.append((name, n_jobs, wall))
        if not args.top:
            print(f"{name:45s} jobs={n_jobs:4d} wall={wall:6.2f}s",
                  flush=True)
        spark.catalog.clearCache()
        gc.collect()

    if args.top:
        rows.sort(key=lambda r: -r[1])
        for name, n_jobs, wall in rows[: args.top]:
            print(f"{name:45s} jobs={n_jobs:4d} wall={wall:6.2f}s")
    tot_jobs = sum(r[1] for r in rows)
    tot_wall = sum(r[2] for r in rows)
    print(f"TOTAL {len(rows)} queries: jobs={tot_jobs} wall={tot_wall:.1f}s")


if __name__ == "__main__":
    main()
