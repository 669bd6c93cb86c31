"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs the engine's headline queries (reference surface + training-data
operators) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Each query is forced end-to-end with the noop sink (full computation,
no collect-to-driver cost in the measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datawarehouseproject_spark.session import get_spark  # noqa: E402
from datawarehouseproject_spark.plans.registry import queries  # noqa: E402

# Bench EVERY registry query — the no-silent-caps policy (VERDICT r5
# flagged the heaviest queries as silently absent from the timed
# list). The flagship reference surface runs first (warmup target =
# first entry = pricing_summary, the registry's first registration);
# everything else follows in registry order.
HEADLINE = list(queries())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    fns = queries()

    # warm the paths the measured queries actually exercise by running
    # the FIRST headline query once, untimed: JVM/codegen init, the
    # lineitem parquet reader, shuffle machinery, and the noop sink all
    # pay their one-time costs here instead of inflating the flagship
    # row (r4: pricing_summary was the lone regression purely from
    # running first; the old region-table warmup was too small to
    # cover the reader/shuffle init it needed)
    fns[HEADLINE[0]](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = fns[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s", file=sys.stderr)
        # drop caches the query pinned (operators cache() for intra-job
        # reuse but the blocks outlive the job): without this, storage
        # memory fills over the run and late queries pay eviction + GC
        # pressure for earlier queries' dead blocks (observed: minhash
        # at 24s mid-run vs 6.6s isolated, same code, same data)
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Host-contention transparency: this container shares a host, and
    # observed 1-min load has swung 0.1 -> 14 between runs with the
    # SAME code (r8->r9: identical queries 2-5x slower under load).
    # Record the load triple so cross-round comparisons can tell a
    # regression from a noisy neighbor.
    try:
        load1, load5, load15 = os.getloadavg()
    except OSError:
        load1 = load5 = load15 = -1.0
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "host_load_1m_5m_15m": [
            round(load1, 2), round(load5, 2), round(load15, 2),
        ],
    }
    full_line = json.dumps(payload)
    # The driver captures a bounded tail of the output; in round 5 the
    # single ~4 KB JSON line had its HEAD cut by that window (VERDICT
    # r5: BENCH_r05.json parsed:null).  Emit three redundant forms so
    # any capture parses:
    #   1. the full JSON (with per-query timings) as the FIRST stdout
    #      line,
    #   2. the same object persisted to BENCH.json next to this script,
    #   3. a compact LAST line small enough to always fit whole in a
    #      tail window (metric/value/unit/sf + a pointer to the file).
    print(full_line)
    bench_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH.json"
    )
    try:
        with open(bench_path, "w") as fh:
            json.dump(payload, fh, indent=1)
            fh.write("\n")
    except OSError as exc:  # never let the artifact write kill the run
        print(f"# BENCH.json write failed: {exc}", file=sys.stderr)
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "queries_file": "BENCH.json",
            }
        )
    )


if __name__ == "__main__":
    main()
