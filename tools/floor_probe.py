"""Decompose the per-query fixed cost: construction vs analysis vs
execution (guide §1.1 — know where the time goes before touching
anything).

For each named query (or a deterministic sample of the registry),
times three phases over N passes and prints the min of each:

- build  : ``fns[name](spark, sf_dir)`` — py4j plan construction,
  ``load_table`` schema handling, driver-side Python.
- analyze: first access to ``df.columns`` — forces analysis only.
- exec   : noop-sink write — optimization + codegen + job run.

Usage: python tools/floor_probe.py [--passes N] [--sample K] [NAME ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as bench.py).
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
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sample", type=int, default=0)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("floor_probe")
    spark.sparkContext.setLogLevel("ERROR")
    fns = queries()
    names = args.names
    if not names:
        allq = list(fns)
        step = max(1, len(allq) // (args.sample or 16))
        names = allq[::step][: (args.sample or 16)]

    from datawarehouseproject_spark.plans.queries_ref import clear_two_day_cache

    # warmup
    fns[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    tot = {"build": 0.0, "analyze": 0.0, "exec": 0.0}
    for name in names:
        best = {"build": [], "analyze": [], "exec": []}
        for _ in range(args.passes):
            clear_two_day_cache()
            t0 = time.time()
            df = fns[name](spark, sf_dir)
            t1 = time.time()
            _ = df.columns  # analysis only
            t2 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            best["build"].append(t1 - t0)
            best["analyze"].append(t2 - t1)
            best["exec"].append(t3 - t2)
            spark.catalog.clearCache()
            gc.collect()
        b, a, e = (min(best[k]) for k in ("build", "analyze", "exec"))
        tot["build"] += b
        tot["analyze"] += a
        tot["exec"] += e
        print(f"{name:42s} build={b:6.3f} analyze={a:6.3f} exec={e:6.3f}",
              flush=True)
    n = len(names)
    print(f"{'MEAN over ' + str(n):42s} build={tot['build']/n:6.3f} "
          f"analyze={tot['analyze']/n:6.3f} exec={tot['exec']/n:6.3f}")


if __name__ == "__main__":
    main()
