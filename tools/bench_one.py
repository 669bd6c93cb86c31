"""Isolate one or more queries: time N noop-sink runs + capture the
formatted plan (guide §1.1/§1.4 — measure before changing anything).

Usage: python tools/bench_one.py [--passes N] [--plans-dir DIR] \
           [--suffix before|after] QUERY [QUERY ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Prints one line per query: min/all samples. With --plans-dir, writes
``<dir>/<query>_<suffix>.txt`` containing ``explain('formatted')``
for the judge to check plan claims against.
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
    ap.add_argument("names", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench_one")
    spark.sparkContext.setLogLevel("ERROR")
    fns = queries()
    from datawarehouseproject_spark.plans.queries_ref import (
        clear_two_day_cache,
    )

    for name in args.names:
        if name not in fns:
            print(f"{name}: NOT REGISTERED", flush=True)
            continue
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fns[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(
                args.plans_dir, f"{name}_{args.suffix}.txt"
            )
            with open(out, "w") as fh:
                fh.write(txt)
            spark.catalog.clearCache()
        samples = []
        for _ in range(args.passes):
            clear_two_day_cache()
            spark.sparkContext.setJobDescription(f"bench_one:{name}")
            t0 = time.time()
            fns[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: min={min(samples):.3f}s samples={samples}",
            flush=True,
        )


if __name__ == "__main__":
    main()
