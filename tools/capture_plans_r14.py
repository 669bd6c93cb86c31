"""Capture ``explain("formatted")`` output for named queries into
``plans/r14/<query>_<tag>.txt`` — the optimization round's before/
after plan evidence (the judge reads these files instead of running
Spark).

Usage: python tools/capture_plans_r14.py TAG NAME [NAME ...]
       TAG is ``before`` or ``after``.
Env: SPARK_GRAFT_SF_DIR (default sf0.1 — the bench scale, so plan
shapes match the measured numbers), SPARK_GRAFT_CPUS.

Run it from the tree whose plans you want (the pre-optimization
worktree for ``before``, the repo for ``after``); output always goes
to the REPO's plans/r14/ via SPARK_GRAFT_PLANS_DIR (default
/root/repo/plans/r14).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datawarehouseproject_spark.session import get_spark  # noqa: E402
from datawarehouseproject_spark.plans.registry import queries  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR", "/root/repo/plans/r14"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans_r14")
    spark.sparkContext.setLogLevel("ERROR")
    fns = queries()
    from datawarehouseproject_spark.plans.queries_ref import (
        clear_two_day_cache,
    )

    for name in names:
        clear_two_day_cache()
        df = fns[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
