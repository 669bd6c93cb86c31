"""Plan-lint: sweep EVERY registry query's physical plan for
scale anti-patterns.

The per-query plan tests (tests/test_plans.py) pin positive
properties of flagship queries; this tool enforces the NEGATIVE
space across the whole registry — the patterns that must never
appear anywhere:

- ``CartesianProduct``: an unbroadcast cross join — quadratic
  shuffle, dead at scale. (BroadcastNestedLoopJoin is the acceptable
  cross shape: its build side is broadcast-small by construction.)
- ``BatchEvalPython``: a row-at-a-time Python UDF — the 10-100x
  slow path. Arrow-batched forms (``ArrowEvalPython``,
  ``MapInPandas``) are fine.

Usage: python tools/audit_plans.py [sf_dir]
Prints one line per offending query and a summary; exit 1 on any hit.
``tests/test_plan_audit.py`` runs the same sweep in the suite.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORBIDDEN = {
    "CartesianProduct": "unbroadcast cross join",
    "BatchEvalPython": "row-at-a-time Python UDF",
}

#: name -> forbidden patterns tolerated there, with justification.
ALLOWLIST: dict[str, set[str]] = {}


def audit(spark, sf_dir: str) -> dict[str, list[str]]:
    """Return {query_name: [offending pattern, ...]} over the whole
    registry (empty dict = clean)."""
    from datawarehouseproject_spark.plans.registry import queries

    bad: dict[str, list[str]] = {}
    for name, fn in sorted(queries().items()):
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001 - report, don't abort sweep
            bad[name] = [f"PLAN ERROR: {type(e).__name__}: {e}"[:200]]
            continue
        hits = [
            f"{pat} ({why})"
            for pat, why in FORBIDDEN.items()
            if pat in plan and pat not in ALLOWLIST.get(name, set())
        ]
        if hits:
            bad[name] = hits
    return bad


def main() -> None:
    from datawarehouseproject_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    bad = audit(spark, sf_dir)
    for name, hits in bad.items():
        print(f"FLAG {name}: {'; '.join(hits)}")
    from datawarehouseproject_spark.plans.registry import queries

    print(
        f"{len(queries()) - len(bad)}/{len(queries())} query plans clean"
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
