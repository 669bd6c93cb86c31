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
- **Partition-less WindowExec over an unbounded input** (round-10
  verdict): ``row_number().over(Window.orderBy(...))`` with no
  ``partitionBy`` moves EVERY input row into one partition. Allowed
  only when the window's input is provably bounded — a
  ``TakeOrderedAndProject``/``GlobalLimit``/``CollectLimit``/
  ``WindowGroupLimit`` below it in the plan (the
  ``operators.topk.global_topk`` rank-after-limit shape), or a
  query on the small-by-construction allowlist (months, LSH bands,
  IVF cells, sketch rows).

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

#: Nodes below a partition-less Window that bound its input to a
#: constant row count (the rank-after-limit shape is the sanctioned
#: global-top-k idiom; WindowGroupLimit is Spark 3.5+'s own rank
#: pushdown).
_BOUNDING_NODES = {
    "TakeOrderedAndProject",
    "GlobalLimit",
    "CollectLimit",
    "WindowGroupLimit",
}

#: Queries whose partition-less windows run over frames that are
#: small BY CONSTRUCTION (not data-sized), each with the bound.
GLOBAL_WINDOW_ALLOWLIST: dict[str, str] = {
    "orders_yoy": "lag window over the monthly rollup — |months| rows",
    "cumulative_monthly_revenue": (
        "running total over the monthly rollup — |months| rows"
    ),
    "t_closeness_audit": (
        "global-distribution windows over the acctbal band domain — "
        "m ≈ 11 bands fixed by the schema's value range"
    ),
}


def _iter_nodes(node):
    """Depth-first walk of a SparkPlan py4j node, descending into the
    AQE wrapper's initial plan."""
    stack = [node]
    while stack:
        n = stack.pop()
        yield n
        if n.nodeName() == "AdaptiveSparkPlan":
            try:
                stack.append(n.initialPlan())
            except Exception:  # noqa: BLE001 - older Spark shims
                pass
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))


def _subtree_bounded(window_node) -> bool:
    """True if the window's input subtree contains a bounding node.

    Besides explicit limits, the two-stage prefix-sum idiom
    (``operators/ids.py``: ``dense_ids`` / ``running_total`` /
    ``running_max``) is recognized by its signature: the partition-less
    window runs over an aggregate GROUPED BY ``__pid``
    (``spark_partition_id()``) — at most ``numPartitions`` rows by
    construction. The ``__pid`` name is the repo-wide convention for
    exactly this idiom; anything else must be allowlisted by query
    name with a documented bound.

    A bounding node only counts on the row-preserving SPINE: the walk
    does not descend through joins/unions/generators, because a limit
    on one (small) side of a join says nothing about the joined
    frame's cardinality (review r11 — a broadcast(small.limit(5))
    build side must not whitewash a window over the data-sized probe
    side).
    """
    blocked = ("Join", "Union", "Generate", "Expand", "CartesianProduct")
    stack = []
    ch = window_node.children()
    for i in range(ch.size()):
        stack.append(ch.apply(i))
    while stack:
        d = stack.pop()
        name = d.nodeName()
        if name in _BOUNDING_NODES:
            return True
        if name.endswith("Aggregate") and _pid_keyed(d):
            return True
        if any(b in name for b in blocked):
            continue
        if name == "AdaptiveSparkPlan":
            try:
                stack.append(d.initialPlan())
            except Exception:  # noqa: BLE001 - older Spark shims
                pass
        dch = d.children()
        for i in range(dch.size()):
            stack.append(dch.apply(i))
    return False


_PID_KEYS_RE = None


def _pid_keyed(agg_node) -> bool:
    """True iff ``__pid`` appears in the aggregate's GROUPING KEYS —
    not merely anywhere in the node string (review r11 pass 2: an
    aggregate keyed on a data-sized column whose child happens to
    carry a __pid attribute must not whitewash the window)."""
    global _PID_KEYS_RE
    if _PID_KEYS_RE is None:
        import re

        _PID_KEYS_RE = re.compile(r"keys=\[[^\]]*__pid")
    return bool(_PID_KEYS_RE.search(agg_node.simpleString(20)))


def _unbounded_global_windows(root) -> int:
    """Count partition-less Window nodes with no bounding descendant."""
    hits = 0
    for n in _iter_nodes(root):
        if n.nodeName() == "Window" and n.partitionSpec().isEmpty():
            if not _subtree_bounded(n):
                hits += 1
    return hits


def audit(spark, sf_dir: str) -> dict[str, list[str]]:
    """Return {query_name: [offending pattern, ...]} over the whole
    registry (empty dict = clean)."""
    from datawarehouseproject_spark.plans.registry import queries

    bad: dict[str, list[str]] = {}
    for name, fn in sorted(queries().items()):
        try:
            root = fn(spark, sf_dir)._jdf.queryExecution().executedPlan()
            plan = root.toString()
        except Exception as e:  # noqa: BLE001 - report, don't abort sweep
            bad[name] = [f"PLAN ERROR: {type(e).__name__}: {e}"[:200]]
            continue
        hits = [
            f"{pat} ({why})"
            for pat, why in FORBIDDEN.items()
            if pat in plan and pat not in ALLOWLIST.get(name, set())
        ]
        if name not in GLOBAL_WINDOW_ALLOWLIST:
            try:
                n = _unbounded_global_windows(root)
            except Exception as e:  # noqa: BLE001
                n = 0
                hits.append(
                    f"WINDOW AUDIT ERROR: {type(e).__name__}: {e}"[:200]
                )
            if n:
                hits.append(
                    f"{n} partition-less Window(s) over unbounded input "
                    "(single-partition global sort)"
                )
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
