"""Registry-wide plan-lint: no scale anti-pattern in ANY query.

Complements tests/test_plans.py (positive flagship pins) with the
negative space over the entire registry — no CartesianProduct
(unbroadcast cross join) and no BatchEvalPython (row-at-a-time
Python UDF) in any of the 160+ physical plans. A regression that
sneaks either into one query fails here by name.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)


@needs_testdata
def test_no_antipatterns_in_any_registry_plan(spark):
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    from audit_plans import audit

    bad = audit(spark, SF_DIR)
    assert bad == {}, f"anti-patterns in {len(bad)} plans: {bad}"
