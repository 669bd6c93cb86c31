"""Property-based MERGE INTO check vs a dict reference model.

Hypothesis generates a random target table and a random key-unique
CDC feed (update / delete / insert actions); ``merge_into`` must
produce exactly what the obvious Python dictionary merge produces,
for EVERY combination of matched/unmatched keys and flags.
Examples stay small (one Spark job each); the point is exhaustive
outcome coverage, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datawarehouseproject_spark.operators.merge import merge_into

import pytest

target_strategy = st.dictionaries(
    keys=st.integers(min_value=0, max_value=5),
    values=st.integers(min_value=0, max_value=99),
    max_size=6,
)
# source: key -> (new value, is_delete)
source_strategy = st.dictionaries(
    keys=st.integers(min_value=0, max_value=8),
    values=st.tuples(
        st.integers(min_value=100, max_value=199), st.booleans()
    ),
    max_size=6,
)


def _model(target: dict, source: dict) -> dict:
    out = dict(target)
    for k, (v, is_del) in source.items():
        if k in out:
            if is_del:
                del out[k]
            else:
                out[k] = v
        else:
            # ANSI MERGE: the delete clause binds to WHEN MATCHED
            # only, so an unmatched row inserts regardless of its
            # flag — the operator does the same
            out[k] = v
    return out


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target=target_strategy, source=source_strategy)
def test_merge_matches_dict_model(spark, target, source):
    tdf = spark.createDataFrame(
        [(k, v) for k, v in sorted(target.items())] or [(None, None)],
        "k int, v int",
    ).filter("k IS NOT NULL")
    sdf = spark.createDataFrame(
        [(k, v, d) for k, (v, d) in sorted(source.items())]
        or [(None, None, None)],
        "k int, v int, is_del boolean",
    ).filter("k IS NOT NULL")
    got = {
        r["k"]: r["v"]
        for r in merge_into(
            tdf, sdf, on=["k"], update_cols=["v"], delete_col="is_del"
        ).collect()
    }
    assert got == _model(target, source)
