"""Declarative data-quality expectations over a frame.

The reference's quality control is COUNT(*) guards around load steps
(check_status.py; SURVEY §2.5 A4) — run, count, compare, abort. This
generalizes to a rule battery evaluated in ONE pass: each expectation
is a boolean Column; the gate reports per-rule violation counts and a
pass flag, so a pipeline can assert-or-abort on the result without
rescanning per rule (rules fold into a single conditional-aggregate
projection — no shuffle at all until the 1-row final agg).

This complements the row-level corpus filters
(:mod:`.corpus` quality rules): those SELECT rows, this VALIDATES a
table and reports.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """Evaluate ``rules`` (name → boolean expectation per row) in one
    scan; returns one row per rule:
    ``(rule, n_rows, n_violations, pass)``.

    A NULL expectation result counts as a violation (unknown is not
    acceptable — the SQL three-valued-logic trap that lets bad rows
    slip through WHERE-based checks).
    """
    aggs = []
    for name, col in rules.items():
        ok = F.coalesce(col.cast("boolean"), F.lit(False))
        aggs.append(
            # coalesce: sum() over an EMPTY frame is NULL, which would
            # make every rule "fail" with n_violations=NULL on a
            # no-new-data day; an empty input passes vacuously
            F.coalesce(
                F.sum(F.when(~ok, 1).otherwise(0)), F.lit(0)
            ).alias(f"__v_{name}")
        )
    counted = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    per_rule = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("__n").alias("n_rows"),
            F.col(f"__v_{name}").alias("n_violations"),
            (F.col(f"__v_{name}") == 0).alias("pass"),
        )
        for name in rules
    ]
    return counted.select(
        F.explode(F.array(*per_rule)).alias("r")
    ).select("r.rule", "r.n_rows", "r.n_violations", "r.pass")


def assert_expectations(df: DataFrame, rules: dict[str, Column]) -> None:
    """Abort (raise) if any rule has violations — the pipeline-guard
    form. Collects only the |rules|-row report, never the data."""
    failed = [
        (r["rule"], r["n_violations"])
        for r in check_expectations(df, rules).collect()
        if not r["pass"]
    ]
    if failed:
        raise AssertionError(f"data-quality expectations failed: {failed}")
