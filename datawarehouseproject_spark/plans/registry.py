"""Named-query registry (the ``sql_commands`` analogue).

Every operator of SURVEY.md §2 — and every beyond-reference
training-data operator — registers here as a named query:

- ``fn(spark, sf_dir) -> DataFrame``: the engine's DataFrame plan.
- ``oracle``: equivalent ANSI SQL that DuckDB runs over the same
  Parquet tables, or None for genuinely non-SQL-expressible ops
  (custom stateful streaming etc.) where the driver records a
  rows-only check.

Column names and types are aligned pairwise: every computed column is
aliased identically on both sides, integer-typed derivations are cast
explicitly (DuckDB's ``year()`` returns BIGINT, Spark's returns INT),
and floating aggregates either run in exact DECIMAL then cast to
DOUBLE, or are rounded, so order-of-accumulation noise can't flip the
value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QueryDef(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from . import queries_ref  # noqa: F401
    from . import queries_data  # noqa: F401
    from . import queries_ext  # noqa: F401
    from . import queries_corpus  # noqa: F401
    from . import queries_tpch  # noqa: F401
    from . import queries_tpch2  # noqa: F401
    from . import queries_analytics  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: qd.fn for name, qd in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle}
