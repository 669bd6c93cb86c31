"""Query registry, pipeline DAG, and run-ledger control plane.

The reference stores its transformation SQL as *data* in a
``sql_commands`` table and executes by name
(``transform_staging.py:9-22``; SURVEY.md §1.3). The engine's
equivalent is :mod:`.registry`: named query definitions, each a
DataFrame builder plus (where SQL-expressible) an ANSI-SQL twin used
as an independent correctness oracle.
"""

from .registry import QUERIES, QueryDef, register, queries, oracle_sql  # noqa: F401
