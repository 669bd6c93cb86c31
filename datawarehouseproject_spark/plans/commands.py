"""Parameterized command registry: the full ``sql_commands``
lifecycle (SURVEY.md §3.2 steps 2-5).

The reference loads SQL texts from a table, binds ``%s`` parameters
driver-side, and executes (``transform_staging.py:9-22``,
``load_staging.py:71-102``). :class:`CommandRegistry` reproduces
that: named MySQL-dialect texts (including the reference's own
utility statements, quoted verbatim from
``db_control_sql.sql:307-352``) are translated by the dialect shim,
parameters are bound as safely-escaped literals, and the result runs
via ``spark.sql`` over registered views.

Write-statements (INSERT/UPDATE on the process log) are control-plane
operations on an append-only ledger here — routed to
:class:`.ledger.RunLedger`, not to SQL (Parquet has no UPDATE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .mysql_shim import translate

#: The reference's utility statements, verbatim
#: (db_control_sql.sql:315-345).
REFERENCE_COMMANDS: dict[str, str] = {
    "COUNT_RUNNING_PROCESS_LOG": (
        "SELECT COUNT(*) AS running_count FROM PROCESS_LOG "
        "WHERE STATUS = 'Running'"
    ),
    "SELECT_PROCESS_ID": "SELECT ID FROM PROCESS WHERE TEN_PROCESS = %s",
    "SELECT_PROCESS_LOG_WAITING": (
        "SELECT ID FROM PROCESS_LOG WHERE ID_PROCESS = %s "
        "AND STATUS = 'WAITING' LIMIT 1"
    ),
}


def _quote(value) -> str:
    """Bind one parameter as a safely-escaped SQL literal."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    escaped = str(value).replace("'", "''")
    return f"'{escaped}'"


class CommandRegistry:
    """Named MySQL-dialect SQL texts with %s parameter binding."""

    def __init__(self, spark: SparkSession, commands: dict[str, str] | None = None):
        self.spark = spark
        self.commands = dict(REFERENCE_COMMANDS)
        if commands:
            self.commands.update(commands)

    def sql_for(self, name: str, *params) -> str:
        text = self.commands[name]
        n = text.count("%s")
        if n != len(params):
            raise ValueError(f"{name} expects {n} params, got {len(params)}")
        for p in params:
            text = text.replace("%s", _quote(p), 1)
        return translate(text)

    def run(self, name: str, *params) -> DataFrame:
        return self.spark.sql(self.sql_for(name, *params))
