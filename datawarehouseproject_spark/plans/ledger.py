"""Run ledger: the control-plane analogue (db_control).

The reference coordinates its pipeline through MySQL tables —
``process``, ``process_log``, ``crawl_log`` — with COUNT(*) guards
for mutual exclusion and once-per-day idempotency
(SURVEY.md §2.8; check_status.py:19-36, transform_staging.py:151-163,
crawl.py:58-77). Here the ledger is a small Parquet table of run
records appended per stage; the guards are the same COUNT queries as
DataFrame filters.

Design note: at cluster scale a run ledger is driver-side metadata —
tiny, append-only, read at job start. Appending one Parquet file per
run is fine (each append is one small file; compaction is a non-issue
at control-plane volumes).
"""

from __future__ import annotations

import datetime
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("PROCESS", T.StringType()),
        T.StructField("START_TIME", T.TimestampType()),
        T.StructField("END_TIME", T.TimestampType()),
        T.StructField("STATUS", T.StringType()),
        T.StructField("MESSAGE", T.StringType()),
    ]
)

#: Status vocabulary observed in the reference (FIXTURES.md F8).
RUNNING, SUCCESS, FAIL, WAITING = "RUNNING", "SUCCESS", "FAIL", "WAITING"


class RunLedger:
    """Append-only process log with the reference's guard queries."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _read(self) -> DataFrame:
        try:
            return self.spark.read.schema(LEDGER_SCHEMA).parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], LEDGER_SCHEMA)

    def log(
        self,
        process: str,
        status: str,
        message: dict | str = "",
        start: datetime.datetime | None = None,
        end: datetime.datetime | None = None,
    ) -> None:
        """Append one run record; dict messages stored as JSON (the
        reference dumps row-count dicts into MESSAGE,
        load_staging.py:42-45)."""
        now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
        msg = json.dumps(message) if isinstance(message, dict) else message
        row = [(process, start or now, end or now, status, msg)]
        self.spark.createDataFrame(row, LEDGER_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.path)

    def running_count(self, process: str | None = None) -> int:
        """Mutual-exclusion guard (COUNT_RUNNING_PROCESS_LOG,
        db_control_sql.sql:315-317)."""
        df = self._read().filter(F.col("STATUS") == RUNNING)
        if process:
            df = df.filter(F.col("PROCESS") == process)
        return df.count()

    def succeeded_today(self, process: str, today: datetime.date | None = None) -> bool:
        """Once-per-day idempotency guard (check_status.py:19-36)."""
        day = today or datetime.date.today()
        return (
            self._read()
            .filter(
                (F.col("PROCESS") == process)
                & (F.col("STATUS") == SUCCESS)
                & (F.to_date("END_TIME") == F.lit(day))
            )
            .count()
            > 0
        )
