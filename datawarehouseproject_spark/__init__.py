"""datawarehouseproject_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of ``trongnghia2406/DataWarehouseProject`` (a MySQL +
Python daily-batch retail price warehouse; see SURVEY.md) as an
idiomatic Spark engine:

- DataFrame/SQL declarative plans over Parquet (Catalyst optimizes;
  no hand-scheduled row loops).
- The reference's stored-procedure ETL (clean -> SCD2 -> dims ->
  aggregate -> marts) recast as set-based, partition-parallel
  operators in :mod:`.operators`.
- The reference's scalar-expression surface (price cleaning, brand
  ladder, Vietnamese date attributes) in :mod:`.functions` — all
  built-in column expressions, zero row-at-a-time UDFs.
- Sources/sinks (CSV landing, partitioned Parquet layers, partition
  overwrite upsert) in :mod:`.sources`.
- Query registry + pipeline DAG + run-ledger (the ``sql_commands`` /
  ``process_log`` control plane analogue) in :mod:`.plans`.
- Incremental/streaming execution (Trigger.AvailableNow landing
  ingestion, stateful sessionization) in :mod:`.streaming`.
- Large-scale training-data operators (dedup families, ANN
  similarity, text analysis, multimodal binary plumbing) in
  :mod:`.operators` as first-class citizens.

Everything is designed for a multi-executor cluster at ~100 TB:
broadcast hints for dims, partition overwrite instead of upsert,
AQE-friendly shuffles, no ``collect()`` in any operator path.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .catalog import Catalog  # noqa: F401
