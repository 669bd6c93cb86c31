"""Sources & sinks: CSV landing, partitioned Parquet layers, atomic
overwrite, partition-overwrite upsert."""

from .landing import read_landing_csv, latest_landing_path  # noqa: F401
from .parquet import overwrite_atomic  # noqa: F401
