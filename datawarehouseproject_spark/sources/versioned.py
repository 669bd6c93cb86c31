"""Versioned parquet tables: snapshot isolation + time travel.

The lakehouse commit pattern (what Delta/Iceberg/Hudi do under the
hood, reduced to its filesystem essentials): every write lands in a
NEW immutable directory ``v{N}`` and a tiny ``_VERSION`` manifest is
swapped atomically to point at it. Properties this buys over the
rewrite-in-place swap of :func:`.parquet.overwrite_atomic`:

- **snapshot isolation**: a reader that resolved version N keeps a
  consistent view forever — the writer never touches vN's files, so
  there is NO non-atomic window at all (overwrite_atomic has one
  between its two renames);
- **time travel**: ``read_version(..., version=N)`` reads any
  retained snapshot — the audit/rollback/reproducibility primitive
  (what did the feature table look like when the model trained?);
- **cheap rollback**: restoring version N is a manifest write, not a
  data copy.

On a real deployment the manifest swap maps to a metastore/catalog
pointer update; directories are immutable exactly as object stores
want them. ``vacuum`` bounds storage by retaining the last K
versions (a retained reader's version must stay within K — the same
contract Delta's ``VACUUM`` has).

Layout::

    table/
      _VERSION            <- text file: latest committed N
      v1/ ... v2/ ...     <- immutable parquet snapshot dirs
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_VERSION"


def _manifest_path(path: str) -> str:
    return os.path.join(path, _MANIFEST)


def current_version(path: str) -> int:
    """Latest committed version, 0 if the table doesn't exist yet.

    Reads ONLY the manifest — never lists data directories, so a
    concurrent writer's in-progress (uncommitted) version dir is
    invisible, which is the isolation property."""
    try:
        with open(_manifest_path(path)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return 0


def write_version(df: DataFrame, path: str) -> int:
    """Commit ``df`` as the next version; returns its number.

    The data write targets a version directory no reader can have
    resolved yet; the commit is the manifest swap (write-to-temp +
    ``os.rename``, atomic on POSIX). A crash before the rename
    leaves an orphaned uncommitted dir that the next ``vacuum``
    clears — readers never see it because version resolution goes
    through the manifest alone."""
    os.makedirs(path, exist_ok=True)
    version = current_version(path) + 1
    vdir = os.path.join(path, f"v{version}")
    df.write.mode("error").parquet(vdir)
    tmp = os.path.join(path, f"._VERSION.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.rename(tmp, _manifest_path(path))
    return version


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a specific snapshot (``version``) or the latest one.

    Raises ``ValueError`` for a version that was never committed or
    has been vacuumed — a silent fallback to 'latest' would be a
    reproducibility bug, not a convenience."""
    latest = current_version(path)
    if latest == 0:
        raise ValueError(f"no committed versions at {path}")
    v = latest if version is None else int(version)
    vdir = os.path.join(path, f"v{v}")
    if v < 1 or v > latest or not os.path.exists(vdir):
        raise ValueError(
            f"version {v} not available at {path} "
            f"(latest {latest}; older versions may be vacuumed)"
        )
    return spark.read.parquet(vdir)


def vacuum(path: str, keep_last: int = 2) -> list[int]:
    """Drop data dirs of all but the last ``keep_last`` committed
    versions (plus any uncommitted orphans beyond the manifest).
    Returns the dropped version numbers.

    SINGLE-WRITER contract (shared by every sink in this package):
    vacuum must not run concurrently with :func:`write_version` — a
    dir numbered past the manifest is indistinguishable from a
    crashed writer's orphan, so vacuuming under a live commit would
    delete the in-progress snapshot. Retained READERS are safe at
    any time provided their version is within ``keep_last``."""
    latest = current_version(path)
    dropped = []
    for name in sorted(os.listdir(path)):
        if name.startswith("._VERSION."):
            # temp manifest from a commit that crashed before its
            # rename — nothing else ever cleans these (review r6)
            os.remove(os.path.join(path, name))
            continue
        if not name.startswith("v"):
            continue
        try:
            v = int(name[1:])
        except ValueError:
            continue
        if v <= latest - keep_last or v > latest:
            shutil.rmtree(os.path.join(path, name))
            dropped.append(v)
    return sorted(dropped)
