"""Versioned parquet tables: snapshot isolation, time travel, and a
conflict-detecting (compare-and-swap) commit.

The lakehouse commit pattern (what Delta/Iceberg/Hudi do under the
hood, reduced to its filesystem essentials): every write lands in a
NEW immutable uuid-named data directory, and committing version N
means winning the exclusive creation of the tiny marker file
``_commits/{N}`` whose content names that directory. Properties:

- **snapshot isolation**: a reader that resolved version N keeps a
  consistent view forever — markers and data dirs are immutable, so
  there is NO non-atomic window at all (overwrite_atomic has one
  between its two renames);
- **time travel**: ``read_version(..., version=N)`` reads any
  retained snapshot — the audit/rollback/reproducibility primitive
  (what did the feature table look like when the model trained?);
- **cheap rollback**: restoring version N is a 1-row commit of its
  marker's target, not a data copy;
- **multi-writer safety (CAS)**: the commit is ``os.link`` of a
  fully-written temp marker to ``_commits/{N}`` — atomic
  create-if-absent on POSIX, so EXACTLY ONE writer wins each version
  number. A loser re-reads the head and retries with N+1 using the
  SAME already-written data dir (no data rewrite), so no committed
  version is ever lost. This is Delta Lake's ``_delta_log``
  optimistic-concurrency protocol verbatim (public: Armbrust et al.,
  VLDB 2020), with parquet snapshot dirs in place of action logs.

Crash safety: a writer that dies before its ``os.link`` leaves only
an unreferenced data dir and/or a stale temp marker — both invisible
to readers (resolution goes through ``_commits/`` alone), both
cleared by the next ``vacuum``, and NEITHER blocks subsequent
commits (data dirs are uuid-named, so there is no name collision to
fight over — the round-6 orphan-blocks-commits defect is gone).

On a real deployment ``_commits/`` maps to the transaction log on the
object store (S3 conditional PUT / GCS precondition) or a metastore
row insert with a uniqueness constraint; listing it to find the head
is exactly Delta's log listing. Data dirs are immutable exactly as
object stores want them. ``vacuum`` bounds storage by retaining the
last K versions (a retained reader's version must stay within K —
the same contract Delta's ``VACUUM`` has).

Layout::

    table/
      _commits/1 2 3 ...  <- immutable marker files: data dir name
      d-<uuid>/ ...       <- immutable parquet snapshot dirs
"""

from __future__ import annotations

import datetime
import decimal
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_COMMITS = "_commits"
_STATS = "_stats.json"


def _commits_dir(path: str) -> str:
    return os.path.join(path, _COMMITS)


def _committed_versions(path: str) -> list[int]:
    try:
        names = os.listdir(_commits_dir(path))
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        try:
            out.append(int(n))
        except ValueError:
            continue  # stale .tmp markers from crashed writers
    return sorted(out)


def current_version(path: str) -> int:
    """Latest committed version, 0 if the table doesn't exist yet.

    Lists ONLY the commit log — never data directories — so a
    concurrent writer's in-progress (uncommitted) snapshot is
    invisible, which is the isolation property. (Listing the log to
    find the head is what Delta/Iceberg readers do too.)"""
    vs = _committed_versions(path)
    return vs[-1] if vs else 0


def _resolve_dir(path: str, version: int) -> str | None:
    """Data dir name committed as ``version``, or None."""
    try:
        with open(os.path.join(_commits_dir(path), str(version))) as fh:
            return fh.read().strip()
    except FileNotFoundError:
        return None


def _stat_scalar(v):
    """Parquet-footer statistic → a JSON-storable ORDER-PRESERVING
    scalar. Numbers stay numbers; date/datetime go to ISO-8601 (whose
    lexicographic order IS chronological order); Decimal to str only
    as a last resort (kept only when both bounds share scale — see
    `_keep_file`, which compares like-typed values only)."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:  # normalize: naive-UTC ISO on both
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None  # unorderable as text; file stays un-prunable
    return None


def _gather_stats(dirpath: str, columns: tuple[str, ...]) -> dict:
    """Per-part-file min/max for ``columns``, read from the parquet
    FOOTERS the write already produced (no data re-scan — exactly
    where Delta/Iceberg writers get their add-file stats). A column
    missing footer stats in some file simply has no entry there, and
    pruning keeps that file (conservative)."""
    import pyarrow.parquet as pq

    out = {}
    for name in sorted(os.listdir(dirpath)):
        if not name.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(dirpath, name)).metadata
        names = [meta.schema.column(i).name for i in range(meta.num_columns)]
        fstats: dict = {"rows": meta.num_rows, "columns": {}}
        for col in columns:
            if col not in names:
                continue
            ci = names.index(col)
            lo = hi = None
            ok = True
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                smin, smax = _stat_scalar(st.min), _stat_scalar(st.max)
                if smin is None or smax is None:
                    ok = False
                    break
                lo = smin if lo is None or smin < lo else lo
                hi = smax if hi is None or smax > hi else hi
            if ok and lo is not None:
                fstats["columns"][col] = [lo, hi]
        out[name] = fstats
    return out


def _write_with_stats(
    df: DataFrame, dirpath: str, stats_columns: tuple[str, ...]
) -> None:
    """Parquet-write a snapshot dir; when stats are requested, force
    TIMESTAMP_MICROS output for the write (Spark's default INT96
    timestamps carry NO parquet statistics, so they'd be
    un-prunable — Delta makes the same choice) and drop the footer
    min/max manifest next to the files."""
    spark = df.sparkSession
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key, None)
    try:
        if stats_columns:
            spark.conf.set(key, "TIMESTAMP_MICROS")
        df.write.mode("error").parquet(dirpath)
    finally:
        if stats_columns:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
    if stats_columns:
        stats = _gather_stats(dirpath, tuple(stats_columns))
        with open(os.path.join(dirpath, _STATS), "w") as fh:
            json.dump(stats, fh)


def write_version(
    df: DataFrame,
    path: str,
    max_attempts: int = 1000,
    stats_columns: tuple[str, ...] = (),
) -> int:
    """Commit ``df`` as the next version; returns its number.

    The data write targets a fresh uuid directory no reader can have
    resolved; the commit is one ``os.link`` into the log — atomic
    create-if-absent, so under concurrent writers exactly one wins
    each version number and the loser retries at N+1 with the same
    data dir. A crash at any point leaves only vacuum-collectable
    garbage, never a blocked or half-visible commit.

    ``stats_columns`` enables DATA SKIPPING: per-file min/max for the
    named columns are lifted from the parquet footers into a
    ``_stats.json`` manifest inside the (immutable) data dir BEFORE
    the commit link, so the stats are atomically part of the
    snapshot — the add-file-stats half of a Delta/Iceberg commit.
    Readers prune with :func:`read_version_pruned`."""
    os.makedirs(_commits_dir(path), exist_ok=True)
    dname = f"d-{uuid.uuid4().hex[:12]}"
    _write_with_stats(df, os.path.join(path, dname), stats_columns)
    tmp = os.path.join(_commits_dir(path), f".tmp.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        fh.write(dname)  # marker content complete BEFORE it can win
    try:
        version = current_version(path) + 1
        for _ in range(max_attempts):
            try:
                os.link(tmp, os.path.join(_commits_dir(path), str(version)))
                return version
            except FileExistsError:
                version += 1  # lost the CAS race; data dir is reusable
        raise RuntimeError(
            f"write_version lost {max_attempts} consecutive commit races at {path}"
        )
    finally:
        os.remove(tmp)


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
    dname = _resolve_dir(path, v) if v >= 1 else None
    if dname is None or not os.path.exists(os.path.join(path, dname)):
        raise ValueError(
            f"version {v} not available at {path} "
            f"(latest {latest}; older versions may be vacuumed)"
        )
    return spark.read.parquet(os.path.join(path, dname))


def read_version_pruned(
    spark: SparkSession,
    path: str,
    column: str,
    lower=None,
    upper=None,
    version: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Data-skipping read: open ONLY the part files whose footer
    [min, max] range for ``column`` intersects [``lower``, ``upper``]
    (either bound may be None for half-open). Returns
    ``(df, files_scanned, files_total)``.

    Pruning is CONSERVATIVE, never a filter: a kept file may still
    hold out-of-range rows (the caller applies the exact predicate —
    cheap, since Spark pushes it into the parquet scan), and a file
    with no stats for the column is always kept. So the result is
    always a superset of the matching rows and never misses one —
    the same contract as Delta/Iceberg file skipping, where the
    query's own predicate still runs after the log prune. At 100 TB
    this is the difference between listing a year and reading a day:
    the prune costs one manifest read, no data I/O."""
    latest = current_version(path)
    if latest == 0:
        raise ValueError(f"no committed versions at {path}")
    v = latest if version is None else int(version)
    dname = _resolve_dir(path, v)
    if dname is None or not os.path.exists(os.path.join(path, dname)):
        raise ValueError(f"version {v} not available at {path}")
    dirpath = os.path.join(path, dname)
    lo_b, hi_b = _stat_scalar(lower), _stat_scalar(upper)
    try:
        with open(os.path.join(dirpath, _STATS)) as fh:
            stats = json.load(fh)
    except FileNotFoundError:
        stats = None  # stats-less snapshot (e.g. compacted): full scan
    files = sorted(
        n for n in os.listdir(dirpath) if n.endswith(".parquet")
    )
    if stats is None:
        return spark.read.parquet(dirpath), len(files), len(files)
    keep = [n for n in files if _keep_file(stats.get(n), column, lo_b, hi_b)]
    if not keep:
        return spark.read.parquet(dirpath).limit(0), 0, len(files)
    df = spark.read.parquet(*(os.path.join(dirpath, n) for n in keep))
    return df, len(keep), len(files)


def _pad_date(s):
    """ISO date → its midnight instant, so date-vs-datetime string
    comparisons are chronologically exact (a DATE row compared to a
    timestamp bound IS its midnight)."""
    if isinstance(s, str) and len(s) == 10 and s[4:5] == "-" and s[7:8] == "-":
        return s + "T00:00:00"
    return s


def _keep_file(fstats, column: str, lo, hi) -> bool:
    """True unless the file's stats PROVE no row can match."""
    if not fstats:
        return True
    rng = fstats.get("columns", {}).get(column)
    if rng is None:
        return True
    fmin, fmax = _pad_date(rng[0]), _pad_date(rng[1])
    lo, hi = _pad_date(lo), _pad_date(hi)
    same = type(fmin) is type(fmax)
    num = isinstance(fmin, (int, float)) and isinstance(fmax, (int, float))
    if not (same or num):
        return True  # mixed-type stats: refuse to prune on them

    def cmp_ok(bound, other):
        if isinstance(bound, (int, float)) and isinstance(other, (int, float)):
            return not isinstance(bound, bool) and not isinstance(other, bool)
        return type(bound) is type(other)

    if lo is not None and cmp_ok(lo, fmax) and fmax < lo:
        return False
    if hi is not None and cmp_ok(hi, fmin) and fmin > hi:
        return False
    return True


def vacuum(path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the last ``keep_last`` committed versions, plus
    any unreferenced data dirs and stale temp markers left by crashed
    writers. Returns the dropped version numbers.

    Must not run concurrently with :func:`write_version` — an
    unreferenced data dir is indistinguishable from a writer that
    has written data but not yet linked its marker, so vacuuming
    under a live commit could delete the in-progress snapshot (the
    same reason Delta's VACUUM has a retention horizon). Retained
    READERS are safe at any time provided their version is within
    ``keep_last``."""
    versions = _committed_versions(path)
    cutoff = (versions[-1] - keep_last) if versions else 0
    dropped = []
    for v in versions:
        if v <= cutoff:
            os.remove(os.path.join(_commits_dir(path), str(v)))
            dropped.append(v)
    live = {
        _resolve_dir(path, v) for v in _committed_versions(path)
    }
    for name in os.listdir(path):
        if name.startswith("d-") and name not in live:
            shutil.rmtree(os.path.join(path, name))
    cdir = _commits_dir(path)
    if os.path.isdir(cdir):
        for name in os.listdir(cdir):
            if name.startswith(".tmp."):
                os.remove(os.path.join(cdir, name))
    return sorted(dropped)


def snapshot_file_count(path: str, version: int) -> int:
    """Parquet part-file count of a committed snapshot — the
    small-file metric OPTIMIZE exists to fix."""
    dname = _resolve_dir(path, version)
    if dname is None:
        raise ValueError(f"version {version} not committed at {path}")
    return sum(
        1
        for n in os.listdir(os.path.join(path, dname))
        if n.endswith(".parquet")
    )


def compact_version(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    stats_columns: tuple[str, ...] = (),
) -> int:
    """OPTIMIZE: rewrite the LATEST snapshot's parquet files into
    ``target_files`` larger ones and commit the result as a NEW
    version — no semantic change (the change feed between the two
    versions is empty), so time travel to the pre-compaction version
    still works until vacuumed. This is the first operational need
    of any commit log: every ``write_version`` of a wide job leaves
    one file per task, and a 100 TB table read pays per-file open
    cost forever unless someone rewrites.

    CONFLICT DETECTION, not blind CAS retry: the compacted data is a
    rewrite of version N, so it may only become version N+1. If the
    ``os.link`` loses — a real writer committed N+1 first — retrying
    at N+2 would silently REVERT that writer's data; instead the
    orphaned compacted dir is removed and ``ConflictError`` raised
    for the caller to re-run against the new head. (Delta's OPTIMIZE
    makes the same abort-on-conflict choice for non-commutable
    transactions.)"""
    base = current_version(path)
    if base == 0:
        raise ValueError(f"no committed versions at {path}")
    df = read_version(spark, path, base)
    dname = f"d-{uuid.uuid4().hex[:12]}"
    _write_with_stats(
        df.coalesce(target_files), os.path.join(path, dname), stats_columns
    )
    tmp = os.path.join(_commits_dir(path), f".tmp.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        fh.write(dname)
    try:
        try:
            os.link(tmp, os.path.join(_commits_dir(path), str(base + 1)))
        except FileExistsError:
            shutil.rmtree(os.path.join(path, dname), ignore_errors=True)
            raise ConflictError(
                f"version {base + 1} was committed while compacting "
                f"{base}; re-run against the new head"
            ) from None
    finally:
        os.remove(tmp)
    return base + 1


class ConflictError(RuntimeError):
    """A non-commutable commit (compaction) lost its CAS race to a
    real write and must be re-run against the new head."""
