"""Native Delta Lake table directories: WRITE from a DataFrame,
READ back as a DataFrame — the switch-over surface for a user whose
lake already speaks Delta (the triage readers in
``functions/delta_log.py`` serve the bundle/forensics path; this
module serves ``spark.read``-shaped access to a real ``_delta_log``
directory).

Protocol scope (Delta PROTOCOL.md, public): JSON commits only —
``commitInfo`` / ``protocol`` (1/2) / ``metaData`` / ``add`` /
``remove`` — with per-file numRecords in add-action stats.  A
``_last_checkpoint`` written by another engine is a LOUD boundary
(silently ignoring it would replay a vacuumed log prefix as the
whole table); logs this module writes never need one at fixture
scale, and the replay cost is one small JSON per commit.

Scale posture: the data write is a normal distributed
``df.write.parquet``; only the COMMIT is driver-side — one parquet
footer read per new file for stats and one JSON rename, the same
shape every production Delta writer has (the driver finalizes, the
cluster writes).  Reads prune like any parquet scan: the log replay
yields live file paths, and Spark's own pushdown applies below them.
Commit atomicity = atomic rename of the ``<version>.json`` — the
local-fs assumption the repo's swap sink already documents; object
stores need a coordinating commit service, which is out of scope
here and fenced by the rename-must-create semantics."""

from __future__ import annotations

import io
import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_delta_log"
_COMMIT_RE = re.compile(r"^(\d{20})\.json$")


def _log_versions(path: str) -> list[int]:
    log = os.path.join(path, _LOG)
    if not os.path.isdir(log):
        return []
    for n in os.listdir(log):
        if n == "_last_checkpoint" or ".checkpoint." in n:
            raise ValueError(
                "checkpointed delta log unsupported by the native "
                "reader (boundary: ignoring it would drop state)"
            )
    versions = sorted(
        int(m.group(1))
        for n in os.listdir(log)
        if (m := _COMMIT_RE.match(n))
    )
    if versions != list(range(len(versions))):
        raise ValueError("delta log has version gaps")
    return versions


def _file_stats(table_path: str, rel: str) -> str:
    """numRecords + per-column min/max lifted from the parquet
    footer (row-group stats aggregated) — one footer read per new
    file, driver-side, exactly a production writer's commit cost."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(os.path.join(table_path, rel)).metadata
    mins: dict = {}
    maxs: dict = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            st = col.statistics
            name = col.path_in_schema
            if st is None or not st.has_min_max or "." in name:
                continue
            lo, hi = st.min, st.max
            if isinstance(lo, bytes):
                continue  # binary stats are writer-dependent; skip
            if name not in mins or lo < mins[name]:
                mins[name] = lo
            if name not in maxs or hi > maxs[name]:
                maxs[name] = hi
    return json.dumps(
        {"numRecords": md.num_rows, "minValues": mins,
         "maxValues": maxs},
        default=str,
    )


def _stage_and_place(
    df: DataFrame, path: str, version: int,
    partition_by: list[str] | None,
) -> list[tuple[str, dict]]:
    """Distributed parquet write into a staging dir, then
    deterministic rename into the table root (Hive layout under
    partitioning).  Returns [(relative path, partitionValues)]."""
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex[:12]}")
    writer = df.write
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    placed = []
    i = 0
    for dirpath, _dnames, fnames in sorted(os.walk(staging)):
        reldir = os.path.relpath(dirpath, staging)
        pvals: dict = {}
        if reldir != ".":
            for seg in reldir.split(os.sep):
                if "=" not in seg:
                    raise ValueError("staging layout not hive-shaped")
                k, _, v = seg.partition("=")
                if v == "__HIVE_DEFAULT_PARTITION__":
                    raise ValueError(
                        "null partition values unsupported by the "
                        "native writer (boundary)"
                    )
                pvals[k] = v
        for name in sorted(fnames):
            if not name.endswith(".parquet"):
                continue
            rel = f"part-{version:05d}-{i:05d}.parquet"
            if reldir != ".":
                rel = f"{reldir}/{rel}"
                os.makedirs(
                    os.path.join(path, reldir), exist_ok=True
                )
            os.rename(os.path.join(dirpath, name),
                      os.path.join(path, rel))
            placed.append((rel, pvals))
            i += 1
    import shutil

    shutil.rmtree(staging)
    return placed


def write_delta(
    df: DataFrame,
    path: str,
    mode: str = "append",
    now_ms: int = 0,
    partition_by: list[str] | None = None,
) -> int:
    """Commit ``df`` to the Delta table at ``path`` and return the
    new version.  ``mode='append'`` adds files; ``mode='overwrite'``
    also writes a ``remove`` tombstone for every previously-live
    file.  ``partition_by`` (first commit only) lays data out
    Hive-style and records ``partitionValues`` on every add action —
    the log-level pruning handle ``read_delta(where=...)`` uses.
    ``now_ms`` stamps commitInfo/deletionTimestamp (callers pass a
    deterministic clock in tests/fixtures)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"write mode {mode!r} unsupported")
    spark = df.sparkSession
    versions = _log_versions(path)
    version = len(versions)
    prev_live = []
    if version:
        _live, _schema, prev_pcols = _replay_full(path, None)
        if partition_by is not None \
                and list(partition_by) != prev_pcols:
            raise ValueError(
                "partition_by drift against the table's layout"
            )
        partition_by = prev_pcols or None
        if mode == "overwrite":
            prev_live = sorted(_live)
    placed = _stage_and_place(df, path, version, partition_by)
    rels = [rel for rel, _ in placed]
    lines = [json.dumps({"commitInfo": {
        "operation": "WRITE",
        "operationParameters": {"mode": mode.capitalize()},
        "timestamp": now_ms,
        "operationMetrics": {"numFiles": str(len(rels))},
    }})]
    if version == 0:
        lines.append(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 2,
        }}))
        lines.append(json.dumps({"metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": df.schema.json(),
            "partitionColumns": list(partition_by or []),
            "configuration": {},
        }}))
    for rel in prev_live:
        lines.append(json.dumps({"remove": {
            "path": rel, "deletionTimestamp": now_ms,
            "dataChange": True,
        }}))
    for rel, pvals in placed:
        lines.append(json.dumps({"add": {
            "path": rel,
            "partitionValues": pvals,
            "size": os.path.getsize(os.path.join(path, rel)),
            "dataChange": True,
            "stats": _file_stats(path, rel),
        }}))
    log_dir = os.path.join(path, _LOG)
    os.makedirs(log_dir, exist_ok=True)
    tmp = os.path.join(log_dir, f".tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    final = os.path.join(log_dir, f"{version:020d}.json")
    if os.path.exists(final):
        os.remove(tmp)
        raise ValueError(f"delta version {version} already committed")
    os.rename(tmp, final)
    return version


def _replay_full(path: str, version: int | None):
    """Log replay to ({live rel path: (partitionValues, stats json)},
    schemaString, partitionColumns) at ``version`` (None = latest)."""
    versions = _log_versions(path)
    if not versions:
        raise ValueError(f"no delta log at {path}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"delta version {version} does not exist")
    live: dict[str, tuple] = {}
    schema_str = None
    pcols: list[str] = []
    for v in versions:
        if v > version:
            break
        with open(os.path.join(path, _LOG, f"{v:020d}.json")) as fh:
            for line in fh:
                if not line.strip():
                    continue
                act = json.loads(line)
                if not isinstance(act, dict) or len(act) != 1:
                    raise ValueError("delta log action malformed")
                if "metaData" in act:
                    md = act["metaData"]
                    schema_str = md.get("schemaString")
                    pc = md.get("partitionColumns", [])
                    if not isinstance(pc, list):
                        raise ValueError("partitionColumns malformed")
                    pcols = [str(c) for c in pc]
                elif "add" in act:
                    add = act["add"]
                    rel = add.get("path")
                    if not isinstance(rel, str):
                        raise ValueError("add path malformed")
                    pv = add.get("partitionValues", {})
                    if not isinstance(pv, dict):
                        raise ValueError("partitionValues malformed")
                    live[rel] = (pv, add.get("stats"))
                elif "remove" in act:
                    rel = act["remove"].get("path")
                    if not isinstance(rel, str):
                        raise ValueError("remove path malformed")
                    live.pop(rel, None)
    if not isinstance(schema_str, str):
        raise ValueError("delta log missing metaData schemaString")
    return live, schema_str, pcols


def _replay(path: str, version: int | None):
    """(live relative paths, schemaString) — the pre-partitioning
    call shape, kept for the existing call sites."""
    live, schema_str, _pcols = _replay_full(path, version)
    return set(live), schema_str


def read_delta(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    where: dict | None = None,
) -> DataFrame:
    """The Delta table at ``path`` as a DataFrame — log replay to
    the live file set (optionally AT a past version: time travel),
    then a schema-pinned parquet scan over exactly those files, so
    Catalyst's pushdown/pruning applies untouched below the log
    layer.

    ``where`` = {partition column: string value} prunes files AT THE
    LOG LAYER via each add action's ``partitionValues`` — the whole
    point of a partitioned Delta table at 100 TB: the reader never
    lists, opens, or plans the other partitions' files.  Keys must
    be declared partition columns (a typo would silently scan
    everything).  Partition column values come back from the Hive
    directory layout (``basePath``), same as any partitioned scan."""
    from pyspark.sql import types as T

    live, schema_str, pcols = _replay_full(path, version)
    schema = T.StructType.fromJson(json.loads(schema_str))
    if where:
        for k in where:
            if k not in pcols:
                raise ValueError(
                    f"{k!r} is not a partition column of this table"
                )
        live = {
            rel: meta for rel, meta in live.items()
            if all(meta[0].get(k) == str(v) for k, v in where.items())
        }
    if not live:
        return spark.createDataFrame([], schema)
    reader = spark.read.schema(schema)
    if pcols:
        reader = reader.option("basePath", path)
    return reader.parquet(
        *[os.path.join(path, rel) for rel in sorted(live)]
    )


def merge_delta(
    path: str,
    updates: DataFrame,
    key_col: str,
    now_ms: int = 0,
) -> dict:
    """UPSERT (``MERGE INTO ... WHEN MATCHED UPDATE SET * WHEN NOT
    MATCHED INSERT *``) into the native Delta table at ``path``.

    The copy-on-write shape every Delta engine runs:

    1. plan: candidate files = live files whose stats window on
       ``key_col`` CONTAINS at least one update key — decided by a
       broadcast join of the update keys against the (bounded,
       driver-held) per-file windows, so a global [min, max] overlap
       never inflates the rewrite set (insert-heavy updates extend
       the range but match no window).  Files the merge cannot touch
       are never read OR rewritten — at 100 TB the rewrite set, not
       the table, is the cost;
    2. rewrite: candidates' rows anti-joined against the update keys
       (distributed), unioned with ALL update rows, written as new
       files;
    3. commit: remove each candidate, add the rewrites — one atomic
       log entry.

    Stats are REQUIRED on candidates (a file without a key window
    would have to be rewritten pessimistically; this writer always
    records stats, so their absence means foreign/corrupt log —
    loud).  Returns rewrite metrics.  Unpartitioned tables only
    (boundary: partition-aware merge routing is the next layer)."""
    spark = updates.sparkSession
    versions = _log_versions(path)
    if not versions:
        raise ValueError(f"no delta log at {path}")
    live, schema_str, pcols = _replay_full(path, None)
    if pcols:
        raise ValueError(
            "merge into a partitioned table unsupported (boundary)"
        )
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(json.loads(schema_str))
    if updates.schema != schema:
        raise ValueError("updates schema differs from the table's")
    if updates.agg(F.count(key_col)).first()[0] == 0:
        raise ValueError("updates carry no rows (or null keys)")
    windows = []
    for rel, (_pv, stats_raw) in sorted(live.items()):
        if not isinstance(stats_raw, str):
            raise ValueError("live file without stats (foreign log)")
        st = json.loads(stats_raw)
        fmin = st.get("minValues", {}).get(key_col)
        fmax = st.get("maxValues", {}).get(key_col)
        if fmin is None or fmax is None:
            raise ValueError(
                f"stats missing the merge key window for {rel!r}"
            )
        if isinstance(fmin, bool) or isinstance(fmax, bool)                 or not isinstance(fmin, (int, float, str))                 or type(fmin) is not type(fmax):
            raise ValueError("merge key window not comparable")
        windows.append((rel, fmin, fmax))
    key_type = schema[key_col].dataType
    win_df = spark.createDataFrame(
        windows,
        T.StructType([
            T.StructField("_rel", T.StringType()),
            T.StructField("_lo", key_type),
            T.StructField("_hi", key_type),
        ]),
    )
    touched_rows = (
        updates.select(key_col)
        .join(
            F.broadcast(win_df),
            (F.col(key_col) >= F.col("_lo"))
            & (F.col(key_col) <= F.col("_hi")),
        )
        .select("_rel").distinct().collect()
    )  # bounded: one row per touched FILE
    candidates = sorted(r["_rel"] for r in touched_rows)
    untouched = len(live) - len(candidates)
    version = len(versions)
    new_rows = updates
    if candidates:
        current = spark.read.schema(schema).parquet(
            *[os.path.join(path, rel) for rel in candidates]
        )
        kept = current.join(
            updates.select(key_col), on=key_col, how="left_anti"
        ).select(*[f.name for f in schema.fields])
        new_rows = kept.unionByName(
            updates.select(*[f.name for f in schema.fields])
        )
    placed = _stage_and_place(new_rows, path, version, None)
    lines = [json.dumps({"commitInfo": {
        "operation": "MERGE",
        "operationParameters": {"predicate": key_col},
        "timestamp": now_ms,
        "operationMetrics": {
            "numTargetFilesRemoved": str(len(candidates)),
            "numTargetFilesAdded": str(len(placed)),
        },
    }})]
    for rel in candidates:
        lines.append(json.dumps({"remove": {
            "path": rel, "deletionTimestamp": now_ms,
            "dataChange": True,
        }}))
    for rel, pvals in placed:
        lines.append(json.dumps({"add": {
            "path": rel,
            "partitionValues": pvals,
            "size": os.path.getsize(os.path.join(path, rel)),
            "dataChange": True,
            "stats": _file_stats(path, rel),
        }}))
    log_dir = os.path.join(path, _LOG)
    tmp = os.path.join(log_dir, f".tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    final = os.path.join(log_dir, f"{version:020d}.json")
    if os.path.exists(final):
        os.remove(tmp)
        raise ValueError(f"delta version {version} already committed")
    os.rename(tmp, final)
    return {
        "version": version,
        "files_rewritten": len(candidates),
        "files_untouched": untouched,
        "files_added": len(placed),
    }


def optimize_delta(
    path: str, target_rows: int, now_ms: int = 0
) -> dict:
    """OPTIMIZE (small-file compaction) on the native Delta table:
    sequential-bin-pack the live files into ~``target_rows`` groups
    (same packing rule as ``operators/maintenance.py:
    plan_compaction`` — deterministic path order, ``floor((running -
    w) / target)``), rewrite each MULTI-file group into one file,
    and commit removes+adds with ``dataChange=false`` (the flag that
    keeps change-data-feed and incremental readers from replaying a
    compaction as new data).  Single-file groups are never churned.
    Row content must be invariant — the reader before and after sees
    the same table, which the registry oracle pins."""
    if target_rows <= 0:
        raise ValueError("target_rows must be positive")
    versions = _log_versions(path)
    if not versions:
        raise ValueError(f"no delta log at {path}")
    live, schema_str, pcols = _replay_full(path, None)
    if pcols:
        raise ValueError(
            "optimize on a partitioned table unsupported (boundary)"
        )
    from pyspark.sql import SparkSession
    from pyspark.sql import types as T

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise ValueError("optimize needs an active SparkSession")
    schema = T.StructType.fromJson(json.loads(schema_str))
    groups: list[list[str]] = []
    running = 0
    for rel in sorted(live):
        stats_raw = live[rel][1]
        if not isinstance(stats_raw, str):
            raise ValueError("live file without stats (foreign log)")
        nrec = json.loads(stats_raw).get("numRecords")
        if not isinstance(nrec, int) or isinstance(nrec, bool) \
                or nrec < 0:
            raise ValueError("numRecords malformed")
        gid = running // target_rows
        running += nrec
        while gid >= len(groups):
            # an oversized file can skip group ids entirely — pad
            # with empty groups (filtered below) instead of indexing
            # past the end
            groups.append([])
        groups[gid].append(rel)
    to_rewrite = [g for g in groups if len(g) > 1]
    version = len(versions)
    removed: list[str] = []
    placed_all: list[tuple[str, dict]] = []
    for gi, group in enumerate(to_rewrite):
        merged = spark.read.schema(schema).parquet(
            *[os.path.join(path, rel) for rel in group]
        ).coalesce(1)
        placed = _stage_and_place(merged, path, version, None)
        # disambiguate file names across groups of one commit
        fixed = []
        for rel, pv in placed:
            new_rel = rel.replace(".parquet", f"-g{gi:03d}.parquet")
            os.rename(os.path.join(path, rel),
                      os.path.join(path, new_rel))
            fixed.append((new_rel, pv))
        placed_all.extend(fixed)
        removed.extend(group)
    lines = [json.dumps({"commitInfo": {
        "operation": "OPTIMIZE",
        "operationParameters": {"targetRows": str(target_rows)},
        "timestamp": now_ms,
        "operationMetrics": {
            "numRemovedFiles": str(len(removed)),
            "numAddedFiles": str(len(placed_all)),
        },
    }})]
    for rel in removed:
        lines.append(json.dumps({"remove": {
            "path": rel, "deletionTimestamp": now_ms,
            "dataChange": False,
        }}))
    for rel, pvals in placed_all:
        lines.append(json.dumps({"add": {
            "path": rel,
            "partitionValues": pvals,
            "size": os.path.getsize(os.path.join(path, rel)),
            "dataChange": False,
            "stats": _file_stats(path, rel),
        }}))
    log_dir = os.path.join(path, _LOG)
    tmp = os.path.join(log_dir, f".tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    final = os.path.join(log_dir, f"{version:020d}.json")
    if os.path.exists(final):
        os.remove(tmp)
        raise ValueError(f"delta version {version} already committed")
    os.rename(tmp, final)
    return {
        "version": version,
        "files_before": len(live),
        "files_removed": len(removed),
        "files_added": len(placed_all),
        "files_after": len(live) - len(removed) + len(placed_all),
    }


def delete_delta(
    path: str,
    key_col: str,
    lo,
    hi,
    now_ms: int = 0,
) -> dict:
    """Range DELETE (``DELETE WHERE lo <= key <= hi``) on the native
    Delta table — the third DML verb beside append/overwrite and
    MERGE, same copy-on-write shape: stats-prune to the files whose
    key window OVERLAPS [lo, hi], rewrite each with the matching
    rows filtered out (a rewrite that comes back EMPTY is a pure
    remove — no zero-row file is committed), remove+add in one
    commit.  Files outside the range are untouched — at 100 TB a
    date-range retention delete touches only the expired files."""
    if lo is None or hi is None or lo > hi:
        raise ValueError("delete range malformed")
    versions = _log_versions(path)
    if not versions:
        raise ValueError(f"no delta log at {path}")
    live, schema_str, pcols = _replay_full(path, None)
    if pcols:
        raise ValueError(
            "delete on a partitioned table unsupported (boundary)"
        )
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise ValueError("delete needs an active SparkSession")
    schema = T.StructType.fromJson(json.loads(schema_str))
    candidates = []
    untouched = 0
    for rel, (_pv, stats_raw) in sorted(live.items()):
        if not isinstance(stats_raw, str):
            raise ValueError("live file without stats (foreign log)")
        st = json.loads(stats_raw)
        fmin = st.get("minValues", {}).get(key_col)
        fmax = st.get("maxValues", {}).get(key_col)
        if fmin is None or fmax is None:
            raise ValueError(
                f"stats missing the delete key window for {rel!r}"
            )
        if isinstance(fmin, bool) or isinstance(fmax, bool)                 or not isinstance(fmin, type(lo))                 or not isinstance(fmax, type(hi)):
            raise ValueError("delete key window not comparable")
        if fmax < lo or fmin > hi:
            untouched += 1
        else:
            candidates.append(rel)
    version = len(versions)
    placed: list[tuple[str, dict]] = []
    if candidates:
        kept = spark.read.schema(schema).parquet(
            *[os.path.join(path, rel) for rel in candidates]
        ).filter(
            ~((F.col(key_col) >= F.lit(lo))
              & (F.col(key_col) <= F.lit(hi)))
        )
        if kept.limit(1).count() > 0:
            placed = _stage_and_place(kept, path, version, None)
    lines = [json.dumps({"commitInfo": {
        "operation": "DELETE",
        "operationParameters": {
            "predicate": f"{key_col} BETWEEN {lo} AND {hi}",
        },
        "timestamp": now_ms,
        "operationMetrics": {
            "numRemovedFiles": str(len(candidates)),
            "numAddedFiles": str(len(placed)),
        },
    }})]
    for rel in candidates:
        lines.append(json.dumps({"remove": {
            "path": rel, "deletionTimestamp": now_ms,
            "dataChange": True,
        }}))
    for rel, pvals in placed:
        lines.append(json.dumps({"add": {
            "path": rel,
            "partitionValues": pvals,
            "size": os.path.getsize(os.path.join(path, rel)),
            "dataChange": True,
            "stats": _file_stats(path, rel),
        }}))
    log_dir = os.path.join(path, _LOG)
    tmp = os.path.join(log_dir, f".tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    final = os.path.join(log_dir, f"{version:020d}.json")
    if os.path.exists(final):
        os.remove(tmp)
        raise ValueError(f"delta version {version} already committed")
    os.rename(tmp, final)
    return {
        "version": version,
        "files_rewritten": len(candidates),
        "files_untouched": untouched,
        "files_added": len(placed),
    }


def vacuum_delta(
    path: str,
    retention_hours: int,
    now_ms: int,
    dry_run: bool = True,
) -> dict:
    """VACUUM: delete tombstoned data files whose deletionTimestamp
    has aged past ``retention_hours`` (same eligibility arithmetic
    as ``functions/delta_log.py:delta_vacuum_candidates``, executed
    against the directory).  A tombstoned path that is live again
    (re-added) is NEVER deleted; time travel to versions that needed
    a vacuumed file fails loudly afterwards — that is the retention
    contract, not a bug.  ``dry_run=True`` (the default) only
    reports."""
    if not isinstance(retention_hours, int) \
            or isinstance(retention_hours, bool) or retention_hours < 0:
        raise ValueError("retention_hours malformed")
    versions = _log_versions(path)
    if not versions:
        raise ValueError(f"no delta log at {path}")
    live: set[str] = set()
    tombstones: dict[str, int] = {}
    for v in versions:
        with open(os.path.join(path, _LOG, f"{v:020d}.json")) as fh:
            for line in fh:
                if not line.strip():
                    continue
                act = json.loads(line)
                if "add" in act:
                    rel = act["add"]["path"]
                    live.add(rel)
                    tombstones.pop(rel, None)
                elif "remove" in act:
                    rm = act["remove"]
                    rel = rm["path"]
                    dts = rm.get("deletionTimestamp")
                    if not isinstance(dts, int) \
                            or isinstance(dts, bool) or dts < 0:
                        raise ValueError("deletionTimestamp malformed")
                    live.discard(rel)
                    tombstones[rel] = dts
    horizon = now_ms - retention_hours * 3_600_000
    eligible = sorted(
        rel for rel, dts in tombstones.items()
        if dts <= horizon and rel not in live
    )
    deleted = 0
    for rel in eligible:
        full = os.path.join(path, rel)
        if not os.path.exists(full):
            raise ValueError(f"tombstoned file {rel!r} already gone")
        if not dry_run:
            os.remove(full)
            deleted += 1
    return {
        "tombstones": len(tombstones),
        "eligible": len(eligible),
        "deleted": deleted,
    }
