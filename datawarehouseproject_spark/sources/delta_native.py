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


def write_delta(
    df: DataFrame,
    path: str,
    mode: str = "append",
    now_ms: int = 0,
) -> int:
    """Commit ``df`` to the Delta table at ``path`` and return the
    new version.  ``mode='append'`` adds files; ``mode='overwrite'``
    also writes a ``remove`` tombstone for every previously-live
    file.  ``now_ms`` stamps commitInfo/deletionTimestamp (callers
    pass a deterministic clock in tests/fixtures)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"write mode {mode!r} unsupported")
    spark = df.sparkSession
    versions = _log_versions(path)
    version = len(versions)
    prev_live = []
    if version and mode == "overwrite":
        prev_live = sorted(_replay(path, None)[0])
    # distributed data write into a staging dir, then deterministic
    # rename into the table root (part names carry the version so
    # concurrent staging never collides)
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex[:12]}")
    df.write.parquet(staging)
    rels = []
    i = 0
    for name in sorted(os.listdir(staging)):
        if not name.endswith(".parquet"):
            continue
        rel = f"part-{version:05d}-{i:05d}.parquet"
        os.rename(os.path.join(staging, name), os.path.join(path, rel))
        rels.append(rel)
        i += 1
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)
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
            "partitionColumns": [],
            "configuration": {},
        }}))
    for rel in prev_live:
        lines.append(json.dumps({"remove": {
            "path": rel, "deletionTimestamp": now_ms,
            "dataChange": True,
        }}))
    for rel in rels:
        lines.append(json.dumps({"add": {
            "path": rel,
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


def _replay(path: str, version: int | None):
    """Log replay to (live relative paths, schemaString) at
    ``version`` (None = latest)."""
    versions = _log_versions(path)
    if not versions:
        raise ValueError(f"no delta log at {path}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"delta version {version} does not exist")
    live: set[str] = set()
    schema_str = None
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
                    schema_str = act["metaData"].get("schemaString")
                elif "add" in act:
                    p = act["add"].get("path")
                    if not isinstance(p, str):
                        raise ValueError("add path malformed")
                    live.add(p)
                elif "remove" in act:
                    p = act["remove"].get("path")
                    if not isinstance(p, str):
                        raise ValueError("remove path malformed")
                    live.discard(p)
    if not isinstance(schema_str, str):
        raise ValueError("delta log missing metaData schemaString")
    return live, schema_str


def read_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """The Delta table at ``path`` as a DataFrame — log replay to
    the live file set (optionally AT a past version: time travel),
    then a plain schema-pinned parquet scan over exactly those
    files, so Catalyst's pushdown/pruning applies untouched below
    the log layer."""
    from pyspark.sql import types as T

    live, schema_str = _replay(path, version)
    schema = T.StructType.fromJson(json.loads(schema_str))
    if not live:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(
        *[os.path.join(path, rel) for rel in sorted(live)]
    )
