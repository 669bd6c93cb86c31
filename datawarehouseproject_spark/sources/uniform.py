"""UniForm-style metadata-only Delta -> Iceberg conversion: write
Iceberg v2 metadata INTO a native Delta table's directory so BOTH
readers serve the same parquet files — zero data copy, the
dual-format interop shape Delta UniForm / Iceberg's in-place
migration procedures publish (public docs; no code consulted).

The converter replays the Delta log (``sources/delta_native.py``)
to the live file set and commits an Iceberg snapshot referencing
exactly those files: ``metadata/vN.metadata.json`` + hand-encoded
Avro manifests land beside ``_delta_log``, data file paths stay the
Delta-relative paths (root or Hive dirs), and
``sources/iceberg_native.py:read_iceberg`` reads the result like
any native Iceberg table — manifest-layer partition pruning
included.

Re-running after new Delta commits is INCREMENTAL: one new Iceberg
snapshot per sync carrying the file-level diff — added files status
1, carried files status 0 with their ORIGINAL snapshot/sequence
numbers, dropped files status 2 — so Iceberg time travel walks the
sync history.  The last synced Delta version is recorded in table
properties; an already-synced table is a no-op.

Boundaries (loud): a Delta table with live DELETION VECTORS cannot
convert (the Iceberg side would resurrect the deleted rows —
``optimize_delta`` purges first); schema evolution between syncs
rejects; the Iceberg metadata must be this converter's own (a
foreign ``metadata/`` dir is never overwritten)."""

from __future__ import annotations

import json
import os
import uuid

from ..functions.avro_scan import encode_avro_container
from .delta_native import _dv_of, _replay_state
from .iceberg_native import (
    _MANIFEST_LIST_SCHEMA,
    _PARTITIONABLE,
    _current_meta,
    _encode_entry,
    _encode_partition_struct,
    _fields_sig,
    _footer_bounds,
    _manifest_schema_json,
    _ml_record,
    _schema_at,
    _schema_to_iceberg,
    _snapshot_entries_mor,
    _write_metadata,
)

_PROP_SYNCED = "uniform.delta-version"


def convert_delta_to_iceberg(path: str, now_ms: int = 0) -> dict:
    """Sync the native Delta table at ``path`` to co-located Iceberg
    metadata (see module docstring).  Returns sync metrics; no-op
    when the recorded synced version already covers the Delta head."""
    from pyspark.sql import types as T

    snap = _replay_state(path, None)
    delta_version = snap["version"]
    for rel, body in snap["live"].items():
        if _dv_of(body) is not None:
            raise ValueError(
                "live deletion vectors cannot convert (boundary: "
                "optimize_delta purges them first — Iceberg metadata "
                "referencing the raw file would resurrect deleted "
                "rows)"
            )
    spark_schema = T.StructType.fromJson(
        json.loads(snap["meta"]["schemaString"])
    )
    ice_schema = _schema_to_iceberg(spark_schema)
    by_name = {f["name"]: f for f in ice_schema["fields"]}
    pcols = snap["pcols"]
    pfields: list[tuple[str, str]] = []
    for n in pcols:
        f = by_name.get(n)
        if f is None or f["type"] not in _PARTITIONABLE:
            raise ValueError(
                f"partition column {n!r} untranslatable (boundary)"
            )
        pfields.append((n, f["type"]))

    version, meta = _current_meta(path)
    prior: dict[str, dict] = {}
    if meta is not None:
        props = meta.get("properties", {})
        if _PROP_SYNCED not in props:
            raise ValueError(
                "metadata/ belongs to a non-converted iceberg table "
                "(boundary: refusing to overwrite foreign metadata)"
            )
        if _fields_sig(_schema_at(meta)) != _fields_sig(ice_schema):
            raise ValueError(
                "schema evolved since the last sync (boundary: "
                "re-convert into a fresh table)"
            )
        if int(props[_PROP_SYNCED]) >= delta_version:
            return {
                "synced_delta_version": int(props[_PROP_SYNCED]),
                "snapshot_id": meta["current-snapshot-id"],
                "files_added": 0, "files_carried": 0,
                "files_dropped": 0, "noop": True,
            }
        cur_snap = next(
            s for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        data_entries, delete_entries = _snapshot_entries_mor(
            path, cur_snap)
        if delete_entries:
            raise ValueError("converted table cannot carry deletes")
        prior = {e["file_path"]: e for e in data_entries}

    os.makedirs(os.path.join(path, "metadata"), exist_ok=True)
    seq = 1 if meta is None else meta["last-sequence-number"] + 1
    if seq > 1 << 20:
        raise ValueError("sequence number past cap (boundary)")
    snap_id = seq * 100 + 7
    live = snap["live"]
    entries: list[bytes] = []
    c = {"n_added": 0, "rows_added": 0, "n_existing": 0,
         "rows_existing": 0, "n_deleted": 0, "rows_deleted": 0}
    min_seq = seq
    for rel in sorted(live):
        body = live[rel]
        pv = body.get("partitionValues") or {}
        part = {}
        for pname, ptype in pfields:
            raw = pv.get(pname)
            if not isinstance(raw, str):
                raise ValueError(
                    f"partitionValues missing {pname!r} for {rel!r}"
                )
            part[pname] = int(raw) if ptype in ("long", "int") \
                else raw
        part_bytes = _encode_partition_struct(part, pfields)
        carried = prior.get(rel)
        if carried is not None:
            eseq = carried["sequence"] \
                if isinstance(carried["sequence"], int) else seq
            esnap = carried["snapshot_id"] \
                if isinstance(carried["snapshot_id"], int) else snap_id
            min_seq = min(min_seq, eseq)
            entries.append(_encode_entry(
                0, esnap, eseq, rel, part_bytes,
                carried["record_count"], carried["file_size"],
                carried["lower"], carried["upper"],
            ))
            c["n_existing"] += 1
            c["rows_existing"] += carried["record_count"]
        else:
            # one parquet footer read per NEW file — the same
            # per-file commit cost the delta writer itself paid
            full = os.path.join(path, rel)
            nrec, lower, upper = _footer_bounds(full, ice_schema)
            entries.append(_encode_entry(
                1, snap_id, seq, rel, part_bytes, nrec,
                os.path.getsize(full), lower, upper,
            ))
            c["n_added"] += 1
            c["rows_added"] += nrec
    for rel in sorted(set(prior) - set(live)):
        e = prior[rel]
        entries.append(_encode_entry(
            2, snap_id,
            e["sequence"] if isinstance(e["sequence"], int) else seq,
            rel, _encode_partition_struct(e["partition"], pfields),
            e["record_count"], e["file_size"], e["lower"], e["upper"],
        ))
        c["n_deleted"] += 1
        c["rows_deleted"] += e["record_count"]

    sync = bytes((snap_id * 31 + j * 7 + 1) % 256 for j in range(16))
    m_rel = f"metadata/m-{snap_id}.avro"
    manifest = encode_avro_container(
        _manifest_schema_json(pfields), entries, sync)
    open(os.path.join(path, m_rel), "wb").write(manifest)
    ml_rel = f"metadata/snap-{snap_id}.avro"
    ml_blob = encode_avro_container(
        _MANIFEST_LIST_SCHEMA,
        [_ml_record(
            m_rel, len(manifest), seq, min_seq, snap_id,
            c["n_added"], c["rows_added"],
            c["n_existing"], c["rows_existing"],
            c["n_deleted"], c["rows_deleted"],
        )],
        sync,
    )
    open(os.path.join(path, ml_rel), "wb").write(ml_blob)
    snapshots = list(meta["snapshots"]) if meta is not None else []
    snapshots.append({
        "snapshot-id": snap_id,
        "parent-snapshot-id": (
            meta["current-snapshot-id"] if meta is not None else None
        ),
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": ml_rel,
        "summary": {
            "operation": "replace" if c["n_deleted"] else "append",
            "added-data-files": str(c["n_added"]),
            "deleted-data-files": str(c["n_deleted"]),
        },
    })
    log = list(meta.get("snapshot-log", [])) \
        if meta is not None else []
    log.append({"timestamp-ms": now_ms, "snapshot-id": snap_id})
    new_meta = {
        "format-version": 2,
        "table-uuid": (
            meta["table-uuid"] if meta is not None
            else str(uuid.uuid4())
        ),
        "location": path,
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "last-column-id": len(ice_schema["fields"]),
        "schemas": [ice_schema],
        "current-schema-id": 0,
        "default-spec-id": 0,
        "partition-specs": [{
            "spec-id": 0,
            "fields": [
                {
                    "name": n,
                    "transform": "identity",
                    "source-id": by_name[n]["id"],
                    "field-id": 1000 + i,
                }
                for i, (n, _t) in enumerate(pfields)
            ],
        }],
        "last-partition-id": 999 + len(pfields),
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "properties": {_PROP_SYNCED: str(delta_version)},
        "current-snapshot-id": snap_id,
        "snapshots": snapshots,
        "snapshot-log": log,
        "refs": {"main": {"snapshot-id": snap_id, "type": "branch"}},
    }
    _write_metadata(path, new_meta, version)
    return {
        "synced_delta_version": delta_version,
        "snapshot_id": snap_id,
        "files_added": c["n_added"],
        "files_carried": c["n_existing"],
        "files_dropped": c["n_deleted"],
        "noop": False,
    }


_PROP_ICE_SYNCED = "uniform.iceberg-snapshot"


def convert_iceberg_to_delta(path: str, now_ms: int = 0) -> dict:
    """The REVERSE sync: write a ``_delta_log`` into a native
    Iceberg table's directory so the DELTA reader serves the same
    parquet files — completing bidirectional zero-copy interop.

    The current Iceberg snapshot's live data files become Delta
    ``add`` actions (path, size, typed-bounds-derived min/max stats,
    partitionValues from the typed partition struct — the Hive
    layout under ``data/`` resolves partition columns through
    Delta's ``basePath`` untouched).  Re-running after new Iceberg
    snapshots appends one Delta version with the file-level diff;
    the synced snapshot id is recorded in the Delta ``metaData``
    configuration, and the Delta table id is the Iceberg table-uuid
    (permanent across syncs).

    Boundaries (loud): live position-delete files
    (``purge_deletes_iceberg`` first — a Delta log referencing the
    raw files would resurrect deleted rows); schema evolution
    between syncs; a foreign ``_delta_log`` is never overwritten."""
    from pyspark.sql import types as T  # noqa: F401

    from .delta_native import _commit, _log_info, _replay_state
    from .iceberg_native import (
        _bound_int,
        _snapshot_entries_mor as _entries,
    )

    version, meta = _current_meta(path)
    if meta is None:
        raise ValueError(f"no iceberg table at {path}")
    cur_snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    snap_id = meta["current-snapshot-id"]
    ice_schema = _schema_at(meta, cur_snap)
    from .iceberg_native import _schema_to_spark, _spec_fields

    spark_schema = _schema_to_spark(ice_schema)
    pfields = _spec_fields(meta)
    pnames = [n for n, _t in pfields]
    data_entries, delete_entries = _entries(path, cur_snap)
    if delete_entries:
        raise ValueError(
            "live position-delete files cannot convert (boundary: "
            "purge_deletes_iceberg first)"
        )
    by_id = {f["id"]: f for f in ice_schema["fields"]}

    def stats_for(e) -> str:
        st = {"numRecords": e["record_count"],
              "minValues": {}, "maxValues": {}}
        for side, key in (("minValues", "lower"),
                          ("maxValues", "upper")):
            for fid, raw in e[key].items():
                f = by_id.get(fid)
                if f is not None and f["type"] in ("int", "long"):
                    st[side][f["name"]] = _bound_int(raw, f["type"])
        return json.dumps(st)

    latest, _cp, _jsons = _log_info(path)
    prev_live: dict[str, dict] = {}
    table_id = meta.get("table-uuid", str(uuid.uuid4()))
    if latest >= 0:
        dsnap = _replay_state(path, None)
        conf = dsnap["meta"].get("configuration") or {}
        if _PROP_ICE_SYNCED not in conf:
            raise ValueError(
                "_delta_log belongs to a non-converted delta table "
                "(boundary: refusing to overwrite foreign metadata)"
            )
        if json.loads(dsnap["meta"]["schemaString"]) \
                != json.loads(spark_schema.json()):
            raise ValueError(
                "schema evolved since the last sync (boundary: "
                "re-convert into a fresh table)"
            )
        if int(conf[_PROP_ICE_SYNCED]) == snap_id:
            return {"synced_snapshot": snap_id,
                    "delta_version": dsnap["version"],
                    "files_added": 0, "files_removed": 0,
                    "noop": True}
        prev_live = dsnap["live"]
        table_id = dsnap["meta"].get("id", table_id)
    new_version = latest + 1
    live_now = {e["file_path"]: e for e in data_entries}
    adds = sorted(set(live_now) - set(prev_live))
    removes = sorted(set(prev_live) - set(live_now))
    lines = [json.dumps({"commitInfo": {
        "operation": "CONVERT",
        "operationParameters": {
            "icebergSnapshot": str(snap_id),
        },
        "timestamp": now_ms,
        "operationMetrics": {
            "numConvertedFiles": str(len(adds)),
            "numRemovedFiles": str(len(removes)),
        },
    }})]
    if new_version == 0:
        lines.append(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 2,
        }}))
    lines.append(json.dumps({"metaData": {
        "id": table_id,
        "format": {"provider": "parquet", "options": {}},
        "schemaString": spark_schema.json(),
        "partitionColumns": pnames,
        "configuration": {_PROP_ICE_SYNCED: str(snap_id)},
    }}))
    for rel in removes:
        lines.append(json.dumps({"remove": {
            "path": rel, "deletionTimestamp": now_ms,
            "dataChange": True,
        }}))
    for rel in adds:
        e = live_now[rel]
        lines.append(json.dumps({"add": {
            "path": rel,
            "partitionValues": {
                n: str(e["partition"][n]) for n in pnames
            },
            "size": e["file_size"],
            "dataChange": True,
            "stats": stats_for(e),
        }}))
    _commit(path, new_version, lines, [])
    return {
        "synced_snapshot": snap_id,
        "delta_version": new_version,
        "files_added": len(adds),
        "files_removed": len(removes),
        "noop": False,
    }
