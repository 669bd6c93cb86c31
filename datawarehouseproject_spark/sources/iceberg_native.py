"""Native Iceberg v2 table directories: WRITE from a DataFrame,
READ back as a DataFrame — the Iceberg twin of
:mod:`.delta_native`, closing the "a user of either lakehouse
format could switch" loop.  The triage readers in
``functions/iceberg_scan.py`` serve the bundle/forensics path; this
module serves directory-shaped ``spark.read`` access with the
standard layout: ``data/`` parquet files, ``metadata/`` holding
``v{N}.metadata.json`` + ``version-hint.text`` + avro manifest
lists (``snap-*.avro``) + avro manifests (``m-*.avro``).

Format scope (Iceberg spec, public): format-version 2, UNPARTITIONED
tables, append + overwrite snapshots.  An overwrite commits a new
manifest list that references only the new manifest — prior
snapshots keep their own lists, so time travel works without
tombstones (the spec's snapshot isolation).  Schemas round-trip
through a minimal Iceberg-JSON <-> Spark mapping (long/int/
string/double/boolean/date/timestamp* — the flat-table types);
anything else is a loud boundary, never a silent cast.

Scale posture mirrors the Delta writer: data writes are distributed
``df.write.parquet``; the commit is driver-side — one footer read
per new file for record counts, two small avro writes, one JSON
rename."""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..functions.avro_scan import (
    _zigzag_write,
    decode_avro_blocks,
    encode_avro_container,
)

_META_RE = re.compile(r"^v(\d+)\.metadata\.json$")

_SPARK_TO_ICEBERG = {
    "long": "long", "integer": "int", "string": "string",
    "double": "double", "boolean": "boolean", "date": "date",
    "timestamp": "timestamptz",
}
_ICEBERG_TO_SPARK = {v: k for k, v in _SPARK_TO_ICEBERG.items()}

_MANIFEST_SCHEMA = json.dumps({
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "data_sequence_number", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}).encode()

_MANIFEST_LIST_SCHEMA = json.dumps({
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_data_files_count", "type": "int"},
    ],
}).encode()


def _schema_to_iceberg(schema) -> dict:
    fields = []
    for i, f in enumerate(schema.fields):
        tn = f.dataType.typeName()
        it = _SPARK_TO_ICEBERG.get(tn)
        if it is None:
            raise ValueError(
                f"column type {tn!r} unsupported by the iceberg "
                "writer (boundary)"
            )
        fields.append({
            "id": i + 1, "name": f.name, "required": not f.nullable,
            "type": it,
        })
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _schema_to_spark(ice: dict):
    from pyspark.sql import types as T

    if not isinstance(ice, dict) or ice.get("type") != "struct" \
            or not isinstance(ice.get("fields"), list):
        raise ValueError("iceberg schema malformed")
    out = []
    for f in ice["fields"]:
        if not isinstance(f, dict):
            raise ValueError("iceberg schema field malformed")
        tn = _ICEBERG_TO_SPARK.get(f.get("type"))
        if tn is None:
            raise ValueError(
                f"iceberg type {f.get('type')!r} unsupported (boundary)"
            )
        out.append(T.StructField(
            str(f.get("name")),
            T._parse_datatype_string(tn),
            not bool(f.get("required")),
        ))
    return T.StructType(out)


def _current_meta(path: str):
    """(version, metadata dict) from version-hint.text, fenced
    against hint/file drift."""
    hint = os.path.join(path, "metadata", "version-hint.text")
    if not os.path.exists(hint):
        return 0, None
    raw = open(hint).read().strip()
    if not raw.isdigit():
        raise ValueError("version-hint malformed")
    v = int(raw)
    mpath = os.path.join(path, "metadata", f"v{v}.metadata.json")
    if not os.path.exists(mpath):
        raise ValueError("version-hint points at missing metadata")
    meta = json.loads(open(mpath).read())
    if not isinstance(meta, dict) or meta.get("format-version") != 2:
        raise ValueError("unsupported iceberg metadata")
    seq = meta.get("last-sequence-number")
    schemas = meta.get("schemas")
    if not isinstance(seq, int) or isinstance(seq, bool) or seq < 0 \
            or not isinstance(schemas, list) or not schemas:
        raise ValueError("iceberg metadata missing writer fields")
    return v, meta


def write_iceberg(
    df: DataFrame,
    path: str,
    mode: str = "append",
    now_ms: int = 0,
) -> int:
    """Commit ``df`` to the Iceberg table at ``path``; returns the
    new snapshot id.  ``append`` adds a manifest to the previous
    list; ``overwrite`` starts a fresh list (prior snapshots keep
    theirs — time travel is free)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"write mode {mode!r} unsupported")
    version, meta = _current_meta(path)
    os.makedirs(os.path.join(path, "metadata"), exist_ok=True)
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    seq = 1 if meta is None else meta["last-sequence-number"] + 1
    if seq > 1 << 20:
        raise ValueError("sequence number past cap (boundary)")
    snap_id = seq * 100 + 7  # deterministic, unique per sequence
    ice_schema = _schema_to_iceberg(df.schema)
    if meta is not None:
        if meta["schemas"][0] != ice_schema:
            raise ValueError(
                "schema drift on write (boundary: evolution is the "
                "forensics readers' scope, not the writer's)"
            )
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex[:12]}")
    df.write.parquet(staging)
    import pyarrow.parquet as pq

    entries = []
    rels = []
    i = 0
    for name in sorted(os.listdir(staging)):
        if not name.endswith(".parquet"):
            continue
        rel = f"data/part-{snap_id}-{i:05d}.parquet"
        os.rename(os.path.join(staging, name), os.path.join(path, rel))
        rels.append(rel)
        i += 1
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)
    sync = bytes((snap_id * 31 + j * 7 + 1) % 256 for j in range(16))
    for rel in rels:
        full = os.path.join(path, rel)
        nrec = pq.ParquetFile(full).metadata.num_rows
        entries.append(
            _zigzag_write(1)  # status = added
            + _zigzag_write(1) + _zigzag_write(snap_id)
            + _zigzag_write(1) + _zigzag_write(seq)
            + _zigzag_write(0)
            + _zigzag_write(len(rel.encode())) + rel.encode()
            + _zigzag_write(len(b"PARQUET")) + b"PARQUET"
            + _zigzag_write(nrec)
            + _zigzag_write(os.path.getsize(full))
        )
    m_rel = f"metadata/m-{snap_id}.avro"
    files_manifest = encode_avro_container(
        _MANIFEST_SCHEMA, entries, sync
    )
    open(os.path.join(path, m_rel), "wb").write(files_manifest)

    def ml_record(mpath: str, mlen: int, mseq: int, msnap: int,
                  n: int) -> bytes:
        return (
            _zigzag_write(len(mpath.encode())) + mpath.encode()
            + _zigzag_write(mlen)
            + _zigzag_write(0)
            + _zigzag_write(0)
            + _zigzag_write(mseq)
            + _zigzag_write(msnap)
            + _zigzag_write(n)
        )

    prior_records = []
    if meta is not None and mode == "append":
        cur_snap = next(
            s for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        prior_list = open(
            os.path.join(path, cur_snap["manifest-list"])
        , "rb").read()
        for mf in decode_avro_blocks(prior_list):
            prior_records.append(ml_record(
                mf["manifest_path"], mf["manifest_length"],
                mf["sequence_number"], mf["added_snapshot_id"],
                mf["added_data_files_count"],
            ))
    ml_rel = f"metadata/snap-{snap_id}.avro"
    ml_blob = encode_avro_container(
        _MANIFEST_LIST_SCHEMA,
        prior_records + [ml_record(
            m_rel, len(files_manifest), seq, snap_id, len(rels)
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
            "operation": "append" if mode == "append" else "overwrite",
            "added-data-files": str(len(rels)),
        },
    })
    log = list(meta.get("snapshot-log", [])) if meta is not None else []
    log.append({"timestamp-ms": now_ms, "snapshot-id": snap_id})
    new_meta = {
        "format-version": 2,
        "table-uuid": (
            meta["table-uuid"] if meta is not None else str(uuid.uuid4())
        ),
        "last-sequence-number": seq,
        "schemas": [ice_schema],
        "current-schema-id": 0,
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "current-snapshot-id": snap_id,
        "snapshots": snapshots,
        "snapshot-log": log,
        "refs": {"main": {"snapshot-id": snap_id, "type": "branch"}},
    }
    new_v = version + 1
    tmp = os.path.join(path, "metadata",
                       f".tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        json.dump(new_meta, fh)
    final = os.path.join(path, "metadata", f"v{new_v}.metadata.json")
    if os.path.exists(final):
        os.remove(tmp)
        raise ValueError(f"iceberg version {new_v} already committed")
    os.rename(tmp, final)
    with open(os.path.join(path, "metadata", "version-hint.text"),
              "w") as fh:
        fh.write(str(new_v))
    return snap_id


def read_iceberg(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> DataFrame:
    """The Iceberg table at ``path`` as a DataFrame — resolve the
    snapshot (current, or a historical id: time travel), walk its
    manifest list -> manifests -> live data files, then a
    schema-pinned parquet scan so Catalyst pushdown applies below
    the metadata layer."""
    _v, meta = _current_meta(path)
    if meta is None:
        raise ValueError(f"no iceberg table at {path}")
    sid = snapshot_id if snapshot_id is not None \
        else meta["current-snapshot-id"]
    snap = next(
        (s for s in meta.get("snapshots", [])
         if isinstance(s, dict) and s.get("snapshot-id") == sid),
        None,
    )
    if snap is None:
        raise ValueError(f"snapshot {sid} does not exist")
    schema = _schema_to_spark(meta["schemas"][0])
    ml_rel = snap.get("manifest-list")
    if not isinstance(ml_rel, str):
        raise ValueError("snapshot manifest-list malformed")
    ml_path = os.path.join(path, ml_rel)
    if not os.path.exists(ml_path):
        raise ValueError("manifest list missing from table")
    ml_blob = open(ml_path, "rb").read()
    paths = []
    for mf in decode_avro_blocks(ml_blob):
        m_blob = open(
            os.path.join(path, mf["manifest_path"]), "rb"
        ).read()
        if mf.get("manifest_length") != len(m_blob):
            raise ValueError("manifest_length disagrees with file")
        for e in decode_avro_blocks(m_blob):
            st = e.get("status")
            if st == 2:
                continue
            if st not in (0, 1):
                raise ValueError(f"manifest entry status {st} unknown")
            df_rec = e.get("data_file")
            if not isinstance(df_rec, dict) \
                    or not isinstance(df_rec.get("file_path"), str):
                raise ValueError("manifest data_file malformed")
            if df_rec.get("content", 0) != 0:
                raise ValueError(
                    "delete files unsupported by the native reader "
                    "(boundary: the forensics scan serves those)"
                )
            paths.append(os.path.join(path, df_rec["file_path"]))
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*sorted(paths))
