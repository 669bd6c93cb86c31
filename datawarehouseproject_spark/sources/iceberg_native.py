"""Native Iceberg v2 table directories: WRITE from a DataFrame,
READ back as a DataFrame — the Iceberg twin of
:mod:`.delta_native`, closing the "a user of either lakehouse
format could switch" loop.  The triage readers in
``functions/iceberg_scan.py`` serve the bundle/forensics path; this
module serves directory-shaped ``spark.read`` access with the
standard layout: ``data/`` parquet files (Hive-style subdirs under
identity partitioning), ``metadata/`` holding
``v{N}.metadata.json`` + ``version-hint.text`` + avro manifest
lists (``snap-*.avro``) + avro manifests (``m-*.avro``).

Format scope (Iceberg spec, public): format-version 2, append +
overwrite snapshots, IDENTITY-transform partitioning on
long/int/string columns (round 14 — VERDICT r13 item 5), and
EXECUTED snapshot expiry with the same retention contract the Delta
VACUUM carries (item 6).  The emitted files carry the v2-required
field set (ADVICE r13): ``data_file.partition`` (field-id 102, an
empty struct when unpartitioned), ``manifest_file.
min_sequence_number`` plus the existing/deleted file- and row-count
fields (Avro field names follow the reference Java implementation —
``added_data_files_count`` etc. — the same names the forensics
reader in ``functions/iceberg_scan.py`` consumes), field-id
annotations throughout, and the metadata JSON's required keys
(``location`` / ``last-updated-ms`` / ``last-column-id`` /
``last-partition-id`` / ``sort-orders``).  An overwrite commits a
new manifest list that references only the new manifest — prior
snapshots keep their own lists, so time travel works without
tombstones (the spec's snapshot isolation).  Schemas round-trip
through a minimal Iceberg-JSON <-> Spark mapping (long/int/
string/double/boolean/date/timestamp* — the flat-table types);
anything else is a loud boundary, never a silent cast.

Scale posture mirrors the Delta writer: data writes are distributed
``df.write.parquet``; the commit is driver-side — one footer read
per new file for record counts, two small avro writes, one JSON
rename.  Reads prune partitions AT THE MANIFEST LAYER
(``read_iceberg(where=...)``): files in other partitions never
reach the parquet scan plan."""

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

#: identity partition sources the writer can encode into the
#: partition struct (avro long/int/string)
_PARTITIONABLE = {"long": "long", "int": "int", "string": "string"}


def _manifest_schema_json(pfields: list[tuple[str, str]]) -> bytes:
    """manifest_entry Avro schema with the v2-required data_file
    field set, including the ``partition`` struct (field-id 102;
    identity fields get ids 1000+i per the spec's partition-field-id
    convention).  ``pfields`` = [(name, iceberg primitive type)]."""
    partition_fields = [
        {"name": name, "type": _PARTITIONABLE[t],
         "field-id": 1000 + i}
        for i, (name, t) in enumerate(pfields)
    ]
    return json.dumps({
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "field-id": 1},
            {"name": "data_sequence_number",
             "type": ["null", "long"], "field-id": 3},
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "data_file",
                    "fields": [
                        {"name": "content", "type": "int",
                         "field-id": 134},
                        {"name": "file_path", "type": "string",
                         "field-id": 100},
                        {"name": "file_format", "type": "string",
                         "field-id": 101},
                        {
                            "name": "partition",
                            "field-id": 102,
                            "type": {
                                "type": "record",
                                "name": "partition_struct",
                                "fields": partition_fields,
                            },
                        },
                        {"name": "record_count", "type": "long",
                         "field-id": 103},
                        {"name": "file_size_in_bytes",
                         "type": "long", "field-id": 104},
                        # bounds maps (spec field-ids 125/128): the
                        # spec encodes map<int, binary> in Avro as an
                        # array of key/value records; inner field-ids
                        # are writer-assigned and deliberately
                        # omitted here (annotating ids we cannot
                        # verify would be fabrication)
                        {
                            "name": "lower_bounds",
                            "field-id": 125,
                            "type": {
                                "type": "array",
                                "items": {
                                    "type": "record",
                                    "name": "lower_kv",
                                    "fields": [
                                        {"name": "key", "type": "int"},
                                        {"name": "value",
                                         "type": "bytes"},
                                    ],
                                },
                            },
                        },
                        {
                            "name": "upper_bounds",
                            "field-id": 128,
                            "type": {
                                "type": "array",
                                "items": {
                                    "type": "record",
                                    "name": "upper_kv",
                                    "fields": [
                                        {"name": "key", "type": "int"},
                                        {"name": "value",
                                         "type": "bytes"},
                                    ],
                                },
                            },
                        },
                    ],
                },
            },
        ],
    }).encode()


_MANIFEST_LIST_SCHEMA = json.dumps({
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long",
         "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_data_files_count", "type": "int",
         "field-id": 504},
        {"name": "existing_data_files_count", "type": "int",
         "field-id": 505},
        {"name": "deleted_data_files_count", "type": "int",
         "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long",
         "field-id": 513},
        {"name": "deleted_rows_count", "type": "long",
         "field-id": 514},
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


def _schema_at(meta: dict, snap: dict | None = None) -> dict:
    """The Iceberg schema governing ``snap`` (or the current state):
    resolved through the snapshot's recorded ``schema-id``, falling
    back to ``current-schema-id`` — the evolution-aware lookup every
    read/DML path shares.  Columns resolve by NAME below this (the
    writer only supports trailing ADD COLUMN, never renames, so
    name-resolution is unambiguous — renames are the case that
    genuinely needs field-id resolution and they stay a loud
    boundary)."""
    sid = meta.get("current-schema-id", 0)
    if snap is not None and isinstance(snap.get("schema-id"), int):
        sid = snap["schema-id"]
    for s in meta.get("schemas", []):
        if isinstance(s, dict) and s.get("schema-id") == sid:
            return s
    raise ValueError(f"schema-id {sid} missing from metadata")


def _fields_sig(ice_schema: dict) -> list[tuple]:
    """Schema identity for drift checks: names + types.
    Nullability is deliberately excluded — Spark marks computed
    columns nullable even when every value is present, and on append
    the TABLE's required flags win (``write_iceberg`` reuses the
    stored schema, never the incoming frame's flags)."""
    return [
        (f["name"], f["type"]) for f in ice_schema["fields"]
    ]


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


def _spec_fields(meta: dict) -> list[tuple[str, str]]:
    """The table's identity partition fields as [(name, type)] from
    its partition spec + schema."""
    specs = meta.get("partition-specs")
    if not isinstance(specs, list) or not specs:
        raise ValueError("partition-specs malformed")
    spec = specs[0]
    by_id = {
        f["id"]: f for f in _schema_at(meta)["fields"]
    }
    out = []
    for f in spec.get("fields", []):
        if f.get("transform") != "identity":
            raise ValueError(
                "non-identity transform unsupported by the native "
                "writer (boundary: the forensics readers serve those)"
            )
        src = by_id.get(f.get("source-id"))
        if src is None:
            raise ValueError("partition field source-id dangling")
        out.append((str(f["name"]), str(src["type"])))
    return out


def _encode_string(s: str) -> bytes:
    b = s.encode()
    return _zigzag_write(len(b)) + b


def _encode_partition_value(value, itype: str) -> bytes:
    if itype in ("long", "int"):
        if not isinstance(value, int) or isinstance(value, bool):
            raise ValueError("partition value not an int")
        return _zigzag_write(value)
    if itype == "string":
        if not isinstance(value, str):
            raise ValueError("partition value not a string")
        return _encode_string(value)
    raise ValueError(
        f"partition source type {itype!r} unsupported (boundary)"
    )


def _single_value_bytes(value: int, itype: str) -> bytes:
    """Iceberg single-value binary serialization (spec Appendix D)
    for the bound types the writer emits: int = 4-byte / long =
    8-byte little-endian two's complement."""
    if not isinstance(value, int) or isinstance(value, bool):
        raise ValueError("bound value not an int")
    width = 4 if itype == "int" else 8
    return value.to_bytes(width, "little", signed=True)


def _bound_int(raw: bytes, itype: str) -> int:
    if not isinstance(raw, bytes) \
            or len(raw) != (4 if itype == "int" else 8):
        raise ValueError("bound bytes malformed")
    return int.from_bytes(raw, "little", signed=True)


def _encode_bounds_array(bounds: dict[int, bytes]) -> bytes:
    """map<int, binary> in its Avro array-of-records encoding."""
    if not bounds:
        return _zigzag_write(0)
    out = _zigzag_write(len(bounds))
    for k in sorted(bounds):
        v = bounds[k]
        out += _zigzag_write(k) + _zigzag_write(len(v)) + v
    return out + _zigzag_write(0)


def _decode_bounds(entry_df: dict, key: str) -> dict[int, bytes]:
    """{field id: value bytes} from a decoded entry's bounds array
    (absent on pre-bounds manifests -> {})."""
    arr = entry_df.get(key)
    if arr is None:
        return {}
    if not isinstance(arr, list):
        raise ValueError(f"{key} malformed")
    out = {}
    for kv in arr:
        if not isinstance(kv, dict) or not isinstance(
                kv.get("key"), int) or not isinstance(
                kv.get("value"), bytes):
            raise ValueError(f"{key} entry malformed")
        out[kv["key"]] = kv["value"]
    return out


def _footer_bounds(full: str, ice_schema: dict):
    """(record count, {field id: lower bytes}, {field id: upper
    bytes}) from the parquet footer, for the int/long columns —
    one driver-side footer read per new file, the same commit cost
    the Delta writer pays."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(full).metadata
    by_name = {
        f["name"]: f for f in ice_schema["fields"]
        if f["type"] in ("int", "long")
    }
    mins: dict[str, int] = {}
    maxs: dict[str, int] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            st = col.statistics
            name = col.path_in_schema
            if st is None or not st.has_min_max or name not in by_name:
                continue
            lo, hi = st.min, st.max
            if not isinstance(lo, int) or isinstance(lo, bool):
                continue
            if name not in mins or lo < mins[name]:
                mins[name] = lo
            if name not in maxs or hi > maxs[name]:
                maxs[name] = hi
    lower = {
        by_name[n]["id"]: _single_value_bytes(v, by_name[n]["type"])
        for n, v in mins.items()
    }
    upper = {
        by_name[n]["id"]: _single_value_bytes(v, by_name[n]["type"])
        for n, v in maxs.items()
    }
    return md.num_rows, lower, upper


def _encode_entry(
    status: int,
    snap_id: int,
    seq: int,
    rel: str,
    part_bytes: bytes,
    nrec: int,
    size: int,
    lower: dict[int, bytes],
    upper: dict[int, bytes],
    content: int = 0,
) -> bytes:
    return (
        _zigzag_write(status)
        + _zigzag_write(1) + _zigzag_write(snap_id)
        + _zigzag_write(1) + _zigzag_write(seq)
        + _zigzag_write(content)  # data_file.content: 0 data,
        #                           1 position deletes
        + _encode_string(rel)
        + _encode_string("PARQUET")
        + part_bytes
        + _zigzag_write(nrec)
        + _zigzag_write(size)
        + _encode_bounds_array(lower)
        + _encode_bounds_array(upper)
    )


def _encode_partition_struct(
    part: dict, pfields: list[tuple[str, str]]
) -> bytes:
    out = b""
    for pname, ptype in pfields:
        val = part.get(pname)
        if val is None:
            raise ValueError(
                f"partition value for {pname!r} missing"
            )
        out += _encode_partition_value(val, ptype)
    return out


def _ml_record(mpath: str, mlen: int, mseq: int, mminseq: int,
               msnap: int, n_added: int, rows_added: int,
               n_existing: int = 0, rows_existing: int = 0,
               n_deleted: int = 0, rows_deleted: int = 0,
               content: int = 0, spec_id: int = 0) -> bytes:
    return (
        _encode_string(mpath)
        + _zigzag_write(mlen)
        + _zigzag_write(spec_id)  # partition_spec_id
        + _zigzag_write(content)  # 0 data manifest, 1 deletes
        + _zigzag_write(mseq)
        + _zigzag_write(mminseq)
        + _zigzag_write(msnap)
        + _zigzag_write(n_added)
        + _zigzag_write(n_existing)
        + _zigzag_write(n_deleted)
        + _zigzag_write(rows_added)
        + _zigzag_write(rows_existing)
        + _zigzag_write(rows_deleted)
    )


def _write_metadata(path: str, new_meta: dict, version: int) -> int:
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
    return new_v


def write_iceberg(
    df: DataFrame,
    path: str,
    mode: str = "append",
    now_ms: int = 0,
    partition_by: list[str] | None = None,
    allow_schema_change: bool = False,
    branch: str = "main",
) -> int:
    """Commit ``df`` to the Iceberg table at ``path``; returns the
    new snapshot id.  ``append`` adds a manifest to the previous
    list; ``overwrite`` starts a fresh list (prior snapshots keep
    theirs — time travel is free).  ``partition_by`` (first commit
    only) declares identity-transform partition fields on
    long/int/string columns: data lands Hive-style under ``data/``,
    every manifest entry records the typed partition struct, and
    ``read_iceberg(where=...)`` prunes at the manifest layer.

    ``branch``: commit onto a named BRANCH ref instead of main —
    the write half of WRITE-AUDIT-PUBLISH: main readers never see
    the branch's snapshots (``current-snapshot-id`` and the
    snapshot-log stay on main), auditors read via
    ``read_iceberg(ref=...)``, and ``publish_iceberg`` fast-forwards
    main once the audit passes.  A missing branch is created forking
    from main's head; tags stay immutable (loud)."""
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
    schema_changed = False
    if meta is not None:
        prev_schema = _schema_at(meta)
        if _fields_sig(prev_schema) != _fields_sig(ice_schema):
            if not allow_schema_change:
                raise ValueError(
                    "schema drift on write (boundary: evolve with "
                    "allow_schema_change=True — trailing nullable "
                    "ADD COLUMN only)"
                )
            old_f = prev_schema["fields"]
            new_f = ice_schema["fields"]
            if len(new_f) <= len(old_f) or [
                (f["name"], f["type"]) for f in new_f[: len(old_f)]
            ] != [(f["name"], f["type"]) for f in old_f]:
                raise ValueError(
                    "evolution supports ADDING trailing columns "
                    "only (boundary: drops/renames/retypes need "
                    "field-id resolution this writer does not claim)"
                )
            # stable field ids: the prefix keeps the OLD ids, added
            # columns take the next ids after last-column-id — the
            # spec's one unbreakable evolution rule.  Added columns
            # become OPTIONAL regardless of the incoming frame's
            # nullability: existing files hold no values for them
            last_id = meta["last-column-id"]
            fields = []
            for i, f in enumerate(new_f):
                f = dict(f)
                if i < len(old_f):
                    f["id"] = old_f[i]["id"]
                else:
                    last_id += 1
                    f["id"] = last_id
                    f["required"] = False
                fields.append(f)
            ice_schema = {
                "type": "struct",
                "schema-id": prev_schema["schema-id"] + 1,
                "fields": fields,
            }
            schema_changed = True
        else:
            ice_schema = prev_schema
        if schema_changed and branch != "main":
            raise ValueError(
                "schema evolution must land on main (boundary: a "
                "branch with its own schema cannot fast-forward)"
            )
        prev_pnames = [n for n, _t in _spec_fields(meta)]
        if partition_by is not None \
                and list(partition_by) != prev_pnames:
            raise ValueError(
                "partition_by drift against the table's spec"
            )
        pnames = prev_pnames
    else:
        pnames = list(partition_by or [])
    by_name = {
        f["name"]: f for f in ice_schema["fields"]
    }
    pfields: list[tuple[str, str]] = []
    for n in pnames:
        f = by_name.get(n)
        if f is None:
            raise ValueError(f"partition column {n!r} not in schema")
        if f["type"] not in _PARTITIONABLE:
            raise ValueError(
                f"identity partitioning on type {f['type']!r} "
                "unsupported (boundary)"
            )
        pfields.append((n, f["type"]))
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex[:12]}")
    writer = df.write
    if pnames:
        writer = writer.partitionBy(*pnames)
    writer.parquet(staging)
    placed: list[tuple[str, dict]] = []
    i = 0
    for dirpath, _dn, fnames in sorted(os.walk(staging)):
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
            rel = f"data/part-{snap_id}-{i:05d}.parquet"
            if reldir != ".":
                rel = f"data/{reldir}/part-{snap_id}-{i:05d}.parquet"
                os.makedirs(
                    os.path.join(path, "data", reldir), exist_ok=True
                )
            os.rename(os.path.join(dirpath, name),
                      os.path.join(path, rel))
            placed.append((rel, pvals))
            i += 1
    import shutil

    shutil.rmtree(staging)
    sync = bytes((snap_id * 31 + j * 7 + 1) % 256 for j in range(16))
    entries = []
    total_rows = 0
    for rel, pvals in placed:
        full = os.path.join(path, rel)
        nrec, lower, upper = _footer_bounds(full, ice_schema)
        total_rows += nrec
        part = {
            pname: (int(pvals[pname]) if ptype in ("long", "int")
                    else pvals[pname])
            for pname, ptype in pfields
            if pvals.get(pname) is not None
        }
        part_bytes = _encode_partition_struct(part, pfields)
        entries.append(_encode_entry(
            1, snap_id, seq, rel, part_bytes, nrec,
            os.path.getsize(full), lower, upper,
        ))
    m_rel = f"metadata/m-{snap_id}.avro"
    files_manifest = encode_avro_container(
        _manifest_schema_json(pfields), entries, sync
    )
    open(os.path.join(path, m_rel), "wb").write(files_manifest)
    base_head = None
    if meta is not None:
        if branch == "main":
            base_head = meta["current-snapshot-id"]
        else:
            bref = meta.get("refs", {}).get(branch)
            if isinstance(bref, dict) \
                    and isinstance(bref.get("snapshot-id"), int):
                if bref.get("type") != "branch":
                    raise ValueError(
                        f"ref {branch!r} is a tag, not a branch "
                        "(boundary: tags are immutable)"
                    )
                base_head = bref["snapshot-id"]
            else:
                # creating the branch: it forks from main's head
                base_head = meta["current-snapshot-id"]
    elif branch != "main":
        raise ValueError(
            "first commit must land on main (boundary)"
        )
    prior_records = []
    if meta is not None and mode == "append":
        cur_snap = next(
            s for s in meta["snapshots"]
            if s["snapshot-id"] == base_head
        )
        pl_path = os.path.join(path, cur_snap["manifest-list"])
        if not os.path.exists(pl_path):
            raise ValueError("current manifest list missing from table")
        prior_list = open(pl_path, "rb").read()
        for mf in decode_avro_blocks(prior_list):
            prior_records.append(_ml_record(
                mf["manifest_path"], mf["manifest_length"],
                mf["sequence_number"],
                mf.get("min_sequence_number", mf["sequence_number"]),
                mf["added_snapshot_id"],
                mf["added_data_files_count"],
                mf.get("added_rows_count", 0),
                mf.get("existing_data_files_count", 0),
                mf.get("existing_rows_count", 0),
                mf.get("deleted_data_files_count", 0),
                mf.get("deleted_rows_count", 0),
            ))
    ml_rel = f"metadata/snap-{snap_id}.avro"
    ml_blob = encode_avro_container(
        _MANIFEST_LIST_SCHEMA,
        prior_records + [_ml_record(
            m_rel, len(files_manifest), seq, seq, snap_id,
            len(placed), total_rows,
        )],
        sync,
    )
    open(os.path.join(path, ml_rel), "wb").write(ml_blob)
    snapshots = list(meta["snapshots"]) if meta is not None else []
    snapshots.append({
        "snapshot-id": snap_id,
        "parent-snapshot-id": base_head,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": ml_rel,
        "summary": {
            "operation": "append" if mode == "append" else "overwrite",
            "added-data-files": str(len(placed)),
        },
        "schema-id": ice_schema["schema-id"],
    })
    log = list(meta.get("snapshot-log", [])) if meta is not None else []
    if branch == "main":
        # the snapshot-log is MAIN's history (the spec's
        # timestamp-travel source); branch commits do not enter it
        log.append({"timestamp-ms": now_ms, "snapshot-id": snap_id})
    new_meta = {
        "format-version": 2,
        "table-uuid": (
            meta["table-uuid"] if meta is not None else str(uuid.uuid4())
        ),
        "location": path,
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "last-column-id": max(
            f["id"] for f in ice_schema["fields"]
        ),
        "schemas": (
            [ice_schema] if meta is None
            else meta["schemas"] + [ice_schema] if schema_changed
            else meta["schemas"]
        ),
        "current-schema-id": ice_schema["schema-id"],
        "default-spec-id": 0,
        # specs are append-only table state: preserve any registered
        # beyond the default (the global-delete spec id 1)
        "partition-specs": (
            meta["partition-specs"] if meta is not None else [{
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
            }]
        ),
        "last-partition-id": 999 + len(pfields),
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "properties": {},
        "current-snapshot-id": (
            snap_id if branch == "main"
            else meta["current-snapshot-id"]
        ),
        "snapshots": snapshots,
        "snapshot-log": log,
        "refs": {
            # other refs survive commits; only the written branch
            # advances (a branch commit leaves main untouched — the
            # write-audit-publish isolation)
            **{k: v for k, v in (meta.get("refs", {}) if meta is not None else {}).items() if k != branch},
            branch: {"snapshot-id": snap_id, "type": "branch"},
        },
    }
    _write_metadata(path, new_meta, version)
    return snap_id


def _snapshot_entries_mor(
    path: str, snap: dict
) -> tuple[list[dict], list[dict]]:
    """One snapshot's LIVE manifest entries (status 0/1), decoded
    and normalized, split by ``data_file.content``: (data entries,
    POSITION-DELETE entries).  Each entry carries ``file_path`` /
    ``partition`` / ``record_count`` / ``file_size`` /
    ``snapshot_id`` / ``sequence`` / ``lower`` / ``upper`` ({field
    id: value bytes}; empty on pre-bounds manifests and on delete
    files).  Equality deletes (content=2) stay a loud boundary —
    silently treating them as positional would resurrect rows.
    Integrity-checked against the manifest list."""
    ml_rel = snap.get("manifest-list")
    if not isinstance(ml_rel, str):
        raise ValueError("snapshot manifest-list malformed")
    ml_path = os.path.join(path, ml_rel)
    if not os.path.exists(ml_path):
        raise ValueError("manifest list missing from table")
    data: list[dict] = []
    deletes: list[dict] = []
    for mf in decode_avro_blocks(open(ml_path, "rb").read()):
        m_path = os.path.join(path, mf["manifest_path"])
        if not os.path.exists(m_path):
            raise ValueError(
                f"manifest {mf['manifest_path']!r} missing from table"
            )
        m_blob = open(m_path, "rb").read()
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
            content = df_rec.get("content", 0)
            if content not in (0, 1):
                raise ValueError(
                    "equality-delete files unsupported by the native "
                    "reader (boundary: the forensics scan serves those)"
                )
            part = df_rec.get("partition", {})
            if not isinstance(part, dict):
                raise ValueError("partition struct malformed")
            (data if content == 0 else deletes).append({
                "file_path": df_rec["file_path"],
                "partition": part,
                "record_count": df_rec.get("record_count", 0),
                "file_size": df_rec.get("file_size_in_bytes", 0),
                "snapshot_id": e.get("snapshot_id"),
                "sequence": e.get("data_sequence_number"),
                "lower": _decode_bounds(df_rec, "lower_bounds"),
                "upper": _decode_bounds(df_rec, "upper_bounds"),
            })
    return data, deletes


def _snapshot_entries(path: str, snap: dict) -> list[dict]:
    """Data entries only, LOUD when live position deletes exist —
    the guard every copy-on-write DML path sits behind: rewriting a
    file without subtracting its delete positions would resurrect
    deleted rows.  ``purge_deletes_iceberg`` clears the state;
    ``read_iceberg`` serves merge-on-read directly."""
    data, deletes = _snapshot_entries_mor(path, snap)
    if deletes:
        raise ValueError(
            "live position-delete files present (boundary: "
            "purge_deletes_iceberg first — a copy-on-write rewrite "
            "here would resurrect merge-on-read deleted rows)"
        )
    return data


def _stage_cow_files(
    df, path: str, snap_id: int, pnames: list[str]
) -> list[tuple[str, dict]]:
    """Distributed write of rewrite output into ``data/`` (Hive
    layout under partitioning) -> [(rel path, {col: str value})]."""
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex[:12]}")
    writer = df.write
    if pnames:
        writer = writer.partitionBy(*pnames)
    writer.parquet(staging)
    placed: list[tuple[str, dict]] = []
    i = 0
    for dirpath, _dn, fnames in sorted(os.walk(staging)):
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
            rel = f"data/part-{snap_id}-{i:05d}.parquet"
            if reldir != ".":
                rel = f"data/{reldir}/part-{snap_id}-{i:05d}.parquet"
                os.makedirs(
                    os.path.join(path, "data", reldir), exist_ok=True
                )
            os.rename(os.path.join(dirpath, name),
                      os.path.join(path, rel))
            placed.append((rel, pvals))
            i += 1
    import shutil

    shutil.rmtree(staging)
    return placed


def _commit_cow(
    path: str,
    meta: dict,
    version: int,
    pfields: list[tuple[str, str]],
    seq: int,
    snap_id: int,
    entry_bytes: list[bytes],
    counts: dict,
    min_seq: int,
    op: str,
    now_ms: int,
) -> int:
    """Write ONE self-contained manifest (added + existing + deleted
    entries) + a manifest list referencing only it, then the new
    metadata version — the copy-on-write snapshot shape MERGE and
    DELETE commit.  Prior snapshots keep their own lists (time
    travel untouched)."""
    return _commit_snapshot(
        path, meta, version, seq, snap_id,
        [{
            "rel": f"metadata/m-{snap_id}.avro",
            "entries": entry_bytes,
            "pfields": pfields,
            "content": 0,
            "counts": counts,
            "min_seq": min_seq,
        }],
        counts, op, now_ms,
    )


def _commit_snapshot(
    path: str,
    meta: dict,
    version: int,
    seq: int,
    snap_id: int,
    manifests: list[dict],
    summary_counts: dict,
    op: str,
    now_ms: int,
) -> int:
    """Write N manifests (each {rel, entries, pfields, content,
    counts, min_seq, optional spec_id}) + one manifest list
    referencing them all, then the new metadata version.
    ``content=1`` manifests are DELETE manifests (position-delete
    files) — the merge-on-read snapshot shape references a data
    manifest and a delete manifest side by side, exactly how the
    spec separates them in the manifest list (field-id 517).  A
    ``spec_id`` other than 0 marks a manifest written under a
    different partition spec (the GLOBAL position-delete shape uses
    the unpartitioned spec)."""
    sync = bytes((snap_id * 31 + j * 7 + 1) % 256 for j in range(16))
    ml_records = []
    for spec in manifests:
        m_rel = spec["rel"]
        manifest = encode_avro_container(
            _manifest_schema_json(spec["pfields"]),
            spec["entries"], sync,
        )
        open(os.path.join(path, m_rel), "wb").write(manifest)
        c = spec["counts"]
        ml_records.append(_ml_record(
            m_rel, len(manifest), seq, spec["min_seq"], snap_id,
            c["n_added"], c["rows_added"],
            c["n_existing"], c["rows_existing"],
            c["n_deleted"], c["rows_deleted"],
            content=spec["content"],
            spec_id=spec.get("spec_id", 0),
        ))
    counts = summary_counts
    ml_rel = f"metadata/snap-{snap_id}.avro"
    ml_blob = encode_avro_container(
        _MANIFEST_LIST_SCHEMA, ml_records, sync,
    )
    open(os.path.join(path, ml_rel), "wb").write(ml_blob)
    snapshots = list(meta["snapshots"])
    snapshots.append({
        "snapshot-id": snap_id,
        "parent-snapshot-id": meta["current-snapshot-id"],
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": ml_rel,
        "summary": {
            "operation": op,
            "added-data-files": str(counts["n_added"]),
            "deleted-data-files": str(counts["n_deleted"]),
        },
        "schema-id": meta.get("current-schema-id", 0),
    })
    log = list(meta.get("snapshot-log", []))
    log.append({"timestamp-ms": now_ms, "snapshot-id": snap_id})
    new_meta = dict(meta)
    new_meta.update({
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "current-snapshot-id": snap_id,
        "snapshots": snapshots,
        "snapshot-log": log,
        "refs": {
            # tags/branches survive commits; main advances
            **{k: v for k, v in (meta.get("refs", {}) if meta is not None else {}).items() if k != "main"},
            "main": {"snapshot-id": snap_id, "type": "branch"},
        },
    })
    _write_metadata(path, new_meta, version)
    return snap_id


def _dml_candidates(
    entries: list[dict],
    updates,
    key_col: str,
    key_id: int,
    key_type: str,
    pcols: list[str],
    spark,
):
    """The exact candidate file set for a keyed DML: a broadcast
    join of the update (partition, key) tuples against the
    driver-held per-file bound windows — partition equality FIRST,
    then window containment, the same routing the Delta merge runs.
    Entries without bounds for the key are loud (pre-bounds table)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    windows = []
    for e in entries:
        lo_b = e["lower"].get(key_id)
        hi_b = e["upper"].get(key_id)
        if lo_b is None or hi_b is None:
            raise ValueError(
                f"no {key_col!r} bounds for {e['file_path']!r} "
                "(boundary: the table predates bounds emission — "
                "rewrite it via overwrite first)"
            )
        windows.append((
            e["file_path"],
            *[
                None if e["partition"].get(c) is None
                else str(e["partition"][c])
                for c in pcols
            ],
            _bound_int(lo_b, key_type),
            _bound_int(hi_b, key_type),
        ))
    spark_key = T.LongType() if key_type == "long" else T.IntegerType()
    win_df = spark.createDataFrame(
        windows,
        T.StructType(
            [T.StructField("_rel", T.StringType())]
            + [T.StructField(f"_p_{c}", T.StringType())
               for c in pcols]
            + [T.StructField("_lo", spark_key),
               T.StructField("_hi", spark_key)]
        ),
    ) if windows else None
    if win_df is None:
        return []
    cond = (
        (F.col(key_col) >= F.col("_lo"))
        & (F.col(key_col) <= F.col("_hi"))
    )
    for c in pcols:
        cond = cond & (F.col(c).cast("string") == F.col(f"_p_{c}"))
    touched = (
        updates.select(key_col, *pcols)
        .join(F.broadcast(win_df), cond)
        .select("_rel").distinct().collect()
    )  # bounded: one row per touched FILE
    return sorted(r["_rel"] for r in touched)


def merge_iceberg(
    path: str,
    updates: DataFrame,
    key_col: str,
    now_ms: int = 0,
) -> dict:
    """UPSERT into the native Iceberg table — the copy-on-write twin
    of ``delta_native.merge_delta`` (round 14): candidates = files
    whose partition matches an update row AND whose ``lower_bounds``/
    ``upper_bounds`` window on ``key_col`` contains that row's key;
    candidates are rewritten with the update keys replaced (anti
    join on partition cols + key, union the updates), and the new
    snapshot's single manifest carries status=1 adds, status=0
    existing entries for every untouched file (with their ORIGINAL
    snapshot/sequence numbers), and status=2 deletes for the
    replaced ones — the self-contained v2 COW snapshot.  On a
    partitioned table the ON predicate is (partition cols + key),
    the date-partitioned-upsert shape.  Duplicate (partition, key)
    tuples and null keys are loud, as is a partition-column merge
    key (no bounds)."""
    spark = updates.sparkSession
    from pyspark.sql import functions as F

    version, meta = _current_meta(path)
    if meta is None:
        raise ValueError(f"no iceberg table at {path}")
    schema = _schema_to_spark(_schema_at(meta))
    pfields = _spec_fields(meta)
    pcols = [n for n, _t in pfields]
    if key_col in pcols:
        raise ValueError(
            "merge key cannot be a partition field (boundary: "
            "partition fields carry no bound window)"
        )
    by_name = {f["name"]: f for f in _schema_at(meta)["fields"]}
    kf = by_name.get(key_col)
    if kf is None or kf["type"] not in ("int", "long"):
        raise ValueError(
            "merge key must be an int/long schema column (boundary)"
        )
    if [(f.name, f.dataType) for f in updates.schema.fields] \
            != [(f.name, f.dataType) for f in schema.fields]:
        raise ValueError("updates schema differs from the table's")
    counts = updates.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(key_col).alias("nk"),
        F.countDistinct(key_col, *pcols).alias("nd"),
    ).first()
    if counts["n"] == 0:
        raise ValueError("updates carry no rows")
    if counts["nk"] != counts["n"]:
        raise ValueError("null merge keys in updates (boundary)")
    if counts["nd"] != counts["n"]:
        raise ValueError(
            "duplicate merge keys in updates (multiple source rows "
            "match one target row)"
        )
    cur_snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    entries = _snapshot_entries(path, cur_snap)
    candidates = set(_dml_candidates(
        entries, updates, key_col, kf["id"], kf["type"], pcols, spark,
    ))
    seq = meta["last-sequence-number"] + 1
    if seq > 1 << 20:
        raise ValueError("sequence number past cap (boundary)")
    snap_id = seq * 100 + 7
    on_cols = [key_col] + pcols
    new_rows = updates
    if candidates:
        reader = spark.read.schema(schema)
        if pcols:
            reader = reader.option(
                "basePath", os.path.join(path, "data"))
        current = reader.parquet(
            *sorted(os.path.join(path, rel) for rel in candidates)
        )
        kept = current.join(
            updates.select(*on_cols), on=on_cols, how="left_anti"
        ).select(*[f.name for f in schema.fields])
        new_rows = kept.unionByName(
            updates.select(*[f.name for f in schema.fields])
        )
    placed = _stage_cow_files(new_rows, path, snap_id, pcols)
    ice_schema = _schema_at(meta)
    entry_bytes = []
    c = {"n_added": 0, "rows_added": 0, "n_existing": 0,
         "rows_existing": 0, "n_deleted": 0, "rows_deleted": 0}
    for rel, pvals in placed:
        full = os.path.join(path, rel)
        nrec, lower, upper = _footer_bounds(full, ice_schema)
        part = {
            pname: (int(pvals[pname]) if ptype in ("long", "int")
                    else pvals[pname])
            for pname, ptype in pfields
            if pvals.get(pname) is not None
        }
        entry_bytes.append(_encode_entry(
            1, snap_id, seq, rel,
            _encode_partition_struct(part, pfields),
            nrec, os.path.getsize(full), lower, upper,
        ))
        c["n_added"] += 1
        c["rows_added"] += nrec
    min_seq = seq
    for e in entries:
        status = 2 if e["file_path"] in candidates else 0
        eseq = e["sequence"] if isinstance(e["sequence"], int) else seq
        esnap = e["snapshot_id"] \
            if isinstance(e["snapshot_id"], int) else snap_id
        if status == 0:
            min_seq = min(min_seq, eseq)
            c["n_existing"] += 1
            c["rows_existing"] += e["record_count"]
        else:
            # a deleted entry records the snapshot that deleted it
            esnap = snap_id
            c["n_deleted"] += 1
            c["rows_deleted"] += e["record_count"]
        entry_bytes.append(_encode_entry(
            status, esnap, eseq, e["file_path"],
            _encode_partition_struct(e["partition"], pfields),
            e["record_count"], e["file_size"], e["lower"], e["upper"],
        ))
    _commit_cow(path, meta, version, pfields, seq, snap_id,
                entry_bytes, c, min_seq, "overwrite", now_ms)
    return {
        "snapshot_id": snap_id,
        "files_rewritten": len(candidates),
        "files_untouched": c["n_existing"],
        "files_added": c["n_added"],
    }


def delete_iceberg(
    path: str,
    key_col: str,
    lo,
    hi,
    now_ms: int = 0,
) -> dict:
    """Range DELETE on the native Iceberg table — COW twin of
    ``delta_native.delete_delta`` (round 14).  When ``key_col`` IS a
    partition field the delete is a pure METADATA operation: entries
    whose partition value falls in [lo, hi] become status=2 with
    ZERO rewrite (the retention-drop shape).  Otherwise files whose
    bound window overlaps the range are rewritten with matching rows
    filtered out (an empty rewrite is a pure delete)."""
    if lo is None or hi is None or lo > hi:
        raise ValueError("delete range malformed")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise ValueError("delete needs an active SparkSession")
    version, meta = _current_meta(path)
    if meta is None:
        raise ValueError(f"no iceberg table at {path}")
    schema = _schema_to_spark(_schema_at(meta))
    pfields = _spec_fields(meta)
    pcols = [n for n, _t in pfields]
    by_name = {f["name"]: f for f in _schema_at(meta)["fields"]}
    cur_snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    entries = _snapshot_entries(path, cur_snap)
    candidates: set[str] = set()
    if key_col in pcols:
        if isinstance(lo, bool) or not isinstance(lo, (int, str)) \
                or type(lo) is not type(hi):
            raise ValueError(
                "partition delete range must be int or str (boundary)"
            )
        for e in entries:
            val = e["partition"].get(key_col)
            if val is None:
                raise ValueError(
                    f"partition struct missing {key_col!r}"
                )
            if isinstance(lo, int) and (
                not isinstance(val, int) or isinstance(val, bool)
            ):
                raise ValueError("partition value not comparable")
            if isinstance(lo, str) and not isinstance(val, str):
                raise ValueError("partition value not comparable")
            if lo <= val <= hi:
                candidates.add(e["file_path"])
        rewrite = False
    else:
        kf = by_name.get(key_col)
        if kf is None or kf["type"] not in ("int", "long"):
            raise ValueError(
                "delete key must be an int/long schema column "
                "(boundary)"
            )
        if not isinstance(lo, int) or isinstance(lo, bool) \
                or not isinstance(hi, int) or isinstance(hi, bool):
            raise ValueError("delete range must be ints (boundary)")
        for e in entries:
            lo_b = e["lower"].get(kf["id"])
            hi_b = e["upper"].get(kf["id"])
            if lo_b is None or hi_b is None:
                raise ValueError(
                    f"no {key_col!r} bounds for {e['file_path']!r} "
                    "(boundary: pre-bounds table)"
                )
            fmin = _bound_int(lo_b, kf["type"])
            fmax = _bound_int(hi_b, kf["type"])
            if not (fmax < lo or fmin > hi):
                candidates.add(e["file_path"])
        rewrite = True
    seq = meta["last-sequence-number"] + 1
    if seq > 1 << 20:
        raise ValueError("sequence number past cap (boundary)")
    snap_id = seq * 100 + 7
    placed: list[tuple[str, dict]] = []
    if rewrite and candidates:
        reader = spark.read.schema(schema)
        if pcols:
            reader = reader.option(
                "basePath", os.path.join(path, "data"))
        kept = reader.parquet(
            *sorted(os.path.join(path, rel) for rel in candidates)
        ).filter(
            ~((F.col(key_col) >= F.lit(lo))
              & (F.col(key_col) <= F.lit(hi)))
        )
        if kept.limit(1).count() > 0:
            placed = _stage_cow_files(kept, path, snap_id, pcols)
    ice_schema = _schema_at(meta)
    entry_bytes = []
    c = {"n_added": 0, "rows_added": 0, "n_existing": 0,
         "rows_existing": 0, "n_deleted": 0, "rows_deleted": 0}
    for rel, pvals in placed:
        full = os.path.join(path, rel)
        nrec, lower, upper = _footer_bounds(full, ice_schema)
        part = {
            pname: (int(pvals[pname]) if ptype in ("long", "int")
                    else pvals[pname])
            for pname, ptype in pfields
            if pvals.get(pname) is not None
        }
        entry_bytes.append(_encode_entry(
            1, snap_id, seq, rel,
            _encode_partition_struct(part, pfields),
            nrec, os.path.getsize(full), lower, upper,
        ))
        c["n_added"] += 1
        c["rows_added"] += nrec
    min_seq = seq
    for e in entries:
        status = 2 if e["file_path"] in candidates else 0
        eseq = e["sequence"] if isinstance(e["sequence"], int) else seq
        esnap = e["snapshot_id"] \
            if isinstance(e["snapshot_id"], int) else snap_id
        if status == 0:
            min_seq = min(min_seq, eseq)
            c["n_existing"] += 1
            c["rows_existing"] += e["record_count"]
        else:
            esnap = snap_id
            c["n_deleted"] += 1
            c["rows_deleted"] += e["record_count"]
        entry_bytes.append(_encode_entry(
            status, esnap, eseq, e["file_path"],
            _encode_partition_struct(e["partition"], pfields),
            e["record_count"], e["file_size"], e["lower"], e["upper"],
        ))
    _commit_cow(path, meta, version, pfields, seq, snap_id,
                entry_bytes, c, min_seq, "delete", now_ms)
    return {
        "snapshot_id": snap_id,
        "files_rewritten": len(candidates) if rewrite else 0,
        "files_dropped": 0 if rewrite else len(candidates),
        "files_untouched": c["n_existing"],
        "files_added": c["n_added"],
    }


def _with_unpartitioned_spec(meta: dict) -> dict:
    """metadata with the GLOBAL-delete spec registered: partition
    spec id 1 = no fields.  Idempotent; the default spec stays 0."""
    specs = list(meta.get("partition-specs", []))
    if not any(
        isinstance(s, dict) and s.get("spec-id") == 1 for s in specs
    ):
        specs.append({"spec-id": 1, "fields": []})
    out = dict(meta)
    out["partition-specs"] = specs
    return out


def _existing_entry_bytes(
    entries: list[dict], pfields, seq: int, snap_id: int,
    content: int = 0, status_for: dict | None = None,
) -> tuple[list[bytes], dict, int]:
    """Re-encode prior live entries into a new self-contained
    manifest: status 0 carrying ORIGINAL snapshot/sequence numbers
    (or status 2 for paths in ``status_for``).  Returns (entry
    bytes, counts, min_seq)."""
    out: list[bytes] = []
    c = {"n_added": 0, "rows_added": 0, "n_existing": 0,
         "rows_existing": 0, "n_deleted": 0, "rows_deleted": 0}
    min_seq = seq
    drop = status_for or {}
    for e in entries:
        status = 2 if e["file_path"] in drop else 0
        eseq = e["sequence"] if isinstance(e["sequence"], int) else seq
        esnap = e["snapshot_id"] \
            if isinstance(e["snapshot_id"], int) else snap_id
        if status == 0:
            min_seq = min(min_seq, eseq)
            c["n_existing"] += 1
            c["rows_existing"] += e["record_count"]
        else:
            esnap = snap_id
            c["n_deleted"] += 1
            c["rows_deleted"] += e["record_count"]
        out.append(_encode_entry(
            status, esnap, eseq, e["file_path"],
            _encode_partition_struct(e["partition"], pfields),
            e["record_count"], e["file_size"], e["lower"],
            e["upper"], content=content,
        ))
    return out, c, min_seq


def mor_delete_iceberg(
    path: str,
    key_col: str,
    lo,
    hi,
    now_ms: int = 0,
) -> dict:
    """Merge-on-read range DELETE via a POSITION-DELETE file — the
    Iceberg v2 twin of ``delta_native.dv_delete_delta``: NO data
    file is rewritten.  The matching rows' physical positions are
    computed distributed (``_metadata.row_index``), written as ONE
    spec-shaped delete parquet (columns ``file_path`` string /
    ``pos`` long, sorted by both — the schema
    ``functions/iceberg_scan.py:_load_positional_deletes``
    independently decodes), and committed as a DELETE manifest
    (manifest-list content=1, data_file.content=1) beside a
    self-contained data manifest whose entries keep their ORIGINAL
    snapshot/sequence numbers.  Prior delete files carry over as
    status-0 entries; duplicate positions across delete files are
    legal (readers union).  Exact-path matching makes the spec's
    sequence-number applicability rule a no-op for this writer
    (paths are never reused).

    PARTITIONED tables (round 14 continuation) use the spec's
    GLOBAL-delete shape: the delete file is written under the
    UNPARTITIONED spec (its manifest declares partition-spec-id 1 —
    registered in metadata on first use — with an empty partition
    struct), so one file may name rows across partitions.  A
    partition-COLUMN delete stays a pure metadata drop
    (``delete_iceberg``); the key must be an int/long column."""
    if lo is None or hi is None or lo > hi:
        raise ValueError("delete range malformed")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise ValueError("mor delete needs an active SparkSession")
    version, meta = _current_meta(path)
    if meta is None:
        raise ValueError(f"no iceberg table at {path}")
    pfields = _spec_fields(meta)
    if key_col in [n for n, _t in pfields]:
        raise ValueError(
            "partition-column delete is a metadata drop (boundary: "
            "use delete_iceberg)"
        )
    schema = _schema_to_spark(_schema_at(meta))
    by_name = {f["name"]: f for f in _schema_at(meta)["fields"]}
    kf = by_name.get(key_col)
    if kf is None or kf["type"] not in ("int", "long"):
        raise ValueError(
            "delete key must be an int/long schema column (boundary)"
        )
    if not isinstance(lo, int) or isinstance(lo, bool) \
            or not isinstance(hi, int) or isinstance(hi, bool):
        raise ValueError("delete range must be ints (boundary)")
    cur_snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    data_entries, delete_entries = _snapshot_entries_mor(
        path, cur_snap)
    candidates: list[str] = []
    for e in data_entries:
        lo_b = e["lower"].get(kf["id"])
        hi_b = e["upper"].get(kf["id"])
        if lo_b is None or hi_b is None:
            raise ValueError(
                f"no {key_col!r} bounds for {e['file_path']!r} "
                "(boundary: pre-bounds table)"
            )
        if not (_bound_int(hi_b, kf["type"]) < lo
                or _bound_int(lo_b, kf["type"]) > hi):
            candidates.append(e["file_path"])
    seq = meta["last-sequence-number"] + 1
    if seq > 1 << 20:
        raise ValueError("sequence number past cap (boundary)")
    snap_id = seq * 100 + 7
    del_rel = None
    del_rows = 0
    if candidates:
        reader = spark.read.schema(schema)
        if pfields:
            reader = reader.option(
                "basePath", os.path.join(path, "data"))
        # basename -> manifest-relative path, broadcast — under Hive
        # partitioning the rel carries the partition dirs, so a
        # "data/" + basename reconstruction would be wrong
        rel_map = spark.createDataFrame(
            [(os.path.basename(rel), rel) for rel in candidates],
            "_name string, file_path string",
        )
        matches = reader.parquet(
            *sorted(os.path.join(path, rel) for rel in candidates)
        ).filter(
            (F.col(key_col) >= F.lit(lo))
            & (F.col(key_col) <= F.lit(hi))
        ).select(
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("_name"),
            F.col("_metadata.row_index").alias("pos"),
        ).join(F.broadcast(rel_map), on="_name").select(
            "file_path", "pos",
        )
        staging = os.path.join(
            path, f".staging-{uuid.uuid4().hex[:12]}")
        # spec: rows within a delete file sorted by file_path, pos
        matches.repartition(1).sortWithinPartitions(
            "file_path", "pos"
        ).write.parquet(staging)
        import shutil

        part_files = sorted(
            n for n in os.listdir(staging) if n.endswith(".parquet")
        )
        if len(part_files) != 1:
            raise ValueError("delete staging not a single file")
        del_rel = f"data/pos-delete-{snap_id}.parquet"
        os.rename(os.path.join(staging, part_files[0]),
                  os.path.join(path, del_rel))
        shutil.rmtree(staging)
        import pyarrow.parquet as pq

        del_rows = pq.ParquetFile(
            os.path.join(path, del_rel)).metadata.num_rows
        if del_rows == 0:
            os.remove(os.path.join(path, del_rel))
            del_rel = None
    data_bytes, data_counts, data_min = _existing_entry_bytes(
        data_entries, pfields, seq, snap_id)
    manifests = [{
        "rel": f"metadata/m-{snap_id}.avro",
        "entries": data_bytes,
        "pfields": pfields,
        "content": 0,
        "counts": data_counts,
        "min_seq": data_min,
    }]
    # delete manifests always use the UNPARTITIONED spec (global
    # deletes): prior delete entries carry an empty partition struct
    del_bytes, del_counts, del_min = _existing_entry_bytes(
        delete_entries, [], seq, snap_id, content=1)
    if del_rel is not None:
        del_bytes.append(_encode_entry(
            1, snap_id, seq, del_rel, b"",
            del_rows, os.path.getsize(os.path.join(path, del_rel)),
            {}, {}, content=1,
        ))
        del_counts["n_added"] += 1
        del_counts["rows_added"] += del_rows
    if del_bytes:
        manifests.append({
            "rel": f"metadata/dm-{snap_id}.avro",
            "entries": del_bytes,
            "pfields": [],
            "content": 1,
            "counts": del_counts,
            "min_seq": del_min,
            "spec_id": 1 if pfields else 0,
        })
        if pfields:
            meta = _with_unpartitioned_spec(meta)
    summary = dict(data_counts)
    _commit_snapshot(path, meta, version, seq, snap_id, manifests,
                     summary, "delete", now_ms)
    return {
        "snapshot_id": snap_id,
        "files_rewritten": 0,
        "files_with_candidates": len(candidates),
        "delete_file": del_rel,
        "delete_rows": del_rows,
    }


def purge_deletes_iceberg(path: str, now_ms: int = 0) -> dict:
    """Apply and DROP all live position-delete files (the
    ``rewrite_position_delete_files`` maintenance action): data
    files that have at least one delete position are rewritten
    merge-on-read (survivor rows only), untouched files carry over
    with original snapshot/sequence numbers, and the new snapshot
    references NO delete entries — unblocking the copy-on-write DML
    paths that loud-reject MOR state.  The superseded delete parquet
    files stay on disk for time travel until ``expire_iceberg``
    reclaims them (same lifecycle as superseded data files)."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise ValueError("purge needs an active SparkSession")
    version, meta = _current_meta(path)
    if meta is None:
        raise ValueError(f"no iceberg table at {path}")
    pfields = _spec_fields(meta)
    pnames = [n for n, _t in pfields]
    schema = _schema_to_spark(_schema_at(meta))
    cur_snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    data_entries, delete_entries = _snapshot_entries_mor(
        path, cur_snap)
    if not delete_entries:
        return {"snapshot_id": None, "files_rewritten": 0,
                "delete_files_dropped": 0}
    del_paths = sorted(
        os.path.join(path, e["file_path"]) for e in delete_entries
    )
    del_df = spark.read.schema(
        "file_path string, pos long").parquet(*del_paths)
    affected = {
        r["file_path"]
        for r in del_df.select("file_path").distinct().collect()
    }  # bounded: one row per file with deletions
    by_path = {e["file_path"]: e for e in data_entries}
    # delete rows naming since-rewritten paths are legal dead weight
    # (they match nothing) — only live data files rewrite
    affected &= set(by_path)
    seq = meta["last-sequence-number"] + 1
    if seq > 1 << 20:
        raise ValueError("sequence number past cap (boundary)")
    snap_id = seq * 100 + 7
    placed: list[tuple[str, dict]] = []
    if affected:
        names = [f.name for f in schema.fields]
        reader = spark.read.schema(schema)
        if pnames:
            reader = reader.option(
                "basePath", os.path.join(path, "data"))
        # join on BASENAME (unique table-wide): under Hive
        # partitioning the delete rows carry partition dirs in
        # file_path, the scan metadata a full URI
        scan = reader.parquet(
            *sorted(os.path.join(path, rel) for rel in affected)
        ).withColumn(
            "_mor_name",
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ),
        ).withColumn("_mor_pos", F.col("_metadata.row_index"))
        survivors = scan.join(
            F.broadcast(del_df.select(
                F.element_at(
                    F.split(F.col("file_path"), "/"), -1
                ).alias("_mor_name"),
                F.col("pos").alias("_mor_pos"),
            )),
            on=["_mor_name", "_mor_pos"],
            how="left_anti",
        ).select(*names)
        placed = _stage_cow_files(survivors, path, snap_id, pnames)
    ice_schema = _schema_at(meta)
    entry_bytes = []
    c = {"n_added": 0, "rows_added": 0, "n_existing": 0,
         "rows_existing": 0, "n_deleted": 0, "rows_deleted": 0}
    for rel, pvals in placed:
        full = os.path.join(path, rel)
        nrec, lower, upper = _footer_bounds(full, ice_schema)
        part = {
            pname: (int(pvals[pname]) if ptype in ("long", "int")
                    else pvals[pname])
            for pname, ptype in pfields
            if pvals.get(pname) is not None
        }
        entry_bytes.append(_encode_entry(
            1, snap_id, seq, rel,
            _encode_partition_struct(part, pfields),
            nrec, os.path.getsize(full), lower, upper,
        ))
        c["n_added"] += 1
        c["rows_added"] += nrec
    carry_bytes, carry_counts, min_seq = _existing_entry_bytes(
        data_entries, pfields, seq, snap_id,
        status_for={p: 2 for p in affected},
    )
    entry_bytes.extend(carry_bytes)
    for k in carry_counts:
        c[k] += carry_counts[k]
    # the delete manifest: every delete file goes status=2 — the new
    # snapshot references zero live delete entries
    dd_bytes, dd_counts, dd_min = _existing_entry_bytes(
        delete_entries, [], seq, snap_id, content=1,
        status_for={e["file_path"]: 2 for e in delete_entries},
    )
    manifests = [{
        "rel": f"metadata/m-{snap_id}.avro",
        "entries": entry_bytes,
        "pfields": pfields,
        "content": 0,
        "counts": c,
        "min_seq": min_seq,
    }, {
        "rel": f"metadata/dm-{snap_id}.avro",
        "entries": dd_bytes,
        "pfields": [],
        "content": 1,
        "counts": dd_counts,
        "min_seq": dd_min,
        "spec_id": 1 if pfields else 0,
    }]
    _commit_snapshot(path, meta, version, seq, snap_id, manifests,
                     c, "replace", now_ms)
    return {
        "snapshot_id": snap_id,
        "files_rewritten": len(affected),
        "files_added": len(placed),
        "delete_files_dropped": len(delete_entries),
    }


def publish_iceberg(
    path: str,
    branch: str,
    now_ms: int = 0,
    drop_branch: bool = True,
) -> dict:
    """PUBLISH (the fast-forward half of write-audit-publish):
    advance main to ``branch``'s head after validating the
    FAST-FORWARD condition — the branch head's parent chain must
    reach main's current head, so publishing never discards a main
    commit that landed mid-audit (that race is loud, exactly
    Iceberg's ``fast_forward`` contract).  Metadata-only; the
    branch ref is dropped after publishing by default."""
    version, meta = _current_meta(path)
    if meta is None:
        raise ValueError(f"no iceberg table at {path}")
    bref = meta.get("refs", {}).get(branch)
    if not isinstance(bref, dict) \
            or not isinstance(bref.get("snapshot-id"), int):
        raise ValueError(f"branch {branch!r} does not exist")
    if bref.get("type") != "branch":
        raise ValueError(f"ref {branch!r} is a tag, not a branch")
    target = bref["snapshot-id"]
    main_head = meta["current-snapshot-id"]
    by_id = {
        s["snapshot-id"]: s for s in meta.get("snapshots", [])
        if isinstance(s, dict)
    }
    node = target
    hops = 0
    while node is not None and node != main_head:
        snap = by_id.get(node)
        node = snap.get("parent-snapshot-id") if snap else None
        hops += 1
        if hops > len(by_id) + 1:
            raise ValueError("snapshot parent chain cyclic")
    if node != main_head:
        raise ValueError(
            f"branch {branch!r} does not descend from main's head "
            "(boundary: main advanced mid-audit — rebase the branch)"
        )
    log = list(meta.get("snapshot-log", []))
    log.append({"timestamp-ms": now_ms, "snapshot-id": target})
    refs = {
        k: v for k, v in meta.get("refs", {}).items()
        if k != "main" and not (drop_branch and k == branch)
    }
    refs["main"] = {"snapshot-id": target, "type": "branch"}
    new_meta = dict(meta)
    new_meta.update({
        "last-updated-ms": now_ms,
        "current-snapshot-id": target,
        "snapshot-log": log,
        "refs": refs,
    })
    _write_metadata(path, new_meta, version)
    return {
        "published": target,
        "fast_forwarded_commits": hops,
        "branch_dropped": drop_branch,
    }


def rollback_iceberg(
    path: str,
    snapshot_id: int,
    now_ms: int = 0,
) -> dict:
    """Rollback (the spec's ``rollback_to_snapshot`` procedure):
    METADATA-ONLY — a new metadata version whose
    ``current-snapshot-id`` (and the ``main`` branch ref) points at
    the target ancestor snapshot.  No snapshot is deleted: the
    rolled-back-over snapshots stay readable by id until
    ``expire_iceberg`` reclaims them, and the snapshot-log records
    the state change (time-travel-by-timestamp resolves the
    rollback boundary correctly).  Loud when the target does not
    exist — after an expire that is real Iceberg's error too."""
    version, meta = _current_meta(path)
    if meta is None:
        raise ValueError(f"no iceberg table at {path}")
    target = next(
        (s for s in meta.get("snapshots", [])
         if isinstance(s, dict)
         and s.get("snapshot-id") == snapshot_id),
        None,
    )
    if target is None:
        raise ValueError(
            f"snapshot {snapshot_id} does not exist (boundary: it "
            "may have been expired)"
        )
    if meta["current-snapshot-id"] == snapshot_id:
        return {"rolled_back": False, "current": snapshot_id}
    log = list(meta.get("snapshot-log", []))
    log.append({"timestamp-ms": now_ms, "snapshot-id": snapshot_id})
    new_meta = dict(meta)
    new_meta.update({
        "last-updated-ms": now_ms,
        "current-snapshot-id": snapshot_id,
        "snapshot-log": log,
        "refs": {
            **meta.get("refs", {}),
            "main": {"snapshot-id": snapshot_id, "type": "branch"},
        },
    })
    _write_metadata(path, new_meta, version)
    return {"rolled_back": True, "current": snapshot_id}


def tag_iceberg(
    path: str,
    name: str,
    snapshot_id: int | None = None,
) -> dict:
    """Create a TAG ref (the spec's named-snapshot references):
    metadata-only; ``read_iceberg(ref=...)`` resolves it, and
    ``expire_iceberg`` already retains every ref target.  Defaults
    to tagging the current snapshot."""
    version, meta = _current_meta(path)
    if meta is None:
        raise ValueError(f"no iceberg table at {path}")
    if not name or name == "main":
        raise ValueError("tag name malformed (boundary)")
    sid = snapshot_id if snapshot_id is not None \
        else meta["current-snapshot-id"]
    if not any(
        isinstance(s, dict) and s.get("snapshot-id") == sid
        for s in meta.get("snapshots", [])
    ):
        raise ValueError(f"snapshot {sid} does not exist")
    refs = dict(meta.get("refs", {}))
    if name in refs:
        raise ValueError(f"ref {name!r} already exists (boundary)")
    refs[name] = {"snapshot-id": sid, "type": "tag"}
    new_meta = dict(meta)
    new_meta["refs"] = refs
    _write_metadata(path, new_meta, version)
    return {"tag": name, "snapshot_id": sid}


def snapshot_at_timestamp(path: str, ts_ms: int) -> int:
    """``FOR TIMESTAMP AS OF`` resolution from the snapshot-log: the
    LAST snapshot whose timestamp-ms is <= ``ts_ms``.  Metadata-only.
    A timestamp before the log's first entry is loud — after an
    expire, the snapshot it names no longer exists."""
    _v, meta = _current_meta(path)
    if meta is None:
        raise ValueError(f"no iceberg table at {path}")
    log = meta.get("snapshot-log", [])
    eligible = [
        e for e in log
        if isinstance(e, dict)
        and isinstance(e.get("timestamp-ms"), int)
        and e["timestamp-ms"] <= ts_ms
    ]
    # the entry must also still RESOLVE (expire prunes the log too,
    # but belt the contract)
    ids = {s.get("snapshot-id") for s in meta.get("snapshots", [])}
    eligible = [e for e in eligible if e.get("snapshot-id") in ids]
    if not eligible:
        raise ValueError(
            "timestamp precedes the retained snapshot log (boundary:"
            " the snapshot it names may have been expired)"
        )
    return eligible[-1]["snapshot-id"]


def read_iceberg(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    where: dict | None = None,
    as_of_ms: int | None = None,
    ref: str | None = None,
) -> DataFrame:
    """The Iceberg table at ``path`` as a DataFrame — resolve the
    snapshot (current, a historical id, or ``as_of_ms`` timestamp =
    the spec's FOR TIMESTAMP AS OF: time travel), walk its
    manifest list -> manifests -> live data files, then a
    schema-pinned parquet scan so Catalyst pushdown applies below
    the metadata layer.

    ``where`` = {partition field: value} prunes AT THE MANIFEST
    LAYER via each entry's typed partition struct — the other
    partitions' files never reach the scan plan (asserted via
    ``inputFiles()`` in tests).  Keys must be declared partition
    fields; a typo loud-rejects instead of silently full-scanning."""
    if sum(x is not None for x in (snapshot_id, as_of_ms, ref)) > 1:
        raise ValueError(
            "pass at most one of snapshot_id / as_of_ms / ref"
        )
    if as_of_ms is not None:
        snapshot_id = snapshot_at_timestamp(path, as_of_ms)
    _v, meta = _current_meta(path)
    if meta is None:
        raise ValueError(f"no iceberg table at {path}")
    if ref is not None:
        r = meta.get("refs", {}).get(ref)
        if not isinstance(r, dict) \
                or not isinstance(r.get("snapshot-id"), int):
            raise ValueError(f"ref {ref!r} does not exist")
        snapshot_id = r["snapshot-id"]
    sid = snapshot_id if snapshot_id is not None \
        else meta["current-snapshot-id"]
    snap = next(
        (s for s in meta.get("snapshots", [])
         if isinstance(s, dict) and s.get("snapshot-id") == sid),
        None,
    )
    if snap is None:
        raise ValueError(f"snapshot {sid} does not exist")
    # time travel resolves the schema AS OF the snapshot (evolution-
    # aware): an old snapshot reads with its own column set
    schema = _schema_to_spark(_schema_at(meta, snap))
    pfields = _spec_fields(meta)
    pnames = [n for n, _t in pfields]
    data_entries, delete_entries = _snapshot_entries_mor(path, snap)
    files = [(e["file_path"], e["partition"]) for e in data_entries]
    if where:
        for k in where:
            if k not in pnames:
                raise ValueError(
                    f"{k!r} is not a partition field of this table"
                )
        files = [
            (rel, part) for rel, part in files
            if all(part.get(k) == v for k, v in where.items())
        ]
    if not files:
        return spark.createDataFrame([], schema)
    reader = spark.read.schema(schema)
    if pnames:
        # partition columns materialize from the Hive layout; a
        # UniForm-converted table (sources/uniform.py) keeps its
        # data files at the DELTA root rather than under data/
        base = os.path.join(path, "data") if all(
            rel.startswith("data/") for rel, _p in files
        ) else path
        reader = reader.option("basePath", base)
    scan = reader.parquet(
        *sorted(os.path.join(path, rel) for rel, _p in files)
    )
    if not delete_entries:
        return scan
    # merge-on-read: subtract position deletes (spec schema
    # file_path + pos) via a broadcast LEFT ANTI join on (file
    # basename, _metadata.row_index).  Basenames are unique
    # table-wide (writer names embed the snapshot id), and a delete
    # row naming a since-rewritten path matches nothing — exact-path
    # semantics make the sequence-number applicability rule a no-op
    # here.  Delete files referencing PRUNED partitions' files also
    # match nothing, so `where` stays manifest-layer pruning.
    from pyspark.sql import functions as F

    names = [f.name for f in schema.fields]
    for e in delete_entries:
        if not os.path.exists(os.path.join(path, e["file_path"])):
            raise ValueError(
                f"position-delete file {e['file_path']!r} missing "
                "from table"
            )
    del_reader = spark.read.schema("file_path string, pos long")
    del_df = del_reader.parquet(
        *sorted(
            os.path.join(path, e["file_path"])
            for e in delete_entries
        )
    ).select(
        F.element_at(
            F.split(F.col("file_path"), "/"), -1
        ).alias("_mor_name"),
        F.col("pos").alias("_mor_pos"),
    )
    probed = scan.withColumn(
        "_mor_name",
        F.element_at(
            F.split(F.col("_metadata.file_path"), "/"), -1
        ),
    ).withColumn("_mor_pos", F.col("_metadata.row_index"))
    return probed.join(
        F.broadcast(del_df),
        on=["_mor_name", "_mor_pos"],
        how="left_anti",
    ).select(*names)


def expire_iceberg(
    path: str,
    older_than_ms: int,
    now_ms: int = 0,
) -> dict:
    """EXECUTED snapshot expiry (round 14 — VERDICT r13 item 6,
    matching the Delta VACUUM's retention contract): snapshots whose
    ``timestamp-ms`` <= ``older_than_ms`` are removed from the
    metadata — except the CURRENT snapshot and every ref target,
    which are always retained — then every manifest list, manifest,
    and data file reachable ONLY from expired snapshots is
    physically deleted.  Time travel to an expired snapshot
    loud-fails afterwards ("snapshot ... does not exist") — that is
    the retention contract, not a bug.  Re-running is idempotent
    (already-expired snapshots are simply absent).  Returns
    counts."""
    version, meta = _current_meta(path)
    if meta is None:
        raise ValueError(f"no iceberg table at {path}")
    keep_ids = {meta["current-snapshot-id"]}
    for ref in meta.get("refs", {}).values():
        if isinstance(ref, dict) and isinstance(
                ref.get("snapshot-id"), int):
            keep_ids.add(ref["snapshot-id"])
    snapshots = meta.get("snapshots", [])
    retained = [
        s for s in snapshots
        if s["snapshot-id"] in keep_ids
        or s["timestamp-ms"] > older_than_ms
    ]
    expired = [s for s in snapshots if s not in retained]
    if not expired:
        return {"expired": 0, "retained": len(retained),
                "deleted_data_files": 0, "deleted_manifests": 0,
                "deleted_manifest_lists": 0}
    pfields = _spec_fields(meta)

    def reach(snaps):
        lists, manifests, data = set(), set(), set()
        for s in snaps:
            ml_rel = s["manifest-list"]
            ml_path = os.path.join(path, ml_rel)
            if not os.path.exists(ml_path):
                raise ValueError(
                    f"manifest list {ml_rel!r} missing from table"
                )
            lists.add(ml_rel)
            for mf in decode_avro_blocks(open(ml_path, "rb").read()):
                manifests.add(mf["manifest_path"])
            d_entries, del_entries = _snapshot_entries_mor(
                path, s)
            for e in d_entries + del_entries:
                # position-delete parquet files are reachable state
                # exactly like data files
                data.add(e["file_path"])
        return lists, manifests, data

    keep_lists, keep_manifests, keep_data = reach(retained)
    exp_lists, exp_manifests, exp_data = reach(expired)
    del_lists = sorted(exp_lists - keep_lists)
    del_manifests = sorted(exp_manifests - keep_manifests)
    del_data = sorted(exp_data - keep_data)
    # metadata first: once the new version is live, the files below
    # are unreachable by any reader of that version
    retained_ids = {s["snapshot-id"] for s in retained}
    new_meta = dict(meta)
    new_meta["snapshots"] = retained
    new_meta["snapshot-log"] = [
        e for e in meta.get("snapshot-log", [])
        if e.get("snapshot-id") in retained_ids
    ]
    new_meta["last-updated-ms"] = now_ms
    _write_metadata(path, new_meta, version)
    for rel in del_lists + del_manifests + del_data:
        full = os.path.join(path, rel)
        if os.path.exists(full):
            os.remove(full)
    return {
        "expired": len(expired),
        "retained": len(retained),
        "deleted_data_files": len(del_data),
        "deleted_manifests": len(del_manifests),
        "deleted_manifest_lists": len(del_lists),
    }


def optimize_iceberg(
    path: str, target_rows: int, now_ms: int = 0
) -> dict:
    """OPTIMIZE (small-file compaction) on the native Iceberg table —
    the COW twin of ``delta_native.optimize_delta`` (round 14): the
    live-entry inventory goes through ``operators/maintenance.py:
    plan_compaction`` partitioned by the partition struct (packing
    never crosses a partition), each MULTI-file group is rewritten
    into one file, and the new snapshot's manifest marks the packed
    files status=2, the rewrites status=1, and everything else
    status=0 with original snapshot/sequence numbers.  The summary
    operation is ``replace`` (the spec's name for a
    content-preserving rewrite) — row content is invariant, which
    the registry oracle pins."""
    if target_rows <= 0:
        raise ValueError("target_rows must be positive")
    from pyspark.sql import SparkSession

    from ..operators.maintenance import plan_compaction

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise ValueError("optimize needs an active SparkSession")
    version, meta = _current_meta(path)
    if meta is None:
        raise ValueError(f"no iceberg table at {path}")
    schema = _schema_to_spark(_schema_at(meta))
    pfields = _spec_fields(meta)
    pcols = [n for n, _t in pfields]
    cur_snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    entries = _snapshot_entries(path, cur_snap)
    inv_rows = [
        (json.dumps(e["partition"], sort_keys=True), e["file_path"],
         e["record_count"])
        for e in sorted(entries, key=lambda e: e["file_path"])
    ]
    inventory = spark.createDataFrame(
        inv_rows, "part string, rel string, rows long"
    )
    plan = plan_compaction(
        inventory, target_rows,
        table_col="part", path_col="rel", weight_col="rows",
    )
    picked = plan.filter("needs_compaction").select(
        "part", "group_id", "rel"
    ).collect()  # bounded: file-granular plan
    groups: dict[tuple, list[str]] = {}
    for r in picked:
        groups.setdefault((r["part"], r["group_id"]), []).append(
            r["rel"])
    candidates = {rel for g in groups.values() for rel in g}
    seq = meta["last-sequence-number"] + 1
    if seq > 1 << 20:
        raise ValueError("sequence number past cap (boundary)")
    snap_id = seq * 100 + 7
    placed_all: list[tuple[str, dict]] = []
    for gi, gkey in enumerate(sorted(groups)):
        group = sorted(groups[gkey])
        reader = spark.read.schema(schema)
        if pcols:
            reader = reader.option(
                "basePath", os.path.join(path, "data"))
        merged = reader.parquet(
            *[os.path.join(path, rel) for rel in group]
        ).coalesce(1)
        placed = _stage_cow_files(merged, path, snap_id, pcols)
        # disambiguate names across groups of one snapshot
        fixed = []
        for rel, pv in placed:
            new_rel = rel.replace(".parquet", f"-g{gi:03d}.parquet")
            os.rename(os.path.join(path, rel),
                      os.path.join(path, new_rel))
            fixed.append((new_rel, pv))
        placed_all.extend(fixed)
    ice_schema = _schema_at(meta)
    entry_bytes = []
    c = {"n_added": 0, "rows_added": 0, "n_existing": 0,
         "rows_existing": 0, "n_deleted": 0, "rows_deleted": 0}
    for rel, pvals in placed_all:
        full = os.path.join(path, rel)
        nrec, lower, upper = _footer_bounds(full, ice_schema)
        part = {
            pname: (int(pvals[pname]) if ptype in ("long", "int")
                    else pvals[pname])
            for pname, ptype in pfields
            if pvals.get(pname) is not None
        }
        entry_bytes.append(_encode_entry(
            1, snap_id, seq, rel,
            _encode_partition_struct(part, pfields),
            nrec, os.path.getsize(full), lower, upper,
        ))
        c["n_added"] += 1
        c["rows_added"] += nrec
    min_seq = seq
    for e in entries:
        status = 2 if e["file_path"] in candidates else 0
        eseq = e["sequence"] if isinstance(e["sequence"], int) else seq
        esnap = e["snapshot_id"] \
            if isinstance(e["snapshot_id"], int) else snap_id
        if status == 0:
            min_seq = min(min_seq, eseq)
            c["n_existing"] += 1
            c["rows_existing"] += e["record_count"]
        else:
            esnap = snap_id
            c["n_deleted"] += 1
            c["rows_deleted"] += e["record_count"]
        entry_bytes.append(_encode_entry(
            status, esnap, eseq, e["file_path"],
            _encode_partition_struct(e["partition"], pfields),
            e["record_count"], e["file_size"], e["lower"], e["upper"],
        ))
    _commit_cow(path, meta, version, pfields, seq, snap_id,
                entry_bytes, c, min_seq, "replace", now_ms)
    return {
        "snapshot_id": snap_id,
        "files_before": len(entries),
        "files_removed": len(candidates),
        "files_added": c["n_added"],
        "files_after": len(entries) - len(candidates) + c["n_added"],
    }
