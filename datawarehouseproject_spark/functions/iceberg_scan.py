"""Apache Iceberg snapshot scan: metadata JSON → manifest-list avro
→ manifest avro → parquet data files, with BOUNDS-BASED FILE PRUNING
— the lakehouse read path a 100 TB table actually serves queries
through.  Everything here is the public Iceberg table spec
(iceberg.apache.org/spec):

- table metadata is a JSON file: ``format-version``, ``snapshots``
  (each with ``snapshot-id`` and a ``manifest-list`` avro path) and
  ``current-snapshot-id`` — a reader must serve the CURRENT snapshot,
  not the union of history;
- the manifest list is an AVRO container of ``manifest_file`` records
  (``manifest_path``, ``manifest_length``, ``added_snapshot_id``,
  ``added_data_files_count``);
- each manifest is an AVRO container of ``manifest_entry`` records:
  ``status`` (0 existing / 1 added / 2 DELETED — deleted entries must
  not be scanned), nullable ``snapshot_id``, and a NESTED
  ``data_file`` record (``file_path``, ``file_format``,
  ``record_count``, ``file_size_in_bytes``, ``lower_bounds`` /
  ``upper_bounds``).  Iceberg's bounds are conceptually
  ``map<int field-id, bytes>``; since Avro maps require string keys
  the spec stores them as ARRAYS of key/value records — decoded here
  by the generic nested Avro decoder (:mod:`.avro_scan`).  Bound
  VALUES use Iceberg's single-value binary serialization: int64 =
  8-byte little-endian;
- planning = keep a data file iff ``lower <= probe <= upper`` for
  the predicate column, then read only survivors.

The fixture "warehouse" is a tar bundle (stdlib ``tarfile`` both
ways — incidental plumbing, not a format under test) holding the
metadata JSON, manifest-list/manifest avro files written by this
repo's spec-derived encoder, and REAL parquet data files written by
pyarrow, whose footers the scan CROSS-CHECKS against the manifest's
``record_count`` per file (the two metadata systems cannot drift).
Pinning follows the layered pattern: pyarrow pins the parquet layer
(and reads back the surviving files' values), the avro layer's
binary encoding is pinned by the flat-fixture oracles, and every
aggregate is recomputed by the DuckDB oracle from the writer plan."""

from __future__ import annotations

import io
import json
import struct
import tarfile

from .avro_scan import (
    _zigzag_write,
    decode_avro_blocks,
    encode_avro_container,
)

_MANIFEST_LIST_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
            {"name": "content", "type": "int"},  # 0 data, 1 deletes
            {"name": "added_snapshot_id", "type": "long"},
            {"name": "added_data_files_count", "type": "int"},
        ],
    }
).encode()

_BOUND_SCHEMA = {
    "type": "array",
    "items": {
        "type": "record",
        "name": "k_v",
        "fields": [
            {"name": "key", "type": "int"},
            {"name": "value", "type": "bytes"},
        ],
    },
}

_MANIFEST_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "data_file",
                    "fields": [
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                        {"name": "lower_bounds", "type": _BOUND_SCHEMA},
                        {"name": "upper_bounds", "type": _BOUND_SCHEMA},
                    ],
                },
            },
        ],
    }
).encode()

_V_FIELD_ID = 1  # the predicate column's Iceberg field id


def _enc_string(s: str) -> bytes:
    b = s.encode()
    return _zigzag_write(len(b)) + b


def _enc_bytes(b: bytes) -> bytes:
    return _zigzag_write(len(b)) + b


def _enc_bounds(value: int) -> bytes:
    """One-entry bounds array: [(field id, int64-LE bytes)], closed
    with the 0 terminator."""
    return (
        _zigzag_write(1)
        + _zigzag_write(_V_FIELD_ID)
        + _enc_bytes(struct.pack("<q", value))
        + _zigzag_write(0)
    )


def synth_iceberg_plan(seed: int) -> dict:
    """Plan mirrored in the DuckDB oracle: ``3 + seed%4`` data files;
    file j holds ``40 + (seed + j) % 60`` rows of
    ``v = lo_j + (i % 40)`` with ``lo_j = j*100 + seed%50`` (so
    bounds are exactly ``[lo_j, lo_j+39]``); manifests split the
    files in half; snapshot 2 (CURRENT) sees all manifests, snapshot
    1 only the first — plus one DELETED entry that planning must
    skip.  The probe ``lo_k + 17`` with ``k = seed % n_files`` lands
    inside exactly ONE file's bounds.  A POSITIONAL DELETE file
    (v2 merge-on-read) removes positions ``i % 7 == 3`` from every
    data file, so live probe matches are positions
    ``i ≡ 17 (mod 40)`` minus the ``i ≡ 17 (mod 280)`` overlap."""
    n_files = 3 + seed % 4
    return {
        "n_files": n_files,
        "probe_file": seed % n_files,
        "probe": (seed % n_files) * 100 + seed % 50 + 17,
    }


def _file_rows(seed: int, j: int) -> int:
    return 40 + (seed + j) % 60


def _file_lo(seed: int, j: int) -> int:
    return j * 100 + seed % 50


def synth_iceberg(seed: int) -> bytes:
    """One Iceberg "table" as a tar bundle: metadata JSON, two
    snapshots' manifest lists, manifests with nested data_file
    records and bounds arrays, and REAL pyarrow parquet files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    plan = synth_iceberg_plan(seed)
    n_files = plan["n_files"]
    sync = bytes((seed * 17 + j * 5 + 11) % 256 for j in range(16))
    files: dict[str, bytes] = {}

    def entry(status: int, path: str, rows: int, lo: int) -> bytes:
        return (
            _zigzag_write(status)
            + _zigzag_write(1) + _zigzag_write(2)  # snapshot_id = 2
            + _enc_string(path)
            + _enc_string("PARQUET")
            + _zigzag_write(rows)
            + _zigzag_write(len(files[path]))
            + _enc_bounds(lo)
            + _enc_bounds(lo + 39)
        )

    data_entries = []
    for j in range(n_files):
        rows = _file_rows(seed, j)
        lo = _file_lo(seed, j)
        buf = io.BytesIO()
        pq.write_table(
            pa.table({"v": [lo + (i % 40) for i in range(rows)]}), buf
        )
        path = f"data/f{j:02d}.parquet"
        files[path] = buf.getvalue()
        data_entries.append(entry(1, path, rows, lo))
    # a DELETED entry pointing at file 0 again: planning must skip it
    data_entries.append(
        entry(2, "data/f00.parquet", _file_rows(seed, 0), _file_lo(seed, 0))
    )
    # v2 POSITIONAL DELETE file: spec schema (file_path, pos), one
    # file covering every data file's positions i % 7 == 3
    del_paths, del_pos = [], []
    for j in range(n_files):
        for i in range(3, _file_rows(seed, j), 7):
            del_paths.append(f"data/f{j:02d}.parquet")
            del_pos.append(i)
    buf = io.BytesIO()
    pq.write_table(
        pa.table({"file_path": del_paths, "pos": del_pos}), buf
    )
    files["data/d00.parquet"] = buf.getvalue()
    delete_entries = [
        entry(1, "data/d00.parquet", len(del_pos), 0)
    ]
    half = (n_files + 1) // 2
    manifests = {
        "metadata/m0.avro": data_entries[:half],
        "metadata/m1.avro": data_entries[half:],
        "metadata/md.avro": delete_entries,
    }
    for path, entries in manifests.items():
        files[path] = encode_avro_container(_MANIFEST_SCHEMA, entries, sync)
    # manifest lists: snapshot 1 sees only m0 (data only); snapshot 2
    # (current) sees both data manifests AND the delete manifest
    def ml_record(
        mpath: str, snap: int, nfiles: int, content: int = 0
    ) -> bytes:
        return (
            _enc_string(mpath)
            + _zigzag_write(len(files[mpath]))
            + _zigzag_write(0)
            + _zigzag_write(content)
            + _zigzag_write(snap)
            + _zigzag_write(nfiles)
        )

    files["metadata/snap-1.avro"] = encode_avro_container(
        _MANIFEST_LIST_SCHEMA,
        [ml_record("metadata/m0.avro", 1, half)],
        sync,
    )
    files["metadata/snap-2.avro"] = encode_avro_container(
        _MANIFEST_LIST_SCHEMA,
        [
            ml_record("metadata/m0.avro", 2, half),
            ml_record("metadata/m1.avro", 2, len(data_entries) - half),
            ml_record("metadata/md.avro", 2, 1, content=1),
        ],
        sync,
    )
    files["metadata/v2.metadata.json"] = json.dumps(
        {
            "format-version": 2,
            "table-uuid": f"00000000-0000-4000-8000-{seed:012d}",
            "properties": {"fixture.probe": str(plan["probe"])},
            "current-snapshot-id": 2,
            "snapshots": [
                {
                    "snapshot-id": 1,
                    "manifest-list": "metadata/snap-1.avro",
                },
                {
                    "snapshot-id": 2,
                    "manifest-list": "metadata/snap-2.avro",
                },
            ],
        }
    ).encode()
    out = io.BytesIO()
    with tarfile.open(fileobj=out, mode="w") as tf:
        for name in sorted(files):
            info = tarfile.TarInfo(name)
            info.size = len(files[name])
            info.mtime = 0
            tf.addfile(info, io.BytesIO(files[name]))
    return out.getvalue()


def scan_iceberg(payload: bytes) -> dict:
    """Serve a point lookup ``v = probe`` through the Iceberg
    planning path: metadata JSON → CURRENT snapshot's manifest list
    → manifests → bounds pruning (skipping DELETED entries) → read
    only the surviving parquet file(s) via pyarrow, cross-checking
    each survivor's parquet footer row count against the manifest's
    ``record_count``."""
    import pyarrow.parquet as pq

    try:
        # mode "r:" = uncompressed tar ONLY — transparent gzip/bz2/xz
        # detection would add decompression error types (BadGzipFile,
        # EOFError) that are not TarError and escape the quarantine
        with tarfile.open(fileobj=io.BytesIO(payload), mode="r:") as tf:
            files = {}
            total = 0
            for m in tf.getmembers():
                if not m.isfile() or m.size < 0:
                    raise ValueError("non-file tar member in table bundle")
                total += m.size
                if total > 1 << 28:
                    raise ValueError("table bundle exceeds size cap")
                f = tf.extractfile(m)
                if f is None:
                    raise ValueError("unreadable tar member")
                files[m.name] = f.read()
    except tarfile.TarError as e:
        raise ValueError(f"table bundle is not a tar: {e}") from None
    meta_blob = files.get("metadata/v2.metadata.json")
    if meta_blob is None:
        raise ValueError("bundle missing table metadata JSON")
    try:
        meta = json.loads(meta_blob)
    except json.JSONDecodeError as e:
        raise ValueError(f"table metadata is not JSON: {e}") from None
    if meta.get("format-version") != 2:
        raise ValueError("unsupported iceberg format-version")
    # the metadata JSON is untrusted payload content: every shape
    # assumption must quarantine, not TypeError out of dict/list ops
    current = meta.get("current-snapshot-id")
    if not isinstance(current, int) or isinstance(current, bool):
        raise ValueError("current-snapshot-id is not an integer")
    snap_list = meta.get("snapshots", [])
    if not isinstance(snap_list, list):
        raise ValueError("snapshots is not a list")
    snaps: dict[int, str] = {}
    for s in snap_list:
        if not isinstance(s, dict):
            continue
        sid = s.get("snapshot-id")
        ml = s.get("manifest-list")
        if (
            not isinstance(sid, int) or isinstance(sid, bool)
            or not isinstance(ml, str)
        ):
            raise ValueError("malformed snapshot entry")
        snaps[sid] = ml
    if current not in snaps:
        raise ValueError("current-snapshot-id not in snapshots")
    ml_blob = files.get(snaps[current])
    if ml_blob is None:
        raise ValueError("manifest list missing from bundle")
    manifest_files = decode_avro_blocks(ml_blob)
    n_data_files = 0
    n_deleted = 0
    candidates = []  # (path, record_count, lower, upper)
    delete_files = []  # (path, record_count)
    for mf in manifest_files:
        mpath = mf.get("manifest_path")
        if not isinstance(mpath, str):
            # manifests carry attacker-controlled schemas, so decoded
            # field types are arbitrary: shape checks, not trust
            raise ValueError("manifest_path is not a string")
        mblob = files.get(mpath)
        if mblob is None:
            raise ValueError(f"manifest {mpath!r} missing from bundle")
        if mf.get("manifest_length") != len(mblob):
            raise ValueError("manifest_length disagrees with bundle")
        content = mf.get("content", 0)
        if content not in (0, 1):
            raise ValueError(f"manifest content {content!r} unknown")
        for entry in decode_avro_blocks(mblob):
            status = entry.get("status")
            df = entry.get("data_file")
            if not isinstance(df, dict):
                raise ValueError("manifest entry without data_file")
            if status == 2:
                n_deleted += 1
                continue
            if status not in (0, 1):
                raise ValueError(f"manifest entry status {status} unknown")
            path = df.get("file_path")
            record_count = df.get("record_count")
            if not isinstance(path, str):
                raise ValueError("data file path is not a string")
            if (
                not isinstance(record_count, int)
                or isinstance(record_count, bool)
                or record_count < 0
            ):
                raise ValueError("data file record_count malformed")
            if content == 1:
                delete_files.append((path, record_count))
                continue
            n_data_files += 1
            lo = _bound_value(df.get("lower_bounds"))
            hi = _bound_value(df.get("upper_bounds"))
            if lo > hi:
                raise ValueError("data file lower bound above upper")
            candidates.append((path, record_count, lo, hi))
    if not candidates:
        raise ValueError("current snapshot has no live data files")
    # v2 merge-on-read: positional delete files (spec schema
    # file_path + pos) collected BEFORE the scan so survivors can
    # subtract their deleted positions
    deletes: dict[str, set[int]] = {}
    for dpath, dcount in delete_files:
        dblob = files.get(dpath)
        if dblob is None:
            raise ValueError(f"delete file {dpath!r} missing from bundle")
        try:
            dtable = pq.read_table(io.BytesIO(dblob))
        except Exception as e:
            raise ValueError(f"delete file unreadable: {e}") from None
        if dtable.num_rows != dcount:
            raise ValueError(
                "delete-manifest record_count disagrees with its parquet"
            )
        if not {"file_path", "pos"} <= set(dtable.column_names):
            raise ValueError("positional delete file missing columns")
        for p, pos in zip(
            dtable.column("file_path").to_pylist(),
            dtable.column("pos").to_pylist(),
        ):
            if not isinstance(p, str) or not isinstance(pos, int) \
                    or pos < 0:
                raise ValueError("malformed positional delete row")
            deletes.setdefault(p, set()).add(pos)
    # the point lookup rides in the table properties (a fixture knob;
    # a real engine gets it from the query)
    props = meta.get("properties")
    if not isinstance(props, dict) or "fixture.probe" not in props:
        raise ValueError("table properties missing the probe")
    try:
        probe = int(props["fixture.probe"])
    except (TypeError, ValueError):
        raise ValueError("non-integer probe property") from None
    survivors = [c for c in candidates if c[2] <= probe <= c[3]]
    rows_scanned = 0
    matches = 0
    positions_deleted = 0
    for path, record_count, _lo, _hi in survivors:
        blob = files.get(path)
        if blob is None:
            raise ValueError(f"data file {path!r} missing from bundle")
        try:
            table = pq.read_table(io.BytesIO(blob))
        except Exception as e:  # pyarrow raises ArrowInvalid/OSError
            raise ValueError(f"data file unreadable: {e}") from None
        if table.num_rows != record_count:
            raise ValueError(
                f"manifest record_count {record_count} != parquet "
                f"rows {table.num_rows}"
            )
        if "v" not in table.column_names:
            raise ValueError("data file missing the predicate column")
        dead = deletes.get(path, set())
        if dead and max(dead) >= record_count:
            raise ValueError("positional delete past its data file")
        positions_deleted += len(dead)
        rows_scanned += table.num_rows
        matches += sum(
            1
            for i, v in enumerate(table.column("v").to_pylist())
            if v == probe and i not in dead
        )
    total_rows = sum(c[1] for c in candidates)
    # Manifest record_counts are attacker-controlled; a sum past int64
    # would surface as Arrow OverflowError after the quarantine.
    if not (0 <= total_rows < 2**63):
        raise ValueError("iceberg total_rows overflows int64 (boundary)")
    return {
        "n_snapshots": len(snaps),
        "n_manifests": len(manifest_files),
        "n_data_files": n_data_files,
        "n_deleted_entries": n_deleted,
        "n_delete_files": len(delete_files),
        "files_pruned": n_data_files - len(survivors),
        "files_scanned": len(survivors),
        "rows_scanned": rows_scanned,
        "positions_deleted_scanned": positions_deleted,
        "total_rows": total_rows,
        "probe_matches": matches,
    }


def _bound_value(bounds) -> int:
    """One-column bounds array -> the int64 value for the predicate
    field id (Iceberg single-value serialization: 8-byte LE)."""
    if not isinstance(bounds, list) or not bounds:
        raise ValueError("data file without bounds")
    for kv in bounds:
        if not isinstance(kv, dict):
            raise ValueError("bounds entry is not a key/value record")
        if kv.get("key") == _V_FIELD_ID:
            raw = kv.get("value")
            if not isinstance(raw, bytes) or len(raw) != 8:
                raise ValueError("iceberg int64 bound is not 8 bytes")
            return struct.unpack("<q", raw)[0]
    raise ValueError("bounds missing the predicate field id")
