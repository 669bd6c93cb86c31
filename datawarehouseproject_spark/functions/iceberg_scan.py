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

from .bundles import (
    read_parquet_blob,
    read_tar_bundle,
    write_tar_bundle,
)
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

#: the bounds item record is REFERENCED BY NAME on its second use
#: (Avro forbids redefining a name; references are the spec's
#: mechanism) — shared by every manifest schema that carries bounds
_UPPER_BOUNDS_REF = {
    "name": "upper_bounds",
    "type": {"type": "array", "items": "k_v"},
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
                        # spec: 0 = DATA, 1 = POSITION_DELETES,
                        # 2 = EQUALITY_DELETES
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                        {"name": "lower_bounds", "type": _BOUND_SCHEMA},
                        _UPPER_BOUNDS_REF,
                        {
                            "name": "equality_ids",
                            "type": {"type": "array", "items": "int"},
                        },
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

    def entry(
        status: int, path: str, rows: int, lo: int, content: int = 0
    ) -> bytes:
        return (
            _zigzag_write(status)
            + _zigzag_write(1) + _zigzag_write(2)  # snapshot_id = 2
            + _zigzag_write(content)  # data_file.content
            + _enc_string(path)
            + _enc_string("PARQUET")
            + _zigzag_write(rows)
            + _zigzag_write(len(files[path]))
            + _enc_bounds(lo)
            + _enc_bounds(lo + 39)
            + _zigzag_write(0)  # equality_ids: empty array
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
        entry(1, "data/d00.parquet", len(del_pos), 0, content=1)
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
    return write_tar_bundle(files)


def _parse_table_meta(files: dict[str, bytes], string_probe: bool = False):
    """Shared metadata walk for both Iceberg scans (review r11
    pass 3: the v2 copy had already dropped the current-snapshot-id
    fence and TypeError'd past the quarantine): JSON load + dict
    fence, format-version gate, snapshots map, current-wins manifest
    list lookup, and the fixture probe.  Returns
    ``(meta, snaps, ml_blob, probe)``."""
    meta_blob = files.get("metadata/v2.metadata.json")
    if meta_blob is None:
        raise ValueError("bundle missing table metadata JSON")
    try:
        meta = json.loads(meta_blob)
    except json.JSONDecodeError as e:
        raise ValueError(f"table metadata is not JSON: {e}") from None
    if not isinstance(meta, dict):
        raise ValueError("table metadata is not a JSON object")
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
    props = meta.get("properties")
    if not isinstance(props, dict) or "fixture.probe" not in props:
        raise ValueError("table properties missing the probe")
    if string_probe:
        probe = props["fixture.probe"]
        if not isinstance(probe, str) or not 0 < len(probe) <= 1024:
            raise ValueError("string probe property malformed")
        return meta, snaps, ml_blob, probe
    try:
        probe = int(props["fixture.probe"])
    except (TypeError, ValueError):
        raise ValueError("non-integer probe property") from None
    if not (-(2**62) <= probe < 2**62):
        raise ValueError("probe outside plausible range")
    return meta, snaps, ml_blob, probe


def _read_parquet_checked(files: dict[str, bytes], path: str, rc: int):
    """Fetch + parse a bundle parquet file, cross-checking its footer
    row count against the manifest's declared ``record_count``."""
    import pyarrow.parquet as pq

    blob = files.get(path)
    if blob is None:
        raise ValueError(f"data file {path!r} missing from bundle")
    try:
        table = read_parquet_blob(blob)
    except Exception as e:  # pyarrow raises ArrowInvalid/OSError
        raise ValueError(f"data file unreadable: {e}") from None
    if table.num_rows != rc:
        raise ValueError(
            f"manifest record_count {rc} != parquet rows {table.num_rows}"
        )
    return table


def _walk_snapshot(files: dict[str, bytes], ml_blob: bytes):
    """One snapshot's manifest-list walk (shared by the point-lookup
    scan and the time-travel scan): returns ``(candidates,
    delete_files, n_data_files, n_deleted_entries, n_manifests)``
    with all the shape/fence checks of the original inline walk."""
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
            fcontent = df.get("content", 0)
            if content == 1:
                # spec data_file.content: 1 = POSITION_DELETES,
                # 2 = EQUALITY_DELETES (the form streaming CDC writers
                # emit). This scan implements positional merge-on-read
                # only — silently treating an equality-delete file as
                # positional would RESURRECT deleted rows, so content=2
                # quarantines loudly (round-10 verdict item 2 step 1;
                # scan_iceberg_v2 implements equality deletes).
                if fcontent == 2:
                    raise ValueError(
                        "iceberg equality-delete file unsupported by the "
                        "positional scan (boundary)"
                    )
                if fcontent != 1:
                    raise ValueError(
                        f"delete manifest file content {fcontent!r} invalid"
                    )
                delete_files.append((path, record_count))
                continue
            if fcontent != 0:
                raise ValueError(
                    f"data manifest file content {fcontent!r} invalid"
                )
            n_data_files += 1
            lo = _bound_value(df.get("lower_bounds"))
            hi = _bound_value(df.get("upper_bounds"))
            if lo > hi:
                raise ValueError("data file lower bound above upper")
            candidates.append((path, record_count, lo, hi))
    if not candidates:
        raise ValueError("snapshot has no live data files")
    return (
        candidates, delete_files, n_data_files, n_deleted,
        len(manifest_files),
    )


def _load_positional_deletes(
    files: dict[str, bytes], delete_files: list
) -> dict[str, set[int]]:
    """v2 merge-on-read: positional delete files (spec schema
    file_path + pos) collected BEFORE the scan so survivors can
    subtract their deleted positions."""
    import pyarrow.parquet as pq

    deletes: dict[str, set[int]] = {}
    for dpath, dcount in delete_files:
        dblob = files.get(dpath)
        if dblob is None:
            raise ValueError(f"delete file {dpath!r} missing from bundle")
        try:
            dtable = read_parquet_blob(dblob)
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
    return deletes


def _match_live_rows(
    files: dict[str, bytes],
    path: str,
    rc: int,
    probe: int,
    dead: set[int],
) -> tuple[int, int]:
    """Read one survivor data file and count live probe matches
    (positional deletes subtracted); shared by the point-lookup and
    time-travel scans (review r11 pass 4)."""
    table = _read_parquet_checked(files, path, rc)
    if "v" not in table.column_names:
        raise ValueError("data file missing the predicate column")
    if dead and max(dead) >= rc:
        raise ValueError("positional delete past its data file")
    matches = sum(
        1
        for i, v in enumerate(table.column("v").to_pylist())
        if v == probe and i not in dead
    )
    return table.num_rows, matches


def scan_iceberg(payload: bytes) -> dict:
    """Serve a point lookup ``v = probe`` through the Iceberg
    planning path: metadata JSON → CURRENT snapshot's manifest list
    → manifests → bounds pruning (skipping DELETED entries) → read
    only the surviving parquet file(s) via pyarrow, cross-checking
    each survivor's parquet footer row count against the manifest's
    ``record_count``."""
    files = read_tar_bundle(payload)
    meta, snaps, ml_blob, probe = _parse_table_meta(files)
    (
        candidates, delete_files, n_data_files, n_deleted, n_manifests
    ) = _walk_snapshot(files, ml_blob)
    deletes = _load_positional_deletes(files, delete_files)
    # the point lookup (probe) rides in the table properties — a
    # fixture knob parsed in _parse_table_meta; a real engine gets
    # it from the query
    survivors = [c for c in candidates if c[2] <= probe <= c[3]]
    rows_scanned = 0
    matches = 0
    positions_deleted = 0
    for path, record_count, _lo, _hi in survivors:
        dead = deletes.get(path, set())
        rows, m = _match_live_rows(files, path, record_count, probe, dead)
        positions_deleted += len(dead)
        rows_scanned += rows
        matches += m
    total_rows = sum(c[1] for c in candidates)
    # Manifest record_counts are attacker-controlled; a sum past int64
    # would surface as Arrow OverflowError after the quarantine.
    if not (0 <= total_rows < 2**63):
        raise ValueError("iceberg total_rows overflows int64 (boundary)")
    return {
        "n_snapshots": len(snaps),
        "n_manifests": n_manifests,
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


# ---------------------------------------------------------------------------
# v2 scan: EQUALITY deletes + partition-spec transforms (round 11)
# ---------------------------------------------------------------------------

def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit (Austin Appleby, public domain) — the
    hash Iceberg's ``bucket[N]`` transform mandates (table spec
    Appendix B). Pinned in tests by the spec's published vectors:
    ``bucket hash of int/long 34 = 2017239379``, ``string "iceberg"
    = 1210000089``."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    end = n - n % 4
    for i in range(0, end, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[end:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def bucket_transform(value: int, n: int) -> int:
    """Iceberg ``bucket[N]`` of an int/long: murmur3_x86_32 of the
    8-byte little-endian two's-complement value, then
    ``(hash & Integer.MAX_VALUE) % N`` (spec Appendix B)."""
    if not (-(2**63) <= value < 2**63):
        raise ValueError("bucket transform input outside int64")
    h = murmur3_x86_32(struct.pack("<q", value))
    return (h & 0x7FFFFFFF) % n


def truncate_transform(value: int, w: int) -> int:
    """Iceberg ``truncate[W]`` of an int/long:
    ``v - (((v % W) + W) % W)`` — floors toward -inf (spec)."""
    return value - (((value % w) + w) % w)


def _min_twos_complement(value: int) -> bytes:
    """Minimal two's-complement big-endian bytes — the spec's hash
    input for decimals (Appendix B: "hash of the minimum number of
    bytes required to hold the unscaled value as a two's complement
    big-endian", i.e. Java ``BigInteger.toByteArray()``)."""
    if value == 0:
        return b"\x00"
    b = value.to_bytes(value.bit_length() // 8 + 1, "big", signed=True)
    while len(b) > 1 and (
        (b[0] == 0x00 and b[1] < 0x80)
        or (b[0] == 0xFF and b[1] >= 0x80)
    ):
        b = b[1:]
    return b


def bucket_transform_str(value: str, n: int) -> int:
    """Iceberg ``bucket[N]`` of a string: murmur3_x86_32 of the
    UTF-8 bytes (no length prefix), then ``(hash & IntMax) % N``
    (spec Appendix B; pinned by the published vector ``"iceberg" →
    1210000089``)."""
    h = murmur3_x86_32(value.encode("utf-8"))
    return (h & 0x7FFFFFFF) % n


def bucket_transform_decimal(unscaled: int, n: int) -> int:
    """Iceberg ``bucket[N]`` of a decimal: murmur3 of the UNSCALED
    value's minimal two's-complement big-endian bytes (spec Appendix
    B; pinned by the published vector ``decimal(9,2) 14.20 →
    -500754589``)."""
    h = murmur3_x86_32(_min_twos_complement(unscaled))
    return (h & 0x7FFFFFFF) % n


def bucket_transform_date(days: int, n: int) -> int:
    """Iceberg ``bucket[N]`` of a date: dates hash as their
    days-since-epoch widened to LONG — the int/long byte layout
    (spec Appendix B; pinned by ``2017-11-16 (17486 days) →
    -653330422``)."""
    return bucket_transform(days, n)


def truncate_transform_str(value: str, w: int) -> str:
    """Iceberg ``truncate[W]`` of a string: the first W Unicode
    CODE POINTS (spec: "substring of length L" — not bytes, so a
    multi-byte character is never split)."""
    return value[:w]


def truncate_transform_decimal(unscaled: int, w: int) -> int:
    """Iceberg ``truncate[W]`` of a decimal: integer floor-truncate
    of the UNSCALED value (spec Appendix B example: ``truncate[50]``
    of decimal(9,2) ``10.65`` → ``10.50``, i.e. 1065 → 1050)."""
    return truncate_transform(unscaled, w)


_TIME_TRANSFORMS = ("year", "month", "day", "hour")


def parse_transform(spec: str) -> tuple[str, int]:
    """``"bucket[8]"`` -> ("bucket", 8); the argless transforms
    ``identity`` (raw value passthrough — the most common partition
    spec) and ``year``/``month``/``day``/``hour`` -> (name, 0); loud
    boundary otherwise."""
    if isinstance(spec, str) and (
        spec in _TIME_TRANSFORMS or spec == "identity"
    ):
        return spec, 0
    if not isinstance(spec, str) or "[" not in spec or not spec.endswith("]"):
        raise ValueError(f"partition transform {spec!r} unsupported")
    name, _, arg = spec[:-1].partition("[")
    if name not in ("bucket", "truncate"):
        raise ValueError(f"partition transform {name!r} unsupported")
    try:
        n = int(arg)
    except ValueError:
        raise ValueError("partition transform arg not an integer") from None
    if not 0 < n <= 1 << 20:
        raise ValueError("partition transform arg out of range")
    return name, n


def time_transform(name: str, micros: int) -> int:
    """Iceberg's time transforms of a timestamp-micros value (table
    spec: partition by the ordinal SINCE EPOCH — hours, days, months,
    or years; floor semantics for pre-epoch values).  month/year go
    through the proleptic Gregorian calendar (stdlib ``datetime`` is
    the independent producer the tests pin against)."""
    import datetime as _dt

    if not (-(2**63) <= micros < 2**63):
        raise ValueError("time transform input outside int64")
    if name == "hour":
        return micros // 3_600_000_000
    days = micros // 86_400_000_000
    if name == "day":
        return days
    try:
        d = _dt.date(1970, 1, 1) + _dt.timedelta(days=days)
    except OverflowError:
        raise ValueError("timestamp outside the calendar range") from None
    if name == "month":
        return (d.year - 1970) * 12 + d.month - 1
    if name == "year":
        return d.year - 1970
    raise ValueError(f"time transform {name!r} unknown")


def apply_transform(name: str, arg: int, value: int) -> int:
    if name == "bucket":
        return bucket_transform(value, arg)
    if name in _TIME_TRANSFORMS:
        return time_transform(name, value)
    if name == "identity":
        return value
    return truncate_transform(value, arg)


_MANIFEST_SCHEMA_V2 = json.dumps(
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
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {
                            "name": "partition",
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": [{"name": "p", "type": "long"}],
                            },
                        },
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                        {"name": "lower_bounds", "type": _BOUND_SCHEMA},
                        _UPPER_BOUNDS_REF,
                        {
                            "name": "equality_ids",
                            "type": {"type": "array", "items": "int"},
                        },
                    ],
                },
            },
        ],
    }
).encode()

_V2_N_FILES = 4


def synth_iceberg_v2_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracle: 4 data files, file j holds
    ``30 + (seed + j) % 20`` DISTINCT values; transform rotates
    ``bucket[8]`` (even seed) / ``truncate[100]`` (odd); an EQUALITY
    delete file removes each file's values at indices ``i % 5 == 2``;
    the probe is file ``k = seed % 4``'s value at index 18 (kept:
    18 % 5 != 2), so ``probe_matches = 1`` and every other metric is
    an integer formula of (seed, j)."""
    rows = [30 + (seed + j) % 20 for j in range(_V2_N_FILES)]
    k = seed % _V2_N_FILES
    return {
        "transform": "bucket[8]" if seed % 2 == 0 else "truncate[100]",
        "rows": rows,
        "probe_file": k,
        "rows_scanned": rows[k],
        "equality_deleted_rows": (rows[k] + 2) // 5,
        "total_rows": sum(rows),
    }


def _v2_file_values(seed: int) -> list[list[int]]:
    """Per-file DISTINCT value lists under the seed's transform.

    bucket[8]: enumerate v = seed%97, seed%97+1, ... and route each
    value to the file owning its bucket (the first 4 distinct bucket
    values seen own files 0..3) until every file has its row count —
    so file bounds INTERLEAVE across the whole domain and only the
    partition transform can prune. truncate[100]: file j holds
    ``j*100 + seed%50 + i`` — disjoint 100-wide windows."""
    plan = synth_iceberg_v2_plan(seed)
    rows = plan["rows"]
    if plan["transform"] == "truncate[100]":
        return [
            [j * 100 + seed % 50 + i for i in range(rows[j])]
            for j in range(_V2_N_FILES)
        ]
    owner: dict[int, int] = {}
    vals: list[list[int]] = [[] for _ in range(_V2_N_FILES)]
    v = seed % 97
    while any(len(vals[j]) < rows[j] for j in range(_V2_N_FILES)):
        b = bucket_transform(v, 8)
        if b not in owner and len(owner) < _V2_N_FILES:
            owner[b] = len(owner)
        j = owner.get(b)
        if j is not None and len(vals[j]) < rows[j]:
            vals[j].append(v)
        v += 1
    return vals


def synth_iceberg_v2(seed: int) -> bytes:
    """An Iceberg v2 table exercising the two features the base
    fixture doesn't: a PARTITION SPEC with a real transform
    (``bucket[8]`` / ``truncate[100]``) and an EQUALITY DELETE file
    (``data_file.content = 2`` + ``equality_ids = [1]`` — the form
    streaming CDC writers emit).  Layout per
    :func:`synth_iceberg_v2_plan` / :func:`_v2_file_values`."""
    plan = synth_iceberg_v2_plan(seed)
    vals = _v2_file_values(seed)
    return _synth_v2_table(
        seed, plan["transform"], vals, vals[plan["probe_file"]][18]
    )


def _synth_v2_table(
    seed: int, transform: str, vals: list[list[int]], probe: int
) -> bytes:
    """Shared v2 table builder: per-file distinct values ->
    manifest-list/manifest avro + parquet + metadata JSON, with the
    equality-delete file removing each file's values at ``i%5==2``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tname, targ = parse_transform(transform)
    sync = bytes((seed * 29 + j * 7 + 3) % 256 for j in range(16))
    files: dict[str, bytes] = {}

    def entry(
        status: int,
        path: str,
        rows: int,
        part: int,
        lo: int,
        hi: int,
        content: int,
        eq_ids: list[int],
    ) -> bytes:
        eq = _zigzag_write(0)
        if eq_ids:
            eq = (
                _zigzag_write(len(eq_ids))
                + b"".join(_zigzag_write(i) for i in eq_ids)
                + _zigzag_write(0)
            )
        return (
            _zigzag_write(status)
            + _zigzag_write(1) + _zigzag_write(7)  # snapshot_id = 7
            + _zigzag_write(content)
            + _enc_string(path)
            + _enc_string("PARQUET")
            + _zigzag_write(part)  # partition record: single long p
            + _zigzag_write(rows)
            + _zigzag_write(len(files[path]))
            + _enc_bounds(lo)
            + _enc_bounds(hi)
            + eq
        )

    data_entries = []
    for j in range(_V2_N_FILES):
        buf = io.BytesIO()
        pq.write_table(pa.table({"v": vals[j]}), buf)
        path = f"data/f{j:02d}.parquet"
        files[path] = buf.getvalue()
        part = apply_transform(tname, targ, vals[j][0])
        data_entries.append(
            entry(
                1, path, len(vals[j]), part,
                min(vals[j]), max(vals[j]), 0, [],
            )
        )
    # equality delete file: each data file's values at index i%5==2,
    # one column named for field id 1
    dead = [v for j in range(_V2_N_FILES)
            for i, v in enumerate(vals[j]) if i % 5 == 2]
    buf = io.BytesIO()
    pq.write_table(pa.table({"v": dead}), buf)
    files["data/eq00.parquet"] = buf.getvalue()
    delete_entries = [
        entry(
            1, "data/eq00.parquet", len(dead), 0,
            min(dead), max(dead), 2, [_V_FIELD_ID],
        )
    ]
    manifests = {
        "metadata/m0.avro": data_entries,
        "metadata/me.avro": delete_entries,
    }
    for path, entries in manifests.items():
        files[path] = encode_avro_container(
            _MANIFEST_SCHEMA_V2, entries, sync
        )

    def ml_record(mpath: str, nfiles: int, content: int) -> bytes:
        return (
            _enc_string(mpath)
            + _zigzag_write(len(files[mpath]))
            + _zigzag_write(0)
            + _zigzag_write(content)
            + _zigzag_write(7)
            + _zigzag_write(nfiles)
        )

    files["metadata/snap-7.avro"] = encode_avro_container(
        _MANIFEST_LIST_SCHEMA,
        [
            ml_record("metadata/m0.avro", _V2_N_FILES, 0),
            ml_record("metadata/me.avro", 1, 1),
        ],
        sync,
    )
    files["metadata/v2.metadata.json"] = json.dumps(
        {
            "format-version": 2,
            "table-uuid": f"00000000-0000-4000-8000-{seed:012d}",
            "properties": {"fixture.probe": str(probe)},
            "default-spec-id": 0,
            "partition-specs": [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "name": "p",
                            "transform": transform,
                            "source-id": _V_FIELD_ID,
                            "field-id": 1000,
                        }
                    ],
                }
            ],
            "current-snapshot-id": 7,
            "snapshots": [
                {"snapshot-id": 7, "manifest-list": "metadata/snap-7.avro"}
            ],
        }
    ).encode()
    return write_tar_bundle(files)


def _resolve_partition_spec(meta, allowed=None, kind: str = ""):
    """Default partition-spec resolution shared by the v2/string/
    decimal scans (review r12 pass 2: three copies): returns
    ``[(field name, transform name, transform arg), ...]`` with the
    spec-id lookup, field-count, source-id, name-uniqueness, and
    (when ``allowed`` is given) transform-applicability fences."""
    spec_id = meta.get("default-spec-id")
    specs = meta.get("partition-specs")
    if not isinstance(spec_id, int) or isinstance(spec_id, bool) \
            or not isinstance(specs, list):
        raise ValueError("partition spec metadata malformed")
    spec = next(
        (s for s in specs
         if isinstance(s, dict) and s.get("spec-id") == spec_id),
        None,
    )
    if spec is None:
        raise ValueError("default-spec-id not in partition-specs")
    fields = spec.get("fields")
    if not isinstance(fields, list) or not 1 <= len(fields) <= 3:
        raise ValueError("partition spec field count unsupported")
    tspecs = []
    for pf in fields:
        if not isinstance(pf, dict) or pf.get("source-id") != _V_FIELD_ID:
            raise ValueError("partition source field unsupported")
        pname = pf.get("name")
        if not isinstance(pname, str) or not pname:
            raise ValueError("partition field name malformed")
        tname, targ = parse_transform(pf.get("transform"))
        if allowed is not None and tname not in allowed:
            raise ValueError(
                f"transform {tname!r} undefined over {kind} (boundary)"
            )
        tspecs.append((pname, tname, targ))
    if len({t[0] for t in tspecs}) != len(tspecs):
        raise ValueError("partition field names not unique")
    return tspecs



def scan_iceberg_v2(payload: bytes) -> dict:
    """Serve the point lookup through TRANSFORM-AWARE planning plus
    EQUALITY-delete merge-on-read:

    1. resolve the default partition spec; only ``bucket[N]`` /
       ``truncate[W]`` on the predicate field are supported — any
       other transform is a loud boundary (never silent full scan);
    2. prune data files whose manifest ``partition`` value differs
       from ``transform(probe)`` — this is what prunes when bounds
       interleave (the bucket fixture's bounds all overlap);
    3. bounds-prune the remainder; read survivors via pyarrow,
       cross-checking footer row counts against the manifest;
    4. apply equality deletes: a ``content=2`` delete file with
       ``equality_ids=[1]`` removes every row whose ``v`` equals any
       value in the file (applied to ALL data files here — the
       fixture's delete snapshot is newest; sequence-number ordering
       is out of scope and documented).

    Consistency audits (quarantine on drift): every scanned row's
    transform must equal the file's declared partition value, and
    equality ids other than the predicate field loud-reject."""
    import pyarrow.parquet as pq

    files = read_tar_bundle(payload)
    meta, snaps, ml_blob, probe = _parse_table_meta(files)
    tspecs = _resolve_partition_spec(meta)

    candidates = []  # (path, record_count, partition, lo, hi, seq)
    eq_delete_files = []  # (path, record_count, seq)
    for mf in decode_avro_blocks(ml_blob):
        mpath = mf.get("manifest_path")
        if not isinstance(mpath, str):
            raise ValueError("manifest_path is not a string")
        mblob = files.get(mpath)
        if mblob is None:
            raise ValueError(f"manifest {mpath!r} missing from bundle")
        if mf.get("manifest_length") != len(mblob):
            raise ValueError("manifest_length disagrees with bundle")
        content = mf.get("content", 0)
        if content not in (0, 1):
            raise ValueError(f"manifest content {content!r} unknown")
        mseq = mf.get("sequence_number")
        if mseq is not None and (
            not isinstance(mseq, int) or isinstance(mseq, bool) or mseq < 0
        ):
            raise ValueError("manifest sequence_number malformed")
        for e in decode_avro_blocks(mblob):
            status = e.get("status")
            df = e.get("data_file")
            if not isinstance(df, dict):
                raise ValueError("manifest entry without data_file")
            if status == 2:
                continue
            if status not in (0, 1):
                raise ValueError(f"manifest entry status {status} unknown")
            eseq = e.get("data_sequence_number")
            if eseq is None and mseq is not None:
                # spec: a null data_sequence_number on an ADDED entry
                # inherits the manifest's sequence number
                if status != 1:
                    raise ValueError(
                        "sequence inheritance on a non-added entry"
                    )
                eseq = mseq
            if eseq is not None and (
                not isinstance(eseq, int) or isinstance(eseq, bool)
                or eseq < 0
            ):
                raise ValueError("data_sequence_number malformed")
            path = df.get("file_path")
            rc = df.get("record_count")
            part = df.get("partition")
            if not isinstance(path, str):
                raise ValueError("data file path is not a string")
            if not isinstance(rc, int) or isinstance(rc, bool) or rc < 0:
                raise ValueError("data file record_count malformed")
            if not isinstance(part, dict) or not all(
                isinstance(part.get(pname), int)
                and not isinstance(part.get(pname), bool)
                for pname, _tn, _ta in tspecs
            ):
                # bool excluded explicitly: True == 1 would satisfy
                # both the match and the per-row audit (review)
                raise ValueError("data file partition value malformed")
            part_tuple = tuple(
                part[pname] for pname, _tn, _ta in tspecs
            )
            fcontent = df.get("content", 0)
            if content == 1:
                if fcontent == 1:
                    raise ValueError(
                        "positional deletes not supported by the v2 "
                        "equality scan (boundary)"
                    )
                if fcontent != 2:
                    raise ValueError(
                        f"delete manifest file content {fcontent!r} invalid"
                    )
                eq_ids = df.get("equality_ids")
                if eq_ids != [_V_FIELD_ID]:
                    raise ValueError(
                        f"equality ids {eq_ids!r} unsupported (boundary)"
                    )
                eq_delete_files.append((path, rc, eseq))
                continue
            if fcontent != 0:
                raise ValueError(
                    f"data manifest file content {fcontent!r} invalid"
                )
            lo = _bound_value(df.get("lower_bounds"))
            hi = _bound_value(df.get("upper_bounds"))
            if lo > hi:
                raise ValueError("data file lower bound above upper")
            candidates.append((path, rc, part_tuple, lo, hi, eseq))
    if not candidates:
        raise ValueError("current snapshot has no live data files")
    # sequence numbers are all-or-none: a half-declared table cannot
    # be ordered, and guessing silently resurrects or re-kills rows
    seq_present = [c[5] is not None for c in candidates] + [
        d[2] is not None for d in eq_delete_files
    ]
    if any(seq_present) and not all(seq_present):
        raise ValueError("sequence numbers partially declared (boundary)")
    sequenced = bool(seq_present) and all(seq_present)
    # equality delete values, per delete file with its sequence number
    delete_sets: list[tuple[int | None, set[int]]] = []
    for dpath, dcount, dseq in eq_delete_files:
        dblob = files.get(dpath)
        if dblob is None:
            raise ValueError(f"delete file {dpath!r} missing from bundle")
        try:
            dtable = read_parquet_blob(dblob)
        except Exception as e:
            raise ValueError(f"delete file unreadable: {e}") from None
        if dtable.num_rows != dcount:
            raise ValueError(
                "delete-manifest record_count disagrees with its parquet"
            )
        if "v" not in dtable.column_names:
            raise ValueError("equality delete file missing the column")
        dset: set[int] = set()
        for v in dtable.column("v").to_pylist():
            if not isinstance(v, int):
                raise ValueError("equality delete value not an integer")
            dset.add(v)
        delete_sets.append((dseq, dset))
    # transform-aware partition pruning, then bounds pruning
    target = tuple(
        apply_transform(tn, ta, probe) for _pn, tn, ta in tspecs
    )
    part_survivors = [c for c in candidates if c[2] == target]
    files_pruned_partition = len(candidates) - len(part_survivors)
    survivors = [c for c in part_survivors if c[3] <= probe <= c[4]]
    files_pruned_bounds = len(part_survivors) - len(survivors)
    rows_scanned = 0
    eq_deleted = 0
    matches = 0
    for path, rc, part, _lo, _hi, fseq in survivors:
        # spec: an equality delete applies to a row iff the row's
        # data file has a STRICTLY SMALLER data sequence number than
        # the delete file — a value re-added after the delete lives.
        # Sequence-less tables (the pre-sequence fixtures) keep the
        # documented apply-globally behavior.
        dead_values: set[int] = set()
        for dseq, dset in delete_sets:
            if not sequenced or fseq < dseq:
                dead_values |= dset
        table = _read_parquet_checked(files, path, rc)
        if "v" not in table.column_names:
            raise ValueError("data file missing the predicate column")
        rows_scanned += table.num_rows
        for v in table.column("v").to_pylist():
            if not isinstance(v, int):
                raise ValueError("data value not an integer")
            # consistency audit: the manifest's partition value must
            # equal the transform of every row in the file
            if any(
                apply_transform(tn, ta, v) != pv
                for (_pn, tn, ta), pv in zip(tspecs, part)
            ):
                raise ValueError(
                    "row transform disagrees with manifest partition"
                )
            if v in dead_values:
                eq_deleted += 1
            elif v == probe:
                matches += 1
    total_rows = sum(c[1] for c in candidates)
    if not (0 <= total_rows < 2**63):
        raise ValueError("iceberg total_rows overflows int64 (boundary)")
    if len(tspecs) == 1:
        out_transform, out_arg = tspecs[0][1], tspecs[0][2]
    else:
        # multi-field spec: the conjunction label; arg = field count
        out_transform = ",".join(tn for _pn, tn, _ta in tspecs)
        out_arg = len(tspecs)
    return {
        "transform": out_transform,
        "transform_arg": out_arg,
        "n_data_files": len(candidates),
        "n_eq_delete_files": len(eq_delete_files),
        "files_pruned_partition": files_pruned_partition,
        "files_pruned_bounds": files_pruned_bounds,
        "files_scanned": len(survivors),
        "rows_scanned": rows_scanned,
        "equality_deleted_rows": eq_deleted,
        "live_rows": rows_scanned - eq_deleted,
        "total_rows": total_rows,
        "probe_matches": matches,
    }


def scan_iceberg_time_travel(payload: bytes) -> dict:
    """TIME TRAVEL: serve the SAME point lookup at every snapshot in
    the table's history (spec: any snapshot in ``snapshots`` remains
    readable until expired) and report the s1→current deltas — the
    reproducibility primitive a training pipeline leans on ("rerun
    the job exactly as the data stood last week").

    The base fixture's history is deliberately asymmetric: snapshot
    1 sees only the FIRST manifest (half the files, no delete
    manifest), snapshot 2 adds the rest plus the positional-delete
    manifest.  So ``matches_s1`` counts raw positions while
    ``matches_current`` subtracts merge-on-read deletes — a reader
    that unions history or applies current deletes retroactively
    breaks both."""
    files = read_tar_bundle(payload)
    meta, snaps, _ml_current, probe = _parse_table_meta(files)
    if len(snaps) < 2:
        raise ValueError("time travel needs at least two snapshots")
    if len(snaps) > 64:
        # CPU-amplification fence (quarantine bomb class): each
        # snapshot costs a full manifest walk + parquet reads, and
        # the snapshot list is attacker-declared
        raise ValueError("snapshot history too long (boundary)")
    per = {}
    walked: dict[str, dict] = {}  # ml path -> metrics (dedup re-walks)
    # file-level memo across snapshots: a data file shared by two
    # snapshots is byte-identical at both, so the probe result only
    # depends on (path, declared rowcount, its delete positions) —
    # distinct delete sets (or a corrupt rowcount drift) still
    # re-read and hit the cross-checks inside _match_live_rows
    fmemo: dict[tuple, int] = {}
    for sid in sorted(snaps):
        ml_path = snaps[sid]
        if ml_path in walked:
            per[sid] = walked[ml_path]
            continue
        ml_blob = files.get(ml_path)
        if ml_blob is None:
            raise ValueError("manifest list missing from bundle")
        cands, delete_files, n_data, _n_del, _n_m = _walk_snapshot(
            files, ml_blob
        )
        deletes = _load_positional_deletes(files, delete_files)
        survivors = [c for c in cands if c[2] <= probe <= c[3]]
        matches = 0
        scanned = 0
        for path, rc, _lo, _hi in survivors:
            dels = deletes.get(path, set())
            key = (path, rc, frozenset(dels))
            if key not in fmemo:
                fmemo[key] = _match_live_rows(
                    files, path, rc, probe, dels
                )[1]
            scanned += 1
            matches += fmemo[key]
        total = sum(c[1] for c in cands)
        if not (0 <= total < 2**63):
            raise ValueError("iceberg total_rows overflows int64")
        per[sid] = walked[ml_path] = {
            "files": n_data,
            "rows": total,
            "scanned": scanned,
            "matches": matches,
            "delete_files": len(delete_files),
        }
    first = per[min(per)]
    # "current" is the table's current-snapshot-id (already fenced in
    # _parse_table_meta), NOT the max id: the spec allows a rolled-
    # back table whose current snapshot is older than later-created
    # ones still in history (review r11 pass 4)
    cur = per[meta["current-snapshot-id"]]
    return {
        "n_snapshots": len(per),
        "files_s1": first["files"],
        "files_current": cur["files"],
        "files_added": cur["files"] - first["files"],
        "rows_s1": first["rows"],
        "rows_current": cur["rows"],
        "rows_added": cur["rows"] - first["rows"],
        "scanned_s1": first["scanned"],
        "scanned_current": cur["scanned"],
        "matches_s1": first["matches"],
        "matches_current": cur["matches"],
        "delete_files_s1": first["delete_files"],
        "delete_files_current": cur["delete_files"],
    }


# ---------------------------------------------------------------------------
# time transforms (year/month/day/hour) — the daily-partition shape
# ---------------------------------------------------------------------------

_MICROS_HOUR = 3_600_000_000
_MICROS_DAY = 86_400_000_000


def synth_iceberg_time_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracle: transform rotates
    day/hour/month/year by ``seed%4``; 4 data files, file j holding
    ``rows_j = 30 + (seed+j)%20`` DISTINCT timestamp-micros values
    inside partition ordinal ``base + j`` (one day/hour/month/year
    per file — exactly the layout a streaming writer lands); the
    equality delete removes indices ``i%5==2``; probe = file
    ``k = seed%4``'s value at index 18 → time-transform pruning keeps
    ONE file (``files_pruned_partition = 3``)."""
    rows = [30 + (seed + j) % 20 for j in range(_V2_N_FILES)]
    k = seed % _V2_N_FILES
    return {
        "transform": ("hour", "day", "month", "year")[seed % 4],
        "rows": rows,
        "probe_file": k,
        "rows_scanned": rows[k],
        "equality_deleted_rows": (rows[k] + 2) // 5,
        "total_rows": sum(rows),
    }


def _time_file_values(seed: int) -> list[list[int]]:
    """Per-file DISTINCT micros values, file j inside partition
    ordinal ``base + j`` of the seed's transform.  Step sizes keep
    every value strictly inside the window (rows <= 49): hour steps
    ~60 s, day ~1000 s, month ~12 h, year ~7 d."""
    import datetime as _dt

    plan = synth_iceberg_time_plan(seed)
    rows = plan["rows"]
    name = plan["transform"]
    epoch = _dt.date(1970, 1, 1)
    starts = []
    for j in range(_V2_N_FILES):
        if name == "hour":
            starts.append((432000 + seed % 1000 + j) * _MICROS_HOUR)
        elif name == "day":
            starts.append((18000 + seed % 400 + j) * _MICROS_DAY)
        elif name == "month":
            m = 600 + seed % 120 + j
            d = _dt.date(1970 + m // 12, m % 12 + 1, 1)
            starts.append((d - epoch).days * _MICROS_DAY)
        else:  # year
            y = 1990 + seed % 60 + j
            starts.append((_dt.date(y, 1, 1) - epoch).days * _MICROS_DAY)
    step = {
        "hour": 60_000_011,
        "day": 1_000_000_007,
        "month": 43_200_000_001,
        "year": 604_800_000_003,
    }[name]
    return [
        [starts[j] + i * step for i in range(rows[j])]
        for j in range(_V2_N_FILES)
    ]


def synth_iceberg_time(seed: int) -> bytes:
    """An Iceberg v2 table partitioned by a TIME transform
    (``day``/``hour``/``month``/``year``) with an equality-delete
    file — the daily/hourly-partition shape real event tables use.
    Served by :func:`scan_iceberg_v2` (the planning path is
    transform-generic)."""
    plan = synth_iceberg_time_plan(seed)
    vals = _time_file_values(seed)
    return _synth_v2_table(
        seed, plan["transform"], vals, vals[plan["probe_file"]][18]
    )


# ---------------------------------------------------------------------------
# sequence numbers: deletes must not touch files added AFTER them
# ---------------------------------------------------------------------------

_MANIFEST_LIST_SCHEMA_SEQ = json.dumps(
    {
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
    }
).encode()

_MANIFEST_SCHEMA_SEQ = json.dumps(
    {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {
                "name": "data_sequence_number",
                "type": ["null", "long"],
            },
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "data_file",
                    "fields": [
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {
                            "name": "partition",
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": [{"name": "p", "type": "long"}],
                            },
                        },
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                        {"name": "lower_bounds", "type": _BOUND_SCHEMA},
                        _UPPER_BOUNDS_REF,
                        {
                            "name": "equality_ids",
                            "type": {"type": "array", "items": "int"},
                        },
                    ],
                },
            },
        ],
    }
).encode()


def synth_iceberg_seq_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracle: four data files under
    ``truncate[100]``.  f0 (seq 1, window 0) and f1 (seq 1, window
    100) predate the equality delete (seq 2) that kills f0's indices
    ``i%3==0`` and f1's ``i%4==1``; f2 (seq 3, window 0) RE-ADDS
    exactly f0's killed values and f3 (seq 3, window 300) is fresh.
    Probe = f0's value at index 0 (killed in f0, re-added in f2):
    a sequence-aware reader finds it EXACTLY ONCE — a global-delete
    reader 0 times, a delete-ignoring reader twice."""
    rows0 = 20 + seed % 10
    rows1 = 20 + (seed + 1) % 10
    rows3 = 20 + (seed + 3) % 10
    d0 = (rows0 + 2) // 3  # indices i%3==0 of rows0
    lo = seed % 40
    return {
        "rows0": rows0,
        "rows1": rows1,
        "rows2": d0,
        "rows3": rows3,
        "lo": lo,
        "d0": d0,
        "probe": lo,
        "rows_scanned": rows0 + d0,
        "equality_deleted_rows": d0,
        "live_rows": rows0,
        "total_rows": rows0 + rows1 + d0 + rows3,
    }


def synth_iceberg_seq(seed: int) -> bytes:
    """An Iceberg v2 table where SEQUENCE ORDER decides what the
    equality delete touches, exercising BOTH sequence carriers: the
    seq-1 manifest's entries INHERIT (null data_sequence_number),
    the delete and seq-3 entries declare explicitly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    plan = synth_iceberg_seq_plan(seed)
    lo = plan["lo"]
    vals = {
        "f0": [lo + i for i in range(plan["rows0"])],
        "f1": [100 + lo + i for i in range(plan["rows1"])],
        "f3": [300 + lo + i for i in range(plan["rows3"])],
    }
    dead = sorted(
        [v for i, v in enumerate(vals["f0"]) if i % 3 == 0]
        + [v for i, v in enumerate(vals["f1"]) if i % 4 == 1]
    )
    vals["f2"] = [v for i, v in enumerate(vals["f0"]) if i % 3 == 0]
    probe = vals["f0"][0]
    sync = bytes((seed * 31 + j * 13 + 5) % 256 for j in range(16))
    files: dict[str, bytes] = {}

    def entry(
        path: str,
        rows: int,
        part: int,
        lo_b: int,
        hi_b: int,
        content: int,
        eq_ids: list[int],
        eseq: int | None,
    ) -> bytes:
        eq = _zigzag_write(0)
        if eq_ids:
            eq = (
                _zigzag_write(len(eq_ids))
                + b"".join(_zigzag_write(i) for i in eq_ids)
                + _zigzag_write(0)
            )
        seq_bytes = (
            _zigzag_write(0)  # null -> inherit from the manifest
            if eseq is None
            else _zigzag_write(1) + _zigzag_write(eseq)
        )
        return (
            _zigzag_write(1)  # status = added
            + _zigzag_write(1) + _zigzag_write(7)  # snapshot_id = 7
            + seq_bytes
            + _zigzag_write(content)
            + _enc_string(path)
            + _enc_string("PARQUET")
            + _zigzag_write(part)
            + _zigzag_write(rows)
            + _zigzag_write(len(files[path]))
            + _enc_bounds(lo_b)
            + _enc_bounds(hi_b)
            + eq
        )

    def write_parquet(name: str, values: list[int]) -> str:
        buf = io.BytesIO()
        pq.write_table(pa.table({"v": values}), buf)
        path = f"data/{name}.parquet"
        files[path] = buf.getvalue()
        return path

    p0 = write_parquet("f0", vals["f0"])
    p1 = write_parquet("f1", vals["f1"])
    p2 = write_parquet("f2", vals["f2"])
    p3 = write_parquet("f3", vals["f3"])
    pd_ = write_parquet("eq", dead)

    m_old = [  # seq 1 via INHERITANCE (null data_sequence_number)
        entry(p0, len(vals["f0"]), 0, min(vals["f0"]),
              max(vals["f0"]), 0, [], None),
        entry(p1, len(vals["f1"]), 100, min(vals["f1"]),
              max(vals["f1"]), 0, [], None),
    ]
    m_del = [
        entry(pd_, len(dead), 0, min(dead), max(dead), 2,
              [_V_FIELD_ID], 2),
    ]
    m_new = [  # seq 3, declared explicitly on each entry
        entry(p2, len(vals["f2"]), 0, min(vals["f2"]),
              max(vals["f2"]), 0, [], 3),
        entry(p3, len(vals["f3"]), 300, min(vals["f3"]),
              max(vals["f3"]), 0, [], 3),
    ]
    manifests = {
        "metadata/m_old.avro": m_old,
        "metadata/m_del.avro": m_del,
        "metadata/m_new.avro": m_new,
    }
    for path, entries in manifests.items():
        files[path] = encode_avro_container(
            _MANIFEST_SCHEMA_SEQ, entries, sync
        )

    def ml_record(
        mpath: str, nfiles: int, content: int, mseq: int
    ) -> bytes:
        return (
            _enc_string(mpath)
            + _zigzag_write(len(files[mpath]))
            + _zigzag_write(0)
            + _zigzag_write(content)
            + _zigzag_write(mseq)
            + _zigzag_write(7)
            + _zigzag_write(nfiles)
        )

    files["metadata/snap-7.avro"] = encode_avro_container(
        _MANIFEST_LIST_SCHEMA_SEQ,
        [
            ml_record("metadata/m_old.avro", 2, 0, 1),
            ml_record("metadata/m_del.avro", 1, 1, 2),
            ml_record("metadata/m_new.avro", 2, 0, 3),
        ],
        sync,
    )
    files["metadata/v2.metadata.json"] = json.dumps(
        {
            "format-version": 2,
            "table-uuid": f"00000000-0000-4000-8000-{seed:012d}",
            "properties": {"fixture.probe": str(probe)},
            "default-spec-id": 0,
            "partition-specs": [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "name": "p",
                            "transform": "truncate[100]",
                            "source-id": _V_FIELD_ID,
                            "field-id": 1000,
                        }
                    ],
                }
            ],
            "current-snapshot-id": 7,
            "snapshots": [
                {"snapshot-id": 7, "manifest-list": "metadata/snap-7.avro"}
            ],
        }
    ).encode()
    return write_tar_bundle(files)


# ---------------------------------------------------------------------------
# multi-field partition specs: conjunction pruning
# ---------------------------------------------------------------------------

_MANIFEST_SCHEMA_MULTI = json.dumps(
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
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {
                            "name": "partition",
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": [
                                    {"name": "p", "type": "long"},
                                    {"name": "q", "type": "long"},
                                ],
                            },
                        },
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                        {"name": "lower_bounds", "type": _BOUND_SCHEMA},
                        _UPPER_BOUNDS_REF,
                        {
                            "name": "equality_ids",
                            "type": {"type": "array", "items": "int"},
                        },
                    ],
                },
            },
        ],
    }
).encode()


def synth_iceberg_multi_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracle: 4 files under the TWO-field
    spec ``(truncate[1000](v), bucket[8](v))``, laid out so NEITHER
    dimension prunes alone — file j lives at (window, bucket) =
    (W0,B0)/(W0,B1)/(W1,B0)/(W1,B1) and the probe is in file 0, so
    the truncate dimension keeps files 0+1, the bucket dimension
    keeps files 0+2, and only the conjunction reaches
    ``files_pruned_partition = 3``."""
    rows = [20 + (seed + j) % 10 for j in range(4)]
    return {
        "rows": rows,
        "rows_scanned": rows[0],
        "total_rows": sum(rows),
    }


def synth_iceberg_multi(seed: int) -> bytes:
    import pyarrow as pa
    import pyarrow.parquet as pq

    plan = synth_iceberg_multi_plan(seed)
    w0 = 1000 * (seed % 20)
    w1 = w0 + 1000
    b0 = seed % 8
    b1 = (seed + 3) % 8

    def pick(base: int, bucket: int, count: int) -> list[int]:
        vals = []
        v = base
        while len(vals) < count:
            if v >= base + 1000:
                raise ValueError("window exhausted for bucket class")
            if bucket_transform(v, 8) == bucket:
                vals.append(v)
            v += 1
        return vals

    cells = [(w0, b0), (w0, b1), (w1, b0), (w1, b1)]
    vals = [
        pick(w, b, plan["rows"][j]) for j, (w, b) in enumerate(cells)
    ]
    probe = vals[0][0]
    sync = bytes((seed * 41 + j * 11 + 7) % 256 for j in range(16))
    files: dict[str, bytes] = {}
    entries = []
    for j, (w, b) in enumerate(cells):
        buf = io.BytesIO()
        pq.write_table(pa.table({"v": vals[j]}), buf)
        path = f"data/f{j:02d}.parquet"
        files[path] = buf.getvalue()
        entries.append(
            _zigzag_write(1)
            + _zigzag_write(1) + _zigzag_write(7)
            + _zigzag_write(0)  # content = data
            + _enc_string(path)
            + _enc_string("PARQUET")
            + _zigzag_write(w)  # partition.p = truncate value
            + _zigzag_write(b)  # partition.q = bucket value
            + _zigzag_write(len(vals[j]))
            + _zigzag_write(len(files[path]))
            + _enc_bounds(min(vals[j]))
            + _enc_bounds(max(vals[j]))
            + _zigzag_write(0)  # equality_ids: empty
        )
    files["metadata/m0.avro"] = encode_avro_container(
        _MANIFEST_SCHEMA_MULTI, entries, sync
    )
    files["metadata/snap-7.avro"] = encode_avro_container(
        _MANIFEST_LIST_SCHEMA,
        [
            _enc_string("metadata/m0.avro")
            + _zigzag_write(len(files["metadata/m0.avro"]))
            + _zigzag_write(0)
            + _zigzag_write(0)
            + _zigzag_write(7)
            + _zigzag_write(4)
        ],
        sync,
    )
    files["metadata/v2.metadata.json"] = json.dumps(
        {
            "format-version": 2,
            "table-uuid": f"00000000-0000-4000-8000-{seed:012d}",
            "properties": {"fixture.probe": str(probe)},
            "default-spec-id": 0,
            "partition-specs": [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "name": "p",
                            "transform": "truncate[1000]",
                            "source-id": _V_FIELD_ID,
                            "field-id": 1000,
                        },
                        {
                            "name": "q",
                            "transform": "bucket[8]",
                            "source-id": _V_FIELD_ID,
                            "field-id": 1001,
                        },
                    ],
                }
            ],
            "current-snapshot-id": 7,
            "snapshots": [
                {"snapshot-id": 7, "manifest-list": "metadata/snap-7.avro"}
            ],
        }
    ).encode()
    return write_tar_bundle(files)


# ---------------------------------------------------------------------------
# Puffin deletion vectors (Iceberg v3 direction): the Puffin
# container (iceberg.apache.org/puffin-spec) + Delta-compatible DV
# blobs, reusing the roaring codec pinned in functions/delta_log.py
# ---------------------------------------------------------------------------
#
# Puffin layout: "PFA1" magic, concatenated blobs, then the footer =
# Magic + FooterPayload (JSON) + PayloadSize (int32 LE) + Flags
# (int32 LE, bit 0 = payload lz4-compressed -> loud boundary here) +
# Magic.  The payload lists blobs: {type, fields, snapshot-id,
# sequence-number, offset, length, properties, compression-codec} —
# blob payloads compressed as one lz4/zstd frame decode through the
# hand frame decoders (round 12); a compressed FOOTER (flag bit 0)
# stays a loud boundary.  Deletion-vector
# blobs ("deletion-vector-v1", Iceberg v3) use the Delta-compatible
# framing for ecosystem compatibility: <dataSize int32 BE><magic
# 1681511377 LE + 64-bit RoaringBitmapArray portable><crc32 int32
# BE>.  Fixture referencing: each blob's ``referenced-data-file``
# property names its target (manifest-entry content_offset
# referencing is a documented out-of-scope boundary), and the
# ``cardinality`` property is cross-checked against the decoded
# bitmap.

_PUFFIN_MAGIC = b"PFA1"

_DV_MANIFEST_SCHEMA = json.dumps(
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
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                        {
                            "name": "referenced_data_file",
                            "type": "string",
                        },
                        {"name": "content_offset", "type": "long"},
                        {
                            "name": "content_size_in_bytes",
                            "type": "long",
                        },
                    ],
                },
            },
        ],
    }
).encode()


def parse_puffin(payload: bytes) -> tuple[list[dict], dict]:
    """Puffin bytes -> (blob descriptors, file properties), with the
    four magics, payload size, and flags all verified."""
    if len(payload) < 20 or payload[:4] != _PUFFIN_MAGIC:
        raise ValueError("puffin magic missing")
    if payload[-4:] != _PUFFIN_MAGIC:
        raise ValueError("puffin footer magic missing")
    flags = int.from_bytes(payload[-8:-4], "little")
    if flags >> 1:
        raise ValueError("unknown puffin footer flags")
    size = int.from_bytes(payload[-12:-8], "little")
    if not 2 <= size <= 1 << 24 or 16 + size > len(payload):
        raise ValueError("puffin footer size out of bounds")
    start = len(payload) - 12 - size
    if payload[start - 4 : start] != _PUFFIN_MAGIC:
        raise ValueError("puffin footer start magic missing")
    raw_footer = payload[start : start + size]
    if flags & 1:
        # spec flag bit 0: FooterPayload is one lz4 FRAME (round 12 —
        # the round-11 loud boundary, removable once the hand frame
        # decoder existed); PayloadSize stays the COMPRESSED size
        from .lz4_codec import decode_lz4_frame

        raw_footer = decode_lz4_frame(raw_footer, max_output=1 << 24)
    try:
        footer = json.loads(raw_footer)
    except json.JSONDecodeError as e:
        raise ValueError(f"puffin footer not JSON: {e}") from None
    if not isinstance(footer, dict):
        raise ValueError("puffin footer malformed")
    blobs = footer.get("blobs")
    props = footer.get("properties", {})
    if not isinstance(blobs, list) or len(blobs) > 1024 \
            or not isinstance(props, dict):
        raise ValueError("puffin footer malformed")
    out = []
    seen_ranges: set[tuple[int, int]] = set()
    for b in blobs:
        if not isinstance(b, dict):
            raise ValueError("puffin blob descriptor malformed")
        btype = b.get("type")
        off = b.get("offset")
        length = b.get("length")
        if (
            not isinstance(btype, str)
            or not isinstance(off, int) or isinstance(off, bool)
            or not isinstance(length, int) or isinstance(length, bool)
            or off < 4 or length < 0 or off + length > start - 4
        ):
            raise ValueError("puffin blob descriptor malformed")
        if (off, length) in seen_ranges:
            # a duplicate range would make resolution depend on
            # footer ordering (review pass 3)
            raise ValueError("duplicate puffin blob byte range")
        seen_ranges.add((off, length))
        bp = b.get("properties", {})
        if not isinstance(bp, dict):
            raise ValueError("puffin blob properties malformed")
        codec = b.get("compression-codec")
        if codec is not None and codec not in ("lz4", "zstd"):
            # spec: absent = uncompressed; lz4/zstd = one compression
            # frame.  Unknown codecs must refuse BEFORE serving bytes
            raise ValueError(
                f"puffin blob codec {codec!r} unsupported (boundary)"
            )
        out.append(
            {"type": btype, "offset": off, "length": length,
             "properties": bp, "codec": codec}
        )
    return out, props


def puffin_dv_positions(payload: bytes, blob: dict) -> list[int]:
    """One deletion-vector-v1 blob -> ascending row positions, with
    the Delta-compatible framing's size and CRC verified and the
    declared cardinality cross-checked."""
    import zlib

    from .delta_log import dv_data_decode

    if blob["type"] != "deletion-vector-v1":
        raise ValueError(f"puffin blob type {blob['type']!r} unsupported")
    raw = payload[blob["offset"] : blob["offset"] + blob["length"]]
    codec = blob.get("codec")
    if codec == "lz4":
        # round 12 (VERDICT r11 item 6): one LZ4 frame per the spec's
        # codec table, through the hand frame decoder
        from .lz4_codec import decode_lz4_frame

        raw = decode_lz4_frame(raw, max_output=1 << 24)
    elif codec == "zstd":
        from .zstd_codec import decode_zstd

        raw = decode_zstd(raw, max_output=1 << 24)
    if len(raw) < 8:
        raise ValueError("deletion vector blob truncated")
    size = int.from_bytes(raw[:4], "big")
    if 4 + size + 4 != len(raw):
        raise ValueError("deletion vector blob size disagrees")
    data = raw[4 : 4 + size]
    crc = int.from_bytes(raw[4 + size :], "big")
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError("deletion vector blob checksum mismatch")
    positions = dv_data_decode(data)
    declared = blob["properties"].get("cardinality")
    if declared is not None:
        try:
            declared = int(declared)
        except (TypeError, ValueError):
            raise ValueError("blob cardinality not an integer") from None
        if declared != len(positions):
            raise ValueError("blob cardinality disagrees with bitmap")
    return positions


def synth_iceberg_puffin_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracle: 3 data files, file j holding
    ``rows_j = 30 + (seed+j)%20`` contiguous values from
    ``lo_j = j*200 + seed%40``; ONE puffin file carries DV blobs for
    files 0 (positions ``r%4 == seed%4``) and 1 (positions
    ``r%5 == seed%5``); file 2 is clean.  Probe = file 2's value at
    index 3 (never deleted)."""
    rows = [30 + (seed + j) % 20 for j in range(3)]
    lo = [j * 200 + seed % 40 for j in range(3)]
    d0 = [r for r in range(rows[0]) if r % 4 == seed % 4]
    d1 = [r for r in range(rows[1]) if r % 5 == seed % 5]
    deleted = len(d0) + len(d1)
    total = sum(rows)
    surviving = sum(
        lo[j] * rows[j] + rows[j] * (rows[j] - 1) // 2 for j in range(3)
    )
    surviving -= sum(lo[0] + r for r in d0)
    surviving -= sum(lo[1] + r for r in d1)
    return {
        "rows": rows,
        "lo": lo,
        "d0": d0,
        "d1": d1,
        "probe": lo[2] + 3,
        "total_rows": total,
        "deleted_rows": deleted,
        "live_rows": total - deleted,
        "surviving_v_sum": surviving,
    }


def synth_iceberg_puffin(seed: int) -> bytes:
    """Data parquet + manifests (the v2 machinery, identity windows)
    + one REAL Puffin file holding two DV blobs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .delta_log import dv_data_encode

    plan = synth_iceberg_puffin_plan(seed)
    files: dict[str, bytes] = {}
    sync = bytes((seed * 43 + j * 17 + 9) % 256 for j in range(16))

    entries = []
    for j in range(3):
        rows, lo = plan["rows"][j], plan["lo"][j]
        buf = io.BytesIO()
        pq.write_table(
            pa.table({"v": [lo + r for r in range(rows)]}), buf
        )
        path = f"data/f{j:02d}.parquet"
        files[path] = buf.getvalue()
        entries.append(
            _zigzag_write(1)
            + _zigzag_write(1) + _zigzag_write(7)
            + _zigzag_write(0)
            + _enc_string(path)
            + _enc_string("PARQUET")
            + _zigzag_write(rows)
            + _zigzag_write(len(files[path]))
            + _enc_bounds(lo)
            + _enc_bounds(lo + rows - 1)
            + _zigzag_write(0)
        )
    files["metadata/m0.avro"] = encode_avro_container(
        _MANIFEST_SCHEMA, entries, sync
    )

    # blob codec rotation (round 12 — VERDICT r11 item 6): seed%3 =
    # uncompressed / lz4 frame / zstd frame, producer = pyarrow's
    # reference codecs over the framed blob content
    blob_codec = (None, "lz4", "zstd")[seed % 3]

    def dv_blob(positions: list[int]) -> bytes:
        import zlib

        data = dv_data_encode(positions)
        framed = (
            len(data).to_bytes(4, "big")
            + data
            + (zlib.crc32(data) & 0xFFFFFFFF).to_bytes(4, "big")
        )
        if blob_codec is None:
            return framed
        import pyarrow as pa

        return bytes(pa.Codec(blob_codec).compress(framed))

    b0 = dv_blob(plan["d0"])
    b1 = dv_blob(plan["d1"])
    payload = bytearray(_PUFFIN_MAGIC)
    off0 = len(payload)
    payload += b0
    off1 = len(payload)
    payload += b1
    footer = json.dumps(
        {
            "blobs": [
                {
                    "type": "deletion-vector-v1",
                    "fields": [_V_FIELD_ID],
                    "snapshot-id": 7,
                    "sequence-number": 2,
                    "offset": off0,
                    "length": len(b0),
                    **(
                        {"compression-codec": blob_codec}
                        if blob_codec else {}
                    ),
                    "properties": {
                        "cardinality": str(len(plan["d0"])),
                    },
                },
                {
                    "type": "deletion-vector-v1",
                    "fields": [_V_FIELD_ID],
                    "snapshot-id": 7,
                    "sequence-number": 2,
                    "offset": off1,
                    "length": len(b1),
                    **(
                        {"compression-codec": blob_codec}
                        if blob_codec else {}
                    ),
                    "properties": {
                        "cardinality": str(len(plan["d1"])),
                    },
                },
            ],
            "properties": {"created-by": "fixture"},
        }
    ).encode()
    payload += _PUFFIN_MAGIC
    payload += footer
    payload += len(footer).to_bytes(4, "little")
    payload += (0).to_bytes(4, "little")
    payload += _PUFFIN_MAGIC
    puffin_path = "deletes/dv.puffin"
    files[puffin_path] = bytes(payload)

    # the v3 referencing shape: a DELETE manifest whose entries point
    # INTO the puffin via content_offset/content_size_in_bytes
    def dv_entry(ref: str, off: int, blob: bytes, card: int) -> bytes:
        return (
            _zigzag_write(1)
            + _zigzag_write(1) + _zigzag_write(7)
            + _zigzag_write(1)  # content = positional deletes
            + _enc_string(puffin_path)
            + _enc_string("PUFFIN")
            + _zigzag_write(card)
            + _zigzag_write(len(files[puffin_path]))
            + _enc_string(ref)
            + _zigzag_write(off)
            + _zigzag_write(len(blob))
        )

    files["metadata/mdv.avro"] = encode_avro_container(
        _DV_MANIFEST_SCHEMA,
        [
            dv_entry("data/f00.parquet", off0, b0, len(plan["d0"])),
            dv_entry("data/f01.parquet", off1, b1, len(plan["d1"])),
        ],
        sync,
    )
    files["metadata/snap-7.avro"] = encode_avro_container(
        _MANIFEST_LIST_SCHEMA,
        [
            _enc_string("metadata/m0.avro")
            + _zigzag_write(len(files["metadata/m0.avro"]))
            + _zigzag_write(0)
            + _zigzag_write(0)
            + _zigzag_write(7)
            + _zigzag_write(3),
            _enc_string("metadata/mdv.avro")
            + _zigzag_write(len(files["metadata/mdv.avro"]))
            + _zigzag_write(0)
            + _zigzag_write(1)
            + _zigzag_write(7)
            + _zigzag_write(2),
        ],
        sync,
    )

    files["metadata/v2.metadata.json"] = json.dumps(
        {
            "format-version": 2,
            "table-uuid": f"00000000-0000-4000-8000-{seed:012d}",
            "properties": {"fixture.probe": str(plan["probe"])},
            "current-snapshot-id": 7,
            "snapshots": [
                {"snapshot-id": 7, "manifest-list": "metadata/snap-7.avro"}
            ],
        }
    ).encode()
    return write_tar_bundle(files)


def scan_iceberg_puffin(payload: bytes) -> dict:
    """Puffin-DV merge-on-read through the v3 REFERENCING shape:
    DELETE-manifest entries carry ``referenced_data_file`` plus
    ``content_offset``/``content_size_in_bytes`` pointing INTO the
    Puffin container; each range must match a declared footer blob
    exactly.  The roaring codec is shared with the Delta reader."""

    files = read_tar_bundle(payload)
    meta, _snaps, ml_blob, probe = _parse_table_meta(files)
    data_entries = []  # (path, record_count)
    dv_by_file: dict[str, list[int]] = {}
    puffin_cache: dict[str, tuple[bytes, dict]] = {}
    n_dv_blobs = 0
    codecs_seen: set[str] = set()
    for mf in decode_avro_blocks(ml_blob):
        mpath = mf.get("manifest_path")
        if not isinstance(mpath, str):
            raise ValueError("manifest_path is not a string")
        mblob = files.get(mpath)
        if mblob is None:
            raise ValueError(f"manifest {mpath!r} missing from bundle")
        if mf.get("manifest_length") != len(mblob):
            raise ValueError("manifest_length disagrees with bundle")
        content = mf.get("content", 0)
        if content not in (0, 1):
            raise ValueError(f"manifest content {content!r} unknown")
        for e in decode_avro_blocks(mblob):
            df = e.get("data_file")
            if not isinstance(df, dict):
                raise ValueError("manifest entry without data_file")
            if e.get("status") == 2:
                continue
            path = df.get("file_path")
            rc = df.get("record_count")
            if not isinstance(path, str) or not isinstance(rc, int) \
                    or isinstance(rc, bool) or rc < 0:
                raise ValueError("manifest data_file malformed")
            if content == 0:
                data_entries.append((path, rc))
                continue
            # DV entry: file_format PUFFIN, a referenced data file,
            # and a byte range that must name a declared blob
            if df.get("file_format") != "PUFFIN":
                raise ValueError(
                    "delete manifest file_format unsupported (boundary)"
                )
            ref = df.get("referenced_data_file")
            off = df.get("content_offset")
            size = df.get("content_size_in_bytes")
            if (
                not isinstance(ref, str)
                or not isinstance(off, int) or isinstance(off, bool)
                or not isinstance(size, int) or isinstance(size, bool)
                or off < 0 or size < 0
            ):
                raise ValueError("DV manifest entry malformed")
            if path not in puffin_cache:
                blob = files.get(path)
                if blob is None:
                    raise ValueError("puffin file missing from bundle")
                blobs, _props = parse_puffin(blob)
                puffin_cache[path] = (
                    blob,
                    {(b["offset"], b["length"]): b for b in blobs},
                )
            puffin, by_range = puffin_cache[path]
            b = by_range.get((off, size))
            if b is None:
                raise ValueError(
                    "manifest DV range not declared in the puffin footer"
                )
            if ref in dv_by_file:
                raise ValueError("multiple deletion vectors for one file")
            positions = puffin_dv_positions(puffin, b)
            if len(positions) != rc:
                raise ValueError(
                    "DV record_count disagrees with the bitmap"
                )
            dv_by_file[ref] = positions
            codecs_seen.add(b.get("codec") or "none")
            n_dv_blobs += 1
    if not data_entries:
        raise ValueError("current snapshot has no live data files")
    total_rows = deleted_rows = surviving = 0
    matches = 0
    for path, rc in data_entries:
        table = _read_parquet_checked(files, path, rc)
        if "v" not in table.column_names:
            raise ValueError("data file missing the value column")
        vals = table.column("v").to_pylist()
        if not all(isinstance(v, int) for v in vals):
            raise ValueError("data value not an integer")
        total_rows += rc
        positions = dv_by_file.pop(path, [])
        if positions and positions[-1] >= rc:
            raise ValueError("deleted position past file rows")
        deleted_rows += len(positions)
        pset = set(positions)
        for r, v in enumerate(vals):
            if r in pset:
                continue
            surviving += v
            if v == probe:
                matches += 1
    if dv_by_file:
        raise ValueError("deletion vector references a missing file")
    for total in (total_rows, surviving):
        if not -(2**63) <= total < 2**63:
            raise ValueError("puffin scan aggregate overflows int64")
    return {
        "n_data_files": len(data_entries),
        "n_dv_blobs": n_dv_blobs,
        # the blob codec rides in the oracle hash so a reader that
        # served compressed bytes raw (or vice versa) is visible even
        # beyond the CRC/cardinality fences
        "blob_codec": (
            "none" if not codecs_seen
            else next(iter(codecs_seen)) if len(codecs_seen) == 1
            else "mixed"
        ),
        "total_rows": total_rows,
        "deleted_rows": deleted_rows,
        "live_rows": total_rows - deleted_rows,
        "surviving_v_sum": surviving,
        "probe_matches": matches,
    }


# ---------------------------------------------------------------------------
# string partition keys: bucket/truncate over UTF-8 (round 12 —
# VERDICT r11 item 2; tenant/country-style keys are the common case)
# ---------------------------------------------------------------------------

_MANIFEST_SCHEMA_STR = json.dumps(
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
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {
                            "name": "partition",
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": [
                                    {"name": "p", "type": "string"},
                                    {"name": "q", "type": "long"},
                                ],
                            },
                        },
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                        {"name": "lower_bounds", "type": _BOUND_SCHEMA},
                        _UPPER_BOUNDS_REF,
                    ],
                },
            },
        ],
    }
).encode()


def _enc_bounds_str(value: str) -> bytes:
    """One-entry bounds array with the spec's STRING single-value
    serialization: UTF-8 bytes, no length prefix inside the value."""
    return (
        _zigzag_write(1)
        + _zigzag_write(_V_FIELD_ID)
        + _enc_bytes(value.encode("utf-8"))
        + _zigzag_write(0)
    )


def _bound_str(bounds) -> str:
    """The predicate field's string bound (UTF-8 decode of the
    serialized value)."""
    if not isinstance(bounds, list) or not bounds:
        raise ValueError("data file without bounds")
    for kv in bounds:
        if not isinstance(kv, dict):
            raise ValueError("bounds entry is not a key/value record")
        if kv.get("key") == _V_FIELD_ID:
            raw = kv.get("value")
            if not isinstance(raw, bytes) or len(raw) > 1024:
                raise ValueError("iceberg string bound malformed")
            try:
                return raw.decode("utf-8")
            except UnicodeDecodeError:
                raise ValueError("string bound not UTF-8") from None
    raise ValueError("bounds missing the predicate field id")


def synth_iceberg_str_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracle: 4 files under the two-field
    STRING spec ``(truncate[2](s), bucket[8](s))`` at cells
    (prefix, bucket) = (P0,B0)/(P0,B1)/(P1,B0)/(P1,B1) — neither
    dimension prunes alone; the probe string lives in file 0, so
    only the conjunction reaches ``files_pruned_partition = 3``.
    File j holds ``rows_j = 15 + (seed+j) % 10`` distinct strings
    ``prefix || 5 digits`` picked into the cell's bucket class
    ``B0 = seed%8`` / ``B1 = (seed+3)%8``; prefixes are
    ``'t' || seed%10`` and ``'u' || seed%10``."""
    rows = [15 + (seed + j) % 10 for j in range(4)]
    return {
        "rows": rows,
        "prefix": f"t{seed % 10}",
        "bucket": seed % 8,
        "rows_scanned": rows[0],
        "total_rows": sum(rows),
    }


def synth_iceberg_str(seed: int) -> bytes:
    import pyarrow as pa
    import pyarrow.parquet as pq

    plan = synth_iceberg_str_plan(seed)
    p0 = f"t{seed % 10}"
    p1 = f"u{seed % 10}"
    b0 = seed % 8
    b1 = (seed + 3) % 8

    def pick(prefix: str, bucket: int, count: int) -> list[str]:
        vals = []
        k = 0
        while len(vals) < count:
            if k >= 100000:
                raise ValueError("prefix exhausted for bucket class")
            s = f"{prefix}{k:05d}"
            if bucket_transform_str(s, 8) == bucket:
                vals.append(s)
            k += 1
        return vals

    cells = [(p0, b0), (p0, b1), (p1, b0), (p1, b1)]
    vals = [
        pick(p, b, plan["rows"][j]) for j, (p, b) in enumerate(cells)
    ]
    probe = vals[0][0]
    sync = bytes((seed * 43 + j * 13 + 5) % 256 for j in range(16))
    files: dict[str, bytes] = {}
    entries = []
    for j, (p, b) in enumerate(cells):
        buf = io.BytesIO()
        pq.write_table(pa.table({"s": vals[j]}), buf)
        path = f"data/f{j:02d}.parquet"
        files[path] = buf.getvalue()
        entries.append(
            _zigzag_write(1)
            + _zigzag_write(1) + _zigzag_write(7)
            + _zigzag_write(0)  # content = data
            + _enc_string(path)
            + _enc_string("PARQUET")
            + _enc_string(p)  # partition.p = truncate[2] value
            + _zigzag_write(b)  # partition.q = bucket[8] value
            + _zigzag_write(len(vals[j]))
            + _zigzag_write(len(files[path]))
            + _enc_bounds_str(min(vals[j]))
            + _enc_bounds_str(max(vals[j]))
        )
    files["metadata/m0.avro"] = encode_avro_container(
        _MANIFEST_SCHEMA_STR, entries, sync
    )
    files["metadata/snap-7.avro"] = encode_avro_container(
        _MANIFEST_LIST_SCHEMA,
        [
            _enc_string("metadata/m0.avro")
            + _zigzag_write(len(files["metadata/m0.avro"]))
            + _zigzag_write(0)
            + _zigzag_write(0)
            + _zigzag_write(7)
            + _zigzag_write(4)
        ],
        sync,
    )
    files["metadata/v2.metadata.json"] = json.dumps(
        {
            "format-version": 2,
            "table-uuid": f"00000000-0000-4000-8000-{seed:012d}",
            "properties": {"fixture.probe": probe},
            "default-spec-id": 0,
            "partition-specs": [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "name": "p",
                            "transform": "truncate[2]",
                            "source-id": _V_FIELD_ID,
                            "field-id": 1000,
                        },
                        {
                            "name": "q",
                            "transform": "bucket[8]",
                            "source-id": _V_FIELD_ID,
                            "field-id": 1001,
                        },
                    ],
                }
            ],
            "current-snapshot-id": 7,
            "snapshots": [
                {"snapshot-id": 7, "manifest-list": "metadata/snap-7.avro"}
            ],
        }
    ).encode()
    return write_tar_bundle(files)


def scan_iceberg_str(payload: bytes) -> dict:
    """Point lookup on a STRING-partitioned table through
    transform-aware planning: prune data files whose manifest
    partition tuple differs from ``(truncate[W](probe),
    bucket[N](probe))`` computed over the probe's UTF-8 bytes
    (murmur3, spec Appendix B), then bounds-prune on the string
    bounds, read survivors, and audit every scanned row's transforms
    against the manifest's declared partition values (quarantine on
    drift).  ``probe_bucket`` is returned so the murmur3-over-UTF-8
    value itself is inside the oracle hash."""
    files = read_tar_bundle(payload)
    meta, _snaps, ml_blob, probe = _parse_table_meta(
        files, string_probe=True
    )
    tspecs = _resolve_partition_spec(
        meta, allowed=("bucket", "truncate"), kind="strings"
    )

    def transform_of(tname: str, targ: int, value: str):
        if tname == "bucket":
            return bucket_transform_str(value, targ)
        return truncate_transform_str(value, targ)

    candidates = []  # (path, record_count, partition, lo, hi)
    for mf in decode_avro_blocks(ml_blob):
        mpath = mf.get("manifest_path")
        if not isinstance(mpath, str):
            raise ValueError("manifest_path is not a string")
        mblob = files.get(mpath)
        if mblob is None:
            raise ValueError(f"manifest {mpath!r} missing from bundle")
        if mf.get("manifest_length") != len(mblob):
            raise ValueError("manifest_length disagrees with bundle")
        if mf.get("content", 0) != 0:
            raise ValueError(
                "delete manifests unsupported by the string scan "
                "(boundary)"
            )
        for e in decode_avro_blocks(mblob):
            status = e.get("status")
            df = e.get("data_file")
            if not isinstance(df, dict):
                raise ValueError("manifest entry without data_file")
            if status == 2:
                continue
            if status not in (0, 1):
                raise ValueError(f"manifest entry status {status} unknown")
            path = df.get("file_path")
            rc = df.get("record_count")
            part = df.get("partition")
            if not isinstance(path, str):
                raise ValueError("data file path is not a string")
            if not isinstance(rc, int) or isinstance(rc, bool) or rc < 0:
                raise ValueError("data file record_count malformed")
            if not isinstance(part, dict):
                raise ValueError("data file partition malformed")
            part_vals = []
            for pname, tname, _ta in tspecs:
                pv = part.get(pname)
                want = str if tname == "truncate" else int
                if not isinstance(pv, want) or isinstance(pv, bool):
                    raise ValueError(
                        "data file partition value malformed"
                    )
                part_vals.append(pv)
            if df.get("content", 0) != 0:
                raise ValueError("non-data file content (boundary)")
            lo = _bound_str(df.get("lower_bounds"))
            hi = _bound_str(df.get("upper_bounds"))
            if lo > hi:
                raise ValueError("data file lower bound above upper")
            candidates.append((path, rc, tuple(part_vals), lo, hi))
    if not candidates:
        raise ValueError("current snapshot has no live data files")
    target = tuple(
        transform_of(tn, ta, probe) for _pn, tn, ta in tspecs
    )
    part_survivors = [c for c in candidates if c[2] == target]
    files_pruned_partition = len(candidates) - len(part_survivors)
    survivors = [c for c in part_survivors if c[3] <= probe <= c[4]]
    files_pruned_bounds = len(part_survivors) - len(survivors)
    rows_scanned = 0
    matches = 0
    for path, rc, part, _lo, _hi in survivors:
        table = _read_parquet_checked(files, path, rc)
        if "s" not in table.column_names:
            raise ValueError("data file missing the predicate column")
        rows_scanned += table.num_rows
        for s in table.column("s").to_pylist():
            if not isinstance(s, str):
                raise ValueError("data value not a string")
            if any(
                transform_of(tn, ta, s) != pv
                for (_pn, tn, ta), pv in zip(tspecs, part)
            ):
                raise ValueError(
                    "row transform disagrees with manifest partition"
                )
            if s == probe:
                matches += 1
    total_rows = sum(c[1] for c in candidates)
    if not (0 <= total_rows < 2**63):
        raise ValueError("iceberg total_rows overflows int64 (boundary)")
    bucket_spec = next(
        ((tn, ta) for _pn, tn, ta in tspecs if tn == "bucket"), None
    )
    truncate_spec = next(
        ((tn, ta) for _pn, tn, ta in tspecs if tn == "truncate"), None
    )
    if bucket_spec is None or truncate_spec is None:
        raise ValueError("string fixture needs bucket AND truncate")
    return {
        "n_data_files": len(candidates),
        "files_pruned_partition": files_pruned_partition,
        "files_pruned_bounds": files_pruned_bounds,
        "files_scanned": len(survivors),
        "rows_scanned": rows_scanned,
        "total_rows": total_rows,
        "probe_matches": matches,
        "probe_bucket": bucket_transform_str(probe, bucket_spec[1]),
        "probe_prefix": truncate_transform_str(probe, truncate_spec[1]),
    }


# ---------------------------------------------------------------------------
# decimal partition keys: bucket/truncate over the UNSCALED value
# (round 12 — spec Appendix B: murmur3 of the minimal two's-complement
# big-endian bytes; truncate floors in unscaled units)
# ---------------------------------------------------------------------------

def synth_iceberg_dec_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracle: 4 files under the two-field
    DECIMAL(9,2) spec ``(truncate[500](d), bucket[8](d))`` at cells
    (window, bucket) = (W0,B0)/(W0,B1)/(W1,B0)/(W1,B1) — only the
    conjunction prunes to one file.  File j holds ``rows_j = 10 +
    (seed+j) % 6`` distinct unscaled values picked ascending from
    the cell's 500-wide window into its bucket class; ``W0 =
    500*(seed%10)``, ``B0 = seed%8``, ``B1 = (seed+3)%8``."""
    rows = [10 + (seed + j) % 6 for j in range(4)]
    return {
        "rows": rows,
        "window": 500 * (seed % 10),
        "bucket": seed % 8,
        "rows_scanned": rows[0],
        "total_rows": sum(rows),
    }


def synth_iceberg_dec(seed: int) -> bytes:
    import decimal as _dec

    import pyarrow as pa
    import pyarrow.parquet as pq

    plan = synth_iceberg_dec_plan(seed)
    w0 = 500 * (seed % 10)
    w1 = w0 + 500
    b0 = seed % 8
    b1 = (seed + 3) % 8

    def pick(window: int, bucket: int, count: int) -> list[int]:
        vals = []
        u = window
        while len(vals) < count:
            if u >= window + 500:
                raise ValueError("window exhausted for bucket class")
            if bucket_transform_decimal(u, 8) == bucket:
                vals.append(u)
            u += 1
        return vals

    cells = [(w0, b0), (w0, b1), (w1, b0), (w1, b1)]
    unscaled = [
        pick(w, b, plan["rows"][j]) for j, (w, b) in enumerate(cells)
    ]
    probe_u = unscaled[0][0]
    probe = f"{_dec.Decimal(probe_u).scaleb(-2):.2f}"
    sync = bytes((seed * 47 + j * 19 + 3) % 256 for j in range(16))
    files: dict[str, bytes] = {}
    entries = []
    for j, (w, b) in enumerate(cells):
        arr = pa.array(
            [_dec.Decimal(u).scaleb(-2) for u in unscaled[j]],
            type=pa.decimal128(9, 2),
        )
        buf = io.BytesIO()
        pq.write_table(pa.table({"d": arr}), buf)
        path = f"data/f{j:02d}.parquet"
        files[path] = buf.getvalue()
        entries.append(
            _zigzag_write(1)
            + _zigzag_write(1) + _zigzag_write(7)
            + _zigzag_write(0)
            + _enc_string(path)
            + _enc_string("PARQUET")
            + _zigzag_write(w)  # partition.p = truncate (unscaled)
            + _zigzag_write(b)  # partition.q = bucket
            + _zigzag_write(len(unscaled[j]))
            + _zigzag_write(len(files[path]))
            + _enc_bounds(min(unscaled[j]))
            + _enc_bounds(max(unscaled[j]))
            + _zigzag_write(0)  # equality_ids: empty
        )
    files["metadata/m0.avro"] = encode_avro_container(
        _MANIFEST_SCHEMA_MULTI, entries, sync
    )
    files["metadata/snap-7.avro"] = encode_avro_container(
        _MANIFEST_LIST_SCHEMA,
        [
            _enc_string("metadata/m0.avro")
            + _zigzag_write(len(files["metadata/m0.avro"]))
            + _zigzag_write(0)
            + _zigzag_write(0)
            + _zigzag_write(7)
            + _zigzag_write(4)
        ],
        sync,
    )
    files["metadata/v2.metadata.json"] = json.dumps(
        {
            "format-version": 2,
            "table-uuid": f"00000000-0000-4000-8000-{seed:012d}",
            "properties": {"fixture.probe": probe,
                           "fixture.probe.scale": "2"},
            "default-spec-id": 0,
            "partition-specs": [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "name": "p",
                            "transform": "truncate[500]",
                            "source-id": _V_FIELD_ID,
                            "field-id": 1000,
                        },
                        {
                            "name": "q",
                            "transform": "bucket[8]",
                            "source-id": _V_FIELD_ID,
                            "field-id": 1001,
                        },
                    ],
                }
            ],
            "current-snapshot-id": 7,
            "snapshots": [
                {"snapshot-id": 7, "manifest-list": "metadata/snap-7.avro"}
            ],
        }
    ).encode()
    return write_tar_bundle(files)


def scan_iceberg_dec(payload: bytes) -> dict:
    """Point lookup on a DECIMAL-partitioned table: transforms apply
    to the UNSCALED value (spec Appendix B — bucket hashes the
    minimal two's-complement big-endian bytes, truncate floors in
    unscaled units), pruning on the (truncate, bucket) conjunction,
    bounds in unscaled int64 serialization, and a per-row transform
    audit over the pyarrow-decoded decimal column.  ``probe_bucket``
    puts the minimal-bytes murmur3 value inside the oracle hash."""
    import decimal as _dec

    files = read_tar_bundle(payload)
    meta, _snaps, ml_blob, probe_str = _parse_table_meta(
        files, string_probe=True
    )
    props = meta.get("properties", {})
    scale_raw = props.get("fixture.probe.scale")
    try:
        scale = int(scale_raw)
    except (TypeError, ValueError):
        raise ValueError("decimal probe scale malformed") from None
    if not 0 <= scale <= 18:
        raise ValueError("decimal probe scale out of range")
    try:
        probe_dec = _dec.Decimal(probe_str)
    except _dec.InvalidOperation:
        raise ValueError("decimal probe not parseable") from None
    if not probe_dec.is_finite():
        # Decimal("Infinity")/"NaN"/"sNaN" PARSE successfully; the
        # scaleb/int conversions below raise OverflowError /
        # InvalidOperation — not ValueError — and escape the
        # quarantine (review r12 pass 3, reproduced)
        raise ValueError("decimal probe not finite (boundary)")
    probe_scaled = probe_dec.scaleb(scale)
    if probe_scaled != probe_scaled.to_integral_value():
        raise ValueError("decimal probe has more digits than the scale")
    probe_u = int(probe_scaled)

    tspecs = _resolve_partition_spec(
        meta, allowed=("bucket", "truncate"), kind="decimals"
    )

    def transform_of(tname: str, targ: int, unscaled: int) -> int:
        if tname == "bucket":
            return bucket_transform_decimal(unscaled, targ)
        return truncate_transform_decimal(unscaled, targ)

    candidates = []  # (path, record_count, partition, lo, hi)
    for mf in decode_avro_blocks(ml_blob):
        mpath = mf.get("manifest_path")
        if not isinstance(mpath, str):
            raise ValueError("manifest_path is not a string")
        mblob = files.get(mpath)
        if mblob is None:
            raise ValueError(f"manifest {mpath!r} missing from bundle")
        if mf.get("manifest_length") != len(mblob):
            raise ValueError("manifest_length disagrees with bundle")
        if mf.get("content", 0) != 0:
            raise ValueError(
                "delete manifests unsupported by the decimal scan "
                "(boundary)"
            )
        for e in decode_avro_blocks(mblob):
            status = e.get("status")
            df = e.get("data_file")
            if not isinstance(df, dict):
                raise ValueError("manifest entry without data_file")
            if status == 2:
                continue
            if status not in (0, 1):
                raise ValueError(f"manifest entry status {status} unknown")
            path = df.get("file_path")
            rc = df.get("record_count")
            part = df.get("partition")
            if not isinstance(path, str):
                raise ValueError("data file path is not a string")
            if not isinstance(rc, int) or isinstance(rc, bool) or rc < 0:
                raise ValueError("data file record_count malformed")
            if not isinstance(part, dict) or not all(
                isinstance(part.get(pname), int)
                and not isinstance(part.get(pname), bool)
                for pname, _tn, _ta in tspecs
            ):
                raise ValueError("data file partition value malformed")
            part_tuple = tuple(
                part[pname] for pname, _tn, _ta in tspecs
            )
            if df.get("content", 0) != 0:
                raise ValueError("non-data file content (boundary)")
            lo = _bound_value(df.get("lower_bounds"))
            hi = _bound_value(df.get("upper_bounds"))
            if lo > hi:
                raise ValueError("data file lower bound above upper")
            candidates.append((path, rc, part_tuple, lo, hi))
    if not candidates:
        raise ValueError("current snapshot has no live data files")
    target = tuple(
        transform_of(tn, ta, probe_u) for _pn, tn, ta in tspecs
    )
    part_survivors = [c for c in candidates if c[2] == target]
    files_pruned_partition = len(candidates) - len(part_survivors)
    survivors = [
        c for c in part_survivors if c[3] <= probe_u <= c[4]
    ]
    files_pruned_bounds = len(part_survivors) - len(survivors)
    rows_scanned = 0
    matches = 0
    for path, rc, part, _lo, _hi in survivors:
        table = _read_parquet_checked(files, path, rc)
        if "d" not in table.column_names:
            raise ValueError("data file missing the predicate column")
        rows_scanned += table.num_rows
        for d in table.column("d").to_pylist():
            if not isinstance(d, _dec.Decimal):
                raise ValueError("data value not a decimal")
            scaled = d.scaleb(scale)
            if scaled != scaled.to_integral_value():
                raise ValueError("decimal value off the declared scale")
            u = int(scaled)
            if any(
                transform_of(tn, ta, u) != pv
                for (_pn, tn, ta), pv in zip(tspecs, part)
            ):
                raise ValueError(
                    "row transform disagrees with manifest partition"
                )
            if u == probe_u:
                matches += 1
    total_rows = sum(c[1] for c in candidates)
    if not (0 <= total_rows < 2**63):
        raise ValueError("iceberg total_rows overflows int64 (boundary)")
    bucket_spec = next(
        ((tn, ta) for _pn, tn, ta in tspecs if tn == "bucket"), None
    )
    truncate_spec = next(
        ((tn, ta) for _pn, tn, ta in tspecs if tn == "truncate"), None
    )
    if bucket_spec is None or truncate_spec is None:
        raise ValueError("decimal fixture needs bucket AND truncate")
    return {
        "n_data_files": len(candidates),
        "files_pruned_partition": files_pruned_partition,
        "files_pruned_bounds": files_pruned_bounds,
        "files_scanned": len(survivors),
        "rows_scanned": rows_scanned,
        "total_rows": total_rows,
        "probe_matches": matches,
        "probe_bucket": bucket_transform_decimal(probe_u, bucket_spec[1]),
        "probe_window": truncate_transform_decimal(
            probe_u, truncate_spec[1]
        ),
    }


# ---------------------------------------------------------------------------
# the `files` metadata table (round 12): SELECT * FROM tbl.files —
# one row per live manifest entry, with data_sequence_number
# inheritance resolved, served WITHOUT touching any data parquet
# ---------------------------------------------------------------------------

def list_iceberg_files(payload: bytes) -> list[dict]:
    """The current snapshot's manifest entries as metadata ROWS
    (path, content, record_count, partition value, int64 bounds,
    resolved sequence number) — the planning-layer view Iceberg
    exposes as the ``files``/``delete_files`` metadata tables.
    Everything comes from the manifest layer alone: a correct
    implementation never opens a data file, which is exactly why
    the metadata table is the cheap audit surface at 100 TB."""
    files = read_tar_bundle(payload)
    meta, _snaps, ml_blob, _probe = _parse_table_meta(files)
    # ADVICE r12: the partition field name comes from the default
    # partition spec, not a hardcoded 'p' — any single-field spec is
    # served (the value lands in the stable `partition_p` output
    # column); multi-field specs stay a loud boundary because the
    # flat metadata-row schema can't carry a struct.
    tspecs = _resolve_partition_spec(meta)
    if len(tspecs) != 1:
        raise ValueError(
            "files metadata table serves single-field specs only "
            "(boundary: multi-field partition is a struct column)"
        )
    part_field = tspecs[0][0]
    out: list[dict] = []
    for mf in decode_avro_blocks(ml_blob):
        mpath = mf.get("manifest_path")
        if not isinstance(mpath, str):
            raise ValueError("manifest_path is not a string")
        mblob = files.get(mpath)
        if mblob is None:
            raise ValueError(f"manifest {mpath!r} missing from bundle")
        if mf.get("manifest_length") != len(mblob):
            raise ValueError("manifest_length disagrees with bundle")
        mseq = mf.get("sequence_number")
        if mseq is not None and (
            not isinstance(mseq, int) or isinstance(mseq, bool) or mseq < 0
        ):
            raise ValueError("manifest sequence_number malformed")
        for e in decode_avro_blocks(mblob):
            status = e.get("status")
            df = e.get("data_file")
            if not isinstance(df, dict):
                raise ValueError("manifest entry without data_file")
            if status == 2:
                continue
            if status not in (0, 1):
                raise ValueError(f"manifest entry status {status} unknown")
            eseq = e.get("data_sequence_number")
            if eseq is None and mseq is not None:
                if status != 1:
                    raise ValueError(
                        "sequence inheritance on a non-added entry"
                    )
                eseq = mseq
            if eseq is None:
                # v2 requires an explicit or inheritable sequence
                # number; neither present is a malformed manifest,
                # not a null output (ADVICE r12)
                raise ValueError(
                    "entry has no sequence number and none to inherit"
                )
            if (
                not isinstance(eseq, int) or isinstance(eseq, bool)
                or eseq < 0
            ):
                raise ValueError("data_sequence_number malformed")
            path = df.get("file_path")
            rc = df.get("record_count")
            part = df.get("partition")
            content = df.get("content", 0)
            if not isinstance(path, str):
                raise ValueError("data file path is not a string")
            if not isinstance(rc, int) or isinstance(rc, bool) or rc < 0:
                raise ValueError("data file record_count malformed")
            if content not in (0, 1, 2):
                raise ValueError(f"file content {content!r} unknown")
            if isinstance(part, dict):
                pv = part.get(part_field)
            else:
                pv = part
            if not isinstance(pv, int) or isinstance(pv, bool):
                raise ValueError("partition value malformed")
            lo = _bound_value(df.get("lower_bounds"))
            hi = _bound_value(df.get("upper_bounds"))
            if lo > hi:
                raise ValueError("data file lower bound above upper")
            out.append({
                "file_path": path,
                "content": content,
                "record_count": rc,
                "partition_p": pv,
                "lower_bound": lo,
                "upper_bound": hi,
                "sequence_number": eseq,
            })
    if not out:
        raise ValueError("current snapshot has no manifest entries")
    if len(out) > 1 << 16:
        raise ValueError("manifest entry count past cap (boundary)")
    return out


# ---------------------------------------------------------------------------
# inspection tables beyond `files` (round 13 — VERDICT r12 item 2):
# snapshots / history / manifests / partitions, the four views users
# actually query for table ops.  All four are METADATA-LAYER ONLY —
# the fixture deliberately ships NO data parquet at all, so any
# implementation that touches a data file fails loudly instead of
# silently scanning table bytes (the 100 TB sin these views exist to
# avoid).  Reference surface: Iceberg's spec §Table Metadata +
# §Manifests (snapshot-log, parent-snapshot-id, summary.operation,
# manifest_file counts, field_summary); the reference repo has no
# lakehouse layer (SURVEY §2: MySQL tables only) — this is
# beyond-reference scope.
# ---------------------------------------------------------------------------

_INSPECT_OPS = ("append", "replace", "overwrite", "delete")

_MANIFEST_LIST_SCHEMA_INSPECT = json.dumps(
    {
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
            {"name": "existing_data_files_count", "type": "int"},
            {"name": "deleted_data_files_count", "type": "int"},
            {
                "name": "partitions",
                "type": {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "field_summary",
                        "fields": [
                            {"name": "contains_null", "type": "boolean"},
                            {
                                "name": "lower_bound",
                                "type": ["null", "bytes"],
                            },
                            {
                                "name": "upper_bound",
                                "type": ["null", "bytes"],
                            },
                        ],
                    },
                },
            },
        ],
    }
).encode()


def synth_iceberg_inspect_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracles of all four inspection-table
    queries.  Three snapshots s1=11/s2=22/s3=33 (parent chain
    11<-22<-33, sequence numbers 1/2/3, committed at ``t0 + 60s*k``
    with ``t0 = 1.7e12 + (seed%1000)*60000`` ms):

    - s1 appends f0(p=0, rows r0) + f1(p=100, r1) via manifest m1;
    - s2 appends f2(p=0, r2) + f3(p=200, r3) via m2;
    - s3 OVERWRITES: deletes f1 (m1 is rewritten as m1r carrying
      f0 existing + f1 deleted, both with explicit data sequence 1)
      and appends f4(p=100, r4) via m3;
    - EVEN seeds: current = s3.  ODD seeds: the table was ROLLED
      BACK to s2 — snapshot-log gains a 4th entry re-making 22
      current at ``t0+180s``, and s3 stops being a current ancestor.

    ``r_j = 10 + (seed + 3*j) % 20``."""
    rows = [10 + (seed + 3 * j) % 20 for j in range(5)]
    t0 = 1_700_000_000_000 + (seed % 1000) * 60_000
    return {
        "rows": rows,
        "t0_ms": t0,
        "rollback": seed % 2 == 1,
        "current": 22 if seed % 2 == 1 else 33,
    }


def synth_iceberg_inspect(seed: int) -> bytes:
    """The three-snapshot inspection fixture (plan above) with NO
    data parquet in the bundle — metadata tables must never need
    one.  ``file_size_in_bytes`` is synthetic (``100 + rows*10``)."""
    plan = synth_iceberg_inspect_plan(seed)
    r = plan["rows"]
    t0 = plan["t0_ms"]
    sync = bytes((seed * 17 + j * 29 + 3) % 256 for j in range(16))
    files: dict[str, bytes] = {}

    def entry(
        status: int, path: str, part: int, rows: int, eseq: int
    ) -> bytes:
        return (
            _zigzag_write(status)
            + _zigzag_write(1) + _zigzag_write(11)  # snapshot_id
            + _zigzag_write(1) + _zigzag_write(eseq)  # explicit seq
            + _zigzag_write(0)  # content = data
            + _enc_string(path)
            + _enc_string("PARQUET")
            + _zigzag_write(part)
            + _zigzag_write(rows)
            + _zigzag_write(100 + rows * 10)
            + _enc_bounds(part)
            + _enc_bounds(part + rows - 1)
            + _zigzag_write(0)  # equality_ids: empty array
        )

    manifests = {
        "metadata/m1.avro": [
            entry(1, "data/f0.parquet", 0, r[0], 1),
            entry(1, "data/f1.parquet", 100, r[1], 1),
        ],
        "metadata/m2.avro": [
            entry(1, "data/f2.parquet", 0, r[2], 2),
            entry(1, "data/f3.parquet", 200, r[3], 2),
        ],
        "metadata/m1r.avro": [
            entry(0, "data/f0.parquet", 0, r[0], 1),  # existing
            entry(2, "data/f1.parquet", 100, r[1], 1),  # deleted
        ],
        "metadata/m3.avro": [
            entry(1, "data/f4.parquet", 100, r[4], 3),
        ],
    }
    for path, entries in manifests.items():
        files[path] = encode_avro_container(
            _MANIFEST_SCHEMA_SEQ, entries, sync
        )

    def summary(lo: int, hi: int) -> bytes:
        """One field_summary: contains_null=false, int64 bounds."""
        return (
            _zigzag_write(1)  # array count
            + b"\x00"  # contains_null = false
            + _zigzag_write(1) + _enc_bytes(struct.pack("<q", lo))
            + _zigzag_write(1) + _enc_bytes(struct.pack("<q", hi))
            + _zigzag_write(0)  # array terminator
        )

    def ml_record(
        mpath: str, seq: int, added_snap: int,
        added: int, existing: int, deleted: int, lo: int, hi: int,
    ) -> bytes:
        return (
            _enc_string(mpath)
            + _zigzag_write(len(files[mpath]))
            + _zigzag_write(0)  # partition_spec_id
            + _zigzag_write(0)  # content = data
            + _zigzag_write(seq)
            + _zigzag_write(added_snap)
            + _zigzag_write(added)
            + _zigzag_write(existing)
            + _zigzag_write(deleted)
            + summary(lo, hi)
        )

    mls = {
        "metadata/ml1.avro": [
            ml_record("metadata/m1.avro", 1, 11, 2, 0, 0, 0, 100),
        ],
        "metadata/ml2.avro": [
            ml_record("metadata/m1.avro", 1, 11, 2, 0, 0, 0, 100),
            ml_record("metadata/m2.avro", 2, 22, 2, 0, 0, 0, 200),
        ],
        "metadata/ml3.avro": [
            ml_record("metadata/m1r.avro", 3, 33, 0, 1, 1, 0, 0),
            ml_record("metadata/m2.avro", 2, 22, 2, 0, 0, 0, 200),
            ml_record("metadata/m3.avro", 3, 33, 1, 0, 0, 100, 100),
        ],
    }
    for path, records in mls.items():
        files[path] = encode_avro_container(
            _MANIFEST_LIST_SCHEMA_INSPECT, records, sync
        )

    snapshots = [
        {
            "snapshot-id": 11, "sequence-number": 1,
            "timestamp-ms": t0, "manifest-list": "metadata/ml1.avro",
            "summary": {
                "operation": "append",
                "added-data-files": "2",
                "added-records": str(r[0] + r[1]),
            },
        },
        {
            "snapshot-id": 22, "parent-snapshot-id": 11,
            "sequence-number": 2, "timestamp-ms": t0 + 60_000,
            "manifest-list": "metadata/ml2.avro",
            "summary": {
                "operation": "append",
                "added-data-files": "2",
                "added-records": str(r[2] + r[3]),
            },
        },
        {
            "snapshot-id": 33, "parent-snapshot-id": 22,
            "sequence-number": 3, "timestamp-ms": t0 + 120_000,
            "manifest-list": "metadata/ml3.avro",
            "summary": {
                "operation": "overwrite",
                "added-data-files": "1",
                "added-records": str(r[4]),
            },
        },
    ]
    log = [
        {"timestamp-ms": t0, "snapshot-id": 11},
        {"timestamp-ms": t0 + 60_000, "snapshot-id": 22},
        {"timestamp-ms": t0 + 120_000, "snapshot-id": 33},
    ]
    if plan["rollback"]:
        log.append({"timestamp-ms": t0 + 180_000, "snapshot-id": 22})
    files["metadata/v2.metadata.json"] = json.dumps(
        {
            "format-version": 2,
            "table-uuid": f"00000000-0000-4000-8000-{seed:012d}",
            "properties": {"fixture.probe": "0"},
            "default-spec-id": 0,
            "partition-specs": [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "name": "p",
                            "transform": "identity",
                            "source-id": _V_FIELD_ID,
                            "field-id": 1000,
                        }
                    ],
                }
            ],
            "current-snapshot-id": plan["current"],
            "snapshots": snapshots,
            "snapshot-log": log,
            # round 13b: branches and tags (spec §refs) — `main`
            # tracks the current snapshot (spec invariant), a
            # retained tag pins s1, an audit branch pins s2
            "refs": {
                "main": {
                    "snapshot-id": plan["current"],
                    "type": "branch",
                },
                "v1": {
                    "snapshot-id": 11,
                    "type": "tag",
                    "max-ref-age-ms": 86_400_000 * (1 + seed % 5),
                },
                "audit": {
                    "snapshot-id": 22,
                    "type": "branch",
                    "min-snapshots-to-keep": 1 + seed % 3,
                },
            },
        }
    ).encode()
    return write_tar_bundle(files)


def _inspect_snapshots(meta: dict) -> dict[int, dict]:
    """Validated snapshot records keyed by id: parent chain must
    resolve, ids unique, timestamps non-decreasing along the chain,
    summary.operation from the spec's closed set."""
    snap_list = meta.get("snapshots")
    if not isinstance(snap_list, list) or not 1 <= len(snap_list) <= 1024:
        raise ValueError("snapshots list malformed")
    by_id: dict[int, dict] = {}
    for s in snap_list:
        if not isinstance(s, dict):
            raise ValueError("snapshot entry is not an object")
        sid = s.get("snapshot-id")
        ts = s.get("timestamp-ms")
        ml = s.get("manifest-list")
        summ = s.get("summary")
        if not isinstance(sid, int) or isinstance(sid, bool):
            raise ValueError("snapshot-id is not an integer")
        if sid in by_id:
            raise ValueError("duplicate snapshot-id")
        if not isinstance(ts, int) or isinstance(ts, bool) \
                or not 0 <= ts < 2**53:
            raise ValueError("snapshot timestamp-ms malformed")
        if not isinstance(ml, str):
            raise ValueError("snapshot manifest-list malformed")
        if not isinstance(summ, dict):
            raise ValueError("snapshot summary missing")
        op = summ.get("operation")
        if op not in _INSPECT_OPS:
            raise ValueError(f"snapshot operation {op!r} unknown")
        parent = s.get("parent-snapshot-id")
        if parent is not None and (
            not isinstance(parent, int) or isinstance(parent, bool)
        ):
            raise ValueError("parent-snapshot-id malformed")
        by_id[sid] = {
            "snapshot_id": sid,
            "parent_id": parent,
            "committed_at_ms": ts,
            "operation": op,
            "manifest_list": ml,
            "summary": summ,
        }
    for rec in by_id.values():
        p = rec["parent_id"]
        if p is None:
            continue
        if p not in by_id:
            raise ValueError("parent-snapshot-id not in snapshots")
        if by_id[p]["committed_at_ms"] > rec["committed_at_ms"]:
            raise ValueError("snapshot committed before its parent")
    return by_id


def _current_ancestors(by_id: dict[int, dict], current: int) -> set:
    """Snapshot ids on the parent chain from ``current`` to the
    root — bounded by the (already capped) snapshot count, with a
    cycle fence."""
    out: set[int] = set()
    sid = current
    while sid is not None:
        if sid in out:
            raise ValueError("snapshot parent chain has a cycle")
        if sid not in by_id:
            raise ValueError("ancestor snapshot missing")
        out.add(sid)
        sid = by_id[sid]["parent_id"]
    return out


def iceberg_snapshots_table(payload: bytes) -> list[dict]:
    """``SELECT * FROM tbl.snapshots``: one row per snapshot in the
    table metadata — committed_at, ids, operation, and the summary's
    added-files/added-records counters (spec: summary values are
    STRINGS; they are decoded to ints here with a fence).  Metadata
    JSON only: no avro, no parquet."""
    files = read_tar_bundle(payload)
    meta, _snaps, _ml, _probe = _parse_table_meta(files)
    by_id = _inspect_snapshots(meta)
    out = []
    for rec in sorted(by_id.values(), key=lambda x: x["snapshot_id"]):
        summ = rec["summary"]
        counters = []
        for key in ("added-data-files", "added-records"):
            raw = summ.get(key)
            if not isinstance(raw, str) or not raw.isdigit() \
                    or len(raw) > 18:
                raise ValueError(f"summary {key} malformed")
            counters.append(int(raw))
        if rec["manifest_list"] not in files:
            raise ValueError("snapshot manifest-list missing from bundle")
        out.append({
            "snapshot_id": rec["snapshot_id"],
            "parent_id": rec["parent_id"],
            "committed_at_ms": rec["committed_at_ms"],
            "operation": rec["operation"],
            "added_data_files": counters[0],
            "added_records": counters[1],
        })
    return out


def iceberg_history_table(payload: bytes) -> list[dict]:
    """``SELECT * FROM tbl.history``: the snapshot-log in order with
    ``is_current_ancestor`` resolved by walking parent pointers from
    the current snapshot — the column that distinguishes a rollback
    (a logged snapshot that is NO LONGER an ancestor) from linear
    history.  The log's last entry must be the current snapshot and
    timestamps must be non-decreasing (both fenced)."""
    files = read_tar_bundle(payload)
    meta, _snaps, _ml, _probe = _parse_table_meta(files)
    by_id = _inspect_snapshots(meta)
    ancestors = _current_ancestors(by_id, meta["current-snapshot-id"])
    log = meta.get("snapshot-log")
    if not isinstance(log, list) or not 1 <= len(log) <= 4096:
        raise ValueError("snapshot-log malformed")
    out = []
    prev_ts = -1
    for i, e in enumerate(log):
        if not isinstance(e, dict):
            raise ValueError("snapshot-log entry is not an object")
        ts = e.get("timestamp-ms")
        sid = e.get("snapshot-id")
        if not isinstance(ts, int) or isinstance(ts, bool) \
                or not 0 <= ts < 2**53:
            raise ValueError("snapshot-log timestamp malformed")
        if ts < prev_ts:
            raise ValueError("snapshot-log timestamps decrease")
        prev_ts = ts
        if sid not in by_id:
            raise ValueError("snapshot-log references unknown snapshot")
        out.append({
            "log_index": i,
            "made_current_at_ms": ts,
            "snapshot_id": sid,
            "is_current_ancestor": sid in ancestors,
        })
    if out[-1]["snapshot_id"] != meta["current-snapshot-id"]:
        raise ValueError("snapshot-log does not end at current")
    return out


def iceberg_manifests_table(payload: bytes) -> list[dict]:
    """``SELECT * FROM tbl.manifests``: one row per manifest in the
    CURRENT snapshot's manifest list — path, spec id, content kind,
    sequence number, adding snapshot, the added/existing/deleted
    entry counts, and the single partition field's summary
    (contains_null + int64 bounds).  The declared counts are
    CROSS-CHECKED against the manifest's actual entry statuses and
    ``manifest_length`` against the bundle — count drift is how a
    stale manifest list lies, so drift quarantines."""
    files = read_tar_bundle(payload)
    _meta, _snaps, ml_blob, _probe = _parse_table_meta(files)
    out = []
    for mf in decode_avro_blocks(ml_blob):
        mpath = mf.get("manifest_path")
        if not isinstance(mpath, str):
            raise ValueError("manifest_path is not a string")
        mblob = files.get(mpath)
        if mblob is None:
            raise ValueError(f"manifest {mpath!r} missing from bundle")
        if mf.get("manifest_length") != len(mblob):
            raise ValueError("manifest_length disagrees with bundle")
        row = {"manifest_path": mpath}
        for field, lo_ok in (
            ("partition_spec_id", 0), ("content", 0),
            ("sequence_number", 0), ("added_snapshot_id", 0),
            ("added_data_files_count", 0),
            ("existing_data_files_count", 0),
            ("deleted_data_files_count", 0),
        ):
            v = mf.get(field)
            if not isinstance(v, int) or isinstance(v, bool) or v < lo_ok:
                raise ValueError(f"manifest {field} malformed")
            row[field] = v
        if row["content"] not in (0, 1):
            raise ValueError("manifest content unknown")
        parts = mf.get("partitions")
        if not isinstance(parts, list) or len(parts) != 1 \
                or not isinstance(parts[0], dict):
            raise ValueError("manifest partition summary malformed")
        fs = parts[0]
        cn = fs.get("contains_null")
        if not isinstance(cn, bool):
            raise ValueError("contains_null malformed")
        bounds = []
        for key in ("lower_bound", "upper_bound"):
            raw = fs.get(key)
            if not isinstance(raw, bytes) or len(raw) != 8:
                raise ValueError(f"field summary {key} malformed")
            bounds.append(struct.unpack("<q", raw)[0])
        if bounds[0] > bounds[1]:
            raise ValueError("field summary lower above upper")
        counted = {0: 0, 1: 0, 2: 0}
        for e in decode_avro_blocks(mblob):
            st = e.get("status")
            if st not in (0, 1, 2):
                raise ValueError(f"manifest entry status {st} unknown")
            counted[st] += 1
        if (
            counted[1] != row["added_data_files_count"]
            or counted[0] != row["existing_data_files_count"]
            or counted[2] != row["deleted_data_files_count"]
        ):
            raise ValueError(
                "manifest-list counts disagree with entry statuses"
            )
        row["contains_null"] = cn
        row["partition_lower"] = bounds[0]
        row["partition_upper"] = bounds[1]
        out.append(row)
    if not out:
        raise ValueError("current snapshot has no manifests")
    if len(out) > 1 << 14:
        raise ValueError("manifest count past cap (boundary)")
    return out


def iceberg_partitions_table(payload: bytes) -> list[dict]:
    """``SELECT * FROM tbl.partitions``: live data rows/files per
    partition value under the CURRENT snapshot — the view that
    answers "which partitions exist and how big are they" from
    manifest bytes alone.  Live = status 0/1 entries of content-0
    (data) files; status-2 tombstones are what an overwrite leaves
    behind and MUST be excluded (including them double-counts every
    rewritten partition).  Partition field name resolves from the
    default spec (single-field scope, as ``files``)."""
    files = read_tar_bundle(payload)
    meta, _snaps, ml_blob, _probe = _parse_table_meta(files)
    tspecs = _resolve_partition_spec(meta)
    if len(tspecs) != 1:
        raise ValueError(
            "partitions metadata table serves single-field specs only "
            "(boundary: multi-field partition is a struct column)"
        )
    part_field = tspecs[0][0]
    agg: dict[int, list[int]] = {}
    for mf in decode_avro_blocks(ml_blob):
        mpath = mf.get("manifest_path")
        if not isinstance(mpath, str):
            raise ValueError("manifest_path is not a string")
        mblob = files.get(mpath)
        if mblob is None:
            raise ValueError(f"manifest {mpath!r} missing from bundle")
        if mf.get("manifest_length") != len(mblob):
            raise ValueError("manifest_length disagrees with bundle")
        for e in decode_avro_blocks(mblob):
            st = e.get("status")
            if st == 2:
                continue
            if st not in (0, 1):
                raise ValueError(f"manifest entry status {st} unknown")
            df = e.get("data_file")
            if not isinstance(df, dict):
                raise ValueError("manifest entry without data_file")
            if df.get("content", 0) != 0:
                continue  # delete files don't add partition rows
            rc = df.get("record_count")
            if not isinstance(rc, int) or isinstance(rc, bool) or rc < 0:
                raise ValueError("record_count malformed")
            part = df.get("partition")
            pv = part.get(part_field) if isinstance(part, dict) else part
            if not isinstance(pv, int) or isinstance(pv, bool):
                raise ValueError("partition value malformed")
            slot = agg.setdefault(pv, [0, 0])
            slot[0] += rc
            slot[1] += 1
    if not agg:
        raise ValueError("current snapshot has no live data files")
    if len(agg) > 1 << 16:
        raise ValueError("partition count past cap (boundary)")
    return [
        {"partition_p": pv, "record_count": rc, "file_count": fc}
        for pv, (rc, fc) in sorted(agg.items())
    ]


def _live_totals(files: dict[str, bytes], ml_blob: bytes) -> tuple[int, int]:
    """(live data files, live data rows) under one manifest list —
    status-2 tombstones and delete files (content != 0) excluded,
    manifest lengths cross-checked.  Metadata bytes only."""
    n_files = 0
    n_rows = 0
    for mf in decode_avro_blocks(ml_blob):
        mpath = mf.get("manifest_path")
        if not isinstance(mpath, str):
            raise ValueError("manifest_path is not a string")
        mblob = files.get(mpath)
        if mblob is None:
            raise ValueError(f"manifest {mpath!r} missing from bundle")
        if mf.get("manifest_length") != len(mblob):
            raise ValueError("manifest_length disagrees with bundle")
        for e in decode_avro_blocks(mblob):
            st = e.get("status")
            if st == 2:
                continue
            if st not in (0, 1):
                raise ValueError(f"manifest entry status {st} unknown")
            df = e.get("data_file")
            if not isinstance(df, dict):
                raise ValueError("manifest entry without data_file")
            if df.get("content", 0) != 0:
                continue
            rc = df.get("record_count")
            if not isinstance(rc, int) or isinstance(rc, bool) or rc < 0:
                raise ValueError("record_count malformed")
            n_files += 1
            n_rows += rc
    return n_files, n_rows


_REF_RETENTION_KEYS = (
    "max-ref-age-ms", "min-snapshots-to-keep", "max-snapshot-age-ms",
)


def iceberg_refs_table(payload: bytes) -> list[dict]:
    """``SELECT * FROM tbl.refs`` PLUS per-ref live totals: one row
    per named branch/tag — name, type, the snapshot it pins, its
    retention knobs, and the (files, rows) a read AT that ref would
    plan, resolved through the ref's own manifest list (the
    time-travel-by-name surface).  Spec invariants fenced: ``main``
    must exist, be a branch, and point at the current snapshot;
    every ref's snapshot must exist; ``min-snapshots-to-keep`` /
    ``max-snapshot-age-ms`` are branch-only knobs (a tag carrying
    one is the spec violation it sounds like)."""
    files = read_tar_bundle(payload)
    meta, snaps, _ml, _probe = _parse_table_meta(files)
    refs = meta.get("refs")
    if not isinstance(refs, dict) or not 1 <= len(refs) <= 1024:
        raise ValueError("table refs malformed")
    main = refs.get("main")
    if not isinstance(main, dict) or main.get("type") != "branch" \
            or main.get("snapshot-id") != meta["current-snapshot-id"]:
        raise ValueError(
            "main branch missing or not at the current snapshot"
        )
    out = []
    for name in sorted(refs):
        ref = refs[name]
        if not isinstance(ref, dict):
            raise ValueError("ref entry is not an object")
        rtype = ref.get("type")
        if rtype not in ("branch", "tag"):
            raise ValueError(f"ref type {rtype!r} unknown")
        sid = ref.get("snapshot-id")
        if not isinstance(sid, int) or isinstance(sid, bool):
            raise ValueError("ref snapshot-id malformed")
        if sid not in snaps:
            raise ValueError(f"ref {name!r} points at unknown snapshot")
        row = {"ref_name": name, "ref_type": rtype, "snapshot_id": sid}
        for key in _REF_RETENTION_KEYS:
            v = ref.get(key)
            if v is not None and (
                not isinstance(v, int) or isinstance(v, bool)
                or not 0 <= v < 2**53
            ):
                # the int64/int32 output columns must never see a
                # value Arrow would OverflowError on (quarantine
                # escape class)
                raise ValueError(f"ref {key} malformed")
            if key == "min-snapshots-to-keep" and v is not None                     and v > 1 << 20:
                raise ValueError(f"ref {key} out of range")
            if v is not None and rtype == "tag" \
                    and key != "max-ref-age-ms":
                raise ValueError(f"{key} is a branch-only knob")
            row[key.replace("-", "_")] = v
        ml_blob = files.get(snaps[sid])
        if ml_blob is None:
            raise ValueError("ref manifest list missing from bundle")
        n_files, n_rows = _live_totals(files, ml_blob)
        row["live_files"] = n_files
        row["live_rows"] = n_rows
        out.append(row)
    return out


def iceberg_all_manifests_table(payload: bytes) -> list[dict]:
    """``SELECT * FROM tbl.all_manifests``: one row per (snapshot,
    manifest) pair across EVERY snapshot in the metadata — the view
    that shows manifest reuse across commits (a manifest written
    once appears under every later snapshot that still lists it).
    Same count cross-checks as the current-snapshot ``manifests``
    table, deduped per manifest so the entry statuses are only
    re-counted once per distinct blob."""
    files = read_tar_bundle(payload)
    meta, snaps, _ml, _probe = _parse_table_meta(files)
    by_id = _inspect_snapshots(meta)
    counted_cache: dict[str, dict[int, int]] = {}
    out = []
    for sid in sorted(by_id):
        ml_blob = files.get(by_id[sid]["manifest_list"])
        if ml_blob is None:
            raise ValueError("manifest list missing from bundle")
        for mf in decode_avro_blocks(ml_blob):
            mpath = mf.get("manifest_path")
            if not isinstance(mpath, str):
                raise ValueError("manifest_path is not a string")
            mblob = files.get(mpath)
            if mblob is None:
                raise ValueError(
                    f"manifest {mpath!r} missing from bundle"
                )
            if mf.get("manifest_length") != len(mblob):
                raise ValueError("manifest_length disagrees with bundle")
            row = {"reference_snapshot_id": sid, "manifest_path": mpath}
            for field in (
                "sequence_number", "added_snapshot_id",
                "added_data_files_count", "existing_data_files_count",
                "deleted_data_files_count",
            ):
                v = mf.get(field)
                if not isinstance(v, int) or isinstance(v, bool) or v < 0:
                    raise ValueError(f"manifest {field} malformed")
                row[field] = v
            counted = counted_cache.get(mpath)
            if counted is None:
                counted = {0: 0, 1: 0, 2: 0}
                for e in decode_avro_blocks(mblob):
                    st = e.get("status")
                    if st not in (0, 1, 2):
                        raise ValueError(
                            f"manifest entry status {st} unknown"
                        )
                    counted[st] += 1
                counted_cache[mpath] = counted
            if (
                counted[1] != row["added_data_files_count"]
                or counted[0] != row["existing_data_files_count"]
                or counted[2] != row["deleted_data_files_count"]
            ):
                raise ValueError(
                    "manifest-list counts disagree with entry statuses"
                )
            out.append(row)
    if not out:
        raise ValueError("metadata has no manifests")
    if len(out) > 1 << 16:
        raise ValueError("all_manifests row count past cap (boundary)")
    return out


def iceberg_expire_snapshots_plan(
    payload: bytes, keep_last: int = 1
) -> list[dict]:
    """``expire_snapshots`` DRY RUN: which snapshots are REMOVABLE
    and what each removal would orphan — the Iceberg twin of Delta's
    vacuum listing, and the reachability computation a 100 TB
    table's metadata GC runs.

    Retention semantics (the spec's ref-based model):

    - every snapshot pinned by ANY ref (branch head or tag) is kept;
    - ancestors of a BRANCH head are kept while they are among the
      branch's ``min-snapshots-to-keep`` most recent (default 1 —
      the head itself);
    - the ``keep_last`` most recent snapshots overall are kept (the
      procedure's safety floor);
    - everything else is removable.  A removable snapshot's ORPHANED
      manifests/files are those reachable from it but from NO kept
      snapshot — the set a GC could actually delete.

    Output: one row per snapshot — removable flag, why it is kept
    (``ref``/``ancestor``/``recent`` or '' when removable), and the
    orphaned manifest count (0 for kept rows)."""
    files = read_tar_bundle(payload)
    meta, snaps, _ml, _probe = _parse_table_meta(files)
    by_id = _inspect_snapshots(meta)
    if not isinstance(keep_last, int) or isinstance(keep_last, bool) \
            or not 1 <= keep_last <= 1024:
        raise ValueError("keep_last out of range")
    refs = meta.get("refs")
    if not isinstance(refs, dict) or not refs:
        raise ValueError("table refs malformed")
    kept: dict[int, str] = {}

    def keep(sid: int, why: str) -> None:
        kept.setdefault(sid, why)

    # recency floor first: the procedure's safety net outranks
    # ref bookkeeping in every implementation
    by_time = sorted(
        by_id.values(),
        key=lambda r: (r["committed_at_ms"], r["snapshot_id"]),
    )
    for rec in by_time[-keep_last:]:
        keep(rec["snapshot_id"], "recent")
    for name in sorted(refs):
        ref = refs[name]
        if not isinstance(ref, dict):
            raise ValueError("ref entry is not an object")
        sid = ref.get("snapshot-id")
        rtype = ref.get("type")
        if rtype not in ("branch", "tag"):
            raise ValueError(f"ref type {rtype!r} unknown")
        if sid not in by_id:
            raise ValueError(f"ref {name!r} points at unknown snapshot")
        keep(sid, "ref")
        if rtype == "branch":
            min_keep = ref.get("min-snapshots-to-keep", 1)
            if not isinstance(min_keep, int) \
                    or isinstance(min_keep, bool) \
                    or not 1 <= min_keep <= 1024:
                raise ValueError("min-snapshots-to-keep malformed")
            cur = sid
            hops = 0
            while cur is not None and hops < min_keep:
                keep(cur, "ref" if cur == sid else "ancestor")
                cur = by_id[cur]["parent_id"]
                hops += 1
                if hops > len(by_id):
                    raise ValueError("snapshot parent chain has a cycle")

    def manifests_of(sid: int) -> set:
        ml_blob = files.get(by_id[sid]["manifest_list"])
        if ml_blob is None:
            raise ValueError("manifest list missing from bundle")
        out = set()
        for mf in decode_avro_blocks(ml_blob):
            mp = mf.get("manifest_path")
            if not isinstance(mp, str):
                raise ValueError("manifest_path is not a string")
            out.add(mp)
        return out

    reachable_kept: set = set()
    for sid in kept:
        reachable_kept |= manifests_of(sid)
    rows = []
    for sid in sorted(by_id):
        removable = sid not in kept
        orphaned = (
            len(manifests_of(sid) - reachable_kept) if removable else 0
        )
        rows.append({
            "snapshot_id": sid,
            "removable": removable,
            "kept_reason": kept.get(sid, ""),
            "orphaned_manifests": orphaned,
        })
    return rows


def synth_iceberg_expire_plan(seed: int) -> dict:
    """Mirrored in the ``iceberg_expire_snapshots_dry_run`` oracle:
    a 5-snapshot linear chain (ids 10..50, one append each at
    ``t0 + 60s*k``), every snapshot's manifest list = [m_base, m_k]
    (an overwrite-heavy table: each commit rewrites its own
    manifest, only m_base is shared).  Refs: ``main`` -> 50 with
    ``min-snapshots-to-keep = 1 + seed%3``; a ``v2`` tag pins 20 on
    EVEN seeds.  With keep_last=1:

    - 10 is always removable (orphaning m_1);
    - 20 is kept (ref) on even seeds, removable on odd;
    - 30 is kept (ancestor) only when min_keep=3 (seed%3==2);
    - 40 is kept (ancestor) when min_keep>=2 (seed%3 in 1,2);
    - 50 is always kept; recency is assigned before ref
      bookkeeping, so the head reports ``recent``."""
    return {
        "min_keep": 1 + seed % 3,
        "tag_v2": seed % 2 == 0,
        "t0_ms": 1_700_000_000_000 + (seed % 499) * 2000,
        "rows": [20 + (seed + 5 * k) % 30 for k in range(6)],
    }


def synth_iceberg_expire(seed: int) -> bytes:
    """The expire-snapshots fixture (plan above); no data parquet —
    GC planning is a metadata computation."""
    plan = synth_iceberg_expire_plan(seed)
    r = plan["rows"]
    t0 = plan["t0_ms"]
    sync = bytes((seed * 23 + j * 11 + 9) % 256 for j in range(16))
    files: dict[str, bytes] = {}

    def entry(path: str, part: int, rows: int, eseq: int) -> bytes:
        return (
            _zigzag_write(1)
            + _zigzag_write(1) + _zigzag_write(10)
            + _zigzag_write(1) + _zigzag_write(eseq)
            + _zigzag_write(0)
            + _enc_string(path)
            + _enc_string("PARQUET")
            + _zigzag_write(part)
            + _zigzag_write(rows)
            + _zigzag_write(100 + rows * 10)
            + _enc_bounds(part)
            + _enc_bounds(part + rows - 1)
            + _zigzag_write(0)
        )

    files["metadata/m_base.avro"] = encode_avro_container(
        _MANIFEST_SCHEMA_SEQ,
        [entry("data/b0.parquet", 0, r[0], 1),
         entry("data/b1.parquet", 100, r[1], 1)],
        sync,
    )
    for k in range(1, 6):
        files[f"metadata/m{k}.avro"] = encode_avro_container(
            _MANIFEST_SCHEMA_SEQ,
            [entry(f"data/f{k}.parquet", 200 + k, r[k], k)],
            sync,
        )

    def ml_record(mpath: str, seq: int, snap: int, n: int) -> bytes:
        return (
            _enc_string(mpath)
            + _zigzag_write(len(files[mpath]))
            + _zigzag_write(0)
            + _zigzag_write(0)
            + _zigzag_write(seq)
            + _zigzag_write(snap)
            + _zigzag_write(n)
            + _zigzag_write(0)
            + _zigzag_write(0)
            + _zigzag_write(1)
            + b"\x00"
            + _zigzag_write(1) + _enc_bytes(struct.pack("<q", 0))
            + _zigzag_write(1) + _enc_bytes(struct.pack("<q", 500))
            + _zigzag_write(0)
        )

    snapshots = []
    for k in range(1, 6):
        sid = 10 * k
        ml_path = f"metadata/ml{k}.avro"
        files[ml_path] = encode_avro_container(
            _MANIFEST_LIST_SCHEMA_INSPECT,
            [ml_record("metadata/m_base.avro", 1, 10, 2),
             ml_record(f"metadata/m{k}.avro", k, sid, 1)],
            sync,
        )
        snap = {
            "snapshot-id": sid,
            "sequence-number": k,
            "timestamp-ms": t0 + 60_000 * k,
            "manifest-list": ml_path,
            "summary": {
                "operation": "overwrite",
                "added-data-files": "1",
                "added-records": str(r[k]),
            },
        }
        if k > 1:
            snap["parent-snapshot-id"] = 10 * (k - 1)
        snapshots.append(snap)
    refs = {
        "main": {
            "snapshot-id": 50,
            "type": "branch",
            "min-snapshots-to-keep": plan["min_keep"],
        },
    }
    if plan["tag_v2"]:
        refs["v2"] = {"snapshot-id": 20, "type": "tag"}
    files["metadata/v2.metadata.json"] = json.dumps(
        {
            "format-version": 2,
            "table-uuid": f"00000000-0000-4000-8000-{seed:012d}",
            "properties": {"fixture.probe": "0"},
            "default-spec-id": 0,
            "partition-specs": [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "name": "p",
                            "transform": "identity",
                            "source-id": _V_FIELD_ID,
                            "field-id": 1000,
                        }
                    ],
                }
            ],
            "current-snapshot-id": 50,
            "snapshots": snapshots,
            "snapshot-log": [
                {"timestamp-ms": t0 + 60_000 * k, "snapshot-id": 10 * k}
                for k in range(1, 6)
            ],
            "refs": refs,
        }
    ).encode()
    return write_tar_bundle(files)
