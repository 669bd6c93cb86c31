"""Parquet FOOTER scan: hand-parsed Thrift compact protocol.

The engine's own storage format, triaged the way a 100 TB lakehouse
actually plans work: row counts, row-group layout, and column counts
live in the FileMetaData footer — the last few KB of a multi-GB file
— so split planning and file pruning read the tail, never the column
chunks (the same read-the-index-not-the-data shape as the ZIP
central directory). Format facts are public (Apache Parquet format
spec + Apache Thrift compact protocol):

- file layout: ``PAR1`` magic at both ends; the last 8 bytes are
  u32le footer length + ``PAR1``; FileMetaData starts at
  ``len - 8 - footer_len``;
- FileMetaData (Thrift struct): 1 version i32, 2 schema
  list<SchemaElement>, 3 num_rows i64, 4 row_groups list<RowGroup>,
  6 created_by string; RowGroup: 1 columns list<ColumnChunk>,
  2 total_byte_size i64, 3 num_rows i64;
- Thrift COMPACT wire: field header ``(delta<<4)|type`` (delta 0 →
  zigzag-varint field id follows), BOOL in the type nibble, i16/
  i32/i64 as zigzag varints, double 8 bytes, binary/string varint-
  length-prefixed, list/set ``(size<<4)|elem_type`` (size 15 →
  varint), map varint size + type byte, struct nested to a 0 stop
  byte.

The SYNTHESIZER here is **pyarrow** — a genuinely independent
producer, like the stdlib zipfile/tarfile pattern — so the
hand-rolled Thrift reader is pinned against real third-party bytes.
Unknown/extra fields skip by type, exactly like
:mod:`.protowire`'s forward-compatibility contract.
"""

from __future__ import annotations

import struct

_STOP = 0
_BOOL_TRUE = 1
_BOOL_FALSE = 2
_BYTE = 3
_I16 = 4
_I32 = 5
_I64 = 6
_DOUBLE = 7
_BINARY = 8
_LIST = 9
_SET = 10
_MAP = 11
_STRUCT = 12


_MAX_DEPTH = 60  # nesting bound: a crafted deep struct must raise
# ValueError, not RecursionError (review r8 pass 3)


def _varint(data: bytes, pos: int) -> tuple[int, int]:
    """Unsigned varint TRUNCATED to 64 bits — standard encoders sign-
    extend negative i64 to 10 bytes, and without the mask a crafted
    footer yields integers past int64 that overflow the Arrow
    LongType conversion OUTSIDE the ValueError quarantine (review r8
    pass 3 — the same lesson :mod:`.protowire` documents)."""
    out = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated thrift varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out & ((1 << 64) - 1), pos
        shift += 7
        if shift > 70:
            raise ValueError("thrift varint too long")


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _skip(data: bytes, pos: int, ftype: int, depth: int = 0,
          in_container: bool = False) -> int:
    """Skip one value of ``ftype`` — the forward-compatibility
    path for fields this reader doesn't extract. BOOL consumes no
    bytes as a struct FIELD (the value lives in the type nibble)
    but ONE byte as a list/set/map ELEMENT, per the compact spec."""
    if depth > _MAX_DEPTH:
        raise ValueError("thrift nesting too deep")
    if ftype in (_BOOL_TRUE, _BOOL_FALSE):
        return pos + (1 if in_container else 0)
    if ftype == _BYTE:
        if pos + 1 > len(data):
            raise ValueError("truncated thrift byte")
        return pos + 1
    if ftype in (_I16, _I32, _I64):
        # inlined continuation-bit walk (the value is discarded):
        # varints are the hottest skip in column-chunk metadata and
        # the call + shift/accumulate of _varint is pure overhead.
        # Bounds and error strings match _varint exactly.
        n = len(data)
        end = pos + 10  # shift > 70 <=> an 11th varint byte
        while True:
            if pos >= n:
                raise ValueError("truncated thrift varint")
            if not data[pos] & 0x80:
                return pos + 1
            pos += 1
            if pos > end:
                raise ValueError("thrift varint too long")
    if ftype == _DOUBLE:
        if pos + 8 > len(data):
            raise ValueError("truncated thrift double")
        return pos + 8
    if ftype == _BINARY:
        n, pos = _varint(data, pos)
        if pos + n > len(data):
            raise ValueError("truncated thrift binary")
        return pos + n
    if ftype in (_LIST, _SET):
        n, etype, pos = _list_header(data, pos)
        if n > len(data) - pos:
            # every element consumes >= 1 byte, so a count beyond
            # the remaining bytes is corrupt — without this bound a
            # 24-byte payload can demand 2^60 no-op iterations
            # (review r8 pass 3)
            raise ValueError("thrift list size exceeds remaining bytes")
        for _ in range(n):
            pos = _skip(data, pos, etype, depth + 1, in_container=True)
        return pos
    if ftype == _MAP:
        n, pos = _varint(data, pos)
        if n == 0:
            return pos
        if pos >= len(data):
            raise ValueError("truncated thrift map header")
        if 2 * n > len(data) - pos:
            raise ValueError("thrift map size exceeds remaining bytes")
        kv = data[pos]
        pos += 1
        for _ in range(n):
            pos = _skip(data, pos, kv >> 4, depth + 1, in_container=True)
            pos = _skip(data, pos, kv & 0xF, depth + 1, in_container=True)
        return pos
    if ftype == _STRUCT:
        return _walk_struct(data, pos, None, depth + 1)
    raise ValueError(f"unknown thrift compact type {ftype}")


def _list_header(data: bytes, pos: int) -> tuple[int, int, int]:
    if pos >= len(data):
        raise ValueError("truncated thrift list header")
    b = data[pos]
    pos += 1
    n = b >> 4
    etype = b & 0xF
    if n == 15:
        n, pos = _varint(data, pos)
    return n, etype, pos


def _walk_struct(data: bytes, pos: int, handler, depth: int = 0) -> int:
    """Walk one struct; ``handler(field_id, ftype, data, pos) ->
    new_pos or None`` may consume a field's value, else it is
    skipped."""
    if depth > _MAX_DEPTH:
        raise ValueError("thrift nesting too deep")
    field_id = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated thrift struct")
        hdr = data[pos]
        pos += 1
        if hdr == _STOP:
            return pos
        delta = hdr >> 4
        ftype = hdr & 0xF
        if delta == 0:
            raw, pos = _varint(data, pos)
            field_id = _unzigzag(raw)
        else:
            field_id += delta
        consumed = handler(field_id, ftype, data, pos) if handler else None
        pos = (
            consumed
            if consumed is not None
            else _skip(data, pos, ftype, depth)
        )


def scan_parquet_footer(payload: bytes) -> dict:
    """Parse the FileMetaData footer of a parquet file. Returns
    ``version``, ``n_rows``, ``n_row_groups``, ``n_columns`` (leaf
    count = schema elements minus the root), ``rg_rows_total`` (sum
    of per-row-group num_rows — must equal n_rows in a consistent
    file, and the scan CHECKS it), ``total_byte_size`` (sum over row
    groups), ``created_by``, ``payload_bytes``. Raises ``ValueError``
    on malformed structure (permissive-quarantine contract)."""
    if len(payload) < 12 or payload[:4] != b"PAR1" or payload[-4:] != b"PAR1":
        raise ValueError("not a parquet file (missing PAR1 magic)")
    (flen,) = struct.unpack_from("<I", payload, len(payload) - 8)
    start = len(payload) - 8 - flen
    if start < 4:
        raise ValueError("footer length past start of file")
    meta = payload[start : start + flen]

    out = {
        "version": None,
        "n_rows": None,
        "n_schema_elements": 0,
        "n_row_groups": 0,
        "rg_rows_total": 0,
        "total_byte_size": 0,
        "created_by": None,
    }

    def rg_handler(fid, ftype, data, pos):
        if fid == 2 and ftype == _I64:  # total_byte_size
            raw, pos = _varint(data, pos)
            out["total_byte_size"] += _unzigzag(raw)
            return pos
        if fid == 3 and ftype == _I64:  # num_rows
            raw, pos = _varint(data, pos)
            out["rg_rows_total"] += _unzigzag(raw)
            return pos
        return None

    def top_handler(fid, ftype, data, pos):
        if fid == 1 and ftype == _I32:
            raw, pos = _varint(data, pos)
            out["version"] = _unzigzag(raw)
            return pos
        if fid == 2 and ftype == _LIST:  # schema
            n, etype, pos = _list_header(data, pos)
            if etype != _STRUCT:
                raise ValueError("schema list must hold structs")
            if n > len(data) - pos:
                raise ValueError("schema list exceeds remaining bytes")
            out["n_schema_elements"] = n
            for _ in range(n):
                pos = _walk_struct(data, pos, None, 1)
            return pos
        if fid == 3 and ftype == _I64:
            raw, pos = _varint(data, pos)
            out["n_rows"] = _unzigzag(raw)
            if out["n_rows"] < 0:
                raise ValueError("negative num_rows in footer")
            return pos
        if fid == 4 and ftype == _LIST:  # row_groups
            n, etype, pos = _list_header(data, pos)
            if etype != _STRUCT:
                raise ValueError("row_groups list must hold structs")
            if n > len(data) - pos:
                raise ValueError("row_groups list exceeds remaining bytes")
            out["n_row_groups"] = n
            for _ in range(n):
                pos = _walk_struct(data, pos, rg_handler, 1)
            return pos
        if fid == 6 and ftype == _BINARY:
            ln, pos = _varint(data, pos)
            if pos + ln > len(data):
                raise ValueError("truncated created_by string")
            out["created_by"] = data[pos : pos + ln].decode(
                "utf-8", errors="replace"
            )
            return pos + ln
        return None

    _walk_struct(meta, 0, top_handler)
    if out["n_rows"] is None:
        raise ValueError("FileMetaData missing num_rows")
    if not (0 <= out["total_byte_size"] < 1 << 63) or not (
        0 <= out["rg_rows_total"] < 1 << 63
    ):
        # accumulated sums must stay inside int64 or the Arrow
        # LongType conversion overflows OUTSIDE the quarantine
        raise ValueError("row-group totals out of int64 range")
    if out["n_row_groups"] and out["rg_rows_total"] != out["n_rows"]:
        raise ValueError(
            f"row-group rows {out['rg_rows_total']} != file rows "
            f"{out['n_rows']} (inconsistent footer)"
        )
    return {
        "version": out["version"],
        "n_rows": out["n_rows"],
        "n_row_groups": out["n_row_groups"],
        "n_columns": max(out["n_schema_elements"] - 1, 0),
        "total_byte_size": out["total_byte_size"],
        "created_by": out["created_by"],
        "payload_bytes": len(payload),
    }


def synth_parquet_plan(seed: int) -> dict:
    """File plan, mirrored in the DuckDB oracle: 20 + seed*7 % 300
    rows, 2 + seed%3 columns, row groups of 25 rows."""
    n_rows = 20 + (seed * 7) % 300
    return {
        "n_rows": n_rows,
        "n_columns": 2 + seed % 3,
        "row_group_size": 25,
        "n_row_groups": -(-n_rows // 25),
    }


def synth_parquet(seed: int) -> bytes:
    """A REAL parquet file written by pyarrow — the independent
    producer pinning the hand-rolled Thrift reader, as stdlib
    zipfile pins scan_zip."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    plan = synth_parquet_plan(seed)
    cols = {
        f"c{j}": [
            (seed * 3 + i * 5 + j) % 1000 for i in range(plan["n_rows"])
        ]
        for j in range(plan["n_columns"])
    }
    table = pa.table(cols)
    buf = io.BytesIO()
    pq.write_table(table, buf, row_group_size=plan["row_group_size"])
    return buf.getvalue()
