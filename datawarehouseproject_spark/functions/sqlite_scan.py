"""SQLite database-file scan: b-tree walk + record decode, by hand.

Crawled corpora and app-data dumps carry SQLite files constantly
(browser history, mobile app state, ML experiment logs), and at
100 TB the engine must be able to triage AND read them without a
per-executor sqlite install.  Everything here is the public file
format (sqlite.org/fileformat2.html):

- 100-byte header: ``"SQLite format 3\\0"``, u16be page size at 16
  (1 means 65536), u32be page count at 28, u32be text encoding at 56
  (1 = UTF-8 — the only one this reader accepts);
- pages are numbered FROM 1; page 1 holds the header, then the
  ``sqlite_schema`` table b-tree starting at byte 100;
- b-tree page header: type byte (5 = table interior, 13 = table
  leaf, 2 = index interior, 10 = index leaf), u16be freeblock
  ptr, u16be cell count, u16be content start, u8 fragmented bytes,
  plus u32be right-most child on interior pages; then the u16be
  cell-pointer array;
- table-leaf cell: varint payload length, varint rowid, record;
  table-interior cell: u32be left child, varint rowid;
- INDEX b-trees (round 10) store each key exactly once, so interior
  cells carry REAL entries (u32be left child, varint payload length,
  key record) — WITHOUT ROWID tables live here (key record = PK
  columns then the rest), as do secondary indexes (indexed columns
  then the row reference); the index-page local-payload threshold is
  ``((U-12)*64/255) - 23``, smaller than the table-leaf ``U - 35``;
- record: varint header length, serial-type varints, then values —
  0 NULL, 1/2/3/4/5/6 big-endian two's-complement ints of
  1/2/3/4/6/8 bytes, 7 float64be, 8 literal 0, 9 literal 1,
  even >= 12 blob of (n-12)/2 bytes, odd >= 13 text of (n-13)/2;
- SQLite varints are BIG-endian 7-bit groups, at most 9 bytes, the
  9th byte contributing all 8 bits.

Payloads that exceed the local threshold follow the OVERFLOW chain
(round 9 — the round-8 boundary is closed): local portion
``K = M + ((P - M) % (U - 4))`` clamped to ``M`` when past the max,
then 4-byte-linked overflow pages each carrying ``U - 4`` content
bytes, cycle-guarded; every 9th fixture row carries a 600-1000-char
name so the chain is exercised at the 512-byte page size.

The SYNTHESIZER is stdlib :mod:`sqlite3` via ``Connection.serialize``
— a third genuinely independent producer alongside pyarrow and
DuckDB.  ``INTEGER PRIMARY KEY`` rowid aliases store NULL in the
record with the value in the rowid; the fixtures use implicit rowids
so decoded columns are literal, and the scan returns rowid sums so
the alias behavior stays visible.
"""

from __future__ import annotations

import struct

_MAGIC = b"SQLite format 3\x00"

_LEAF_TABLE = 13
_INTERIOR_TABLE = 5
_LEAF_INDEX = 10
_INTERIOR_INDEX = 2

_MAX_DEPTH = 40  # a crafted page cycle must fail, not recurse forever


def _varint(data: bytes, pos: int) -> tuple[int, int]:
    """SQLite varint: big-endian, 1-9 bytes, 9th byte uses 8 bits;
    the result is interpreted as SIGNED two's-complement int64."""
    out = 0
    for i in range(8):
        if pos >= len(data):
            raise ValueError("truncated sqlite varint")
        b = data[pos]
        pos += 1
        out = (out << 7) | (b & 0x7F)
        if not b & 0x80:
            break
    else:
        if pos >= len(data):
            raise ValueError("truncated sqlite varint")
        out = (out << 8) | data[pos]
        pos += 1
    out &= (1 << 64) - 1
    if out >= 1 << 63:
        out -= 1 << 64
    return out, pos


def _serial_size(stype: int) -> int:
    if stype in (0, 8, 9):
        return 0
    if stype in (1, 2, 3, 4):
        return stype
    if stype == 5:
        return 6
    if stype in (6, 7):
        return 8
    if stype >= 12:
        return (stype - 12) >> 1
    raise ValueError(f"reserved sqlite serial type {stype}")


def _decode_value(data: bytes, pos: int, stype: int):
    n = _serial_size(stype)
    if pos + n > len(data):
        raise ValueError("truncated sqlite record value")
    raw = data[pos : pos + n]
    if stype == 0:
        return None, pos
    if stype in (1, 2, 3, 4, 5, 6):
        return int.from_bytes(raw, "big", signed=True), pos + n
    if stype == 7:
        return struct.unpack(">d", raw)[0], pos + n
    if stype == 8:
        return 0, pos
    if stype == 9:
        return 1, pos
    if stype & 1:  # odd >= 13: text
        return raw.decode("utf-8", errors="replace"), pos + n
    return bytes(raw), pos + n  # even >= 12: blob


def decode_record(data: bytes) -> list:
    """Decode one SQLite record (header + values) to a Python list."""
    hlen, pos = _varint(data, 0)
    if hlen < 1 or hlen > len(data):
        raise ValueError("sqlite record header length out of range")
    stypes = []
    while pos < hlen:
        st, pos = _varint(data, pos)
        if st < 0:
            raise ValueError("negative sqlite serial type")
        stypes.append(st)
    if pos != hlen:
        raise ValueError("sqlite record header overran its length")
    out = []
    for st in stypes:
        v, pos = _decode_value(data, pos, st)
        out.append(v)
    return out


class _Db:
    def __init__(self, payload: bytes):
        if len(payload) < 512 or payload[:16] != _MAGIC:
            raise ValueError("not a sqlite3 database (bad magic)")
        (psz,) = struct.unpack_from(">H", payload, 16)
        self.page_size = 65536 if psz == 1 else psz
        if self.page_size < 512 or self.page_size & (self.page_size - 1):
            raise ValueError(f"bad sqlite page size {psz}")
        (self.n_pages,) = struct.unpack_from(">I", payload, 28)
        (enc,) = struct.unpack_from(">I", payload, 56)
        if enc != 1:
            raise ValueError(f"unsupported sqlite text encoding {enc}")
        # trust the smaller of declared and actual page counts
        self.n_pages = min(self.n_pages, len(payload) // self.page_size)
        if self.n_pages < 1:
            raise ValueError("sqlite file shorter than one page")
        self.data = payload

    def page(self, number: int) -> tuple[int, int]:
        """(start offset, b-tree header offset) for 1-based page
        ``number`` — page 1's b-tree header sits after the 100-byte
        file header."""
        if not 1 <= number <= self.n_pages:
            raise ValueError(f"sqlite page {number} out of range")
        start = (number - 1) * self.page_size
        return start, start + (100 if number == 1 else 0)

    def walk_table(self, root: int, depth: int = 0):
        """Yield (rowid, record bytes) for every row of the table
        b-tree rooted at page ``root``, in rowid order."""
        if depth > _MAX_DEPTH:
            raise ValueError("sqlite b-tree too deep (cycle?)")
        data = self.data
        start, hdr = self.page(root)
        end = start + self.page_size
        if hdr + 8 > len(data):
            raise ValueError("truncated sqlite page header")
        ptype = data[hdr]
        (n_cells,) = struct.unpack_from(">H", data, hdr + 3)
        if ptype == _INTERIOR_TABLE:
            if hdr + 12 > len(data):
                raise ValueError("truncated interior page header")
            (rightmost,) = struct.unpack_from(">I", data, hdr + 8)
            ptr_base = hdr + 12
            children = []
            for i in range(n_cells):
                off = ptr_base + 2 * i
                if off + 2 > end:
                    raise ValueError("cell pointer array past page end")
                (cell,) = struct.unpack_from(">H", data, off)
                cpos = start + cell
                if cpos + 4 > end:
                    raise ValueError("interior cell past page end")
                (child,) = struct.unpack_from(">I", data, cpos)
                children.append(child)
            children.append(rightmost)
            for child in children:
                yield from self.walk_table(child, depth + 1)
            return
        if ptype != _LEAF_TABLE:
            raise ValueError(f"page {root}: not a table b-tree page "
                             f"(type {ptype})")
        ptr_base = hdr + 8
        usable = self.page_size  # fixtures use 0 reserved bytes
        max_local = usable - 35
        for i in range(n_cells):
            off = ptr_base + 2 * i
            if off + 2 > end:
                raise ValueError("cell pointer array past page end")
            (cell,) = struct.unpack_from(">H", data, off)
            cpos = start + cell
            if cpos >= end or cpos < start:
                raise ValueError("leaf cell pointer outside page")
            plen, cpos = _varint(data, cpos)
            rowid, cpos = _varint(data, cpos)
            yield rowid, self._read_payload(cpos, plen, start, end,
                                            max_local)

    def _read_payload(
        self, cpos: int, plen: int, start: int, end: int, max_local: int
    ) -> bytes:
        """Cell payload at ``cpos``, following the OVERFLOW chain when
        it exceeds the page-local threshold (file-format doc §B-tree
        Pages): local portion ``K = M + ((P - M) % (U - 4))`` with
        ``M = ((U-12)*32/255) - 23``, clamped back to ``M`` when
        ``K > max_local``; a 4-byte first-overflow-page pointer
        follows; each overflow page is [4-byte next][U-4 content]."""
        data = self.data
        usable = self.page_size
        if plen < 0:
            raise ValueError("negative sqlite payload length")
        if plen <= max_local:
            if cpos + plen > end:
                raise ValueError("sqlite payload past page end")
            return data[cpos : cpos + plen]
        m = ((usable - 12) * 32) // 255 - 23
        k = m + ((plen - m) % (usable - 4))
        local = k if k <= max_local else m
        if cpos + local + 4 > end:
            raise ValueError("sqlite local payload past page end")
        parts = [data[cpos : cpos + local]]
        (next_pg,) = struct.unpack_from(">I", data, cpos + local)
        remaining = plen - local
        seen: set[int] = set()
        while remaining > 0:
            if next_pg == 0:
                raise ValueError("sqlite overflow chain ends early")
            if next_pg in seen:
                raise ValueError("sqlite overflow chain cycle")
            seen.add(next_pg)
            if not 1 <= next_pg <= self.n_pages:
                raise ValueError(
                    f"sqlite overflow page {next_pg} out of range"
                )
            pstart = (next_pg - 1) * self.page_size
            (next_pg,) = struct.unpack_from(">I", data, pstart)
            take = min(usable - 4, remaining)
            if pstart + 4 + take > len(data):
                raise ValueError("truncated sqlite overflow page")
            parts.append(data[pstart + 4 : pstart + 4 + take])
            remaining -= take
        return b"".join(parts)

    def walk_index(self, root: int, depth: int = 0):
        """Yield the KEY-RECORD bytes of every entry in the INDEX
        b-tree rooted at ``root``, in key order.  Index b-trees store
        each key exactly ONCE, so interior cells carry REAL entries —
        skipping them (the table-walk habit) silently loses the rows
        that happen to sit in interior pages.  WITHOUT ROWID tables
        and secondary indexes both live in this page family (types
        2/10); the index-page local-payload threshold is the SMALLER
        ``((U-12)*64/255) - 23`` (not ``U - 35``)."""
        if depth > _MAX_DEPTH:
            raise ValueError("sqlite b-tree too deep (cycle?)")
        data = self.data
        start, hdr = self.page(root)
        end = start + self.page_size
        if hdr + 8 > len(data):
            raise ValueError("truncated sqlite page header")
        ptype = data[hdr]
        (n_cells,) = struct.unpack_from(">H", data, hdr + 3)
        usable = self.page_size
        max_local = ((usable - 12) * 64) // 255 - 23
        if ptype == _INTERIOR_INDEX:
            if hdr + 12 > len(data):
                raise ValueError("truncated interior page header")
            (rightmost,) = struct.unpack_from(">I", data, hdr + 8)
            ptr_base = hdr + 12
            for i in range(n_cells):
                off = ptr_base + 2 * i
                if off + 2 > end:
                    raise ValueError("cell pointer array past page end")
                (cell,) = struct.unpack_from(">H", data, off)
                cpos = start + cell
                if cpos + 4 > end or cpos < start:
                    raise ValueError("interior cell past page end")
                (child,) = struct.unpack_from(">I", data, cpos)
                plen, vpos = _varint(data, cpos + 4)
                payload = self._read_payload(vpos, plen, start, end,
                                             max_local)
                yield from self.walk_index(child, depth + 1)
                yield payload
            yield from self.walk_index(rightmost, depth + 1)
            return
        if ptype != _LEAF_INDEX:
            raise ValueError(f"page {root}: not an index b-tree page "
                             f"(type {ptype})")
        ptr_base = hdr + 8
        for i in range(n_cells):
            off = ptr_base + 2 * i
            if off + 2 > end:
                raise ValueError("cell pointer array past page end")
            (cell,) = struct.unpack_from(">H", data, off)
            cpos = start + cell
            if cpos >= end or cpos < start:
                raise ValueError("leaf cell pointer outside page")
            plen, vpos = _varint(data, cpos)
            yield self._read_payload(vpos, plen, start, end, max_local)


def list_tables(payload: bytes) -> dict[str, int]:
    """Parse ``sqlite_schema`` (root = page 1): {table name -> root
    page} for ordinary tables (indexes/views/triggers skipped)."""
    db = _Db(payload)
    tables: dict[str, int] = {}
    for _rowid, rec in db.walk_table(1):
        row = decode_record(rec)
        if len(row) < 5:
            raise ValueError("sqlite_schema record with <5 columns")
        typ, name, _tbl, root = row[0], row[1], row[2], row[3]
        if typ == "table":
            if not isinstance(root, int) or root < 1:
                raise ValueError(f"table {name!r} with bad root page")
            tables[str(name)] = root
    return tables


def read_table(payload: bytes, name: str) -> tuple[list[int], list[list]]:
    """All rows of table ``name``: (rowids, records-as-lists)."""
    tables = list_tables(payload)
    if name not in tables:
        raise ValueError(f"sqlite table {name!r} not found")
    db = _Db(payload)
    rowids: list[int] = []
    rows: list[list] = []
    for rowid, rec in db.walk_table(tables[name]):
        rowids.append(rowid)
        rows.append(decode_record(rec))
    return rowids, rows


def list_indexes(payload: bytes) -> dict[str, int]:
    """``sqlite_schema`` rows with type 'index': {name -> root page}."""
    db = _Db(payload)
    indexes: dict[str, int] = {}
    for _rowid, rec in db.walk_table(1):
        row = decode_record(rec)
        if len(row) < 5:
            raise ValueError("sqlite_schema record with <5 columns")
        if row[0] == "index":
            root = row[3]
            if not isinstance(root, int) or root < 1:
                raise ValueError(f"index {row[1]!r} with bad root page")
            indexes[str(row[1])] = root
    return indexes


def read_without_rowid(payload: bytes, name: str) -> list[list]:
    """All rows of a WITHOUT ROWID table ``name``: its root is an
    INDEX b-tree whose key records hold the PRIMARY KEY columns
    first, then the remaining columns in declared order
    (fileformat2 §2.2 'Representation Of SQL Tables')."""
    tables = list_tables(payload)
    if name not in tables:
        raise ValueError(f"sqlite table {name!r} not found")
    db = _Db(payload)
    return [decode_record(rec) for rec in db.walk_index(tables[name])]


def read_index_entries(payload: bytes, name: str) -> list[list]:
    """All entries of index ``name``: key records of the indexed
    columns followed by the row reference (rowid for ordinary
    tables, the PK columns for WITHOUT ROWID tables)."""
    indexes = list_indexes(payload)
    if name not in indexes:
        raise ValueError(f"sqlite index {name!r} not found")
    db = _Db(payload)
    return [decode_record(rec) for rec in db.walk_index(indexes[name])]


def scan_sqlite(payload: bytes) -> dict:
    """Full scan used by the ``sqlite_table_scan`` query: read the
    ``docs(score INTEGER, name TEXT, flag INTEGER)`` fixture table
    and return checked aggregates (signed ints exercise 1/2/3-byte
    big-endian decode, flag exercises NULL + the 0/1 literal serial
    types, names the text types)."""
    rowids, rows = read_table(payload, "docs")
    if any(len(r) != 3 for r in rows):
        raise ValueError("docs rows must have 3 columns")
    scores = [r[0] for r in rows]
    names = [r[1] for r in rows]
    flags = [r[2] for r in rows]
    if any(not isinstance(v, int) for v in scores):
        raise ValueError("docs.score decoded to non-integer")
    if any(not isinstance(v, str) for v in names):
        raise ValueError("docs.name decoded to non-text")
    if any(v is not None and not isinstance(v, int) for v in flags):
        raise ValueError("docs.flag decoded to non-int/non-null")
    return {
        "n_tables": len(list_tables(payload)),
        "n_rows": len(rows),
        "rowid_sum": sum(rowids),
        "score_sum": sum(scores),
        "score_min": min(scores) if scores else None,
        "name_len_sum": sum(len(v) for v in names),
        "n_flag_null": sum(1 for v in flags if v is None),
        "flag_sum": sum(v for v in flags if v is not None),
    }


def synth_sqlite_plan(seed: int) -> dict:
    """Writer plan mirrored in the DuckDB oracle: n rows of
    score = (seed*3 + i*17) % 1000 - 200 (signed), name =
    'n' * (600 + (i % 3) * 200) when (i + seed) % 9 == 8 — a LONG
    text that spills to 1-2 OVERFLOW pages at the 512-byte page size
    (round 9: the overflow boundary is closed) — else
    'n' * (1 + (i + seed) % 7); flag = NULL when (i + seed) % 3 == 0
    else i % 2."""
    return {"n_rows": 30 + (seed * 11) % 300}


def _name_len(seed: int, i: int) -> int:
    if (i + seed) % 9 == 8:
        return 600 + (i % 3) * 200
    return 1 + (i + seed) % 7


def synth_sqlite(seed: int) -> bytes:
    """A REAL SQLite database produced by the stdlib sqlite3 engine
    (``Connection.serialize``) — 512-byte pages so the fixtures grow
    real multi-level table b-trees (interior + leaf pages)."""
    import sqlite3

    n = synth_sqlite_plan(seed)["n_rows"]
    conn = sqlite3.connect(":memory:")
    try:
        conn.execute("PRAGMA page_size=512")
        conn.execute(
            "CREATE TABLE docs(score INTEGER, name TEXT, flag INTEGER)"
        )
        conn.executemany(
            "INSERT INTO docs VALUES (?, ?, ?)",
            [
                (
                    (seed * 3 + i * 17) % 1000 - 200,
                    "n" * _name_len(seed, i),
                    None if (i + seed) % 3 == 0 else i % 2,
                )
                for i in range(n)
            ],
        )
        conn.commit()
        return bytes(conn.serialize())
    finally:
        conn.close()


def scan_sqlite_without_rowid(payload: bytes) -> dict:
    """Scan for the ``sqlite_without_rowid_scan`` query: read the
    ``kv(k TEXT PRIMARY KEY, score INTEGER, flag INTEGER) WITHOUT
    ROWID`` fixture — an INDEX b-tree whose interior cells carry real
    rows — AND its secondary index ``kv_score`` (entries =
    [score, k]), cross-checking the two walks against each other so
    a skipped interior entry in either tree breaks the scan."""
    rows = read_without_rowid(payload, "kv")
    if any(len(r) != 3 for r in rows):
        raise ValueError("kv rows must have 3 columns")
    ks = [r[0] for r in rows]
    scores = [r[1] for r in rows]
    flags = [r[2] for r in rows]
    if any(not isinstance(v, str) for v in ks):
        raise ValueError("kv.k decoded to non-text")
    if any(not isinstance(v, int) for v in scores):
        raise ValueError("kv.score decoded to non-integer")
    # sqlite type affinity legally stores ANY type in any column; a
    # crafted db must quarantine, not TypeError out of the sums
    if any(
        v is not None and (not isinstance(v, int) or isinstance(v, bool))
        for v in flags
    ):
        raise ValueError("kv.flag decoded to non-int/non-null")
    entries = read_index_entries(payload, "kv_score")
    if any(len(e) != 2 for e in entries):
        raise ValueError("kv_score entries must be [score, k]")
    if any(
        not isinstance(e[0], int) or not isinstance(e[1], str)
        for e in entries
    ):
        raise ValueError("kv_score entry columns decoded to wrong types")
    if len(entries) != len(rows):
        raise ValueError(
            f"secondary index holds {len(entries)} entries for "
            f"{len(rows)} table rows"
        )
    if sum(e[0] for e in entries) != sum(scores):
        raise ValueError("index score sum != table score sum")
    if sorted(e[1] for e in entries) != sorted(ks):
        raise ValueError("index PK references != table keys")
    return {
        "n_rows": len(rows),
        "k_len_sum": sum(len(v) for v in ks),
        "score_sum": sum(scores),
        "n_flag_null": sum(1 for v in flags if v is None),
        "flag_sum": sum(v for v in flags if v is not None),
        "idx_entries": len(entries),
        "idx_k_len_sum": sum(len(e[1]) for e in entries),
    }


def synth_sqlite_wr_plan(seed: int) -> dict:
    """Writer plan mirrored in the DuckDB oracle: n =
    ``40 + (seed*13) % 260`` rows; k = ``'k' + 5-digit i`` padded
    with ``'x' * 150`` when ``(i + seed) % 7 == 5`` (spilling the
    INDEX-page payload past its ``((U-12)*64/255) - 23`` local
    threshold into overflow pages) else ``'x' * (i % 5)``; score =
    ``(seed*5 + i*23) % 2000 - 500``; flag = NULL when
    ``(i + seed) % 4 == 0`` else ``i % 2``."""
    return {"n_rows": 40 + (seed * 13) % 260}


def _wr_key(seed: int, i: int) -> str:
    pad = 150 if (i + seed) % 7 == 5 else i % 5
    return f"k{i:05d}" + "x" * pad


def synth_sqlite_wr(seed: int) -> bytes:
    """A REAL WITHOUT ROWID database from the stdlib sqlite3 engine:
    512-byte pages so both the table's index b-tree and the
    ``kv_score`` secondary index grow interior pages (whose cells
    carry real rows), plus long keys exercising INDEX-page overflow
    chains."""
    import sqlite3

    n = synth_sqlite_wr_plan(seed)["n_rows"]
    conn = sqlite3.connect(":memory:")
    try:
        conn.execute("PRAGMA page_size=512")
        conn.execute(
            "CREATE TABLE kv(k TEXT PRIMARY KEY, score INTEGER, "
            "flag INTEGER) WITHOUT ROWID"
        )
        conn.execute("CREATE INDEX kv_score ON kv(score)")
        conn.executemany(
            "INSERT INTO kv VALUES (?, ?, ?)",
            [
                (
                    _wr_key(seed, i),
                    (seed * 5 + i * 23) % 2000 - 500,
                    None if (i + seed) % 4 == 0 else i % 2,
                )
                for i in range(n)
            ],
        )
        conn.commit()
        return bytes(conn.serialize())
    finally:
        conn.close()
