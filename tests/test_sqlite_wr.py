"""SQLite WITHOUT ROWID tables + secondary indexes — index b-trees
(page types 2/10), where interior cells carry REAL entries and the
local-payload threshold is the index formula, not the table one.
Producer: stdlib sqlite3 via ``Connection.serialize``."""

from __future__ import annotations

import sqlite3
import struct

import pytest

from datawarehouseproject_spark.functions.sqlite_scan import (
    _Db,
    _wr_key,
    list_indexes,
    read_index_entries,
    read_without_rowid,
    scan_sqlite_without_rowid,
    synth_sqlite_wr,
    synth_sqlite_wr_plan,
)


def test_scan_matches_plan_formulas():
    for seed in range(10):
        n = synth_sqlite_wr_plan(seed)["n_rows"]
        r = scan_sqlite_without_rowid(synth_sqlite_wr(seed))
        assert r["n_rows"] == n == r["idx_entries"]
        assert r["k_len_sum"] == sum(
            len(_wr_key(seed, i)) for i in range(n)
        ) == r["idx_k_len_sum"]
        assert r["score_sum"] == sum(
            (seed * 5 + i * 23) % 2000 - 500 for i in range(n)
        )


def test_rows_ordered_by_primary_key():
    rows = read_without_rowid(synth_sqlite_wr(3), "kv")
    ks = [r[0] for r in rows]
    assert ks == sorted(ks)


def test_interior_index_cells_carry_rows():
    """The fixture trees must actually have interior index pages
    (else the interior-cells-carry-entries path is untested), and
    every key must come back exactly once."""
    blob = synth_sqlite_wr(5)
    db = _Db(blob)
    page_types = {
        blob[(p - 1) * db.page_size + (100 if p == 1 else 0)]
        for p in range(1, db.n_pages + 1)
    }
    assert 2 in page_types, "no interior index page in fixture"
    n = synth_sqlite_wr_plan(5)["n_rows"]
    rows = read_without_rowid(blob, "kv")
    assert len(rows) == n
    assert len({r[0] for r in rows}) == n  # exactly once each


def test_index_overflow_chains_followed():
    """Keys padded to 150+ chars exceed the index-page local
    threshold ((512-12)*64/255 - 23 = 102) and spill to overflow."""
    blob = synth_sqlite_wr(5)  # (i+5)%7==5 rows have 156-char keys
    rows = read_without_rowid(blob, "kv")
    long_keys = [r[0] for r in rows if len(r[0]) > 102]
    assert long_keys, "fixture lost its overflow-length keys"
    assert all(k.endswith("x" * 150) for k in long_keys)


def test_secondary_index_of_rowid_table_references_rowids():
    """For an ORDINARY table, index entries end with the rowid."""
    conn = sqlite3.connect(":memory:")
    conn.execute("PRAGMA page_size=512")
    conn.execute("CREATE TABLE t(a INTEGER, b TEXT)")
    conn.execute("CREATE INDEX t_a ON t(a)")
    conn.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(i * 7 % 50, f"s{i}") for i in range(200)],
    )
    conn.commit()
    blob = bytes(conn.serialize())
    conn.close()
    entries = read_index_entries(blob, "t_a")
    assert len(entries) == 200
    assert sorted(e[1] for e in entries) == list(range(1, 201))
    assert sum(e[0] for e in entries) == sum(i * 7 % 50 for i in range(200))


def test_missing_index_and_table_raise():
    blob = synth_sqlite_wr(0)
    with pytest.raises(ValueError, match="not found"):
        read_index_entries(blob, "nope")
    with pytest.raises(ValueError, match="not found"):
        read_without_rowid(blob, "nope")
    assert "kv_score" in list_indexes(blob)


def test_table_walk_refuses_index_root_and_vice_versa():
    """read_table on a WITHOUT ROWID root must refuse loudly (it is
    an index page), and walk_index on a rowid-table root likewise."""
    from datawarehouseproject_spark.functions.sqlite_scan import (
        read_table,
        synth_sqlite,
    )

    with pytest.raises(ValueError, match="not a table b-tree"):
        read_table(synth_sqlite_wr(1), "kv")
    with pytest.raises(ValueError, match="not an index b-tree"):
        read_without_rowid(synth_sqlite(1), "docs")


def test_index_cell_cycle_guarded():
    """Patch an interior index cell's child pointer to its own page:
    the depth guard must fire, not infinite-recurse."""
    blob = bytearray(synth_sqlite_wr(5))
    db = _Db(bytes(blob))
    for p in range(2, db.n_pages + 1):
        start = (p - 1) * db.page_size
        if blob[start] == 2:  # interior index page
            (cell0,) = struct.unpack_from(">H", blob, start + 12)
            struct.pack_into(">I", blob, start + cell0, p)  # self-loop
            break
    else:
        pytest.skip("no interior index page")
    with pytest.raises(ValueError):
        scan_sqlite_without_rowid(bytes(blob))


def test_type_affinity_garbage_quarantines():
    """Review r10: sqlite affinity legally stores text in INTEGER
    columns; the scan must ValueError, not TypeError."""
    conn = sqlite3.connect(":memory:")
    conn.execute("PRAGMA page_size=512")
    conn.execute(
        "CREATE TABLE kv(k TEXT PRIMARY KEY, score INTEGER, "
        "flag INTEGER) WITHOUT ROWID"
    )
    conn.execute("CREATE INDEX kv_score ON kv(score)")
    conn.execute("INSERT INTO kv VALUES ('a', 5, 'notanint')")
    blob = bytes(conn.serialize())
    conn.close()
    with pytest.raises(ValueError, match="flag"):
        scan_sqlite_without_rowid(blob)
    conn = sqlite3.connect(":memory:")
    conn.execute("PRAGMA page_size=512")
    conn.execute(
        "CREATE TABLE kv(k TEXT PRIMARY KEY, score INTEGER, "
        "flag INTEGER) WITHOUT ROWID"
    )
    conn.execute("CREATE INDEX kv_score ON kv(score)")
    conn.execute("INSERT INTO kv VALUES ('a', 'xx', 1)")  # text score
    blob = bytes(conn.serialize())
    conn.close()
    with pytest.raises(ValueError):
        scan_sqlite_without_rowid(blob)
