"""SQLite file-format reader — functions/sqlite_scan.py (round 8):
b-tree walk + record decode pinned against the stdlib sqlite3 engine
(Connection.serialize), a third independent producer alongside
pyarrow and DuckDB."""

from __future__ import annotations

import sqlite3

import pytest

from datawarehouseproject_spark.functions.sqlite_scan import (
    decode_record,
    list_tables,
    read_table,
    scan_sqlite,
    synth_sqlite,
    synth_sqlite_plan,
)


def _make_db(rows, schema="CREATE TABLE t(a, b, c)", page_size=512,
             table="t"):
    conn = sqlite3.connect(":memory:")
    conn.execute(f"PRAGMA page_size={page_size}")
    conn.execute(schema)
    if rows:
        marks = ",".join("?" * len(rows[0]))
        conn.executemany(f"INSERT INTO {table} VALUES ({marks})", rows)
    conn.commit()
    payload = bytes(conn.serialize())
    conn.close()
    return payload


def test_fixture_aggregates_match_insert_formulas():
    for seed in range(10):
        got = scan_sqlite(synth_sqlite(seed))
        n = synth_sqlite_plan(seed)["n_rows"]
        scores = [(seed * 3 + i * 17) % 1000 - 200 for i in range(n)]
        flags = [None if (i + seed) % 3 == 0 else i % 2 for i in range(n)]
        assert got["n_tables"] == 1
        assert got["n_rows"] == n
        assert got["rowid_sum"] == n * (n + 1) // 2
        assert got["score_sum"] == sum(scores)
        assert got["score_min"] == min(scores)
        from datawarehouseproject_spark.functions.sqlite_scan import (
            _name_len,
        )

        assert got["name_len_sum"] == sum(
            _name_len(seed, i) for i in range(n)
        )
        assert got["n_flag_null"] == sum(1 for f in flags if f is None)
        assert got["flag_sum"] == sum(f for f in flags if f is not None)


def test_multilevel_btree_is_actually_exercised():
    """The 512-byte-page fixtures must contain interior table pages
    (type 5), or the traversal above the leaf level is untested."""
    payload = synth_sqlite(9)
    ps = 512
    types = {payload[i * ps] if i else payload[100]
             for i in range(len(payload) // ps)}
    assert 5 in types and 13 in types


def test_all_serial_types_roundtrip():
    """Force every value class through the record decoder: NULL,
    1/2/3/4/6/8-byte signed ints, float64, 0/1 literals, text, blob."""
    rows = [
        (None, 0, 1, "hello", b"\x01\x02"),
        (-1, 127, -129, "", b""),
        (32767, -32769, 2**24, "unicode éà", b"\xff" * 5),
        (2**40, -(2**40), 2**62, "x" * 40, b"\x00"),
        (1.5, -2.25, 0.0, "f", b"f"),
    ]
    payload = _make_db(rows, "CREATE TABLE t(a, b, c, d, e)")
    _rowids, got = read_table(payload, "t")
    assert got == [list(r) for r in rows]


def test_rowid_alias_stores_null_in_record():
    """INTEGER PRIMARY KEY columns live in the rowid; the record
    holds NULL — the documented alias the fixtures avoid."""
    payload = _make_db(
        [(10, "a"), (20, "b")],
        "CREATE TABLE t(id INTEGER PRIMARY KEY, v TEXT)",
    )
    rowids, rows = read_table(payload, "t")
    assert rowids == [10, 20]
    assert rows == [[None, "a"], [None, "b"]]


def test_multiple_tables_and_missing_table():
    conn = sqlite3.connect(":memory:")
    conn.execute("CREATE TABLE one(a)")
    conn.execute("CREATE TABLE two(b)")
    conn.execute("CREATE INDEX idx ON one(a)")  # indexes are skipped
    conn.commit()
    payload = bytes(conn.serialize())
    conn.close()
    assert set(list_tables(payload)) == {"one", "two"}
    with pytest.raises(ValueError, match="not found"):
        read_table(payload, "three")


def test_overflow_chain_round_trips():
    """The round-9 overflow boundary is CLOSED: multi-page spilled
    payloads (here a 5000-char text through ~10 overflow pages at
    512-byte pages) must decode exactly."""
    payload = _make_db([("y" * 5000,), ("z" * 477,), ("w",)],
                       "CREATE TABLE t(a)")
    _rowids, rows = read_table(payload, "t")
    assert [r[0] for r in rows] == ["y" * 5000, "z" * 477, "w"]


def test_malformed_inputs_quarantine():
    with pytest.raises(ValueError, match="magic"):
        scan_sqlite(b"not a database" + b"\x00" * 600)
    payload = bytearray(synth_sqlite(1))
    # non-power-of-two page size
    payload[16:18] = (500).to_bytes(2, "big")
    with pytest.raises(ValueError, match="page size"):
        scan_sqlite(bytes(payload))
    payload = bytearray(synth_sqlite(1))
    # unsupported encoding (UTF-16le = 2)
    payload[56:60] = (2).to_bytes(4, "big")
    with pytest.raises(ValueError, match="encoding"):
        scan_sqlite(bytes(payload))
    # record decoder: header length past data
    with pytest.raises(ValueError, match="header length"):
        decode_record(b"\x7f\x01")


def test_spark_permissive_quarantine(spark):
    from datawarehouseproject_spark.operators.multimodal import (
        extract_sqlite_scan,
    )

    rows = [
        (2, bytearray(synth_sqlite(2))),
        (9, bytearray(b"SQLite format 3\x00" + b"\x00" * 600)),
    ]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {
        r["media_id"]: r
        for r in extract_sqlite_scan(media, permissive=True).collect()
    }
    n = synth_sqlite_plan(2)["n_rows"]
    assert out[2]["decode_error"] is None and out[2]["n_rows"] == n
    assert out[9]["decode_error"] is not None and out[9]["n_rows"] is None
