"""XZ container triage — functions/xz_scan.py (round 8): footer ->
index -> block map with every skeleton CRC verified, pinned against
stdlib lzma including concatenated streams."""

from __future__ import annotations

import lzma

import pytest

from datawarehouseproject_spark.functions.xz_scan import (
    scan_xz,
    synth_xz,
    synth_xz_plan,
)


def test_fixture_plan_roundtrip():
    for seed in range(12):
        plan = synth_xz_plan(seed)
        got = scan_xz(synth_xz(seed))
        assert got["n_streams"] == len(plan["sizes"])
        assert got["n_blocks"] == len(plan["sizes"])
        assert got["uncompressed_total"] == sum(plan["sizes"])
        assert got["check_type"] == plan["check_type"]


def test_stdlib_shapes():
    data = b"hello xz " * 5000
    got = scan_xz(lzma.compress(data))
    assert got["uncompressed_total"] == len(data)
    assert got["n_streams"] == 1
    # empty stream: zero blocks is legal
    got = scan_xz(lzma.compress(b""))
    assert got["n_blocks"] == 0 and got["uncompressed_total"] == 0
    # three concatenated streams with padding-free boundaries
    tri = b"".join(lzma.compress(bytes([i]) * 100) for i in range(3))
    got = scan_xz(tri)
    assert got["n_streams"] == 3 and got["uncompressed_total"] == 300


def test_crcs_actually_verified():
    payload = bytearray(synth_xz(2))
    # corrupt the index CRC region (last 12 bytes before the footer
    # hold index tail + CRC for this single-stream file)
    payload[-16] ^= 0xFF
    with pytest.raises(ValueError):
        scan_xz(bytes(payload))
    payload = bytearray(synth_xz(2))
    payload[7] ^= 0x01  # stream flags byte inside the header CRC
    with pytest.raises(ValueError):
        scan_xz(bytes(payload))


def test_malformed_quarantine():
    with pytest.raises(ValueError, match="magic"):
        scan_xz(b"not xz at all, definitely not" + b"\x00" * 10)
    with pytest.raises(ValueError):
        scan_xz(synth_xz(1)[:-5])  # truncated footer
    # a non-stream 8-byte prefix before a real stream: the backward
    # walk consumes the real stream, then the leftover prefix can't
    # form a header+footer pair -> quarantined
    with pytest.raises(ValueError):
        scan_xz(b"\xfd7zXZ\x00\x00\x00" + synth_xz(0))


def test_spark_permissive_quarantine(spark):
    from datawarehouseproject_spark.operators.multimodal import (
        extract_xz_scan,
    )

    rows = [
        (5, bytearray(synth_xz(5))),
        (9, bytearray(b"\xfd7zXZ\x00" + b"\x00" * 40)),
    ]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {
        r["media_id"]: r
        for r in extract_xz_scan(media, permissive=True).collect()
    }
    plan = synth_xz_plan(5)
    assert out[5]["decode_error"] is None
    assert out[5]["uncompressed_total"] == sum(plan["sizes"])
    assert out[9]["decode_error"] is not None
