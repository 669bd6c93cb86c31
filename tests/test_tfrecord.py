"""TFRecord container framing — functions/tfrecord.py (round 9):
masked CRC32C record walk composed with the protowire protobuf
decoder.  CRC32C pinned on the published catalogue vector (no stdlib
producer exists for this container — the documented boundary)."""

from __future__ import annotations

import struct

import pytest

from datawarehouseproject_spark.functions.protowire import (
    synth_record,
    synth_record_fields,
)
from datawarehouseproject_spark.functions.tfrecord import (
    crc32c,
    iter_records,
    mask_crc,
    scan_tfrecord,
    synth_tfrecord,
    synth_tfrecord_plan,
    unmask_crc,
    write_record,
)


def test_crc32c_published_vectors():
    # CRC catalogue check value for CRC-32C (Castagnoli)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # incremental == one-shot is NOT supported (no running api); the
    # all-zeros and all-ones 32-byte vectors from the iSCSI spec:
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_mask_round_trip():
    for c in (0, 1, 0x7FFFFFFF, 0xDEADBEEF, 0xFFFFFFFF):
        assert unmask_crc(mask_crc(c)) == c


def test_record_round_trip_and_multi():
    payloads = [b"", b"x", b"hello world" * 10]
    blob = b"".join(write_record(p) for p in payloads)
    assert list(iter_records(blob)) == payloads


def test_scan_composes_with_protowire():
    for seed in range(15):
        plan = synth_tfrecord_plan(seed)
        st = scan_tfrecord(synth_tfrecord(seed))
        nr = plan["n_records"]
        assert st["n_records"] == nr
        assert st["event_sum"] == sum(
            synth_record_fields(seed * 31 + r)["event_count"]
            for r in range(nr)
        )
        assert st["balance_sum"] == sum(
            synth_record_fields(seed * 31 + r)["balance"] for r in range(nr)
        )


def test_both_crcs_are_verified():
    blob = bytearray(write_record(synth_record(3)))
    # corrupt the length CRC
    b1 = bytearray(blob)
    b1[9] ^= 0x01
    with pytest.raises(ValueError, match="length CRC"):
        list(iter_records(bytes(b1)))
    # corrupt a data byte (data CRC catches it)
    b2 = bytearray(blob)
    b2[14] ^= 0x01
    with pytest.raises(ValueError, match="data CRC"):
        list(iter_records(bytes(b2)))


def test_truncations_raise():
    blob = synth_tfrecord(4)
    for cut in (1, 7, 11, len(blob) // 2, len(blob) - 1):
        with pytest.raises(ValueError):
            list(iter_records(blob[:cut]))
    with pytest.raises(ValueError):
        scan_tfrecord(b"")


def test_declared_length_cannot_overrun():
    hdr = struct.pack("<Q", 1 << 40)
    blob = hdr + struct.pack("<I", mask_crc(crc32c(hdr))) + b"xx"
    with pytest.raises(ValueError, match="truncated"):
        list(iter_records(blob))


def test_compressed_shards_gzip_and_zstd():
    """Round 10: gzip multi-member (framing reassembled across the
    member split) and file-level zstd shards decode to the same
    aggregates the raw framing would give."""
    from datawarehouseproject_spark.functions.tfrecord import (
        synth_tfrecord_compressed,
        synth_tfrecord_compressed_plan,
    )
    from datawarehouseproject_spark.functions.protowire import (
        synth_record,
        parse_record,
    )

    for seed in range(8):
        plan = synth_tfrecord_compressed_plan(seed)
        got = scan_tfrecord(synth_tfrecord_compressed(seed))
        assert got["n_records"] == plan["n_records"]
        want_event = sum(
            parse_record(synth_record(seed * 47 + r))["event_count"] or 0
            for r in range(plan["n_records"])
        )
        assert got["event_sum"] == want_event


def test_corrupt_compressed_byte_quarantines():
    """A flipped byte inside the compressed body dies in the gzip
    CRC32 / zstd xxh64 layer (or the framing CRC) — ValueError, never
    wrong aggregates."""
    from datawarehouseproject_spark.functions.tfrecord import (
        synth_tfrecord_compressed,
    )

    for seed in (0, 1):
        blob = bytearray(synth_tfrecord_compressed(seed))
        blob[len(blob) // 2] ^= 0x40
        with pytest.raises(ValueError):
            scan_tfrecord(bytes(blob))


def test_gzip_lookalike_raw_framing_not_misrouted():
    """Review r10: a raw shard whose first record is exactly 35615
    bytes starts 1f 8b — the masked length-CRC must route it to the
    raw framing walk, not the gzip decoder."""
    from datawarehouseproject_spark.functions.tfrecord import (
        write_record,
        iter_records,
    )

    blob = write_record(b"x" * 35615)
    assert blob[:2] == b"\x1f\x8b"
    got = scan_tfrecord_raw_safe(blob)
    assert got == 1


def scan_tfrecord_raw_safe(blob):
    # the fixture payload is not protowire, so count frames directly
    # through scan_tfrecord's sniff by checking it does NOT raise the
    # gzip error; frame-level iteration is the sniffed path's core
    from datawarehouseproject_spark.functions.tfrecord import (
        scan_tfrecord,
    )

    try:
        scan_tfrecord(blob)
    except ValueError as e:
        assert "gzip" not in str(e), f"misrouted to gzip: {e}"
        # protowire parse of 'xxx...' payload may legitimately fail;
        # the sniff routing is what this test pins
    from datawarehouseproject_spark.functions.tfrecord import iter_records

    return sum(1 for _ in iter_records(blob))
