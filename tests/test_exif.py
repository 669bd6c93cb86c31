"""Tests for the EXIF (APP1 / TIFF IFD) metadata codec —
functions/exif.py: both byte orders, inline vs out-of-line values,
sub-IFD recursion, malformed-structure quarantine, and coexistence
with the full pixel decode."""

from __future__ import annotations

import struct

import pytest

from datawarehouseproject_spark.functions.exif import (
    build_exif_app1,
    parse_exif,
    synth_exif_fields,
    synth_jpeg_with_exif,
)


def test_round_trip_both_byte_orders():
    for seed in range(24):  # even = II, odd = MM
        got = parse_exif(synth_jpeg_with_exif(seed))
        assert got == synth_exif_fields(seed), f"seed {seed}"


def test_out_of_line_values_resolved_via_offset():
    """ASCII strings > 4 bytes and RATIONALs always live in the
    value heap; a wrong heap base would shift every string."""
    f = synth_exif_fields(6)
    assert len(f["make"]) + 1 > 4  # forced out-of-line
    got = parse_exif(synth_jpeg_with_exif(6))
    assert got["make"] == f["make"]
    assert got["datetime"] == f["datetime"]
    assert got["exposure_den"] == f["exposure_den"]


def test_exif_does_not_break_pixel_decode():
    import numpy as np

    from datawarehouseproject_spark.functions.jpeg import (
        decode_jpeg,
        synth_jpeg420_pixels,
        synth_jpeg420_size,
    )

    p = synth_jpeg_with_exif(9)
    w, h, rgb = decode_jpeg(p)
    assert (w, h) == synth_jpeg420_size(9)
    assert np.array_equal(rgb, synth_jpeg420_pixels(9, w, h))


def test_missing_app1_raises():
    from datawarehouseproject_spark.functions.jpeg import synth_jpeg420

    with pytest.raises(ValueError, match="no EXIF"):
        parse_exif(synth_jpeg420(3))
    with pytest.raises(ValueError, match="SOI"):
        parse_exif(b"nope")


def test_bad_byte_order_and_magic_raise():
    app1 = bytearray(build_exif_app1(2))
    # APP1 body: marker(2) len(2) 'Exif\0\0'(6) then TIFF
    tiff_at = 2 + 2 + 6
    payload = b"\xff\xd8" + bytes(app1) + b"\xff\xd9"
    bad_bom = bytearray(payload)
    bad_bom[2 + tiff_at : 2 + tiff_at + 2] = b"XX"
    with pytest.raises(ValueError, match="byte-order"):
        parse_exif(bytes(bad_bom))
    bad_magic = bytearray(payload)
    bad_magic[2 + tiff_at + 2 : 2 + tiff_at + 4] = struct.pack("<H", 43)
    with pytest.raises(ValueError, match="magic"):
        parse_exif(bytes(bad_magic))


def test_truncated_value_offset_raises():
    """An entry whose value offset points past the TIFF blob must
    quarantine, not IndexError."""
    app1 = bytearray(build_exif_app1(2))  # II
    payload = bytearray(b"\xff\xd8" + bytes(app1) + b"\xff\xd9")
    # IFD0 starts at TIFF offset 8: count then entries sorted by tag.
    # Corrupt the first out-of-line entry's offset (Make, tag 0x010F,
    # first entry): offset field at entry_base + 8.
    tiff0 = 2 + 2 + 2 + 6  # SOI + marker + len + Exif\0\0
    entry0 = tiff0 + 8 + 2
    payload[entry0 + 8 : entry0 + 12] = struct.pack("<I", 10_000_000)
    with pytest.raises(ValueError, match="offset past end"):
        parse_exif(bytes(payload))


def test_spark_permissive_quarantine(spark):
    from datawarehouseproject_spark.operators.multimodal import (
        extract_exif_metadata,
    )

    rows = [
        (4, bytearray(synth_jpeg_with_exif(4))),
        (77, bytearray(b"\xff\xd8\xff\xd9")),  # no APP1
    ]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {r["media_id"]: r for r in extract_exif_metadata(media, permissive=True).collect()}
    assert out[77]["decode_error"] is not None and out[77]["make"] is None
    assert out[4]["decode_error"] is None
    assert out[4]["make"] == synth_exif_fields(4)["make"]


def test_count_zero_short_entry_raises_valueerror_not_struct_error():
    """ADVICE r7: a count=0 SHORT entry (empty raw value) used to
    raise struct.error from _short, escaping the permissive
    quarantine's `except ValueError`. It must raise ValueError."""
    payload = bytearray(synth_jpeg_with_exif(2))  # II
    tiff0 = 2 + 2 + 2 + 6  # SOI + APP1 marker + len + Exif\0\0
    # Walk IFD0 entries (offset 8 in TIFF space) to the Orientation
    # tag and zero its count field.
    (n,) = struct.unpack_from("<H", payload, tiff0 + 8)
    patched = False
    for i in range(n):
        base = tiff0 + 8 + 2 + 12 * i
        (tag,) = struct.unpack_from("<H", payload, base)
        if tag == 0x0112:  # Orientation, SHORT
            payload[base + 4 : base + 8] = struct.pack("<I", 0)
            patched = True
    assert patched
    with pytest.raises(ValueError, match="SHORT value"):
        parse_exif(bytes(payload))


def test_count_zero_subifd_pointer_raises_valueerror():
    """Same defect class on the Exif sub-IFD LONG pointer."""
    payload = bytearray(synth_jpeg_with_exif(2))
    tiff0 = 2 + 2 + 2 + 6
    (n,) = struct.unpack_from("<H", payload, tiff0 + 8)
    patched = False
    for i in range(n):
        base = tiff0 + 8 + 2 + 12 * i
        (tag,) = struct.unpack_from("<H", payload, base)
        if tag == 0x8769:  # Exif sub-IFD pointer
            payload[base + 4 : base + 8] = struct.pack("<I", 0)
            patched = True
    assert patched
    with pytest.raises(ValueError, match="sub-IFD pointer"):
        parse_exif(bytes(payload))
