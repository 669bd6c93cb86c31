"""Multi-page TIFF container scan — functions/tiff.py (round 8):
IFD-chain walk reusing the EXIF IFD reader, byte orders, cycle
detection, malformed-structure quarantine."""

from __future__ import annotations

import struct

import pytest

from datawarehouseproject_spark.functions.tiff import (
    scan_tiff,
    synth_tiff,
    synth_tiff_pages,
)


def test_scan_matches_page_plan_both_byte_orders():
    for seed in range(25):
        plan = synth_tiff_pages(seed)
        payload = synth_tiff(seed)
        got = scan_tiff(payload)
        assert got["byte_order"] == ("II" if seed % 2 == 0 else "MM")
        assert got["n_pages"] == len(plan)
        assert (got["width"], got["height"]) == (
            plan[0]["width"],
            plan[0]["height"],
        )
        assert got["bits_per_sample"] == plan[0]["bits"]
        assert got["compression"] == plan[0]["compression"]
        assert got["total_pixels"] == sum(
            p["width"] * p["height"] for p in plan
        )
        assert got["payload_bytes"] == len(payload)


def test_next_ifd_cycle_detected_not_hung():
    d = bytearray(synth_tiff(0))
    ifd0 = struct.unpack_from("<I", d, 4)[0]
    n = struct.unpack_from("<H", d, ifd0)[0]
    struct.pack_into("<I", d, ifd0 + 2 + 12 * n, ifd0)  # self-loop
    with pytest.raises(ValueError, match="cycle"):
        scan_tiff(bytes(d))


def test_malformed_structures_quarantine():
    good = synth_tiff(3)
    with pytest.raises(ValueError, match="byte-order"):
        scan_tiff(b"XXXXXXXXXX")
    with pytest.raises(ValueError, match="magic"):
        scan_tiff(b"II" + struct.pack("<HI", 43, 8) + b"\x00" * 8)
    with pytest.raises(ValueError, match="truncated"):
        scan_tiff(good[:6])
    # IFD0 offset past the end
    bad = bytearray(good[:8])
    struct.pack_into(">I" if good[:2] == b"MM" else "<I", bad, 4, 10_000_000)
    with pytest.raises(ValueError, match="past end"):
        scan_tiff(bytes(bad))
    # a page missing ImageWidth must reject: clobber the WIDTH tag id
    wbad = bytearray(good)
    endian = ">" if good[:2] == b"MM" else "<"
    ifd0 = struct.unpack_from(endian + "I", good, 4)[0]
    # first sorted entry is tag 0x0100 (width)
    struct.pack_into(endian + "H", wbad, ifd0 + 2, 0x00FE)
    with pytest.raises(ValueError, match="ImageWidth"):
        scan_tiff(bytes(wbad))


def test_spark_permissive_quarantine(spark):
    from datawarehouseproject_spark.operators.multimodal import (
        extract_tiff_structure,
    )

    rows = [
        (2, bytearray(synth_tiff(2))),
        (5, bytearray(b"MM\x00\x2a trunc")),
    ]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {
        r["media_id"]: r
        for r in extract_tiff_structure(media, permissive=True).collect()
    }
    assert out[2]["decode_error"] is None
    assert out[2]["n_pages"] == len(synth_tiff_pages(2))
    assert out[5]["decode_error"] is not None and out[5]["width"] is None
