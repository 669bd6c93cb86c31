"""ICO favicon-container scan — functions/ico.py (round 8)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datawarehouseproject_spark.functions.ico import (
    scan_ico,
    synth_ico,
    synth_ico_entries,
)


def test_scan_matches_entry_plan():
    for seed in range(25):
        plan = synth_ico_entries(seed)
        payload = synth_ico(seed)
        got = scan_ico(payload)
        assert got["n_entries"] == len(plan)
        assert got["max_size"] == max(e["size"] for e in plan)
        assert got["n_png"] == sum(1 for e in plan if e["is_png"])
        assert got["n_dib"] == len(plan) - got["n_png"]
        assert got["payload_bytes"] == len(payload)


def test_zero_byte_encodes_256():
    from datawarehouseproject_spark.functions.png import encode_png

    png = encode_png(256, 256, np.zeros((256, 256), dtype=np.uint8),
                     color_type=0)
    ico = (
        struct.pack("<HHH", 0, 1, 1)
        + struct.pack("<BBBBHHII", 0, 0, 0, 0, 1, 0, len(png), 22)
        + png
    )
    got = scan_ico(ico)
    assert got["max_size"] == 256 and got["n_png"] == 1


def test_synth_accepts_seeds_past_int64():
    # ADVICE r14: the vectorized pixel synth overflowed int64 for
    # huge seeds where the old per-byte genexpr accepted any int;
    # the scalar is now reduced mod 256 first — same bytes out
    big = synth_ico(1 << 80)
    assert isinstance(big, bytes) and len(big) > 6
    # and the reduction changes nothing for ordinary seeds
    assert synth_ico(7) == synth_ico(7)


def test_malformed_quarantines():
    good = bytearray(synth_ico(3))
    with pytest.raises(ValueError, match="bad header"):
        scan_ico(b"\x00\x00\x02\x00\x01\x00")  # type 2 = cursor
    with pytest.raises(ValueError, match="empty"):
        scan_ico(struct.pack("<HHH", 0, 1, 0))
    with pytest.raises(ValueError, match="out of bounds"):
        scan_ico(bytes(good[: len(good) - 10]))
    # entry payload neither PNG nor DIB
    bad = bytearray(good)
    (off,) = struct.unpack_from("<I", bad, 6 + 12)
    bad[off : off + 4] = b"XXXX"
    with pytest.raises(ValueError, match="neither PNG nor DIB"):
        scan_ico(bytes(bad))


def test_spark_permissive_quarantine(spark):
    from datawarehouseproject_spark.operators.multimodal import (
        extract_ico_structure,
    )

    rows = [
        (1, bytearray(synth_ico(1))),
        (7, bytearray(b"\x00\x00\x01\x00\xff\xff trunc")),
    ]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {
        r["media_id"]: r
        for r in extract_ico_structure(media, permissive=True).collect()
    }
    assert out[1]["decode_error"] is None
    assert out[1]["n_entries"] == len(synth_ico_entries(1))
    assert out[7]["decode_error"] is not None
