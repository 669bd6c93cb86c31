"""BI_RLE8 palette BMP — functions/bmp.py round-9 extension: every
opcode of the public RLE8 format (runs, absolute mode + word pad,
end-of-line, delta, end-of-bitmap), pinned against the worked example
in Microsoft's BITMAPINFOHEADER documentation and exact round-trips
through the module's own encoder."""

from __future__ import annotations

import numpy as np
import pytest

from datawarehouseproject_spark.functions.bmp import (
    decode_bmp,
    decode_rle8,
    encode_bmp_rle8,
    encode_rle8,
    synth_bmp_rle8,
    synth_rle8_indices,
    synth_rle8_palette,
    synth_rle8_size,
)


def test_msdn_worked_example():
    """The expansion table published in the BITMAPINFOHEADER docs:
    runs, an absolute block (with pad byte), a delta of (5, 1), an
    end-of-line, and the end-of-bitmap marker."""
    data = bytes(
        [3, 4, 5, 6, 0, 3, 0x45, 0x56, 0x67, 0, 2, 0x78,
         0, 2, 5, 1, 2, 0x78, 0, 0, 9, 0x1E, 0, 1]
    )
    g = decode_rle8(data, 20, 3)
    want = np.zeros((3, 20), np.uint8)
    want[2, :13] = [4, 4, 4, 6, 6, 6, 6, 6, 0x45, 0x56, 0x67, 0x78, 0x78]
    want[1, 18:20] = [0x78, 0x78]  # pixels skipped by the delta stay 0
    want[0, :9] = 0x1E
    assert np.array_equal(g, want)


def test_encoder_roundtrip_and_opcode_coverage():
    pal = synth_rle8_palette()
    saw_delta = saw_abs = False
    for seed in range(12):
        w, h = synth_rle8_size(seed)
        idx = synth_rle8_indices(seed, w, h)
        stream = encode_rle8(idx)
        assert np.array_equal(decode_rle8(stream, w, h), idx), seed
        # whole-file round trip maps indices through the palette
        W, H, rgb = decode_bmp(synth_bmp_rle8(seed))
        assert (W, H) == (w, h)
        assert np.array_equal(rgb, pal[idx]), seed
        # opcode coverage: the fixtures must actually exercise the
        # escape codes, not just plain runs
        b = stream
        i = 0
        while i + 2 <= len(b):
            if b[i] == 0:
                if b[i + 1] == 2:
                    saw_delta = True
                    i += 4
                    continue
                if b[i + 1] >= 3:
                    saw_abs = True
                    n = b[i + 1]
                    i += 2 + n + (n & 1)
                    continue
            i += 2
    assert saw_delta and saw_abs


def test_uncompressed_8bit_palette():
    """compression=0 8-bit files share the palette path with padded
    index rows instead of an RLE stream."""
    import struct

    idx = synth_rle8_indices(3, 8, 4)
    pal = synth_rle8_palette()
    # hand-assemble: headers + 256 BGRX quads + bottom-up padded rows
    quads = np.zeros((256, 4), np.uint8)
    quads[:, :3] = pal[:, ::-1]
    stride = (8 + 3) & ~3
    rows = np.zeros((4, stride), np.uint8)
    rows[:, :8] = idx[::-1]
    body = rows.tobytes()
    off = 54 + 1024
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, 8, 4, 1, 8, 0, len(body), 2835, 2835, 256, 0
    )
    w, h, rgb = decode_bmp(hdr + info + quads.tobytes() + body)
    assert (w, h) == (8, 4)
    assert np.array_equal(rgb, pal[idx])


def test_malformed_streams_quarantine():
    with pytest.raises(ValueError, match="end-of-bitmap"):
        decode_rle8(bytes([3, 4]), 20, 3)  # no terminator
    with pytest.raises(ValueError, match="past row edge"):
        decode_rle8(bytes([30, 4, 0, 1]), 20, 3)  # run wider than row
    with pytest.raises(ValueError, match="past image bounds"):
        decode_rle8(bytes([0, 2, 250, 250, 0, 1]), 20, 3)  # wild delta
    with pytest.raises(ValueError, match="truncated RLE8 absolute"):
        decode_rle8(bytes([0, 9, 1, 2]), 20, 3)
    with pytest.raises(ValueError, match="end-of-line past"):
        decode_rle8(bytes([0, 0] * 9 + [0, 1]), 4, 3)
    # top-down (negative height) RLE8 is not legal per the spec
    payload = bytearray(synth_bmp_rle8(1))
    import struct

    w, h = synth_rle8_size(1)
    struct.pack_into("<i", payload, 22, -h)
    with pytest.raises(ValueError, match="bottom-up"):
        decode_bmp(bytes(payload))
    # truncated color table
    with pytest.raises(ValueError, match="color table"):
        decode_bmp(bytes(synth_bmp_rle8(1)[:200]))


def test_spark_extract_channel_sums(spark):
    from datawarehouseproject_spark.operators.multimodal import (
        extract_image_features,
    )

    rows = [(int(s), bytearray(synth_bmp_rle8(s))) for s in range(4)]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    got = {
        r["media_id"]: r for r in extract_image_features(media).collect()
    }
    pal = synth_rle8_palette().astype(np.int64)
    for s in range(4):
        w, h = synth_rle8_size(s)
        rgb = pal[synth_rle8_indices(s, w, h)]
        assert got[s]["width"] == w and got[s]["height"] == h
        assert got[s]["sum_r"] == int(rgb[:, :, 0].sum())
        assert got[s]["sum_g"] == int(rgb[:, :, 1].sum())
        assert got[s]["sum_b"] == int(rgb[:, :, 2].sum())
