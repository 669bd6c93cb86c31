"""Tests for the stdlib-zlib PNG codec: the first COMPRESSED media
format in the multimodal surface (chunk walk + CRC + DEFLATE +
per-row filters)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from datawarehouseproject_spark.functions.png import (
    PNG_SIG,
    decode_png,
    encode_png,
    synth_png,
    synth_png_pixel,
    synth_png_pixels,
    synth_png_size,
)
from datawarehouseproject_spark.operators.multimodal import (
    extract_image_features,
    synthesize_png_media,
)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload))
    )


def _png_from_scanlines(width: int, height: int, lines: bytes) -> bytes:
    """Assemble a PNG BY HAND from raw (filter byte + row) scanlines —
    pins the container format independently of encode_png."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(lines))
        + _chunk(b"IEND", b"")
    )


# 2x2 image [[red, green], [blue, white]], both rows filter 0 —
# assembled by hand, not via encode_png.
GOLDEN_PIXELS = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
GOLDEN_2X2 = _png_from_scanlines(
    2, 2, b"\x00" + bytes((255, 0, 0, 0, 255, 0)) + b"\x00" + bytes((0, 0, 255, 255, 255, 255))
)


def test_decode_golden_bytes():
    w, h, rows = decode_png(GOLDEN_2X2)
    assert (w, h) == (2, 2)
    assert np.array_equal(rows, GOLDEN_PIXELS)


@pytest.mark.parametrize("width,height", [(1, 1), (2, 3), (3, 4), (5, 7), (8, 2)])
def test_roundtrip(width, height):
    pixels = [
        [((x * 31 + y * 17) % 256, (x * 7 + 5) % 256, (y * 13 + 99) % 256) for x in range(width)]
        for y in range(height)
    ]
    w, h, rows = decode_png(encode_png(width, height, pixels))
    assert (w, h) == (width, height) and np.array_equal(rows, pixels)


def test_encoder_uses_sub_and_up_filters():
    # height >= 3 must exercise the None/Sub/Up cycle in the stream
    payload = encode_png(4, 3, synth_png_pixels(7, 4, 3))
    # locate the IDAT chunk and inflate it
    pos = len(PNG_SIG)
    raw = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        if payload[pos + 4 : pos + 8] == b"IDAT":
            raw = zlib.decompress(payload[pos + 8 : pos + 8 + length])
        pos += 12 + length
    filters = [raw[y * (1 + 4 * 3)] for y in range(3)]
    assert filters == [0, 1, 2]


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_decode_every_filter_type(filter_type):
    """Forward-filter a known image by the spec's formulas and check
    the decoder reconstructs it — covers Average/Paeth, which our
    encoder never emits but real-world files use."""
    width, height, bpp = 3, 3, 3
    pixels = np.array(
        [[(x * 50 + y * 30 + c * 7) % 256 for c in range(3)] for y in range(height) for x in range(width)],
        dtype=np.uint8,
    ).reshape(height, width, 3)
    flat = pixels.reshape(height, width * bpp).astype(int)
    lines = bytearray()
    for y in range(height):
        prior = flat[y - 1] if y > 0 else np.zeros(width * bpp, dtype=int)
        row = flat[y]
        filt = []
        for x in range(width * bpp):
            a = row[x - bpp] if x >= bpp else 0  # recon left == raw left
            b = prior[x]
            c = prior[x - bpp] if x >= bpp else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt.append((int(row[x]) - int(pred)) & 0xFF)
        lines.append(filter_type)
        lines += bytes(filt)
    w, h, rows = decode_png(_png_from_scanlines(width, height, bytes(lines)))
    assert (w, h) == (width, height) and np.array_equal(rows, pixels)


def test_decode_concatenates_multiple_idat_and_skips_ancillary():
    base = encode_png(2, 2, GOLDEN_PIXELS)
    # rebuild: split the zlib stream across two IDAT chunks and add a
    # tEXt chunk between them (spec: IDAT payloads concatenate)
    pos = len(PNG_SIG)
    ihdr = idat = None
    while pos + 8 <= len(base):
        (length,) = struct.unpack_from(">I", base, pos)
        ctype = base[pos + 4 : pos + 8]
        body = base[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat = body
        pos += 12 + length
    patched = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat[:3])
        + _chunk(b"tEXt", b"Comment\x00hi")
        + _chunk(b"IDAT", idat[3:])
        + _chunk(b"IEND", b"")
    )
    w, h, rows = decode_png(patched)
    assert (w, h) == (2, 2) and np.array_equal(rows, GOLDEN_PIXELS)


def test_decode_rejects_malformed():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"XXXX" + GOLDEN_2X2[4:])
    # corrupt one IDAT byte -> CRC mismatch
    bad = bytearray(GOLDEN_2X2)
    idat_off = bad.index(b"IDAT") + 4
    bad[idat_off] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # grayscale (color type 0) DECODES as of round 8 — the 1x1
    # hand-built payload replicates its sample into all channels
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    gray = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"\x00\x05")) + _chunk(b"IEND", b"")
    _, _, px = decode_png(gray)
    assert px.tolist() == [[[5, 5, 5]]]
    # genuinely unsupported: RGBA (color type 6)
    ihdr6 = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)
    rgba = PNG_SIG + _chunk(b"IHDR", ihdr6) + _chunk(b"IDAT", zlib.compress(b"\x00\x05\x05\x05\xff")) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(rgba)


def test_synth_png_decodes_to_formula():
    for seed in (0, 1, 11, 987654321):
        w, h = synth_png_size(seed)
        gw, gh, rows = decode_png(synth_png(seed))
        assert (gw, gh) == (w, h)
        assert np.array_equal(
            rows, [[synth_png_pixel(seed, x, y) for x in range(w)] for y in range(h)]
        )


def test_extract_png_features_spark(spark):
    ids = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    rows = {
        r.media_id: r
        for r in extract_image_features(
            synthesize_png_media(ids), codec="png"
        ).collect()
    }
    assert len(rows) == 10
    for seed in range(10):
        w, h = synth_png_size(seed)
        px = [synth_png_pixel(seed, x, y) for y in range(h) for x in range(w)]
        r = rows[seed]
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        assert (r.sum_r, r.sum_g, r.sum_b) == tuple(
            sum(p[c] for p in px) for c in range(3)
        )


# ---------------------------------------------------------------------------
# Adam7 interlacing (round 8 — the progressive-delivery PNG layout).
# ---------------------------------------------------------------------------


def test_adam7_roundtrip_exact_including_empty_passes():
    """Interlaced encode/decode is pixel-exact at every size —
    including tiny images where several of the seven passes are
    EMPTY (e.g. width 1 leaves passes 2/4/6 with zero columns) and
    must contribute no scanline bytes at all."""
    import numpy as np

    rng = np.random.RandomState(11)
    for w, h in [(1, 1), (1, 9), (9, 1), (3, 3), (8, 8), (17, 5), (23, 31)]:
        px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        w2, h2, back = decode_png(encode_png(w, h, px, interlace=True))
        assert (w2, h2) == (w, h)
        assert np.array_equal(back, px), (w, h)


def test_adam7_layout_differs_but_content_matches():
    """Same pixels, different byte layout: the interlaced stream must
    differ from sequential (it IS a different scanline order) while
    decoding to identical content — the re-encode-invariance that
    makes content hashing work across delivery profiles."""
    import numpy as np

    px = synth_png_pixels(5, 10, 8)
    seq = encode_png(10, 8, px)
    il = encode_png(10, 8, px, interlace=True)
    assert seq != il
    assert il[8 + 8 + 12] == 1 or b"IHDR" in il  # interlace byte set
    _, _, a = decode_png(seq)
    _, _, b = decode_png(il)
    assert np.array_equal(a, b)


def test_adam7_truncated_pass_quarantines():
    import pytest as _pt

    px = synth_png_pixels(3, 16, 16)
    payload = bytearray(encode_png(16, 16, px, interlace=True))
    # re-deflate a truncated scanline stream so the CRC/zlib layers
    # pass and the PASS-WALK itself must catch the truncation
    import struct as _st
    import zlib as _z

    sig = 8
    pos = sig
    out = bytearray(payload[:sig])
    while pos + 8 <= len(payload):
        (length,) = _st.unpack_from(">I", payload, pos)
        ctype = bytes(payload[pos + 4 : pos + 8])
        body = bytes(payload[pos + 8 : pos + 8 + length])
        if ctype == b"IDAT":
            raw = _z.decompress(body)
            body = _z.compress(raw[: len(raw) - 30])
            out += _st.pack(">I", len(body)) + ctype + body
            out += _st.pack(">I", _z.crc32(ctype + body))
        else:
            out += payload[pos : pos + 12 + length]
        pos += 12 + length
    with _pt.raises(ValueError, match="truncated Adam7 pass"):
        decode_png(bytes(out))


def test_unknown_interlace_method_rejected():
    import pytest as _pt
    import struct as _st
    import zlib as _z

    px = synth_png_pixels(1, 4, 4)
    payload = bytearray(encode_png(4, 4, px))
    # IHDR body starts at 8 (sig) + 8 (len+type); interlace is its
    # 13th byte — patch it to 2 and fix the CRC
    ihdr_body = bytearray(payload[16 : 16 + 13])
    ihdr_body[12] = 2
    payload[16 : 16 + 13] = ihdr_body
    crc = _z.crc32(b"IHDR" + bytes(ihdr_body))
    payload[16 + 13 : 16 + 17] = _st.pack(">I", crc)
    with _pt.raises(ValueError, match="interlace method"):
        decode_png(bytes(payload))


def test_truncation_inside_chunk_crc_raises_valueerror():
    """Truncation INSIDE the 4 CRC bytes used to escape as
    struct.error (review r8 pass 1); every truncation offset must
    quarantine as ValueError."""
    import pytest as _pt

    payload = synth_png(0)
    for cut in range(8, len(payload)):
        try:
            decode_png(payload[:cut])
        except ValueError:
            pass  # the only acceptable failure type


def test_ihdr_wrong_length_raises_valueerror():
    """An IHDR declaring length != 13 with a matching CRC used to
    raise struct.error from the fixed-size unpack (review r8
    pass 2)."""
    import pytest as _pt
    import struct as _st
    import zlib as _z

    payload = bytearray(synth_png(2))
    # rebuild the IHDR chunk with a 12-byte body and a VALID crc
    body = payload[16 : 16 + 12]
    bad = (
        payload[:8]
        + _st.pack(">I", 12)
        + b"IHDR"
        + body
        + _st.pack(">I", _z.crc32(b"IHDR" + bytes(body)))
        + payload[16 + 13 + 4 :]
    )
    with _pt.raises(ValueError, match="IHDR chunk must be 13"):
        decode_png(bytes(bad))


# ---------------------------------------------------------------------------
# Grayscale + palette color types (round 8).
# ---------------------------------------------------------------------------


def test_gray_and_palette_roundtrip_both_layouts():
    import numpy as np

    rng = np.random.RandomState(5)
    pal = np.stack(
        [
            np.arange(256),
            (2 * np.arange(256) + 9) % 256,
            255 - np.arange(256),
        ],
        axis=-1,
    ).astype(np.uint8)
    for t in range(8):
        h, w = rng.randint(1, 25, 2)
        g = rng.randint(0, 256, (h, w), dtype=np.uint8)
        idx = rng.randint(0, 256, (h, w), dtype=np.uint8)
        for il in (False, True):
            _, _, back = decode_png(
                encode_png(w, h, g, interlace=il, color_type=0)
            )
            assert np.array_equal(back, np.stack([g, g, g], axis=-1))
            _, _, back = decode_png(
                encode_png(w, h, idx, interlace=il, color_type=3, palette=pal)
            )
            assert np.array_equal(back, pal[idx.astype(np.int64)])


def test_palette_synth_matches_formula():
    import numpy as np

    from datawarehouseproject_spark.functions.png import (
        synth_png_palette,
        synth_png_palette_indices,
        synth_png_palette_size,
        synth_png_palette_table,
    )

    pal = synth_png_palette_table()
    for seed in range(20):
        w, h = synth_png_palette_size(seed)
        payload = synth_png_palette(seed)
        if seed % 2 == 1:
            # interlaced seeds carry the Adam7 flag in IHDR byte 12
            assert payload[16 + 12] == 1
        w2, h2, rgb = decode_png(payload)
        assert (w2, h2) == (w, h)
        idx = synth_png_palette_indices(seed, w, h)
        assert np.array_equal(rgb, pal[idx.astype(np.int64)]), seed


def test_palette_errors_quarantine():
    import numpy as np
    import pytest as _pt

    from datawarehouseproject_spark.functions.png import (
        synth_png_palette,
    )

    good = bytearray(synth_png_palette(2))
    # strip the PLTE chunk: palette PNG without PLTE must reject
    p = good.index(b"PLTE") - 4
    (ln,) = struct.unpack_from(">I", good, p)
    no_plte = good[:p] + good[p + 12 + ln :]
    with _pt.raises(ValueError, match="without a PLTE"):
        decode_png(bytes(no_plte))
    # an out-of-range index vs a SHORT palette must reject: re-build
    # with a 4-entry palette and an index of 9
    short_pal = np.zeros((4, 3), dtype=np.uint8)
    with _pt.raises(ValueError, match="outside the palette"):
        encode_png(2, 1, np.array([[1, 9]], dtype=np.uint8),
                   color_type=3, palette=short_pal)
