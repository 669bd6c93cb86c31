"""Tests for the pure-stdlib GIF87a/LZW codec — the second
compressed media format (dictionary coding, vs PNG's DEFLATE)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datawarehouseproject_spark.functions.gif import (
    _lzw_compress,
    _lzw_decompress,
    decode_gif,
    encode_gif,
    palette,
    synth_gif,
    synth_gif_index,
    synth_gif_size,
)
from datawarehouseproject_spark.operators.multimodal import (
    extract_image_features,
    synthesize_gif_media,
)


def test_palette_bijection_on_red():
    pal = palette()
    assert pal.shape == (256, 3)
    assert np.array_equal(pal[:, 0], np.arange(256))  # red IS the index


def test_lzw_roundtrip_simple():
    data = b"\x01\x02\x01\x02\x01\x02\x03"
    assert _lzw_decompress(_lzw_compress(data), len(data)) == data


def test_lzw_kwkwk_case():
    # aaa...: the decoder immediately hits code == next_code
    data = b"\x05" * 50
    assert _lzw_decompress(_lzw_compress(data), len(data)) == data


def test_lzw_width_growth_and_reclear():
    rng = np.random.RandomState(3)
    data = rng.randint(0, 256, size=20000).astype(np.uint8).tobytes()
    assert _lzw_decompress(_lzw_compress(data), len(data)) == data


@pytest.mark.parametrize("width,height", [(1, 1), (3, 2), (8, 8), (64, 64)])
def test_gif_roundtrip(width, height):
    idx = (np.add.outer(np.arange(height) * 5, np.arange(width) * 3) % 256)
    img = palette()[idx]
    gw, gh, rows = decode_gif(encode_gif(width, height, img))
    assert (gw, gh) == (width, height) and np.array_equal(rows, img)


def test_encode_rejects_non_palette_pixel():
    img = np.zeros((1, 1, 3), dtype=np.uint8)
    img[0, 0] = (0, 0, 0)  # palette[0] is (0, 9, 255) -> not representable
    with pytest.raises(ValueError, match="palette"):
        encode_gif(1, 1, img)


def test_decode_skips_89a_extension_blocks():
    base = synth_gif(4)
    # splice a Graphic Control Extension (0x21 0xF9) before the image
    # descriptor (structural offset: header 13 + 256-entry palette —
    # searching for b"," would false-match palette bytes)
    img_off = 13 + 256 * 3
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = b"GIF89a" + base[6:img_off] + ext + base[img_off:]
    w, h = synth_gif_size(4)
    gw, gh, rows = decode_gif(patched)
    assert (gw, gh) == (w, h)
    want = palette()[
        np.array([[synth_gif_index(4, x, y) for x in range(w)] for y in range(h)])
    ]
    assert np.array_equal(rows, want)


def test_decode_rejects_malformed():
    good = synth_gif(2)
    with pytest.raises(ValueError, match="magic"):
        decode_gif(b"XIF87a" + good[6:])
    # interlace flag on the image descriptor (structural offset —
    # see test_decode_skips_89a_extension_blocks)
    bad = bytearray(good)
    img_off = 13 + 256 * 3
    bad[img_off + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(bad))
    # corrupt LZW: an out-of-range code
    with pytest.raises(ValueError):
        _lzw_decompress(struct.pack("<H", 0x0FFF), 10)


def test_synth_gif_decodes_to_formula():
    for seed in (0, 1, 13, 123456789):
        w, h = synth_gif_size(seed)
        gw, gh, rows = decode_gif(synth_gif(seed))
        assert (gw, gh) == (w, h)
        want = palette()[
            np.array(
                [[synth_gif_index(seed, x, y) for x in range(w)] for y in range(h)]
            )
        ]
        assert np.array_equal(rows, want)


def test_extract_gif_features_spark(spark):
    ids = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    rows = {
        r.media_id: r
        for r in extract_image_features(
            synthesize_gif_media(ids), codec="gif"
        ).collect()
    }
    assert len(rows) == 10
    pal = palette()
    for seed in range(10):
        w, h = synth_gif_size(seed)
        px = [
            pal[synth_gif_index(seed, x, y)]
            for y in range(h)
            for x in range(w)
        ]
        r = rows[seed]
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        assert (r.sum_r, r.sum_g, r.sum_b) == tuple(
            int(sum(p[c] for p in px)) for c in range(3)
        )


# ---------------------------------------------------------------------------
# GIF89a animation triage (round 8).
# ---------------------------------------------------------------------------


def test_gif_animation_scan_matches_plan():
    from datawarehouseproject_spark.functions.gif import (
        scan_gif_anim,
        synth_gif_anim,
        synth_gif_anim_plan,
    )

    for seed in range(25):
        p = synth_gif_anim_plan(seed)
        payload = synth_gif_anim(seed)
        got = scan_gif_anim(payload)
        assert got["n_frames"] == p["n_frames"]
        assert got["total_delay_cs"] == sum(p["delays"])
        assert got["loop_count"] == p["loop_count"]
        assert (got["width"], got["height"]) == (p["width"], p["height"])
        assert got["payload_bytes"] == len(payload)


def test_gif_animation_scan_handles_single_frame_87a():
    """A plain GIF87a (the pixel-path synthesizer's output) is a
    one-frame, zero-delay, no-loop animation to the triage scan."""
    import numpy as np

    from datawarehouseproject_spark.functions.gif import (
        encode_gif,
        palette,
        scan_gif_anim,
    )

    idx = np.arange(20, dtype=np.uint8).reshape(4, 5)
    px = palette()[idx.astype(np.int64)]
    got = scan_gif_anim(encode_gif(5, 4, px))
    assert got["n_frames"] == 1
    assert got["total_delay_cs"] == 0
    assert got["loop_count"] is None
    assert got["n_extensions"] == 0


def test_gif_animation_malformed_quarantines():
    import pytest as _pt

    from datawarehouseproject_spark.functions.gif import (
        scan_gif_anim,
        synth_gif_anim,
    )

    good = bytearray(synth_gif_anim(3))
    with _pt.raises(ValueError, match="magic"):
        scan_gif_anim(b"GIF99a rest")
    # missing trailer
    with _pt.raises(ValueError, match="trailer|truncated"):
        scan_gif_anim(bytes(good[:-1]))
    # a frame rect outside the logical screen must be rejected; the
    # first image descriptor sits right after the first GCE (0x2C
    # bytes also occur inside the palette, so don't search for ',')
    i = good.find(b"\x21\xf9") + 8
    assert good[i] == 0x2C
    bad = bytearray(good)
    import struct as _st

    bad[i + 1 : i + 3] = _st.pack("<H", 60000)  # x way outside
    with _pt.raises(ValueError, match="outside the logical screen"):
        scan_gif_anim(bytes(bad))
