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
