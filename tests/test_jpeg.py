"""Tests for the baseline JPEG codec — the first LOSSY media format
in the multimodal surface (markers + huffman entropy coding +
dequant/IDCT + YCbCr).

Two exactness regimes, tested separately:
- the ENTROPY half of JPEG is lossless: decode must reproduce the
  encoder's quantized coefficients bit-for-bit on arbitrary images;
- the PIXEL path is exact only for the synthesis construction
  (constant-gray 8×8 blocks, DC quant step 1) and bounded-error on
  everything else.
"""

from __future__ import annotations

import numpy as np
import pytest

from datawarehouseproject_spark.functions.jpeg import (
    ZIGZAG,
    _Q_CHROMA,
    _Q_LUMA,
    _dct2,
    _to_blocks,
    decode_jpeg,
    decode_jpeg_coefficients,
    encode_jpeg,
    synth_jpeg,
    synth_jpeg_pixels,
    synth_jpeg_size,
)
from datawarehouseproject_spark.operators.multimodal import (
    extract_image_features,
    synthesize_jpeg_media,
)


def test_exact_roundtrip_on_block_constant_gray():
    """The oracle construction: every 8×8 block a constant gray ⇒
    decode(encode(x)) == x EXACTLY despite the lossy codec."""
    for seed in range(60):
        w, h = synth_jpeg_size(seed)
        px = synth_jpeg_pixels(seed, w, h)
        w2, h2, rgb = decode_jpeg(synth_jpeg(seed))
        assert (w2, h2) == (w, h)
        assert np.array_equal(rgb, px), f"seed {seed}"


def test_quantized_coefficients_bit_exact_random_rgb():
    """Entropy coding is lossless: huffman-decode every quantized
    coefficient of a random RGB image and compare bit-for-bit with an
    independent recomputation of what the encoder must have written
    (DCT → quantize → zigzag). Random pixels maximize AC activity, so
    this exercises run/size codes, ZRL, EOB, byte stuffing, and DC
    prediction across blocks."""
    rng = np.random.RandomState(1234)
    px = rng.randint(0, 256, (21, 30, 3), dtype=np.uint8)
    payload = encode_jpeg(px)
    h, w, coeff, _state = decode_jpeg_coefficients(payload)
    assert (h, w) == (21, 30)
    r = px[..., 0].astype(float)
    g = px[..., 1].astype(float)
    b = px[..., 2].astype(float)
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
    ]
    for ci, (plane, q) in enumerate(
        zip(planes, [_Q_LUMA, _Q_CHROMA, _Q_CHROMA])
    ):
        blocks, _bh, _bw = _to_blocks(plane - 128.0)
        qz = (
            np.round(_dct2(blocks) / q.reshape(8, 8).astype(float))
            .astype(np.int64)
            .reshape(-1, 64)[:, ZIGZAG]
        )
        assert np.array_equal(qz, coeff[ci]), f"component {ci}"


def test_lossy_roundtrip_bounded_error_smooth():
    """On smooth gradients the Annex-K tables keep error tiny; on
    noise it's bounded but larger. Pins the dequant/IDCT plumbing
    (a zigzag or table mixup produces errors of ~100, not ~5)."""
    xx, yy = np.meshgrid(np.arange(40), np.arange(24))
    smooth = np.stack(
        [
            np.minimum(xx * 3 + yy * 2, 255),
            np.minimum(xx + yy * 4, 255),
            np.minimum(xx * 2 + yy, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    _, _, back = decode_jpeg(encode_jpeg(smooth))
    assert np.abs(back.astype(int) - smooth.astype(int)).max() <= 8


def test_grayscale_single_component():
    xx, yy = np.meshgrid(np.arange(19), np.arange(13))
    gp = ((xx * 2 + yy) % 200 + 20).astype(np.uint8)
    w, h, rgb = decode_jpeg(encode_jpeg(gp, gray=True))
    assert (w, h) == (19, 13)
    assert np.array_equal(rgb[:, :, 0], rgb[:, :, 1])
    assert np.array_equal(rgb[:, :, 0], rgb[:, :, 2])
    assert np.abs(rgb[:, :, 0].astype(int) - gp.astype(int)).max() <= 8


def test_dc_prediction_spans_blocks():
    """A 24×8 image = 3 horizontal blocks with distinct constants:
    DC differences (not absolute values) are coded, so a predictor
    bug would shift the 2nd/3rd blocks."""
    px = np.zeros((8, 24, 3), dtype=np.uint8)
    px[:, 0:8] = 10
    px[:, 8:16] = 200
    px[:, 16:24] = 60
    _, _, back = decode_jpeg(encode_jpeg(px))
    assert np.array_equal(back, px)


def test_edge_padding_non_multiple_of_8():
    """Non-8-multiple sizes pad by edge replication and crop back;
    constant image stays exact at every size."""
    for w, h in [(1, 1), (7, 5), (9, 17), (8, 8), (15, 8)]:
        px = np.full((h, w, 3), 77, dtype=np.uint8)
        w2, h2, back = decode_jpeg(encode_jpeg(px))
        assert (w2, h2) == (w, h)
        assert np.array_equal(back, px)


def test_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg at all")
    # progressive SOF2 must be rejected, not mis-decoded
    payload = bytearray(synth_jpeg(3))
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(payload))


def test_truncated_entropy_data_raises():
    payload = synth_jpeg(5)
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) - 8])


def test_spark_jpeg_features_match_formula(spark):
    """End-to-end through mapInPandas: synthesized JPEGs decoded on
    executors, channel sums equal the block-constant formula."""
    ids = spark.range(0, 40).selectExpr("id AS doc_id")
    media = synthesize_jpeg_media(ids)
    rows = {
        r["media_id"]: r
        for r in extract_image_features(media, codec="jpeg").collect()
    }
    assert len(rows) == 40
    for seed, r in rows.items():
        w, h = synth_jpeg_size(seed)
        px = synth_jpeg_pixels(seed, w, h).astype(np.int64)
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_pixels"] == w * h
        assert r["sum_r"] == int(px[..., 0].sum())
        assert r["sum_g"] == r["sum_r"]
        assert r["sum_b"] == r["sum_r"]


def test_permissive_mode_quarantines_bad_payload(spark):
    import pandas as pd

    good = synth_jpeg(1)
    rows = [(1, bytearray(good)), (2, bytearray(b"\xff\xd8garbage"))]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = extract_image_features(media, codec="jpeg", permissive=True)
    got = {r["media_id"]: r for r in out.collect()}
    assert got[1]["decode_error"] is None
    assert got[1]["n_pixels"] == got[1]["width"] * got[1]["height"]
    assert got[2]["decode_error"] is not None
    assert got[2]["width"] is None


def test_image_phash_jpeg_matches_bmp_content(spark):
    """The phash codec dispatch (fixed in round 6: the codec param
    was silently ignored): hashing the SAME pixel content through
    the BMP and JPEG codecs gives the SAME perceptual hash, because
    the block-constant gray synthesis decodes losslessly."""
    import pandas as pd

    from datawarehouseproject_spark.functions.bmp import encode_bmp
    from datawarehouseproject_spark.operators.multimodal import image_phash

    rows_bmp, rows_jpg = [], []
    for seed in range(12):
        w, h = synth_jpeg_size(seed)
        px = synth_jpeg_pixels(seed, w, h)
        rows_bmp.append((seed, bytearray(encode_bmp(w, h, px))))
        rows_jpg.append((seed, bytearray(synth_jpeg(seed))))
    schema = "media_id: long, payload: binary"
    bmp_h = {
        r["media_id"]: r["phash"]
        for r in image_phash(
            spark.createDataFrame(rows_bmp, schema), codec="bmp"
        ).collect()
    }
    jpg_h = {
        r["media_id"]: r["phash"]
        for r in image_phash(
            spark.createDataFrame(rows_jpg, schema), codec="jpeg"
        ).collect()
    }
    assert bmp_h == jpg_h


def test_bad_sos_component_id_raises_valueerror():
    """Round-6 review finding: an SOS referencing an unknown
    component id used to escape the permissive quarantine as
    KeyError."""
    payload = bytearray(synth_jpeg(3))
    i = payload.find(b"\xff\xda")
    payload[i + 5] = 9
    with pytest.raises(ValueError, match="unknown component"):
        decode_jpeg(bytes(payload))
