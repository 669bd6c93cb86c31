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
    # a baseline stream relabeled SOF2 is MALFORMED progressive (its
    # one scan covers band 0..63, illegal for a progressive DC scan)
    # — it must raise, never mis-decode
    payload = bytearray(synth_jpeg(3))
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(payload))
    # genuinely unsupported frame types (SOF3 lossless) still reject
    payload[idx + 1] = 0xC3
    with pytest.raises(ValueError, match="SOF0"):
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


# ---------------------------------------------------------------------------
# 4:2:0 / 4:2:2 chroma subsampling + restart intervals (round 7 —
# VERDICT r6 item 1: the profile virtually every real-world photo
# uses).
# ---------------------------------------------------------------------------


def test_exact_roundtrip_420_macroblock_constant():
    """The 4:2:0 oracle construction: every 16×16 macroblock a
    constant gray ⇒ decode(encode(x, 420, RST every 2 MCUs)) == x
    EXACTLY — all four luma blocks per MCU are DC-only, chroma is
    the constant 128 (DC exactly 0), upsample replicates a
    constant."""
    from datawarehouseproject_spark.functions.jpeg import (
        synth_jpeg420,
        synth_jpeg420_pixels,
        synth_jpeg420_size,
    )

    for seed in range(60):
        w, h = synth_jpeg420_size(seed)
        px = synth_jpeg420_pixels(seed, w, h)
        w2, h2, rgb = decode_jpeg(synth_jpeg420(seed))
        assert (w2, h2) == (w, h)
        assert np.array_equal(rgb, px), f"seed {seed}"


def test_quantized_coefficients_bit_exact_interleaved_420():
    """The entropy half stays lossless under 2×2 interleaved MCUs +
    restart intervals: huffman-decode every quantized coefficient of
    a random RGB 4:2:0 image and compare bit-for-bit with an
    independent recomputation (color transform → box downsample →
    MCU-grid padding → DCT → quantize → zigzag). Random pixels
    maximize AC activity; the restart interval exercises byte
    alignment + DC predictor resets mid-image."""
    rng = np.random.RandomState(99)
    H, W = 29, 43  # non-multiples of 16: partial edge MCUs
    px = rng.randint(0, 256, (H, W, 3), dtype=np.uint8)
    payload = encode_jpeg(px, subsampling="420", restart_interval=2)
    h, w, coeff, state = decode_jpeg_coefficients(payload)
    assert (h, w) == (H, W)
    assert state["ri"] == 2
    r = px[..., 0].astype(float)
    g = px[..., 1].astype(float)
    b = px[..., 2].astype(float)
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
    ]
    mcx, mcy = -(-W // 16), -(-H // 16)
    for ci, (plane, q, hi, vi) in enumerate(
        zip(planes, [_Q_LUMA, _Q_CHROMA, _Q_CHROMA], [2, 1, 1], [2, 1, 1])
    ):
        ry, rx = 2 // vi, 2 // hi
        if ry > 1 or rx > 1:
            ph, pw = -(-H // ry) * ry, -(-W // rx) * rx
            p = np.pad(
                plane, ((0, ph - H), (0, pw - W)), mode="edge"
            )
            plane = p.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        gh, gw = mcy * vi, mcx * hi
        ch, cw = plane.shape
        padded = np.pad(
            plane, ((0, gh * 8 - ch), (0, gw * 8 - cw)), mode="edge"
        )
        blocks = (
            padded.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        qz = (
            np.round(_dct2(blocks - 128.0) / q.reshape(8, 8).astype(float))
            .astype(np.int64)
            .reshape(-1, 64)[:, ZIGZAG]
        )
        assert np.array_equal(qz, coeff[ci]), f"component {ci}"


def test_422_constant_exact_and_smooth_bounded():
    """4:2:2 (2×1 luma): constant image exact at awkward sizes;
    smooth gradient bounded — pins the horizontal-only downsample/
    upsample axis handling (an axis swap gives ~100 errors)."""
    for w, h in [(1, 1), (17, 9), (16, 8), (33, 15)]:
        px = np.full((h, w, 3), 119, dtype=np.uint8)
        w2, h2, back = decode_jpeg(encode_jpeg(px, subsampling="422"))
        assert (w2, h2) == (w, h)
        assert np.array_equal(back, px)
    xx, yy = np.meshgrid(np.arange(40), np.arange(24))
    smooth = np.stack(
        [np.minimum(xx * 2 + yy, 255)] * 3, axis=-1
    ).astype(np.uint8)
    _, _, back = decode_jpeg(encode_jpeg(smooth, subsampling="422"))
    assert np.abs(back.astype(int) - smooth.astype(int)).max() <= 10


def test_restart_marker_sequence_enforced():
    """RSTn markers must cycle 0..7; swapping one for the wrong index
    is stream corruption and must quarantine as ValueError, not
    silently desync the huffman decode."""
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (33, 49, 3), dtype=np.uint8)
    payload = bytearray(encode_jpeg(px, subsampling="420", restart_interval=1))
    i = payload.find(b"\xff\xd0")  # first RST0 in the entropy stream
    assert i > 0, "restart markers must be present"
    payload[i + 1] = 0xD5  # claim RST5 where RST0 is expected
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg_coefficients(bytes(payload))


def test_dri_changes_stream_but_not_pixels():
    """Restart intervals are pure framing: same pixels decode from
    the DRI and non-DRI encodings, and the DRI stream really does
    contain RST markers."""
    from datawarehouseproject_spark.functions.jpeg import (
        synth_jpeg420_pixels,
    )

    px = synth_jpeg420_pixels(7, 47, 29)
    plain = encode_jpeg(px, subsampling="420")
    dri = encode_jpeg(px, subsampling="420", restart_interval=1)
    assert b"\xff\xd0" in dri and b"\xff\xd0" not in plain
    _, _, a = decode_jpeg(plain)
    _, _, b_ = decode_jpeg(dri)
    assert np.array_equal(a, b_)
    assert np.array_equal(a, px)


def test_image_phash_420_jpeg_matches_bmp_content(spark):
    """Re-encode invariance across a LOSSY subsampled re-encode: the
    same macroblock-constant content encoded as BMP and as 4:2:0
    JPEG (restart intervals and all) must produce identical
    perceptual hashes — the property that makes phash the
    content-based dedup key where byte hashing fails."""
    from datawarehouseproject_spark.functions.bmp import encode_bmp
    from datawarehouseproject_spark.functions.jpeg import (
        synth_jpeg420,
        synth_jpeg420_pixels,
        synth_jpeg420_size,
    )
    from datawarehouseproject_spark.operators.multimodal import image_phash

    rows_bmp, rows_jpg = [], []
    for seed in range(12):
        w, h = synth_jpeg420_size(seed)
        px = synth_jpeg420_pixels(seed, w, h)
        rows_bmp.append((seed, bytearray(encode_bmp(w, h, px))))
        rows_jpg.append((seed, bytearray(synth_jpeg420(seed))))
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


# ---------------------------------------------------------------------------
# Progressive mode (round 8 — VERDICT r7 item 1: SOF2 spectral
# selection + successive approximation, the web-delivery profile that
# previously quarantined).
# ---------------------------------------------------------------------------


def test_progressive_pixel_exact_vs_baseline_random_images():
    """The 10-scan progressive pipeline (DC Al=1 + refinement,
    per-band AC first scans, AC refinement with correction bits)
    must reassemble EXACTLY the coefficients the baseline encoder
    quantized — decoded pixels identical bit-for-bit across random
    content, every subsampling, with and without restarts."""
    from datawarehouseproject_spark.functions.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(7)
    for trial in range(18):
        h = rng.randint(1, 50)
        w = rng.randint(1, 50)
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        sub = ["444", "422", "420"][trial % 3]
        ri = [0, 2, 5][(trial // 3) % 3]
        _, _, base = decode_jpeg(
            encode_jpeg(px, subsampling=sub, restart_interval=ri)
        )
        wp, hp, prog = decode_jpeg(
            encode_jpeg_progressive(px, subsampling=sub, restart_interval=ri)
        )
        assert (wp, hp) == (w, h)
        assert np.array_equal(base, prog), f"trial {trial} {h}x{w} {sub} ri={ri}"


def test_progressive_coefficients_bit_exact_on_true_blocks():
    """Coefficient-level round trip: progressive decode accumulates
    the SAME quantized integers as baseline on every TRUE block.
    Edge-PADDING blocks (beyond ceil(samples/8)) are coded only by
    the interleaved DC scans — their AC stays zero in progressive,
    which is cropped away in pixel space and asserted here
    explicitly."""
    from datawarehouseproject_spark.functions.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(13)
    H, W = 21, 29  # 420: luma grid 4x4 blocks padded, 3x4 true
    px = rng.randint(0, 256, (H, W, 3), dtype=np.uint8)
    hb, wb, cb, sb = decode_jpeg_coefficients(
        encode_jpeg(px, subsampling="420", restart_interval=2)
    )
    hp, wp, cp, sp = decode_jpeg_coefficients(
        encode_jpeg_progressive(px, subsampling="420", restart_interval=2)
    )
    assert sp["progressive"] and not sb["progressive"]
    assert (hb, wb) == (hp, wp) == (H, W)
    h, w, comps = sp["frame"]
    mcx, mcy = -(-W // 16), -(-H // 16)
    for ci, (_cid, hi, vi, _tq) in enumerate(comps):
        ch = -(-H * vi // 2)  # true sample dims (vmax = hmax = 2)
        cw = -(-W * hi // 2)
        rows, cols = -(-ch // 8), -(-cw // 8)
        grid_b = cb[ci].reshape(mcy * vi, mcx * hi, 64)
        grid_p = cp[ci].reshape(mcy * vi, mcx * hi, 64)
        assert np.array_equal(
            grid_b[:rows, :cols], grid_p[:rows, :cols]
        ), f"component {ci} true blocks differ"
        # padding blocks: DC identical (interleaved scans cover them),
        # AC zero in the progressive stream
        pad_mask = np.ones(grid_b.shape[:2], dtype=bool)
        pad_mask[:rows, :cols] = False
        if pad_mask.any():
            assert np.array_equal(
                grid_b[pad_mask][:, 0], grid_p[pad_mask][:, 0]
            )
            assert not grid_p[pad_mask][:, 1:].any()


def test_progressive_synthesis_exact():
    """The registry-query construction: constant 16×16 macroblocks
    survive the full 10-scan pipeline exactly at every seed."""
    from datawarehouseproject_spark.functions.jpeg import (
        synth_jpeg_progressive,
        synth_jpeg_progressive_pixels,
        synth_jpeg_progressive_size,
    )

    for seed in range(60):
        w, h = synth_jpeg_progressive_size(seed)
        px = synth_jpeg_progressive_pixels(seed, w, h)
        payload = synth_jpeg_progressive(seed)
        assert b"\xff\xc2" in payload and b"\xff\xd0" in payload
        w2, h2, rgb = decode_jpeg(payload)
        assert (w2, h2) == (w, h)
        assert np.array_equal(rgb, px), f"seed {seed}"


def test_progressive_eobn_runs_decode():
    """The DECODER handles general EOBn end-of-band runs (our
    encoder only emits EOB0): handcraft a grayscale SOF2 stream
    whose AC scan codes one coefficient then covers the remaining 4
    blocks with a single EOB2 run (2^2 + 2 appended bits = 4
    blocks)."""
    import struct

    from datawarehouseproject_spark.functions.jpeg import (
        _BitWriter,
        _DC_LUMA_SPEC,
        _build_codes,
        _dht_payload,
        _marker,
        _Q_LUMA,
    )

    H, W = 8, 40  # 5 blocks in one row
    out = bytearray(b"\xff\xd8")
    out += _marker(0xFFDB, bytes([0]) + bytes(int(x) for x in _Q_LUMA[ZIGZAG]))
    out += _marker(0xFFC2, struct.pack(">BHHB", 8, H, W, 1) + bytes([1, 0x11, 0]))
    out += _marker(0xFFC4, _dht_payload(0x00, _DC_LUMA_SPEC))
    # custom AC table: EOB0 (0x00), run0/size1 (0x01), EOB2 (0x20)
    ac_spec = ([0, 3] + [0] * 14, [0x00, 0x01, 0x20])
    out += _marker(0xFFC4, _dht_payload(0x10, ac_spec))
    dc_codes = _build_codes(_DC_LUMA_SPEC)
    ac_codes = _build_codes(ac_spec)
    # scan 1: DC first (Ss=0 Se=0 Ah=0 Al=0), all DC = 0
    out += _marker(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    wtr = _BitWriter()
    for _ in range(5):
        code, ln = dc_codes[0]
        wtr.write(code, ln)
    out += wtr.flush()
    # scan 2: AC first (Ss=1 Se=63): block 0 gets coef[1]=+1 then
    # EOB0; blocks 1-4 covered by EOB2 + appended bits 00 (run = 4)
    out += _marker(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    wtr = _BitWriter()
    code, ln = ac_codes[0x01]
    wtr.write(code, ln)
    wtr.write(1, 1)  # amplitude +1
    code, ln = ac_codes[0x00]
    wtr.write(code, ln)
    code, ln = ac_codes[0x20]
    wtr.write(code, ln)
    wtr.write(0, 2)  # appended bits: eobrun = 4 + 0
    out += wtr.flush()
    out += b"\xff\xd9"
    h, w, coeff, state = decode_jpeg_coefficients(bytes(out))
    assert (h, w) == (H, W) and state["progressive"]
    assert coeff[0][0, 1] == 1
    assert not coeff[0][0, 2:].any()
    assert not coeff[0][1:].any()


def test_progressive_malformed_scans_raise():
    """Structural validation: multi-component AC scans and full-band
    DC scans are illegal in progressive mode; truncated scan data
    quarantines as ValueError."""
    from datawarehouseproject_spark.functions.jpeg import (
        encode_jpeg_progressive,
    )

    px = np.full((16, 16, 3), 90, dtype=np.uint8)
    payload = bytearray(encode_jpeg_progressive(px))
    # find the THIRD scan's SOS (an AC scan: 1 component, 6-byte
    # header body) and claim 2 components
    sos_positions = []
    i = 0
    while True:
        i = payload.find(b"\xff\xda", i + 1)
        if i < 0:
            break
        sos_positions.append(i)
    assert len(sos_positions) == 10
    ac_sos = sos_positions[1]
    assert payload[ac_sos + 4] == 1  # single-component AC scan
    bad = bytearray(payload)
    bad[ac_sos + 4] = 2
    with pytest.raises(ValueError):
        decode_jpeg_coefficients(bytes(bad))
    with pytest.raises(ValueError):
        decode_jpeg_coefficients(bytes(payload[: len(payload) - 20]))


def test_malformed_dht_oversized_symbol_quarantines_not_overflow():
    """A DHT defining a DC symbol >= 64 drives read_bits(sym) to
    values too large for the int64 coefficient store; the resulting
    OverflowError must surface as the quarantine ValueError (review
    r8 pass 1 — fuzz-found escape)."""
    import struct

    payload = bytearray(synth_jpeg(3))
    i = payload.find(b"\xff\xc4")  # first DHT (DC luma)
    # spec bytes: [tc_th][bits x16][vals...]; put symbol 70 as the
    # single length-2 code
    (seglen,) = struct.unpack_from(">H", payload, i + 2)
    body = bytearray(payload[i + 4 : i + 2 + seglen])
    body[1:17] = bytes([0, 1] + [0] * 14)  # one code of length 2
    body[17] = 70  # category symbol WAY past the valid 0..11
    payload[i + 4 : i + 2 + seglen] = body[: seglen - 2]
    with pytest.raises(ValueError):
        decode_jpeg_coefficients(bytes(payload))


def test_missing_eoi_still_decodes():
    """A stream whose entropy data decoded completely but whose EOI
    marker was cut off (interrupted transfer) must still yield its
    pixels (review r8 pass 2 — the multi-scan rewrite briefly
    regressed this)."""
    from datawarehouseproject_spark.functions.jpeg import (
        encode_jpeg_progressive,
    )

    for seed in (3, 7):
        w, h = synth_jpeg_size(seed)
        px = synth_jpeg_pixels(seed, w, h)
        full = synth_jpeg(seed)
        assert full.endswith(b"\xff\xd9")
        _, _, rgb = decode_jpeg(full[:-2])
        assert np.array_equal(rgb, px)
    # progressive too: EOI after the final scan
    px = synth_jpeg_pixels(5, 32, 16)
    prog = encode_jpeg_progressive(px, subsampling="420")
    _, _, a = decode_jpeg(prog)
    _, _, b = decode_jpeg(prog[:-2])
    assert np.array_equal(a, b)
