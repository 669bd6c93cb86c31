"""Property tests for the round-6 codecs: JPEG entropy coding is
lossless for ANY image (coefficients round-trip bit-exactly), the
H.264 escape layer round-trips ANY byte string, and SPS dimension
encoding round-trips ANY even size. Hypothesis drives the inputs —
these pin the machinery on shapes the hand-written fixtures never
tried."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datawarehouseproject_spark.functions.h264 import (
    _escape,
    _unescape,
    encode_sps,
    parse_sps,
)
from datawarehouseproject_spark.functions.jpeg import (
    ZIGZAG,
    _Q_CHROMA,
    _Q_LUMA,
    _dct2,
    _to_blocks,
    decode_jpeg,
    decode_jpeg_coefficients,
    encode_jpeg,
)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_coefficients_lossless_any_image(w, h, seed):
    """Whatever the encoder quantized, the decoder's huffman pass
    must recover bit-for-bit — at every size, including 1×1 and
    non-multiples of 8."""
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    hh, ww, coeff, _ = decode_jpeg_coefficients(encode_jpeg(px))
    assert (hh, ww) == (h, w)
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
        blocks, _, _ = _to_blocks(plane - 128.0)
        qz = (
            np.round(_dct2(blocks) / q.reshape(8, 8).astype(float))
            .astype(np.int64)
            .reshape(-1, 64)[:, ZIGZAG]
        )
        assert np.array_equal(qz, coeff[ci]), f"component {ci}"


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    v=st.integers(0, 255),
)
def test_jpeg_constant_images_exact_any_size(w, h, v):
    """Any constant image at any size decodes EXACTLY (DC-only
    blocks + DC quant step 1 + gray transform fixed point)."""
    px = np.full((h, w, 3), v, dtype=np.uint8)
    w2, h2, back = decode_jpeg(encode_jpeg(px))
    assert (w2, h2) == (w, h)
    assert np.array_equal(back, px)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=120))
def test_h264_escape_roundtrip_any_bytes(raw):
    esc = _escape(raw)
    assert _unescape(esc) == raw
    # the escaped stream never emulates a start code or a stray
    # in-payload escape target
    for i in range(len(esc) - 2):
        assert not (
            esc[i] == 0 and esc[i + 1] == 0 and esc[i + 2] in (0, 1, 2)
        )


def _escape_reference(rbsp: bytes) -> bytes:
    """The original stateful per-byte escape loop, kept as the spec
    reference for the find()-based fast path (r15)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _unescape_reference(ebsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(ebsp):
        b = ebsp[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


@settings(max_examples=400, deadline=None)
@given(
    st.binary(max_size=200),
    st.lists(st.sampled_from(list(range(5)) + [255]), max_size=60),
)
def test_h264_escape_fast_paths_match_stateful_reference(raw, zeroish):
    """The r15 find()/replace() escape fast paths must match the
    stateful per-byte walk on arbitrary bytes AND zero-heavy runs
    (where the reset-after-insert subtlety lives)."""
    for data in (raw, bytes(zeroish), raw + bytes(zeroish) + raw):
        assert _escape(data) == _escape_reference(data)
        assert _unescape(data) == _unescape_reference(data)


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(1, 2048).map(lambda x: x * 2),
    h=st.integers(1, 1088).map(lambda x: x * 2),
)
def test_sps_dimensions_roundtrip_any_even_size(w, h):
    got = parse_sps(encode_sps(w, h))
    assert (got["width"], got["height"]) == (w, h)
