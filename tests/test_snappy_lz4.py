"""Snappy + LZ4 decoders — functions/snappy.py, functions/lz4_codec.py
(round 9): the big-data block-codec pair, pinned against the
reference C implementations behind pyarrow.Codec; xxHash32 pinned on
published vectors AND live through every LZ4 frame checksum."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from datawarehouseproject_spark.functions.lz4_codec import (
    decode_lz4_block,
    decode_lz4_frame,
    scan_lz4_frame,
    synth_lz4,
    synth_lz4_plan,
    xxh32,
)
from datawarehouseproject_spark.functions.snappy import decode_snappy


def _shapes():
    rnd = random.Random(3)
    return [
        b"",
        b"a",
        b"hello hello hello hello world" * 50,
        bytes(rnd.randrange(256) for _ in range(5000)),
        b"\x00" * 100_000,                     # deep RLE overlap copies
        (b"abc" * 30_000) + bytes(rnd.randrange(256) for _ in range(1000)),
        bytes(range(256)) * 400,
        b"The quick brown fox. " * 20_000,     # multi-block linked frame
        bytes(rnd.randrange(256) for _ in range(200_000)),  # stored blocks
    ]


def test_xxh32_published_vectors():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F
    assert xxh32(b"Nobody inspects the spammish repetition", seed=42) != (
        xxh32(b"Nobody inspects the spammish repetition")
    )


def test_snappy_pinned_against_reference_c():
    codec = pa.Codec("snappy")
    for d in _shapes():
        assert decode_snappy(bytes(codec.compress(d))) == d, len(d)


def test_lz4_block_pinned_against_reference_c():
    codec = pa.Codec("lz4_raw")
    for d in _shapes():
        assert decode_lz4_block(bytes(codec.compress(d))) == d, len(d)


def test_lz4_frame_pinned_including_linked_blocks():
    codec = pa.Codec("lz4")
    for d in _shapes():
        assert decode_lz4_frame(bytes(codec.compress(d))) == d, len(d)


def test_lz4_frame_header_checksum_is_verified():
    payload = bytearray(pa.Codec("lz4").compress(b"abc" * 100))
    # descriptor starts at byte 4; find the header-checksum byte by
    # corrupting FLG and expecting the checksum to catch it
    payload[4] ^= 0x08  # toggle content-size flag
    with pytest.raises(ValueError):
        decode_lz4_frame(bytes(payload))


def test_lz4_content_checksum_is_verified_when_present():
    """pyarrow's writer sets FLG 0x60 (no content checksum), so a
    literal flip can legitimately decode to different bytes — that's
    the format, not the decoder.  Build a checksummed frame (FLG
    0x64, stored block) and prove the verification path is LIVE:
    clean decodes, one flipped content byte raises."""
    import struct

    data = b"integrity matters " * 10
    flg, bd = 0x64, 0x40
    desc = bytes([flg, bd])
    header = (
        struct.pack("<I", 0x184D2204)
        + desc
        + bytes([(xxh32(desc) >> 8) & 0xFF])
    )
    block = struct.pack("<I", 0x80000000 | len(data)) + data
    frame = (
        header + block + struct.pack("<I", 0) + struct.pack("<I", xxh32(data))
    )
    assert decode_lz4_frame(frame) == data
    bad = bytearray(frame)
    bad[len(header) + 4 + 3] ^= 0x01  # a content byte inside the block
    with pytest.raises(ValueError, match="content checksum"):
        decode_lz4_frame(bytes(bad))


def test_snappy_malformed_inputs_raise():
    good = bytes(pa.Codec("snappy").compress(b"x" * 1000))
    for cut in (0, 1, len(good) // 2, len(good) - 1):
        with pytest.raises(ValueError):
            decode_snappy(good[:cut])
    with pytest.raises(ValueError):
        decode_snappy(b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff")
    # declared length beyond cap
    with pytest.raises(ValueError):
        decode_snappy(b"\x80\x80\x80\x80\x40", max_output=1 << 20)


def test_lz4_offset_zero_and_overruns_raise():
    with pytest.raises(ValueError):
        # token: 1 literal + match, offset 0 (invalid)
        decode_lz4_block(b"\x10A\x00\x00")
    with pytest.raises(ValueError):
        decode_lz4_block(b"\x10A\x09\x00")  # offset 9 > history 1


def test_synth_plan_matches_scan():
    for seed in range(12):
        st = scan_lz4_frame(synth_lz4(seed))
        n = synth_lz4_plan(seed)["n_bytes"]
        assert st["n_bytes"] == n, seed
        assert st["byte_sum"] == sum(
            ((i // 5) * 7 + seed) % 240 for i in range(n)
        ), seed
