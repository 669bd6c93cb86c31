"""Zstd decoder — functions/zstd_codec.py (round 9): the FSE/tANS
entropy stack, pinned against TWO independent producers (libzstd via
pyarrow, and the zstd CLI binary which writes xxh64 content
checksums by default) across levels and data shapes."""

from __future__ import annotations

import os
import random
import shutil
import struct
import subprocess

import pyarrow as pa
import pytest

from datawarehouseproject_spark.functions.zstd_codec import (
    decode_zstd,
    synth_zstd,
    synth_zstd_plan,
    xxh64,
)

# prefer the conda CLI if present, else whatever is on PATH; the two
# CLI-producer tests skip cleanly when neither exists
_ZSTD_BIN = (
    "/root/miniconda/bin/zstd"
    if os.path.exists("/root/miniconda/bin/zstd")
    else shutil.which("zstd")
)
_needs_cli = pytest.mark.skipif(
    _ZSTD_BIN is None, reason="no zstd CLI on this machine"
)


def _shapes():
    rnd = random.Random(5)
    return {
        "text": b"The quick brown fox jumps over the lazy dog. " * 12_000,
        "rand": bytes(rnd.randrange(256) for _ in range(150_000)),
        "zeros": b"\x00" * 300_000,
        "mix": b"abcabcabc" * 30_000
        + bytes(rnd.randrange(256) for _ in range(20_000)),
        "small": b"hi hi hi hi hi",
        "empty": b"",
        "one": b"x",
        "seq": bytes(range(256)) * 600,
    }


def test_xxh64_published_vectors():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert (
        xxh64(b"Nobody inspects the spammish repetition")
        == 0xFBCEA83C8A378BF1
    )


@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_pinned_against_libzstd_via_pyarrow(level):
    codec = pa.Codec("zstd", compression_level=level)
    for name, d in _shapes().items():
        assert decode_zstd(
            bytes(codec.compress(d)), max_output=1 << 24
        ) == d, (level, name)


@_needs_cli
def test_pinned_against_zstd_cli_with_checksums():
    """The CLI writes an xxh64 content checksum by default — every
    pass here live-verifies the hand-rolled xxh64 too."""
    for args in (["-3"], ["-19"], ["-1", "--no-check"], ["-3", "--long=20"]):
        for name, d in _shapes().items():
            p = subprocess.run(
                [_ZSTD_BIN, "-c", *args], input=d, capture_output=True
            )
            assert p.returncode == 0
            assert decode_zstd(p.stdout, max_output=1 << 24) == d, (
                args, name,
            )


@_needs_cli
def test_content_checksum_is_verified():
    d = b"checksum me " * 1000
    p = subprocess.run([_ZSTD_BIN, "-c", "-3"], input=d, capture_output=True)
    frame = bytearray(p.stdout)
    frame[-1] ^= 0x01  # checksum is the last 4 bytes
    with pytest.raises(ValueError, match="checksum"):
        decode_zstd(bytes(frame))


def test_concatenated_frames_and_skippable():
    a = bytes(pa.Codec("zstd").compress(b"first " * 100))
    b = bytes(pa.Codec("zstd").compress(b"second " * 100))
    skip = struct.pack("<II", 0x184D2A50, 7) + b"junk!!!"
    assert (
        decode_zstd(a + skip + b) == b"first " * 100 + b"second " * 100
    )


def test_truncations_and_garbage_raise():
    good = bytes(pa.Codec("zstd").compress(b"abcdef" * 500))
    for cut in (0, 3, 5, len(good) // 2, len(good) - 1):
        with pytest.raises(ValueError):
            decode_zstd(good[:cut])
    with pytest.raises(ValueError):
        decode_zstd(b"\x12\x34\x56\x78\x9a")


def test_declared_size_cap_is_enforced():
    big = bytes(pa.Codec("zstd").compress(b"\x00" * 1_000_000))
    with pytest.raises(ValueError, match="cap"):
        decode_zstd(big, max_output=1 << 10)


def test_synth_plan_round_trip():
    for seed in range(16):
        plan = synth_zstd_plan(seed)
        payload = synth_zstd(seed)
        got = decode_zstd(payload)
        n = plan["n_lines"]
        text = got.decode("ascii")
        assert text.count("\n") == n, seed
        first = f"row 0 doc {seed} v {(seed * 17) % 7919}"
        assert text.splitlines()[0] == first, seed
        n_frames = plan["n_frames"]
        # count frame magics (skippable-free synthesis)
        assert payload.count(b"\x28\xb5\x2f\xfd") == n_frames, seed


def test_match_offset_fenced_to_current_frame():
    """A match may not reach into a PREVIOUS concatenated frame's
    output: libzstd rejects that as corrupt, and silently copying
    those bytes would be a wrong answer, not an error.  White-box via
    _decode_sequences_exec with RLE tables (one sequence: ll=2, ml=3,
    of_code=3 + 3 zero bits -> of_value=8 -> offset 5)."""
    from datawarehouseproject_spark.functions.zstd_codec import (
        _decode_sequences_exec,
        _FrameState,
        _rle_table,
    )

    def run(frame_start):
        st = _FrameState()
        st.fse = {
            "ll": _rle_table(2),
            "of": _rle_table(3),
            "ml": _rle_table(0),
        }
        out = bytearray(b"PREV")  # a previous frame's output
        _decode_sequences_exec(
            b"xy", bytes([0x08]), 1, st, out, 1 << 20,
            frame_start=frame_start,
        )
        return bytes(out)

    # same bytes treated as same-frame history: offset 5 is in range
    # (copies out[1:4] == b"REV" from the "previous frame" bytes)
    assert run(0) == b"PREVxyREV"
    # fenced at the frame boundary: only 2 frame bytes precede the
    # match, so offset 5 must quarantine
    with pytest.raises(ValueError, match="frame"):
        run(4)
