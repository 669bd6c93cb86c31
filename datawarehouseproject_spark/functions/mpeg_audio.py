"""MPEG audio (MP3) frame-structure codec: header walk + synthesis.

The corpus-scale question for audio is rarely "give me PCM" — it is
"how long is this, at what bitrate, is it CBR/VBR, is the container
intact?" (ffprobe's job). This module implements that REAL bit-level
structure parse for MPEG-1 Layer III streams — ID3v2 skip, frame
sync, header field decode, bitrate/sample-rate tables, padding, and
the 144·bitrate/samplerate frame-length walk — with a deterministic
synthesizer so every extracted statistic is integer-exact and
DuckDB-oracle-checkable. Full subband/IMDCT PCM decode remains the
documented extension point (SURVEY §8.4); frame structure is what
this engine extracts natively, mirroring the JPEG split
(metadata + entropy layer native, full pixel pipeline for
PIL/ffmpeg).

Format facts used (all public, ISO/IEC 11172-3):

- frame header: 11 sync bits ``11111111111``, 2 version bits
  (``11`` = MPEG-1), 2 layer bits (``01`` = Layer III), 1 protection
  bit, 4 bitrate-index bits, 2 sample-rate bits, 1 padding bit, …;
- MPEG-1 Layer III bitrates (kbps) indexed 1..14:
  32 40 48 56 64 80 96 112 128 160 192 224 256 320;
- sample rates indexed 0..2: 44100, 48000, 32000 Hz;
- frame bytes = 144_000·kbps / rate + padding;
- 1152 samples per frame;
- ID3v2 prefix: ``ID3`` + version(2) + flags(1) + syncsafe u28 size.
"""

from __future__ import annotations

BITRATES_KBPS = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
SAMPLE_RATES = (44100, 48000, 32000)
SAMPLES_PER_FRAME = 1152


def frame_length(kbps: int, rate: int, padding: int) -> int:
    return (144_000 * kbps) // rate + padding


def _frame_header(bitrate_idx: int, rate_idx: int, padding: int) -> bytes:
    b0 = 0xFF
    b1 = 0b11111011  # sync(3) + MPEG-1 (11) + Layer III (01) + no-CRC (1)
    b2 = (bitrate_idx << 4) | (rate_idx << 2) | (padding << 1)
    b3 = 0b11000100  # mono, no mode ext, not copyrighted, original
    return bytes([b0, b1, b2, b3])


def synth_mp3_params(seed: int) -> tuple[int, list[int], list[int]]:
    """(sample-rate index, per-frame bitrate indices, paddings) for
    the deterministic test stream: 6 + seed%7 frames, bitrate index
    cycling over the table (a VBR stream), padding alternating from
    the seed — all modular arithmetic, mirrored in the oracle."""
    n_frames = 6 + seed % 7
    rate_idx = seed % 3
    bitrate_idxs = [1 + (seed + i * 5) % 14 for i in range(n_frames)]
    paddings = [(seed + i) % 2 for i in range(n_frames)]
    return rate_idx, bitrate_idxs, paddings


def synth_mp3(seed: int) -> bytes:
    """A REAL MPEG-1 Layer III frame sequence (VBR) behind an ID3v2
    tag whose size exercises the syncsafe decode. Frame payloads are
    deterministic filler — the scanner never reads them, only the
    header-walk arithmetic places the next sync."""
    rate_idx, bitrate_idxs, paddings = synth_mp3_params(seed)
    rate = SAMPLE_RATES[rate_idx]
    tag_body = bytes((seed + j) % 256 for j in range(seed % 100))
    n = len(tag_body)
    syncsafe = bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )
    out = bytearray(b"ID3\x04\x00\x00" + syncsafe + tag_body)
    for i, (bi, pad) in enumerate(zip(bitrate_idxs, paddings)):
        flen = frame_length(BITRATES_KBPS[bi], rate, pad)
        out += _frame_header(bi, rate_idx, pad)
        body = flen - 4
        out += bytes((seed * 3 + i + j) % 256 for j in range(body))
    return bytes(out)


def scan_mp3(payload: bytes) -> dict:
    """Walk the frame structure of an MPEG-1 Layer III stream.

    Skips an ID3v2 tag if present, then requires a valid frame sync
    at every step (no resync scanning — a corrupt offset raises, so
    one bad payload poisons one row under the permissive harness,
    never silently miscounts). Returns integer-exact statistics:
    ``n_frames``, ``total_samples`` (frames × 1152),
    ``sample_rate``, ``sum_kbps`` (sum of per-frame bitrates — VBR
    mean = sum/frames without float drift), ``n_padded``,
    ``payload_bytes``.
    """
    pos = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("truncated ID3v2 header")
        sz = payload[6:10]
        if any(b & 0x80 for b in sz):
            raise ValueError("invalid ID3v2 syncsafe size")
        pos = 10 + ((sz[0] << 21) | (sz[1] << 14) | (sz[2] << 7) | sz[3])
    n_frames = 0
    sum_kbps = 0
    n_padded = 0
    sample_rate = None
    while pos < len(payload):
        hdr = payload[pos : pos + 4]
        if len(hdr) < 4:
            raise ValueError("truncated MPEG frame header")
        if hdr[0] != 0xFF or (hdr[1] & 0xE0) != 0xE0:
            raise ValueError(f"lost frame sync at byte {pos}")
        version = (hdr[1] >> 3) & 0x3
        layer = (hdr[1] >> 1) & 0x3
        if version != 0b11 or layer != 0b01:
            raise ValueError(
                "only MPEG-1 Layer III frame structure supported"
            )
        bi = (hdr[2] >> 4) & 0xF
        ri = (hdr[2] >> 2) & 0x3
        pad = (hdr[2] >> 1) & 0x1
        if bi in (0, 15):
            raise ValueError("free-form/invalid bitrate index")
        if ri == 3:
            raise ValueError("reserved sample-rate index")
        rate = SAMPLE_RATES[ri]
        if sample_rate is None:
            sample_rate = rate
        elif rate != sample_rate:
            raise ValueError("sample rate changed mid-stream")
        kbps = BITRATES_KBPS[bi]
        flen = frame_length(kbps, rate, pad)
        if pos + flen > len(payload):
            raise ValueError("truncated final MPEG frame")
        n_frames += 1
        sum_kbps += kbps
        n_padded += pad
        pos += flen
    if n_frames == 0:
        raise ValueError("no MPEG frames found")
    return {
        "n_frames": n_frames,
        "total_samples": n_frames * SAMPLES_PER_FRAME,
        "sample_rate": sample_rate,
        "sum_kbps": sum_kbps,
        "n_padded": n_padded,
        "payload_bytes": len(payload),
    }
