"""FLAC metadata structure scan: STREAMINFO + Vorbis comments.

The lossless-audio counterpart of the MP3/ID3 triage pair: an audio
corpus answers "how long, what rate/depth/channels, what's it
called?" from the metadata blocks at the FRONT of the file — tens of
bytes per multi-MB track, no frame decode. Format facts are public
(the FLAC format spec, RFC 9639):

- ``fLaC`` magic, then metadata blocks: 1 header byte (bit 7 =
  last-block flag, bits 0-6 = type), 24-bit BE length, body;
- STREAMINFO (type 0, exactly 34 bytes): u16be min/max blocksize,
  u24be min/max framesize, then a 64-bit BE field packing sample
  rate (20 bits), channels-1 (3), bits-per-sample-1 (5), total
  samples (36), then the 16-byte MD5 of the raw PCM;
- VORBIS_COMMENT (type 4): u32le vendor length + vendor string,
  u32le comment count, then per comment u32le length +
  ``KEY=value`` UTF-8.

Subband/LPC frame decode is out of scope by design (the documented
boundary, like Layer III); the synthesizer is this module's own.
"""

from __future__ import annotations

import struct

BLOCK_STREAMINFO = 0
BLOCK_VORBIS_COMMENT = 4


def _block(btype: int, body: bytes, last: bool) -> bytes:
    hdr = ((0x80 if last else 0) | btype).to_bytes(1, "big")
    return hdr + len(body).to_bytes(3, "big") + body


def synth_flac_params(seed: int) -> dict:
    """Stream plan, mirrored in the DuckDB oracle."""
    rate = (44100, 48000, 96000, 22050)[seed % 4]
    total = 1000 + (seed * 37) % 100000
    return {
        "sample_rate": rate,
        "channels": 1 + seed % 2,
        "bits_per_sample": (16, 24)[seed % 2],
        "total_samples": total,
        "duration_ms": total * 1000 // rate,
        "title": f"track-{seed % 50}",
    }


def synth_flac(seed: int) -> bytes:
    p = synth_flac_params(seed)
    packed = (
        (p["sample_rate"] << 44)
        | ((p["channels"] - 1) << 41)
        | ((p["bits_per_sample"] - 1) << 36)
        | p["total_samples"]
    )
    streaminfo = (
        struct.pack(">HH", 4096, 4096)
        + (14 + seed % 999).to_bytes(3, "big")  # min framesize
        + (9000 + seed % 999).to_bytes(3, "big")  # max framesize
        + packed.to_bytes(8, "big")
        + bytes((seed + j) % 256 for j in range(16))  # MD5 placeholder
    )
    title = p["title"].encode()
    vendor = b"datawarehouseproject_spark"
    vorbis = (
        struct.pack("<I", len(vendor))
        + vendor
        + struct.pack("<I", 2)
        + struct.pack("<I", len(b"TITLE=") + len(title))
        + b"TITLE="
        + title
        + struct.pack("<I", len(b"ENCODER=synth"))
        + b"ENCODER=synth"
    )
    frames = bytes((seed * 3 + j) % 256 for j in range(20 + seed % 40))
    return (
        b"fLaC"
        + _block(BLOCK_STREAMINFO, streaminfo, last=False)
        + _block(BLOCK_VORBIS_COMMENT, vorbis, last=True)
        + frames
    )


def scan_flac(payload: bytes) -> dict:
    """Walk the metadata blocks: STREAMINFO bit unpacking + the
    TITLE Vorbis comment. Returns ``sample_rate``, ``channels``,
    ``bits_per_sample``, ``total_samples``, ``duration_ms`` (integer
    floor), ``title`` (None if absent), ``n_blocks``,
    ``payload_bytes``. Raises ``ValueError`` on malformed structure
    (the permissive-quarantine contract)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    pos = 4
    info = None
    title = None
    n_blocks = 0
    last = False
    while not last:
        if pos + 4 > len(payload):
            raise ValueError("truncated metadata block header")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated metadata block body")
        n_blocks += 1
        if btype == BLOCK_STREAMINFO:
            if blen != 34:
                raise ValueError("STREAMINFO must be 34 bytes")
            packed = int.from_bytes(body[10:18], "big")
            rate = packed >> 44
            if rate == 0:
                raise ValueError("invalid zero sample rate")
            info = {
                "sample_rate": rate,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bits_per_sample": ((packed >> 36) & 0x1F) + 1,
                "total_samples": packed & ((1 << 36) - 1),
            }
        elif btype == BLOCK_VORBIS_COMMENT:
            vp = 0
            if vp + 4 > blen:
                raise ValueError("truncated vorbis vendor length")
            (vlen,) = struct.unpack_from("<I", body, vp)
            vp += 4 + vlen
            if vp + 4 > blen:
                raise ValueError("truncated vorbis comment count")
            (count,) = struct.unpack_from("<I", body, vp)
            vp += 4
            for _ in range(count):
                if vp + 4 > blen:
                    raise ValueError("truncated vorbis comment length")
                (clen,) = struct.unpack_from("<I", body, vp)
                vp += 4
                if vp + clen > blen:
                    raise ValueError("vorbis comment past block end")
                rec = body[vp : vp + clen]
                vp += clen
                key, _, value = rec.partition(b"=")
                if key.upper() == b"TITLE":
                    title = value.decode("utf-8")
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + blen
    if info is None:
        raise ValueError("no STREAMINFO block (must be first per spec)")
    return {
        **info,
        "duration_ms": info["total_samples"] * 1000 // info["sample_rate"],
        "title": title,
        "n_blocks": n_blocks,
        "payload_bytes": len(payload),
    }
