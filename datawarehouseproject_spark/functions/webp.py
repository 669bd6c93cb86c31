"""WebP (RIFF) container structure scan: the web image format's
triage layer.

WebP is the second-most-served lossy web image format after JPEG; a
crawl corpus triages it the same way ("what are the dimensions, is
there alpha, is it animated, is the container intact?") before any
pixel work. Format facts are public (RFC 9649 container spec + RFC
6386 VP8 bitstream):

- RIFF envelope: ``RIFF`` + u32le file size + ``WEBP``; chunks are
  fourcc + u32le size + payload, padded to even offsets;
- ``VP8 `` (lossy): 3-byte frame tag (a 24-bit LE value, LSB-first
  fields: frame type 1 bit — 0 = keyframe, version 3, show_frame 1,
  first-partition size 19), keyframe start code ``9D 01 2A``, then
  two 16-bit LE values: 14-bit width + 2-bit horizontal scale, same
  for height;
- ``VP8L`` (lossless): signature byte ``0x2F``, then one 32-bit LE
  value read LSB-first: width-1 (14 bits), height-1 (14 bits),
  alpha-is-used (1), version (3, must be 0);
- ``VP8X`` (extended): 1 flag byte (MSB→LSB: 2 reserved, ICC,
  Alpha, EXIF, XMP, Animation, 1 reserved), 3 reserved bytes, then
  24-bit LE canvas width-1 and height-1.

VP8 entropy decode (boolean arithmetic coder + DCT) is out of scope
by design — the documented boundary, like H.264's CAVLC: triage
reads tens of header bytes per multi-hundred-KB image. The
synthesizer is this module's own (no stdlib WebP writer exists);
the three profiles ROTATE with the seed so every batch exercises
lossy, lossless, and extended layouts, including odd-sized chunks
that force RIFF padding.
"""

from __future__ import annotations

import struct

_VP8_START = b"\x9d\x01\x2a"


def _riff_chunk(fourcc: bytes, body: bytes) -> bytes:
    out = fourcc + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        out += b"\x00"  # RIFF pads chunks to even offsets
    return out


def _vp8_chunk(width: int, height: int, filler: bytes) -> bytes:
    """A VP8 keyframe header with deterministic filler in place of
    the entropy-coded partitions (structure scan never reads it)."""
    part_size = len(filler)
    tag = (part_size << 5) | (1 << 4) | (0 << 1) | 0  # show, v0, keyframe
    body = (
        struct.pack("<I", tag)[:3]
        + _VP8_START
        + struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
        + filler
    )
    return _riff_chunk(b"VP8 ", body)


def _vp8l_chunk(width: int, height: int, alpha: int, filler: bytes) -> bytes:
    bits = (width - 1) | ((height - 1) << 14) | (alpha << 28) | (0 << 29)
    body = b"\x2f" + struct.pack("<I", bits) + filler
    return _riff_chunk(b"VP8L", body)


def _vp8x_chunk(
    width: int, height: int, alpha: int, exif: int, anim: int
) -> bytes:
    flags = (alpha << 4) | (exif << 3) | (anim << 1)
    body = (
        bytes([flags, 0, 0, 0])
        + struct.pack("<I", width - 1)[:3]
        + struct.pack("<I", height - 1)[:3]
    )
    return _riff_chunk(b"VP8X", body)


def synth_webp_params(seed: int) -> dict:
    """Profile plan, mirrored in the DuckDB oracle. seed%3 rotates
    the layout: 0 → lossy VP8, 1 → lossless VP8L (alpha bit =
    seed%2), 2 → extended VP8X (alpha flag, EXIF chunk when seed%2,
    embedded VP8 bitstream)."""
    kind = ("VP8", "VP8L", "VP8X")[seed % 3]
    return {
        "fmt": kind,
        "width": 20 + (seed * 3) % 2000,
        "height": 12 + (seed * 11) % 1500,
        "alpha": 0 if kind == "VP8" else seed % 2,
        "exif": 1 if kind == "VP8X" and seed % 2 else 0,
        "filler": 17 + seed % 48,  # odd sizes exercise RIFF padding
    }


def synth_webp(seed: int) -> bytes:
    p = synth_webp_params(seed)
    filler = bytes((seed + j) % 256 for j in range(p["filler"]))
    if p["fmt"] == "VP8":
        chunks = _vp8_chunk(p["width"], p["height"], filler)
    elif p["fmt"] == "VP8L":
        chunks = _vp8l_chunk(p["width"], p["height"], p["alpha"], filler)
    else:
        chunks = _vp8x_chunk(
            p["width"], p["height"], p["alpha"], p["exif"], 0
        )
        if p["exif"]:
            # deliberately odd-sized metadata chunk -> padding byte
            chunks += _riff_chunk(b"EXIF", b"II*\x00" + filler[:5])
        chunks += _vp8_chunk(p["width"], p["height"], filler)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def scan_webp(payload: bytes) -> dict:
    """Walk the RIFF container and the image-header bytes of the
    first bitstream chunk. Returns ``fmt`` (VP8/VP8L/VP8X),
    integer-exact ``width``/``height`` (canvas dims for VP8X),
    ``has_alpha``, ``has_exif``, ``has_animation``, ``n_chunks``,
    ``payload_bytes``. Raises ``ValueError`` on malformed structure
    (the permissive-quarantine contract), never ``struct.error``."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if payload[8:12] != b"WEBP":
        raise ValueError("RIFF payload is not WebP")
    if 8 + riff_size > len(payload):
        raise ValueError("RIFF size past end of payload")
    pos = 12
    fmt = None
    width = height = None
    has_alpha = has_exif = has_anim = 0
    n_chunks = 0
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {fourcc!r} chunk")
        n_chunks += 1
        if fourcc == b"VP8 " and fmt is None:
            fmt = "VP8"
            if len(body) < 10:
                raise ValueError("truncated VP8 frame header")
            tag = int.from_bytes(body[:3], "little")
            if tag & 1:
                raise ValueError("VP8 chunk does not start with a keyframe")
            if body[3:6] != _VP8_START:
                raise ValueError("bad VP8 keyframe start code")
            (wraw, hraw) = struct.unpack_from("<HH", body, 6)
            width, height = wraw & 0x3FFF, hraw & 0x3FFF
        elif fourcc == b"VP8L" and fmt is None:
            fmt = "VP8L"
            if len(body) < 5:
                raise ValueError("truncated VP8L header")
            if body[0] != 0x2F:
                raise ValueError("bad VP8L signature byte")
            (bits,) = struct.unpack_from("<I", body, 1)
            if (bits >> 29) & 0x7:
                raise ValueError("unknown VP8L version")
            width = (bits & 0x3FFF) + 1
            height = ((bits >> 14) & 0x3FFF) + 1
            has_alpha = (bits >> 28) & 1
        elif fourcc == b"VP8X":
            if fmt is not None:
                raise ValueError("VP8X must be the first chunk")
            fmt = "VP8X"
            if len(body) != 10:
                raise ValueError("VP8X chunk must be 10 bytes")
            flags = body[0]
            has_alpha = (flags >> 4) & 1
            has_exif = (flags >> 3) & 1
            has_anim = (flags >> 1) & 1
            width = int.from_bytes(body[4:7], "little") + 1
            height = int.from_bytes(body[7:10], "little") + 1
        # metadata chunks (EXIF/XMP/ICCP/ANIM...) and the bitstream
        # inside a VP8X container: counted, not re-parsed for dims
        pos += 8 + size + (size % 2)
    if fmt is None:
        raise ValueError("no WebP bitstream chunk found")
    return {
        "fmt": fmt,
        "width": width,
        "height": height,
        "has_alpha": int(has_alpha),
        "has_exif": int(has_exif),
        "has_animation": int(has_anim),
        "n_chunks": n_chunks,
        "payload_bytes": len(payload),
    }
