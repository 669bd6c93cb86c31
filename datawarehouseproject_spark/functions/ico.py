"""ICO (favicon) container scan.

The web-crawl companion of :mod:`.webp`: every site ships favicons,
and an ICO is a little directory of images at multiple sizes whose
entries are either PNG payloads or headerless DIBs. Triage answers
"how many sizes, what's the largest, PNG or BMP entries?" from the
6-byte header + 16-byte directory entries alone. Format facts are
public (the Windows ICO layout):

- header: u16le reserved(0), u16le type (1 = icon), u16le count;
- per entry: u8 width, u8 height (0 means 256), u8 colors,
  u8 reserved, u16le planes, u16le bit count, u32le byte size,
  u32le data offset;
- entry payloads: a PNG stream (sniffed by signature) or a DIB
  whose BITMAPINFOHEADER height is DOUBLED (XOR + AND masks).

Pixel decode of DIB entries reuses no new machinery and is out of
scope; PNG entries decode via :mod:`.png` when needed. The
synthesizer builds mixed PNG/DIB icons with formula dims.
"""

from __future__ import annotations

import struct

from .png import PNG_SIG, encode_png


def synth_ico_entries(seed: int) -> list[dict]:
    """Entry plan, mirrored in the DuckDB oracle: 1 + seed%4
    entries; entry i is (8 + ((seed + i*5) % 25) * 8) px square —
    multiples of 8 from 8..200, so the 0-means-256 encoding is NOT
    hit by the plan (it is hand-tested) — PNG when (seed+i)%2 else
    DIB."""
    out = []
    for i in range(1 + seed % 4):
        size = 8 + ((seed + i * 5) % 25) * 8
        out.append({"size": size, "is_png": (seed + i) % 2 == 1})
    return out


def synth_ico(seed: int) -> bytes:
    import numpy as np

    entries = synth_ico_entries(seed)
    blobs = []
    for i, e in enumerate(entries):
        s = e["size"]
        if e["is_png"]:
            g = np.full((s, s), (seed * 11 + i) % 256, dtype=np.uint8)
            blobs.append(encode_png(s, s, g, color_type=0))
        else:
            # headerless DIB: BITMAPINFOHEADER with DOUBLED height,
            # 32-bit pixels, then XOR data (no palette, no AND mask
            # bytes needed at 32bpp per common practice — size field
            # carries the truth either way)
            bih = struct.pack(
                "<IiiHHIIiiII", 40, s, 2 * s, 1, 32, 0, 0, 0, 0, 0, 0
            )
            # vectorized (seed + i + j) % 256 over j — the per-byte
            # genexpr was 1.1 s per 60 payloads (r14 profile).  The
            # scalar is reduced mod 256 BEFORE the int64 add (ADVICE
            # r14): a seed past int64 raised OverflowError where the
            # old pure-Python genexpr accepted arbitrary ints; the
            # result is unchanged for every int seed
            px = (
                (np.arange(4 * s * s, dtype=np.int64) + (seed + i) % 256)
                % 256
            ).astype(np.uint8).tobytes()
            blobs.append(bih + px)
    out = bytearray(struct.pack("<HHH", 0, 1, len(entries)))
    offset = 6 + 16 * len(entries)
    for e, blob in zip(entries, blobs):
        s = e["size"] % 256  # 256 encodes as 0
        out += struct.pack(
            "<BBBBHHII",
            s, s, 0, 0, 1, 32 if not e["is_png"] else 0,
            len(blob), offset,
        )
        offset += len(blob)
    for blob in blobs:
        out += blob
    return bytes(out)


def scan_ico(payload: bytes) -> dict:
    """Walk the icon directory: entry count, per-entry dims (0 →
    256) and payload kind (PNG signature vs DIB header), offsets
    validated against the payload. Returns ``n_entries``,
    ``max_size``, ``n_png``, ``n_dib``, ``payload_bytes``. Raises
    ``ValueError`` on malformed structure."""
    if len(payload) < 6:
        raise ValueError("truncated ICO header")
    reserved, ico_type, count = struct.unpack_from("<HHH", payload, 0)
    if reserved != 0 or ico_type != 1:
        raise ValueError("not an ICO payload (bad header)")
    if count == 0:
        raise ValueError("empty ICO directory")
    if 6 + 16 * count > len(payload):
        raise ValueError("ICO directory past end of payload")
    max_size = 0
    n_png = n_dib = 0
    for i in range(count):
        base = 6 + 16 * i
        w, h, _colors, _rsv, _planes, _bits, size, off = struct.unpack_from(
            "<BBBBHHII", payload, base
        )
        w = w or 256
        h = h or 256
        if w != h:
            # real favicons are square; reject rather than guess
            # which axis downstream consumers should trust
            raise ValueError(f"non-square ICO entry {w}x{h}")
        if off + size > len(payload) or size < 8:
            raise ValueError("ICO entry data out of bounds")
        max_size = max(max_size, w)
        head = payload[off : off + len(PNG_SIG)]
        if head == PNG_SIG:
            n_png += 1
        elif struct.unpack_from("<I", payload, off)[0] == 40:
            n_dib += 1  # BITMAPINFOHEADER size field
        else:
            raise ValueError(f"ICO entry {i} is neither PNG nor DIB")
    return {
        "n_entries": count,
        "max_size": max_size,
        "n_png": n_png,
        "n_dib": n_dib,
        "payload_bytes": len(payload),
    }
