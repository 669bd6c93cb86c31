"""Standalone (multi-page) TIFF container scan.

Scanned-document corpora arrive as multi-page TIFFs — one IFD per
page, chained by the next-IFD pointer that the EXIF profile
(:mod:`.exif`, which embeds a TIFF structure inside JPEG APP1) never
uses. This module reuses the same IFD machinery (``_read_ifd``,
both byte orders, inline-vs-offset values) and adds the page chain:
triage answers "how many pages, what dims/bit depth/compression,
is the chain intact?" from the directory structures alone — strip
DATA is never read. Format facts are public (TIFF 6.0 spec):

- header: ``II``/``MM`` + magic 42 + u32 offset of IFD0;
- each IFD: u16 entry count, 12-byte entries (tag, type, count,
  value-or-offset), then a u32 offset of the NEXT IFD (0 = last);
- baseline page tags: ImageWidth 0x0100, ImageLength 0x0101,
  BitsPerSample 0x0102, Compression 0x0103 (1 = none, 5 = LZW,
  7 = JPEG), PhotometricInterpretation 0x0106.

Pixel decode (strip/LZW/CCITT) is out of scope by design — the
documented boundary; the synthesizer is this module's own, with the
byte order alternating per seed like the EXIF fixtures.
"""

from __future__ import annotations

import struct

from .exif import _TYPE_SIZES, _read_ifd

TAG_WIDTH = 0x0100
TAG_HEIGHT = 0x0101
TAG_BITS = 0x0102
TAG_COMPRESSION = 0x0103
TAG_PHOTOMETRIC = 0x0106


def _int_value(v: tuple | None, endian: str) -> int | None:
    """SHORT or LONG scalar from an IFD entry (TIFF integer tags may
    legally use either type)."""
    if v is None:
        return None
    typ, _count, raw = v
    if typ == 3:
        if len(raw) < 2:
            raise ValueError("SHORT value shorter than 2 bytes")
        return struct.unpack_from(endian + "H", raw, 0)[0]
    if typ == 4:
        if len(raw) < 4:
            raise ValueError("LONG value shorter than 4 bytes")
        return struct.unpack_from(endian + "I", raw, 0)[0]
    raise ValueError(f"expected SHORT/LONG, got TIFF type {typ}")


def synth_tiff_pages(seed: int) -> list[dict]:
    """Page plan, mirrored in the DuckDB oracle: 1 + seed%4 pages;
    page p is (40 + (seed*3 + p*7) % 500) × (30 + (seed*11 + p*13)
    % 400), bits 1/8/8 and compression 1/5/7 rotating with p."""
    out = []
    for p in range(1 + seed % 4):
        out.append(
            {
                "width": 40 + (seed * 3 + p * 7) % 500,
                "height": 30 + (seed * 11 + p * 13) % 400,
                "bits": (1, 8, 8)[(seed + p) % 3],
                "compression": (1, 5, 7)[(seed + p) % 3],
            }
        )
    return out


def synth_tiff(seed: int) -> bytes:
    """Multi-page TIFF: header + chained IFDs (even seeds II, odd
    MM), one IFD per page with the plan's tags. Strip data is a
    small deterministic filler per page (the scan never reads it,
    but offsets must be internally consistent)."""
    endian = "<" if seed % 2 == 0 else ">"
    bom = b"II" if seed % 2 == 0 else b"MM"
    pages = synth_tiff_pages(seed)
    # layout: header(8) | per page: filler data then IFD
    out = bytearray(bom + struct.pack(endian + "HI", 42, 0))
    ifd_offsets = []
    for p, page in enumerate(pages):
        filler = bytes((seed + p + j) % 256 for j in range(10 + p))
        data_off = len(out)
        out += filler
        if len(out) % 2:
            out += b"\x00"  # TIFF requires word-aligned IFDs
        ifd_offsets.append(len(out))
        entries = [
            (TAG_WIDTH, 4, 1, struct.pack(endian + "I", page["width"])),
            (TAG_HEIGHT, 3, 1, struct.pack(endian + "H", page["height"]) + b"\x00\x00"),
            (TAG_BITS, 3, 1, struct.pack(endian + "H", page["bits"]) + b"\x00\x00"),
            (TAG_COMPRESSION, 3, 1, struct.pack(endian + "H", page["compression"]) + b"\x00\x00"),
            (TAG_PHOTOMETRIC, 3, 1, struct.pack(endian + "H", 1) + b"\x00\x00"),
            (0x0111, 4, 1, struct.pack(endian + "I", data_off)),  # StripOffsets
            (0x0117, 4, 1, struct.pack(endian + "I", len(filler))),  # ByteCounts
        ]
        out += struct.pack(endian + "H", len(entries))
        for tag, typ, count, val in sorted(entries):
            out += struct.pack(endian + "HHI", tag, typ, count)
            out += (val + b"\x00\x00\x00\x00")[:4]
        out += struct.pack(endian + "I", 0)  # next-IFD placeholder
    # link the chain: header -> IFD0, each IFD -> next
    struct.pack_into(endian + "I", out, 4, ifd_offsets[0])
    for p in range(len(pages) - 1):
        # next-IFD pointer sits after the 7 entries of IFD p
        ptr = ifd_offsets[p] + 2 + 12 * 7
        struct.pack_into(endian + "I", out, ptr, ifd_offsets[p + 1])
    return bytes(out)


def scan_tiff(payload: bytes, max_pages: int = 10_000) -> dict:
    """Walk the IFD chain: per-page dims/bits/compression, page
    count, total pixel count. Returns ``byte_order``, ``n_pages``,
    ``width``/``height``/``bits_per_sample``/``compression`` of
    page 0, ``total_pixels`` (sum of w·h over pages),
    ``payload_bytes``. Raises ``ValueError`` on malformed structure,
    including next-IFD CYCLES (a crafted loop must not hang — the
    tar negative-size lesson)."""
    if len(payload) < 8:
        raise ValueError("truncated TIFF header")
    bom = payload[:2]
    if bom == b"II":
        endian = "<"
    elif bom == b"MM":
        endian = ">"
    else:
        raise ValueError(f"bad TIFF byte-order mark {bom!r}")
    magic, off = struct.unpack_from(endian + "HI", payload, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    pages = []
    seen: set[int] = set()
    while off != 0:
        if off in seen:
            raise ValueError("next-IFD pointer cycle")
        if len(pages) >= max_pages:
            raise ValueError("IFD chain exceeds max_pages")
        seen.add(off)
        ifd = _read_ifd(payload, endian, off)
        w = _int_value(ifd.get(TAG_WIDTH), endian)
        h = _int_value(ifd.get(TAG_HEIGHT), endian)
        if w is None or h is None:
            raise ValueError("page IFD missing ImageWidth/ImageLength")
        pages.append(
            {
                "width": w,
                "height": h,
                "bits": _int_value(ifd.get(TAG_BITS), endian) or 1,
                "compression": _int_value(ifd.get(TAG_COMPRESSION), endian)
                or 1,
            }
        )
        (n,) = struct.unpack_from(endian + "H", payload, off)
        ptr = off + 2 + 12 * n
        if ptr + 4 > len(payload):
            raise ValueError("truncated next-IFD pointer")
        (off,) = struct.unpack_from(endian + "I", payload, ptr)
    if not pages:
        raise ValueError("empty IFD chain")
    return {
        "byte_order": bom.decode(),
        "n_pages": len(pages),
        "width": pages[0]["width"],
        "height": pages[0]["height"],
        "bits_per_sample": pages[0]["bits"],
        "compression": pages[0]["compression"],
        "total_pixels": sum(p["width"] * p["height"] for p in pages),
        "payload_bytes": len(payload),
    }
