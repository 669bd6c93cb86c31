"""EXIF (APP1 / TIFF IFD) metadata codec for JPEG payloads.

The metadata side of a real photo corpus: camera make/model,
orientation, timestamps, exposure — stored in an APP1 segment as a
TIFF structure (byte-order mark II/MM, magic 42, linked IFDs of
12-byte entries, out-of-line values, and a pointer tag to the Exif
sub-IFD). All public format facts (TIFF 6.0 spec + EXIF 2.3); both
byte orders are exercised — real cameras ship both.

Same scaffolding pattern as the codecs: a deterministic synthesizer
(so every extracted field is modular arithmetic over the id and the
DuckDB oracle recomputes it) plus the REAL parser — marker walk,
byte-order dispatch, IFD entry decode with inline-vs-offset value
resolution, sub-IFD recursion. The parser never needs the entropy
decode: metadata triage at corpus scale reads a few hundred header
bytes per multi-MB photo, which is exactly why it is its own
operator and not a side effect of pixel decode.
"""

from __future__ import annotations

import struct

# TIFF value types: id -> byte size per element
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_XRES = 0x011A
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_EXPOSURE = 0x829A
TAG_ISO = 0x8827


def _entry(endian: str, tag: int, typ: int, count: int, value: bytes,
           heap: bytearray, heap_base: int) -> bytes:
    """One 12-byte IFD entry; values longer than 4 bytes go to the
    heap and the entry stores their offset."""
    size = _TYPE_SIZES[typ] * count
    if size <= 4:
        inline = value + b"\x00" * (4 - len(value))
        return struct.pack(endian + "HHI", tag, typ, count) + inline
    off = heap_base + len(heap)
    heap.extend(value)
    if len(heap) % 2:  # TIFF offsets must stay word-aligned
        heap.append(0)
    return struct.pack(endian + "HHI", tag, typ, count) + struct.pack(
        endian + "I", off
    )


def _ifd(endian: str, entries: list[tuple[int, int, int, bytes]],
         base: int) -> bytes:
    """Serialize an IFD at absolute TIFF offset ``base``: count,
    12-byte entries sorted by tag (the spec requires ascending
    order), next-IFD pointer 0, then the value heap."""
    entries = sorted(entries)
    heap_base = base + 2 + 12 * len(entries) + 4
    heap = bytearray()
    body = struct.pack(endian + "H", len(entries))
    for tag, typ, count, value in entries:
        body += _entry(endian, tag, typ, count, value, heap, heap_base)
    body += struct.pack(endian + "I", 0)
    return body + bytes(heap)


def synth_exif_fields(seed: int) -> dict:
    """The deterministic field values, mirrored in the DuckDB
    oracle."""
    return {
        "byte_order": "II" if seed % 2 == 0 else "MM",
        "make": f"CAM{seed % 10}",
        "model": f"MODEL-{seed % 7}",
        "orientation": 1 + seed % 8,
        "xres_num": 72 + (seed % 4) * 24,
        "datetime": f"2026:08:{1 + seed % 28:02d} {seed % 24:02d}:00:00",
        "iso": 100 * (1 + seed % 32),
        "exposure_den": 30 + seed % 100,
    }


def build_exif_app1(seed: int) -> bytes:
    """APP1 segment bytes (marker + length + 'Exif\\0\\0' + TIFF):
    IFD0 with make/model/orientation/resolution/datetime and an
    Exif-sub-IFD pointer; the sub-IFD holds ISO and exposure time."""
    f = synth_exif_fields(seed)
    endian = "<" if f["byte_order"] == "II" else ">"
    make = f["make"].encode() + b"\x00"
    model = f["model"].encode() + b"\x00"
    dt = f["datetime"].encode() + b"\x00"
    # layout: header(8) | IFD0 | sub-IFD; compute IFD0 size to place
    # the sub-IFD (6 entries -> heap starts after 2+72+4 bytes)
    ifd0_entries_n = 6
    # serialize IFD0 twice: first pass with a placeholder sub-IFD
    # offset to learn IFD0's total (heap-inclusive) length
    def ifd0_at(sub_off: int) -> bytes:
        return _ifd(
            endian,
            [
                (TAG_MAKE, 2, len(make), make),
                (TAG_MODEL, 2, len(model), model),
                (TAG_ORIENTATION, 3, 1, struct.pack(endian + "H", f["orientation"])),
                (TAG_XRES, 5, 1, struct.pack(endian + "II", f["xres_num"], 1)),
                (TAG_DATETIME, 2, len(dt), dt),
                (TAG_EXIF_IFD, 4, 1, struct.pack(endian + "I", sub_off)),
            ],
            8,
        )
    ifd0_len = len(ifd0_at(0))
    sub_off = 8 + ifd0_len
    ifd0 = ifd0_at(sub_off)
    assert len(ifd0) == ifd0_len
    sub = _ifd(
        endian,
        [
            (TAG_EXPOSURE, 5, 1, struct.pack(endian + "II", 1, f["exposure_den"])),
            (TAG_ISO, 3, 1, struct.pack(endian + "H", f["iso"])),
        ],
        sub_off,
    )
    tiff = (
        f["byte_order"].encode()
        + struct.pack(endian + "HI", 42, 8)
        + ifd0
        + sub
    )
    payload = b"Exif\x00\x00" + tiff
    return struct.pack(">HH", 0xFFE1, len(payload) + 2) + payload


def synth_jpeg_with_exif(seed: int) -> bytes:
    """A real decodable JPEG (the 4:2:0 synthesis) with the EXIF
    APP1 spliced in right after SOI — where cameras put it."""
    from .jpeg import synth_jpeg420

    base = synth_jpeg420(seed)
    return base[:2] + build_exif_app1(seed) + base[2:]


def _read_ifd(data: bytes, endian: str, off: int) -> dict[int, tuple]:
    """Entries of one IFD: tag -> (type, count, raw value bytes)."""
    if off + 2 > len(data):
        raise ValueError("IFD offset past end of TIFF data")
    (n,) = struct.unpack_from(endian + "H", data, off)
    out: dict[int, tuple] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(data):
            raise ValueError("truncated IFD entry")
        tag, typ, count = struct.unpack_from(endian + "HHI", data, base)
        if typ not in _TYPE_SIZES:
            raise ValueError(f"unknown TIFF type {typ} for tag {tag:#06x}")
        size = _TYPE_SIZES[typ] * count
        if size <= 4:
            raw = data[base + 8 : base + 8 + size]
        else:
            (voff,) = struct.unpack_from(endian + "I", data, base + 8)
            if voff + size > len(data):
                raise ValueError("TIFF value offset past end of data")
            raw = data[voff : voff + size]
        out[tag] = (typ, count, raw)
    return out


def _ascii(v: tuple | None) -> str | None:
    if v is None:
        return None
    return v[2].rstrip(b"\x00").decode("ascii", errors="replace")


def _short(v: tuple | None, endian: str) -> int | None:
    if v is None:
        return None
    if len(v[2]) < 2:  # count=0 SHORT entries would raise struct.error
        raise ValueError("SHORT value shorter than 2 bytes")
    return struct.unpack_from(endian + "H", v[2], 0)[0]


def _rational(v: tuple | None, endian: str) -> tuple[int, int] | None:
    if v is None:
        return None
    if len(v[2]) < 8:
        raise ValueError("RATIONAL value shorter than 8 bytes")
    return struct.unpack_from(endian + "II", v[2], 0)


def parse_exif(payload: bytes) -> dict:
    """Extract EXIF metadata from a JPEG payload: walk the marker
    segments to the APP1 'Exif' block, dispatch on the II/MM byte
    order, decode IFD0, follow the Exif sub-IFD pointer. Returns the
    flat field dict; raises ``ValueError`` on any malformed
    structure (the permissive-quarantine contract)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    tiff = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        tag = payload[pos + 1]
        if tag == 0xDA:  # SOS: metadata segments are all behind us
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if tag == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            break
        pos += 2 + seglen
    if tiff is None:
        raise ValueError("no EXIF APP1 segment found")
    bom = tiff[:2]
    if bom == b"II":
        endian = "<"
    elif bom == b"MM":
        endian = ">"
    else:
        raise ValueError(f"bad TIFF byte-order mark {bom!r}")
    try:
        magic, ifd0_off = struct.unpack_from(endian + "HI", tiff, 2)
    except struct.error as e:
        raise ValueError(f"truncated TIFF header: {e}") from e
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    ifd0 = _read_ifd(tiff, endian, ifd0_off)
    sub: dict[int, tuple] = {}
    if TAG_EXIF_IFD in ifd0:
        ptr = ifd0[TAG_EXIF_IFD][2]
        if len(ptr) < 4:  # malformed count=0 LONG; keep ValueError contract
            raise ValueError("Exif sub-IFD pointer shorter than 4 bytes")
        (sub_off,) = struct.unpack_from(endian + "I", ptr, 0)
        sub = _read_ifd(tiff, endian, sub_off)
    xres = _rational(ifd0.get(TAG_XRES), endian)
    expo = _rational(sub.get(TAG_EXPOSURE), endian)
    return {
        "byte_order": bom.decode(),
        "make": _ascii(ifd0.get(TAG_MAKE)),
        "model": _ascii(ifd0.get(TAG_MODEL)),
        "orientation": _short(ifd0.get(TAG_ORIENTATION), endian),
        "xres_num": xres[0] if xres else None,
        "datetime": _ascii(ifd0.get(TAG_DATETIME)),
        "iso": _short(sub.get(TAG_ISO), endian),
        "exposure_den": expo[1] if expo else None,
    }
