"""Snappy raw-block decode, by hand.

Snappy is THE block codec of the big-data stack — the default
parquet page compression, the HBase/LevelDB/Kafka wire codec — and
its format is public (google/snappy format_description.txt):

- a varint (LEB128) uncompressed length preamble;
- then tagged elements, tag = low 2 bits of the first byte:
  - ``00`` literal: length-1 in the high 6 bits; values 60..63 mean
    the length-1 follows in 1..4 little-endian bytes;
  - ``01`` copy, 1-byte offset: length-4 in bits 2..4, offset =
    (bits 5..7) << 8 | next byte  (4..11 byte matches, offsets < 2048);
  - ``10`` copy, 2-byte LE offset: length-1 in the high 6 bits;
  - ``11`` copy, 4-byte LE offset (rare, huge inputs).
- copies may overlap forward (offset < length), the RLE trick —
  byte-at-a-time append, exactly like LZ77/LZMA match copies.

Producer: ``pyarrow.Codec('snappy')`` (the C++ reference
implementation — the strongest independent pin available), plus the
published format examples, in ``tests/test_snappy_lz4.py``.  The
decoder is also wired into :mod:`.parquet_pages`, closing its
"gzip-only codec" boundary: real-world parquet is overwhelmingly
SNAPPY-compressed pages.
"""

from __future__ import annotations


def _uvarint(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    for shift in range(0, 63, 7):
        if pos >= len(data):
            raise ValueError("truncated snappy varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
    raise ValueError("snappy varint too long")


def decode_snappy(data: bytes, max_output: int = 1 << 28) -> bytes:
    """Decode one raw snappy block.  Raises ValueError on malformed
    input (the quarantine contract): bad offsets, overruns, length
    mismatch with the preamble."""
    expected, pos = _uvarint(data, 0)
    if expected > max_output:
        raise ValueError(f"snappy declares {expected} bytes > cap")
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            length = (tag >> 2) + 1
            if length > 60:
                extra = length - 60
                if pos + extra > n:
                    raise ValueError("truncated snappy literal length")
                length = (
                    int.from_bytes(data[pos : pos + extra], "little") + 1
                )
                pos += extra
            if pos + length > n:
                raise ValueError("truncated snappy literal data")
            out += data[pos : pos + length]
            pos += length
            continue
        if kind == 1:
            length = ((tag >> 2) & 0x07) + 4
            if pos >= n:
                raise ValueError("truncated snappy copy-1 offset")
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:
            length = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("truncated snappy copy-2 offset")
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:
            length = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("truncated snappy copy-4 offset")
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError(
                f"snappy copy offset {offset} outside {len(out)} bytes"
            )
        if len(out) + length > expected:
            raise ValueError("snappy copy overruns declared length")
        src = len(out) - offset
        if offset >= length:  # non-overlapping: one slice copy
            out += out[src : src + length]
        else:
            # overlapping copy == periodic repeat of the last
            # ``offset`` bytes (LZ77 semantics), batched
            pat = bytes(out[src:])
            out += (pat * (length // offset + 1))[:length]
    if len(out) != expected:
        raise ValueError(
            f"snappy produced {len(out)} bytes, declared {expected}"
        )
    return bytes(out)
