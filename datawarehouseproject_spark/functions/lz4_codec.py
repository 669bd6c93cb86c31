"""LZ4 block + frame decode and xxHash32, by hand.

LZ4 is the other workhorse block codec of the big-data stack
(parquet/ORC page compression, Kafka message sets, Arrow IPC body
compression) and both its formats are public (lz4.org block and
frame specs):

- BLOCK: token byte = (literal_len << 4) | (match_len - 4); nibble
  value 15 extends with 255-valued continuation bytes; literals,
  then a 2-byte little-endian match offset (0 is invalid) and the
  match copy, which may overlap forward.  The last sequence is
  literals-only (no offset).
- FRAME: magic ``0x184D2204``, FLG/BD descriptor bytes (version 01,
  block-independence, optional block checksums / content size /
  content checksum / dictionary id), a header checksum byte —
  ``(xxh32(descriptor) >> 8) & 0xFF`` — then length-prefixed blocks
  (high bit of the u32 length = stored-uncompressed flag), the
  ``0x00000000`` end mark, and an optional xxh32 content checksum.
- xxHash32 itself is hand-rolled from the public spec (Collet's
  xxhash repo doc): 4 lanes of seed+prime rotations, tail mixing,
  avalanche — pinned on published vectors AND live through every
  frame checksum the pyarrow producer writes.

Producers: ``pyarrow.Codec('lz4_raw')`` for blocks and
``pyarrow.Codec('lz4')`` for frames — the reference C
implementation, the strongest independent pin available.
"""

from __future__ import annotations

import struct

_M32 = 0xFFFFFFFF
_P1, _P2, _P3, _P4, _P5 = (
    2654435761, 2246822519, 3266489917, 668265263, 374761393,
)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 from the public spec — the checksum of the LZ4 frame
    format (and of zstd's predecessor framing)."""
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while pos + 16 <= n:
            (l1, l2, l3, l4) = struct.unpack_from("<IIII", data, pos)
            v1 = (_rotl((v1 + l1 * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl((v2 + l2 * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl((v3 + l3 * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl((v4 + l4 * _P2) & _M32, 13) * _P1) & _M32
            pos += 16
        acc = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M32
    else:
        acc = (seed + _P5) & _M32
    acc = (acc + n) & _M32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc = (_rotl((acc + lane * _P3) & _M32, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        acc = (_rotl((acc + data[pos] * _P5) & _M32, 11) * _P1) & _M32
        pos += 1
    acc ^= acc >> 15
    acc = (acc * _P2) & _M32
    acc ^= acc >> 13
    acc = (acc * _P3) & _M32
    acc ^= acc >> 16
    return acc


def decode_lz4_block(
    data: bytes, max_output: int = 1 << 28
) -> bytes:
    """Decode one raw LZ4 block (no framing)."""
    out = bytearray()
    _decode_block_into(data, out, 0, max_output)
    return bytes(out)


def _decode_block_into(
    data: bytes, out: bytearray, window_start: int, max_output: int
) -> None:
    """Decode one block APPENDING to ``out``; matches may reach back
    to ``window_start`` (0 = full history — the frame format's
    LINKED-block mode, where a match can span block boundaries)."""
    pos = 0
    n = len(data)
    if n == 0:
        return
    while pos < n:
        token = data[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated lz4 literal length")
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("truncated lz4 literals")
        out += data[pos : pos + lit_len]
        pos += lit_len
        if len(out) > max_output:
            raise ValueError("lz4 output exceeds cap")
        if pos == n:
            break  # last sequence: literals only
        if pos + 2 > n:
            raise ValueError("truncated lz4 match offset")
        offset = int.from_bytes(data[pos : pos + 2], "little")
        pos += 2
        if offset == 0 or offset > len(out) - window_start:
            raise ValueError(
                f"lz4 match offset {offset} outside "
                f"{len(out) - window_start} reachable bytes"
            )
        match_len = (token & 0x0F) + 4
        if match_len == 19:
            while True:
                if pos >= n:
                    raise ValueError("truncated lz4 match length")
                b = data[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        if len(out) + match_len > max_output:
            raise ValueError("lz4 output exceeds cap")
        src = len(out) - offset
        if offset >= match_len:  # non-overlapping: one slice copy
            out += out[src : src + match_len]
        else:
            # overlapping copy == periodic repeat of the last
            # ``offset`` bytes (LZ77 semantics), batched
            pat = bytes(out[src:])
            out += (pat * (match_len // offset + 1))[:match_len]


def scan_lz4_frame(payload: bytes) -> dict:
    """Decode one .lz4 frame and return exact byte stats (the
    oracle-twinned shape of `bz2_corpus_decode`)."""
    data = decode_lz4_frame(payload)
    return {
        "n_bytes": len(data),
        "byte_sum": sum(data),
        "n_distinct": len(set(data)),
        "payload_bytes": len(payload),
    }


def synth_lz4_plan(seed: int) -> dict:
    """Plan mirrored in the DuckDB oracle: ``1500 + (seed*23) % 2500``
    bytes, byte i = ``((i // 5) * 7 + seed) % 240``."""
    return {"n_bytes": 1500 + (seed * 23) % 2500}


def synth_lz4(seed: int) -> bytes:
    """A REAL .lz4 frame from the pyarrow (reference C) producer."""
    import pyarrow as pa

    n = synth_lz4_plan(seed)["n_bytes"]
    data = bytes(((i // 5) * 7 + seed) % 240 for i in range(n))
    return bytes(pa.Codec("lz4").compress(data))


_FRAME_MAGIC = 0x184D2204


def decode_lz4_frame(payload: bytes, max_output: int = 1 << 28) -> bytes:
    """Decode a complete LZ4 FRAME: descriptor (with its xxh32-derived
    header checksum VERIFIED), length-prefixed blocks (stored or
    compressed, per-block xxh32 verified when present), end mark,
    and the content xxh32 verified when present."""
    if len(payload) < 7:
        raise ValueError("lz4 frame shorter than any valid frame")
    (magic,) = struct.unpack_from("<I", payload, 0)
    if magic != _FRAME_MAGIC:
        raise ValueError("bad lz4 frame magic")
    flg = payload[4]
    bd = payload[5]
    version = flg >> 6
    if version != 1:
        raise ValueError(f"lz4 frame version {version} unsupported")
    b_indep = bool(flg & 0x20)
    b_checksum = bool(flg & 0x10)
    c_size = bool(flg & 0x08)
    c_checksum = bool(flg & 0x04)
    if flg & 0x02:
        raise ValueError("reserved lz4 FLG bit set")
    dict_id = bool(flg & 0x01)
    if bd & 0x8F:
        raise ValueError("reserved lz4 BD bits set")
    bmax_code = (bd >> 4) & 0x07
    if bmax_code < 4:
        raise ValueError(f"invalid lz4 block-size code {bmax_code}")
    pos = 6
    desc_start = 4
    content_size = None
    if c_size:
        if pos + 8 > len(payload):
            raise ValueError("truncated lz4 content size")
        (content_size,) = struct.unpack_from("<Q", payload, pos)
        pos += 8
    if dict_id:
        pos += 4
    if pos >= len(payload):
        raise ValueError("truncated lz4 frame descriptor")
    hc = payload[pos]
    if (xxh32(payload[desc_start:pos]) >> 8) & 0xFF != hc:
        raise ValueError("lz4 frame header checksum mismatch")
    pos += 1
    out = bytearray()
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated lz4 block length")
        (blen,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        if blen == 0:
            break  # end mark
        stored = bool(blen & 0x80000000)
        blen &= 0x7FFFFFFF
        if pos + blen > len(payload):
            raise ValueError("truncated lz4 block data")
        block = payload[pos : pos + blen]
        pos += blen
        if b_checksum:
            if pos + 4 > len(payload):
                raise ValueError("truncated lz4 block checksum")
            (bsum,) = struct.unpack_from("<I", payload, pos)
            pos += 4
            if xxh32(block) != bsum:
                raise ValueError("lz4 block checksum mismatch")
        if stored:
            out += block
        else:
            # block-independent frames fence the match window at the
            # block start; linked frames (what the pyarrow producer
            # writes for multi-block content) let matches span blocks
            window_start = len(out) if b_indep else 0
            _decode_block_into(block, out, window_start, max_output)
        if len(out) > max_output:
            raise ValueError("lz4 frame output exceeds cap")
    if c_checksum:
        if pos + 4 > len(payload):
            raise ValueError("truncated lz4 content checksum")
        (csum,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        if xxh32(bytes(out)) != csum:
            raise ValueError("lz4 content checksum mismatch")
    if content_size is not None and len(out) != content_size:
        raise ValueError(
            f"lz4 frame produced {len(out)}, declared {content_size}"
        )
    if pos != len(payload):
        raise ValueError("trailing garbage after lz4 frame")
    return bytes(out)
