"""XZ container triage: footer -> index -> block map, by hand.

The .xz container (tukaani.org file-format spec, public) is the
third archive codec a crawl actually meets (kernel tarballs, data
dumps).  Full LZMA2 decode is out of scope (a documented boundary —
range coding is a different project); what a 100 TB planner needs
from .xz is the TRIAGE: how many streams/blocks, how much plaintext,
which integrity check — and the format puts all of it in an INDEX
read backward from the footer, the same read-the-index-not-the-data
shape as the ZIP central directory and the parquet footer:

- stream header: magic ``FD 37 7A 58 5A 00``, 2 stream-flag bytes
  (check type: 0 none, 1 CRC32, 4 CRC64, 10 SHA-256), CRC32 of the
  flags;
- stream footer: CRC32, u32le backward size ((index size / 4) - 1),
  the SAME flag bytes, magic ``YZ``;
- index: indicator 0x00, varint record count, per block the varint
  unpadded size and uncompressed size, null padding to 4 bytes,
  CRC32 over all of it (VERIFIED here);
- blocks start right after the header at offset 12; each block
  header declares its real size via ``(byte0 + 1) * 4``, its flags,
  optional sizes, filter chain, and a CRC32 (VERIFIED here) — the
  walk cross-checks the index's unpadded sizes against the actual
  block layout;
- streams concatenate (with 4-aligned null stream padding), so one
  .xz file is a LIST of streams — the scan walks them all.

Multi-byte integers in headers are little-endian; index/block-header
varints are the protobuf-style 7-bit kind.  The SYNTHESIZER is
stdlib :mod:`lzma` (FORMAT_XZ), rotating every check type and
producing genuinely concatenated streams on odd seeds.
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"\xfd7zXZ\x00"
_FOOT_MAGIC = b"YZ"
_CHECK_SIZES = {0: 0, 1: 4, 4: 8, 10: 32}


def _varint(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    for shift in range(0, 63, 7):
        if pos >= len(data):
            raise ValueError("truncated xz varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
    raise ValueError("xz varint too long")


def _scan_stream(payload: bytes, end: int) -> dict:
    """Scan ONE stream that ENDS at ``end`` (footer-first), returning
    its triage dict including its start offset."""
    if end < 32:
        raise ValueError("xz stream shorter than header+footer")
    footer = payload[end - 12 : end]
    if footer[10:12] != _FOOT_MAGIC:
        raise ValueError("bad xz footer magic")
    (foot_crc,) = struct.unpack_from("<I", footer, 0)
    if zlib.crc32(footer[4:10]) != foot_crc:
        raise ValueError("xz footer CRC mismatch")
    (backward,) = struct.unpack_from("<I", footer, 4)
    flags = footer[8:10]
    if flags[0] != 0 or flags[1] & 0xF0:
        raise ValueError("reserved xz stream flags set")
    check_type = flags[1]
    if check_type not in _CHECK_SIZES:
        raise ValueError(f"unknown xz check type {check_type}")
    index_size = (backward + 1) * 4
    idx_start = end - 12 - index_size
    if idx_start < 12:
        raise ValueError("xz index extends past stream header")
    index = payload[idx_start : idx_start + index_size]
    if index[:1] != b"\x00":
        raise ValueError("bad xz index indicator")
    (idx_crc,) = struct.unpack_from("<I", index, index_size - 4)
    if zlib.crc32(index[: index_size - 4]) != idx_crc:
        raise ValueError("xz index CRC mismatch")
    n_records, pos = _varint(index, 1)
    if n_records > index_size:
        raise ValueError("xz index record count exceeds index size")
    records = []
    for _ in range(n_records):
        unpadded, pos = _varint(index, pos)
        uncompressed, pos = _varint(index, pos)
        if unpadded <= 0:
            raise ValueError("xz index record with non-positive size")
        records.append((unpadded, uncompressed))
    # remaining bytes before the CRC must be null padding to 4
    if any(index[pos : index_size - 4]):
        raise ValueError("non-null xz index padding")

    # walk blocks FORWARD from the header, cross-checking the index
    block_start = None
    pos_b = None
    total_padded = 0
    for unpadded, _unc in records:
        total_padded += unpadded + (-unpadded) % 4
    block_start = idx_start - total_padded
    if block_start < 12:
        raise ValueError("xz blocks extend past stream header")
    start = block_start - 12
    header = payload[start : start + 12]
    if header[:6] != _MAGIC:
        raise ValueError("bad xz stream header magic")
    if header[6:8] != flags:
        raise ValueError("xz header/footer stream flags disagree")
    (hdr_crc,) = struct.unpack_from("<I", header, 8)
    if zlib.crc32(header[6:8]) != hdr_crc:
        raise ValueError("xz stream-header CRC mismatch")
    pos_b = block_start
    for unpadded, _unc in records:
        hsize_byte = payload[pos_b]
        if hsize_byte == 0:
            raise ValueError("xz block header where index points")
        hsize = (hsize_byte + 1) * 4
        bh = payload[pos_b : pos_b + hsize]
        if len(bh) < hsize:
            raise ValueError("truncated xz block header")
        (bh_crc,) = struct.unpack_from("<I", bh, hsize - 4)
        if zlib.crc32(bh[: hsize - 4]) != bh_crc:
            raise ValueError("xz block-header CRC mismatch")
        n_filters = (bh[1] & 0x03) + 1
        if bh[1] & 0x3C:
            raise ValueError("reserved xz block flags set")
        pos_b += unpadded + (-unpadded) % 4
    return {
        "start": start,
        "check_type": check_type,
        "n_blocks": len(records),
        "uncompressed": sum(r[1] for r in records),
        "n_filters_last": n_filters if records else 0,
    }


def scan_xz(payload: bytes) -> dict:
    """Triage a complete .xz file (possibly concatenated streams +
    stream padding), walking footers backward.  Every CRC32 in the
    container skeleton (stream header, block headers, index, footer)
    is VERIFIED.  Returns stream/block counts, total declared
    plaintext, and the first stream's check type."""
    if len(payload) < 32 or payload[:6] != _MAGIC:
        raise ValueError("not an xz file (bad magic)")
    end = len(payload)
    streams = []
    while end > 0:
        # strip 4-aligned null stream padding
        while end >= 4 and not any(payload[end - 4 : end]):
            end -= 4
        if end == 0:
            break
        if end % 4:
            raise ValueError("xz stream end not 4-byte aligned")
        st = _scan_stream(payload, end)
        streams.append(st)
        end = st["start"]
    if not streams:
        raise ValueError("xz file with no streams")
    if streams[-1]["start"] != 0:
        raise ValueError("leading garbage before first xz stream")
    streams.reverse()
    return {
        "n_streams": len(streams),
        "n_blocks": sum(s["n_blocks"] for s in streams),
        "uncompressed_total": sum(s["uncompressed"] for s in streams),
        "check_type": streams[0]["check_type"],
        "payload_bytes": len(payload),
    }


def synth_xz_plan(seed: int) -> dict:
    """Plan mirrored in the DuckDB oracle: stream 1 holds 500 +
    (seed*13) % 1000 plaintext bytes; odd seeds append a second
    stream of 300 + (seed*7) % 500; check type rotates
    none/CRC32/CRC64/SHA-256 by seed % 4."""
    n1 = 500 + (seed * 13) % 1000
    n2 = 300 + (seed * 7) % 500 if seed % 2 else 0
    return {
        "sizes": [n1] + ([n2] if n2 else []),
        "check_type": (0, 1, 4, 10)[seed % 4],
    }


def synth_xz(seed: int) -> bytes:
    """REAL .xz bytes from stdlib lzma (FORMAT_XZ), concatenated
    streams on odd seeds — exactly how multi-part dumps ship."""
    import lzma

    plan = synth_xz_plan(seed)
    out = b""
    for part, n in enumerate(plan["sizes"]):
        data = bytes(((i * 11 + seed + part) % 251) for i in range(n))
        out += lzma.compress(
            data, format=lzma.FORMAT_XZ, check=plan["check_type"]
        )
    return out
