"""ZIP archive structure scan (central directory walk, stdlib only).

Corpus data routinely lands as archives; the triage question is the
same as for media ("how many members, what sizes, which methods,
is the directory intact?") and the answer lives in the CENTRAL
DIRECTORY — the index at the END of the file — so a scanner reads
the tail, never the member data. Format facts are public (PKWARE
APPNOTE): End-Of-Central-Directory record ``PK\\x05\\x06`` (with a
variable-length trailing comment, so it must be FOUND by scanning
backwards), central file headers ``PK\\x01\\x02`` with method /
sizes / CRC / name.

Unlike the other codecs, the SYNTHESIZER here is not this module's
own encoder: payloads come from Python's stdlib ``zipfile`` writer —
a genuinely independent producer — so the hand-rolled parser is
exercised against a real third-party byte layout, not against
itself. Member names, counts, methods and uncompressed sizes are
modular formulas over the id (DuckDB-oracle-checkable); compressed
sizes and CRCs are producer-dependent and are verified in pytest
against ``zlib`` instead.
"""

from __future__ import annotations

import io
import struct
import zipfile

_EOCD_SIG = b"PK\x05\x06"
_CDH_SIG = b"PK\x01\x02"


def synth_zip_members(seed: int) -> list[dict]:
    """Member plan, mirrored in the DuckDB oracle: 2 + seed%3
    members; member i is named ``f{i}_{seed%9}.txt``, holds
    ``10 + (seed*3 + i) % 40`` deterministic bytes, STORED when
    (seed + i) % 2 == 1 else DEFLATED."""
    out = []
    for i in range(2 + seed % 3):
        n = 10 + (seed * 3 + i) % 40
        out.append(
            {
                "name": f"f{i}_{seed % 9}.txt",
                "content": bytes((seed + i + j) % 256 for j in range(n)),
                "method": zipfile.ZIP_STORED
                if (seed + i) % 2 == 1
                else zipfile.ZIP_DEFLATED,
            }
        )
    return out


def synth_zip(seed: int) -> bytes:
    """Write the archive with the STDLIB producer (fixed timestamps
    keep bytes deterministic; an archive comment exercises the
    EOCD backward scan)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.comment = b"corpus-archive-" + str(seed % 100).encode()
        for m in synth_zip_members(seed):
            info = zipfile.ZipInfo(m["name"], date_time=(2026, 8, 14, 0, 0, 0))
            info.compress_type = m["method"]
            zf.writestr(info, m["content"])
    return buf.getvalue()


def scan_zip(payload: bytes) -> dict:
    """Walk the central directory: locate the EOCD by scanning
    backwards through the trailing comment, validate entry counts
    and offsets, and parse every central file header. Returns
    ``n_members``, ``n_stored``, ``n_deflated``,
    ``total_uncompressed``, ``member_names`` (sorted,
    comma-joined), plus the per-member detail list (name, method,
    crc32, comp_size, uncomp_size) for callers that verify
    content. Raises ``ValueError`` on malformed structure (the
    permissive-quarantine contract)."""
    # EOCD is >= 22 bytes from the end, minus up to 65535 comment bytes
    tail_start = max(0, len(payload) - 22 - 0xFFFF)
    idx = payload.rfind(_EOCD_SIG, tail_start)
    if idx < 0:
        raise ValueError("no end-of-central-directory record")
    if idx + 22 > len(payload):
        raise ValueError("truncated EOCD record")
    (n_disk, n_total, cd_size, cd_off, comment_len) = struct.unpack_from(
        "<HHIIH", payload, idx + 8
    )
    if idx + 22 + comment_len > len(payload):
        raise ValueError("EOCD comment past end of payload")
    if n_disk != n_total:
        raise ValueError("multi-disk archives unsupported")
    if cd_off + cd_size > idx:
        raise ValueError("central directory overlaps EOCD")
    pos = cd_off
    members = []
    for _ in range(n_total):
        if payload[pos : pos + 4] != _CDH_SIG:
            raise ValueError(f"bad central header signature at {pos}")
        (
            _ver_made,
            _ver_need,
            _flags,
            method,
            _mtime,
            _mdate,
            crc,
            comp_size,
            uncomp_size,
            name_len,
            extra_len,
            comment_len2,
        ) = struct.unpack_from("<HHHHHHIIIHHH", payload, pos + 4)
        name_start = pos + 46
        name = payload[name_start : name_start + name_len].decode("utf-8")
        if method not in (0, 8):
            raise ValueError(f"unsupported compression method {method}")
        members.append(
            {
                "name": name,
                "method": method,
                "crc32": crc,
                "comp_size": comp_size,
                "uncomp_size": uncomp_size,
            }
        )
        pos = name_start + name_len + extra_len + comment_len2
    if pos != cd_off + cd_size:
        raise ValueError("central directory size mismatch")
    return {
        "n_members": n_total,
        "n_stored": sum(1 for m in members if m["method"] == 0),
        "n_deflated": sum(1 for m in members if m["method"] == 8),
        "total_uncompressed": sum(m["uncomp_size"] for m in members),
        "member_names": ",".join(sorted(m["name"] for m in members)),
        "members": members,
    }
