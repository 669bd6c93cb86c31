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
        if pos + 46 > idx:
            # a corrupt name/extra length can jump pos toward a stray
            # 'PK\\x01\\x02' in the comment with < 46 bytes left; the
            # unpack would then raise struct.error and ESCAPE the
            # ValueError quarantine (review r7 pass 2)
            raise ValueError(f"central header at {pos} runs past EOCD")
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


# ---------------------------------------------------------------------------
# POSIX ustar (tar) structure scan — the other archive format corpus
# drops arrive in. Same independent-producer pattern: synthesis via
# the stdlib ``tarfile`` writer, parsing by hand from the public
# format (512-byte headers, NUL-padded octal numeric fields, the
# space-blanked header checksum, NUL-block terminator).
# ---------------------------------------------------------------------------


def synth_tar_members(seed: int) -> list[dict]:
    """Member plan, mirrored in the DuckDB oracle: 1 + seed%4
    members; member i is ``d{seed%7}/m{i}.bin`` with
    ``5 + (seed*7 + i*3) % 120`` deterministic bytes."""
    out = []
    for i in range(1 + seed % 4):
        n = 5 + (seed * 7 + i * 3) % 120
        out.append(
            {
                "name": f"d{seed % 7}/m{i}.bin",
                "content": bytes((seed * 5 + i + j) % 256 for j in range(n)),
            }
        )
    return out


def synth_tar(seed: int) -> bytes:
    """Write the archive with the STDLIB producer (fixed mtime/uids
    keep bytes deterministic)."""
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for m in synth_tar_members(seed):
            info = tarfile.TarInfo(m["name"])
            info.size = len(m["content"])
            info.mtime = 1_800_000_000
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(m["content"]))
    return buf.getvalue()


def _tar_octal(field: bytes) -> int:
    s = field.split(b"\x00", 1)[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError as e:
        raise ValueError(f"bad octal field {field!r}") from e


def scan_tar(payload: bytes) -> dict:
    """Walk 512-byte ustar headers: name, octal size, header
    CHECKSUM verification (sum of header bytes with the checksum
    field blanked to spaces — the format's integrity feature),
    512-aligned content skip, NUL-block terminator. Returns
    ``n_members``, ``total_bytes``, ``n_dirs_refd`` (distinct
    directory prefixes), ``member_names`` (sorted, comma-joined),
    plus per-member details. Raises ``ValueError`` on malformed
    structure."""
    pos = 0
    members = []
    while pos + 512 <= len(payload):
        hdr = payload[pos : pos + 512]
        if hdr == b"\x00" * 512:  # end-of-archive marker
            break
        name = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8")
        if not name:
            raise ValueError(f"empty member name at offset {pos}")
        size = _tar_octal(hdr[124:136])
        if size < 0:
            # a crafted negative octal size makes the advance zero or
            # negative — an infinite loop no quarantine could catch
            # (review r7 pass 2)
            raise ValueError(f"negative tar member size for {name!r}")
        stored_ck = _tar_octal(hdr[148:156])
        blanked = hdr[:148] + b" " * 8 + hdr[156:]
        if sum(blanked) != stored_ck:
            raise ValueError(
                f"tar header checksum mismatch for {name!r}"
            )
        typeflag = hdr[156:157]
        if typeflag not in (b"0", b"\x00", b"5"):
            raise ValueError(f"unsupported tar entry type {typeflag!r}")
        members.append({"name": name, "size": size})
        pos += 512 + ((size + 511) // 512) * 512
    else:
        raise ValueError("missing tar end-of-archive marker")
    if not members:
        raise ValueError("empty tar archive")
    dirs = {m["name"].rsplit("/", 1)[0] for m in members if "/" in m["name"]}
    return {
        "n_members": len(members),
        "total_bytes": sum(m["size"] for m in members),
        "n_dirs_refd": len(dirs),
        "member_names": ",".join(sorted(m["name"] for m in members)),
        "members": members,
    }


# ---------------------------------------------------------------------------
# gzip member decode (RFC 1952) — the third archive/compression
# container, and unlike the ZIP/tar TRIAGE scans this one runs the
# FULL verified pipeline: header parse (magic, method, flag bits,
# optional FNAME), raw-DEFLATE decompression via stdlib zlib (the
# same dependency budget as the PNG decoder), and validation of the
# CRC32 + ISIZE trailer against the recovered bytes. Synthesis uses
# the stdlib gzip/zlib producer — independent again.
# ---------------------------------------------------------------------------


def synth_gzip_plan(seed: int) -> dict:
    """Deterministic member plan, mirrored in the DuckDB oracle:
    name ``log{seed%20}.txt``, 20 + (seed*11) % 200 content bytes
    ``(seed*3 + j) % 256``."""
    n = 20 + (seed * 11) % 200
    return {
        "fname": f"log{seed % 20}.txt",
        "content": bytes((seed * 3 + j) % 256 for j in range(n)),
    }


def synth_gzip(seed: int) -> bytes:
    """RFC 1952 member written with stdlib zlib primitives: header
    with FNAME flag, raw deflate body, CRC32 + ISIZE trailer.
    (Assembled field-by-field rather than via gzip.GzipFile so the
    FNAME path is always exercised and the mtime is fixed.)"""
    import zlib as _z

    plan = synth_gzip_plan(seed)
    co = _z.compressobj(9, _z.DEFLATED, -15)  # raw deflate
    body = co.compress(plan["content"]) + co.flush()
    header = (
        b"\x1f\x8b\x08\x08"  # magic, deflate, FNAME flag
        + struct.pack("<I", 1_800_000_000)  # fixed mtime
        + b"\x00\x03"  # XFL, OS=unix
        + plan["fname"].encode() + b"\x00"
    )
    trailer = struct.pack(
        "<II", _z.crc32(plan["content"]), len(plan["content"]) % (1 << 32)
    )
    return header + body + trailer


def decode_gzip(payload: bytes) -> dict:
    """Full verified gzip decode: header walk (all flag-dependent
    optional fields: FEXTRA, FNAME, FCOMMENT, FHCRC), raw-DEFLATE
    inflate, and trailer verification — the CRC32 and ISIZE MUST
    match the recovered bytes (a corrupt stream fails loudly, never
    returns silently wrong content). Returns ``fname``,
    ``n_bytes``, ``sum_bytes`` and the content. Raises
    ``ValueError`` on any malformation."""
    import zlib as _z

    if payload[:2] != b"\x1f\x8b":
        raise ValueError("not a gzip member (bad magic)")
    if len(payload) < 18:
        raise ValueError("truncated gzip member")
    if payload[2] != 8:
        raise ValueError(f"unsupported compression method {payload[2]}")
    flg = payload[3]
    if flg & 0xE0:
        raise ValueError("reserved gzip flag bits set")
    pos = 10
    if flg & 0x04:  # FEXTRA
        if pos + 2 > len(payload):
            raise ValueError("truncated FEXTRA length")
        (xlen,) = struct.unpack_from("<H", payload, pos)
        pos += 2 + xlen
    fname = None
    if flg & 0x08:  # FNAME
        end = payload.find(b"\x00", pos)
        if end < 0:
            raise ValueError("unterminated FNAME")
        fname = payload[pos:end].decode("latin-1")
        pos = end + 1
    if flg & 0x10:  # FCOMMENT
        end = payload.find(b"\x00", pos)
        if end < 0:
            raise ValueError("unterminated FCOMMENT")
        pos = end + 1
    if flg & 0x02:  # FHCRC
        pos += 2
    if pos >= len(payload) - 8:
        raise ValueError("no deflate body")
    d = _z.decompressobj(-15)
    try:
        content = d.decompress(payload[pos:-8]) + d.flush()
    except _z.error as e:
        raise ValueError(f"deflate error: {e}") from e
    crc, isize = struct.unpack_from("<II", payload, len(payload) - 8)
    if _z.crc32(content) != crc:
        raise ValueError("gzip CRC32 mismatch")
    if len(content) % (1 << 32) != isize:
        raise ValueError("gzip ISIZE mismatch")
    return {
        "fname": fname,
        "n_bytes": len(content),
        "sum_bytes": sum(content),
        "content": content,
    }
