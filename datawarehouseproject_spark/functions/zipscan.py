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
_EOCD64_SIG = b"PK\x06\x06"
_EOCD64_LOC_SIG = b"PK\x06\x07"
_LFH_SIG = b"PK\x03\x04"


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
    EOCD backward scan). Every 4th seed instead produces a SPARSE
    ZIP64 archive (:func:`synth_zip64`) — >4 GiB DECLARED member
    sizes and saturated EOCD fields, without materializing 4 GiB of
    payload — so the scan query exercises the ZIP64 path on every
    batch."""
    if seed % 4 == 0:
        return synth_zip64(seed)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.comment = b"corpus-archive-" + str(seed % 100).encode()
        for m in synth_zip_members(seed):
            info = zipfile.ZipInfo(m["name"], date_time=(2026, 8, 14, 0, 0, 0))
            info.compress_type = m["method"]
            zf.writestr(info, m["content"])
    return buf.getvalue()


def synth_zip64(seed: int) -> bytes:
    """SPARSE ZIP64 archive: the same member-name plan as
    :func:`synth_zip_members` but every member STORED with a
    DECLARED uncompressed size of 4 GiB + the plan size — central
    headers saturate both size fields to 0xFFFFFFFF and carry the
    true values in the 0x0001 ZIP64 extra, and the EOCD saturates
    count/size/offset and redirects through the ZIP64 locator +
    EOCD64 record (APPNOTE 4.4.1). Member DATA is not written
    (the central-directory scan never reads it), which is exactly
    how a >4 GiB fixture must be synthesized without 4 GiB of
    bytes. The EOCD64/locator byte layout is pinned against the
    STDLIB producer separately in ``tests/test_zipscan.py`` via a
    >65535-member ``zipfile`` archive."""
    members = synth_zip_members(seed)
    out = bytearray()
    locals_ = []
    for m in members:
        name = m["name"].encode()
        usize = (1 << 32) + len(m["content"])  # > 4 GiB declared
        locals_.append((name, usize, len(out)))
        # local header stub: ZIP64-saturated sizes + 0x0001 extra
        extra = struct.pack("<HHQQ", 0x0001, 16, usize, usize)
        out += _LFH_SIG + struct.pack(
            "<HHHHHIIIHH",
            45, 0, 0, 0x6E00, 0x5B0E,  # ver_need 4.5, mtime/mdate fixed
            0, 0xFFFFFFFF, 0xFFFFFFFF,
            len(name), len(extra),
        ) + name + extra
    cd_off = len(out)
    for name, usize, lofs in locals_:
        extra = struct.pack("<HHQQ", 0x0001, 16, usize, usize)
        out += _CDH_SIG + struct.pack(
            "<HHHHHHIIIHHHHHII",
            45, 45, 0, 0,  # ver_made, ver_need, flags, method=stored
            0x6E00, 0x5B0E, 0,  # mtime, mdate, crc
            0xFFFFFFFF, 0xFFFFFFFF,  # saturated comp/uncomp
            len(name), len(extra), 0,  # name/extra/comment lens
            0, 0, 0,  # disk_start, internal attrs, external attrs
            lofs,
        ) + name + extra
    cd_size = len(out) - cd_off
    eocd64_off = len(out)
    out += _EOCD64_SIG + struct.pack(
        "<QHHIIQQQQ",
        44, 45, 45, 0, 0,
        len(members), len(members), cd_size, cd_off,
    )
    out += _EOCD64_LOC_SIG + struct.pack("<IQI", 0, eocd64_off, 1)
    comment = b"corpus-archive64-" + str(seed % 100).encode()
    out += _EOCD_SIG + struct.pack(
        "<HHHHIIH",
        0, 0, 0xFFFF, 0xFFFF, 0xFFFFFFFF, 0xFFFFFFFF, len(comment),
    ) + comment
    return bytes(out)


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
    cd_end_limit = idx
    loc = idx - 20
    has_locator = loc >= 0 and payload[loc : loc + 4] == _EOCD64_LOC_SIG
    if has_locator and (
        n_total == 0xFFFF or cd_size == 0xFFFFFFFF or cd_off == 0xFFFFFFFF
    ):
        # ZIP64 (APPNOTE 4.4.1): saturated EOCD fields redirect
        # through the 20-byte EOCD64 LOCATOR immediately before the
        # EOCD to the 8-byte-field EOCD64 record. Routine at 100 TB:
        # >4 GiB archives and >65535-member archives both land here.
        # The redirect requires the LOCATOR, not just saturation:
        # 0xFFFF is also the LEGAL literal count of an exactly-
        # 65535-member archive (CPython's zipfile writes exactly
        # that, with no EOCD64 — review r8 pass 1), so a saturated
        # field without a locator falls back to the literal values.
        loc_disk, eocd64_off, n_disks = struct.unpack_from(
            "<IQI", payload, loc + 4
        )
        if loc_disk != 0 or n_disks != 1:
            raise ValueError("multi-disk ZIP64 archives unsupported")
        if eocd64_off + 56 > loc:
            raise ValueError("ZIP64 EOCD offset past its locator")
        if payload[eocd64_off : eocd64_off + 4] != _EOCD64_SIG:
            raise ValueError("bad ZIP64 EOCD signature")
        (
            _rec_size,
            _ver_made64,
            _ver_need64,
            disk64,
            cd_disk64,
            n_this64,
            n_total64,
            cd_size64,
            cd_off64,
        ) = struct.unpack_from("<QHHIIQQQQ", payload, eocd64_off + 4)
        if disk64 != 0 or cd_disk64 != 0 or n_this64 != n_total64:
            raise ValueError("multi-disk ZIP64 archives unsupported")
        n_total, cd_size, cd_off = n_total64, cd_size64, cd_off64
        cd_end_limit = eocd64_off
    if cd_off + cd_size > cd_end_limit:
        raise ValueError("central directory overlaps EOCD")
    pos = cd_off
    members = []
    for _ in range(n_total):
        if pos + 46 > cd_end_limit:
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
        (local_off,) = struct.unpack_from("<I", payload, pos + 42)
        name_start = pos + 46
        name = payload[name_start : name_start + name_len].decode("utf-8")
        if method not in (0, 8):
            raise ValueError(f"unsupported compression method {method}")
        if (
            uncomp_size == 0xFFFFFFFF
            or comp_size == 0xFFFFFFFF
            or local_off == 0xFFFFFFFF
        ):
            # true sizes live in the 0x0001 ZIP64 extra field, which
            # carries ONLY the saturated fields, in spec order
            # (uncompressed then compressed)
            extra = payload[
                name_start + name_len : name_start + name_len + extra_len
            ]
            z64 = None
            ep = 0
            while ep + 4 <= len(extra):
                eid, esz = struct.unpack_from("<HH", extra, ep)
                if eid == 0x0001:
                    z64 = extra[ep + 4 : ep + 4 + esz]
                    break
                ep += 4 + esz
            if z64 is None:
                raise ValueError(
                    f"saturated sizes for {name!r} without ZIP64 extra"
                )
            zp = 0
            if uncomp_size == 0xFFFFFFFF:
                if zp + 8 > len(z64):
                    raise ValueError("short ZIP64 extra field")
                (uncomp_size,) = struct.unpack_from("<Q", z64, zp)
                zp += 8
            if comp_size == 0xFFFFFFFF:
                if zp + 8 > len(z64):
                    raise ValueError("short ZIP64 extra field")
                (comp_size,) = struct.unpack_from("<Q", z64, zp)
                zp += 8
            if local_off == 0xFFFFFFFF:
                if zp + 8 > len(z64):
                    raise ValueError("short ZIP64 extra field")
                (local_off,) = struct.unpack_from("<Q", z64, zp)
                zp += 8
        members.append(
            {
                "name": name,
                "method": method,
                "crc32": crc,
                "comp_size": comp_size,
                "uncomp_size": uncomp_size,
                "local_off": local_off,
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
    ``5 + (seed*7 + i*3) % 120`` deterministic bytes. Seeds with
    seed%3 != 2 get >100-char paths — ``d{seed%7}/ppp…p/m{i}.bin``
    with a ``100 + seed % 30``-char run of 'p' — which do NOT fit a
    classic ustar name field and force the long-name mechanism of
    whichever dialect writes the archive (pax ``x`` headers for
    seed%3==0, GNU ``L`` entries for seed%3==1)."""
    out = []
    longdir = "p" * (100 + seed % 30) if seed % 3 != 2 else None
    for i in range(1 + seed % 4):
        n = 5 + (seed * 7 + i * 3) % 120
        name = (
            f"d{seed % 7}/{longdir}/m{i}.bin"
            if longdir
            else f"d{seed % 7}/m{i}.bin"
        )
        out.append(
            {
                "name": name,
                "content": bytes((seed * 5 + i + j) % 256 for j in range(n)),
            }
        )
    return out


def synth_tar(seed: int) -> bytes:
    """Write the archive with the STDLIB producer (fixed mtime/uids
    keep bytes deterministic). The DIALECT rotates with the seed so
    every batch exercises all three real-world layouts: seed%3==0 →
    pax (POSIX.1-2001 ``x`` extended headers, forced by the
    >100-char paths these seeds carry), seed%3==1 → GNU tar (``L``
    longname entries, same trigger), seed%3==2 → classic ustar with
    short names."""
    import tarfile

    fmt = {
        0: tarfile.PAX_FORMAT,
        1: tarfile.GNU_FORMAT,
        2: tarfile.USTAR_FORMAT,
    }[seed % 3]
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
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


def _parse_pax_records(data: bytes) -> dict[str, str]:
    """POSIX.1-2001 extended-header records: ``"LEN key=value\\n"``
    where LEN is the DECIMAL length of the whole record including
    the length digits, the spaces, and the trailing newline."""
    out: dict[str, str] = {}
    pos = 0
    while pos < len(data):
        sp = data.find(b" ", pos)
        if sp < 0:
            raise ValueError("malformed pax record (no length)")
        try:
            rec_len = int(data[pos:sp])
        except ValueError as e:
            raise ValueError("malformed pax record length") from e
        if rec_len <= sp - pos or pos + rec_len > len(data):
            raise ValueError("pax record length out of bounds")
        rec = data[pos + (sp - pos) + 1 : pos + rec_len]
        if not rec.endswith(b"\n"):
            raise ValueError("pax record missing newline")
        key, _, value = rec[:-1].partition(b"=")
        out[key.decode("utf-8")] = value.decode("utf-8")
        pos += rec_len
    return out


def scan_tar(payload: bytes) -> dict:
    """Walk 512-byte tar headers: name, octal size, header CHECKSUM
    verification (sum of header bytes with the checksum field
    blanked to spaces — the format's integrity feature),
    512-aligned content skip, NUL-block terminator. Understands the
    three real-world dialects: classic ustar, POSIX pax (typeflag
    ``x`` per-member and ``g`` global extended headers whose
    ``path``/``size`` records override the following member — how
    >100-char paths and >8 GiB members are expressed), and GNU tar
    (typeflag ``L`` longname / ``K`` longlink entries carrying the
    real name as content). Returns ``n_members``, ``total_bytes``,
    ``n_dirs_refd`` (distinct directory prefixes), ``member_names``
    (sorted, comma-joined), plus per-member details. Raises
    ``ValueError`` on malformed structure."""
    pos = 0
    members = []
    pax_global: dict[str, str] = {}
    pax_next: dict[str, str] = {}
    gnu_longname: str | None = None
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
        data_end = pos + 512 + size
        if data_end > len(payload):
            raise ValueError(f"tar member data for {name!r} truncated")
        if typeflag in (b"x", b"g"):  # pax extended header
            recs = _parse_pax_records(payload[pos + 512 : data_end])
            if typeflag == b"x":
                pax_next.update(recs)
            else:
                pax_global.update(recs)
        elif typeflag in (b"L", b"K"):  # GNU longname / longlink
            content = payload[pos + 512 : data_end]
            if typeflag == b"L":
                gnu_longname = (
                    content.split(b"\x00", 1)[0].decode("utf-8")
                )
        elif typeflag in (b"0", b"\x00", b"5"):
            # ustar prefix field (155 bytes at 345) extends the name
            # for paths the base field can't hold; pax/GNU overrides
            # take precedence over both
            prefix = hdr[345:500].split(b"\x00", 1)[0].decode("utf-8")
            if prefix:
                name = f"{prefix}/{name}"
            eff = dict(pax_global)
            eff.update(pax_next)
            if gnu_longname is not None:
                name = gnu_longname
            if "path" in eff:
                name = eff["path"]
            if "size" in eff:
                try:
                    size = int(eff["size"])
                except ValueError as e:
                    raise ValueError("bad pax size record") from e
                if size < 0:
                    raise ValueError("negative pax size record")
            pax_next = {}
            gnu_longname = None
            members.append({"name": name, "size": size})
        else:
            raise ValueError(f"unsupported tar entry type {typeflag!r}")
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
