"""ZIP central-directory scanner tests — functions/zipscan.py. The
synthesizer is the STDLIB zipfile writer (independent producer), so
these pin the parser against a real third-party layout, including
the producer-dependent fields the SQL oracle can't reach (CRCs,
compressed sizes)."""

from __future__ import annotations

import io
import zipfile
import zlib

import pytest

from datawarehouseproject_spark.functions.zipscan import (
    scan_zip,
    synth_zip,
    synth_zip_members,
)


def test_scan_matches_member_plan_and_zlib_crc():
    for seed in range(30):
        if seed % 4 == 0:
            continue  # ZIP64 sparse seeds: covered separately below
        got = scan_zip(synth_zip(seed))
        plan = synth_zip_members(seed)
        assert got["n_members"] == len(plan)
        assert got["member_names"] == ",".join(sorted(m["name"] for m in plan))
        assert got["total_uncompressed"] == sum(len(m["content"]) for m in plan)
        crcs = {m["name"]: zlib.crc32(m["content"]) for m in plan}
        sizes = {m["name"]: len(m["content"]) for m in plan}
        for m in got["members"]:
            assert m["crc32"] == crcs[m["name"]]
            assert m["uncomp_size"] == sizes[m["name"]]
            if m["method"] == 0:  # STORED: comp == uncomp
                assert m["comp_size"] == m["uncomp_size"]


def test_eocd_found_through_comment():
    """The archive comment sits AFTER the EOCD signature's fixed
    fields; a forward-only scanner breaks on it."""
    payload = synth_zip(3)
    assert b"corpus-archive-3" in payload[-30:]
    assert scan_zip(payload)["n_members"] == len(synth_zip_members(3))


def test_stdlib_roundtrip_agreement():
    """zipfile's own reader and the hand parser must agree on every
    listed member."""
    payload = synth_zip(7)
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        infos = {i.filename: i for i in zf.infolist()}
    got = scan_zip(payload)
    assert set(m["name"] for m in got["members"]) == set(infos)
    for m in got["members"]:
        assert m["crc32"] == infos[m["name"]].CRC
        assert m["comp_size"] == infos[m["name"]].compress_size


def test_malformed_archives_raise():
    good = synth_zip(2)
    with pytest.raises(ValueError, match="end-of-central-directory"):
        scan_zip(b"not a zip at all")
    # corrupt the central-header signature
    bad = bytearray(good)
    i = bad.find(b"PK\x01\x02")
    bad[i + 1] = 0x00
    with pytest.raises(ValueError, match="signature|end-of-central"):
        scan_zip(bytes(bad))
    # EOCD entry count inflated -> walk must fail loudly
    bad2 = bytearray(good)
    j = bad2.rfind(b"PK\x05\x06")
    bad2[j + 10] = bad2[j + 10] + 1
    with pytest.raises(ValueError):
        scan_zip(bytes(bad2))


def test_spark_permissive_quarantine(spark):
    from datawarehouseproject_spark.operators.multimodal import (
        extract_zip_structure,
    )

    rows = [
        (1, bytearray(synth_zip(1))),
        (42, bytearray(b"PK\x03\x04 truncated local header only")),
    ]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {
        r["media_id"]: r
        for r in extract_zip_structure(media, permissive=True).collect()
    }
    assert out[42]["decode_error"] is not None
    assert out[1]["n_members"] == len(synth_zip_members(1))


def test_tar_scan_matches_plan_and_stdlib():
    import tarfile

    from datawarehouseproject_spark.functions.zipscan import (
        scan_tar,
        synth_tar,
        synth_tar_members,
    )

    for seed in range(25):
        payload = synth_tar(seed)
        got = scan_tar(payload)
        plan = synth_tar_members(seed)
        assert got["n_members"] == len(plan)
        assert got["total_bytes"] == sum(len(m["content"]) for m in plan)
        with tarfile.open(fileobj=io.BytesIO(payload)) as tf:
            assert sorted(i.name for i in tf) == sorted(
                m["name"] for m in plan
            )


def test_tar_checksum_and_truncation_raise():
    from datawarehouseproject_spark.functions.zipscan import scan_tar, synth_tar

    good = synth_tar(5)
    bad = bytearray(good)
    bad[0] = bad[0] ^ 0x01  # flip a name byte: checksum must catch it
    with pytest.raises(ValueError, match="checksum"):
        scan_tar(bytes(bad))
    with pytest.raises(ValueError, match="end-of-archive|truncated"):
        scan_tar(good[:512])  # header but no terminator
    with pytest.raises(ValueError, match="empty tar"):
        scan_tar(b"\x00" * 1024)


def test_tar_negative_size_raises_not_hangs():
    """A crafted negative octal size field used to zero the loop
    advance — an infinite loop no quarantine could catch (review r7
    pass 2)."""
    from datawarehouseproject_spark.functions.zipscan import scan_tar

    hdr = bytearray(512)
    hdr[0:5] = b"a.bin"
    hdr[124:136] = b"-0001000\x00\x00\x00\x00"
    hdr[156:157] = b"0"
    hdr[148:156] = b" " * 8
    ck = sum(hdr)
    hdr[148:156] = (oct(ck)[2:].zfill(6) + "\x00 ").encode()
    with pytest.raises(ValueError, match="negative tar member size"):
        scan_tar(bytes(hdr) + b"\x00" * 1024)


def test_zip_stray_signature_in_comment_quarantines():
    """A 'PK\\x01\\x02' planted in the archive comment with an
    inflated entry count must raise ValueError (not struct.error,
    which would escape the permissive quarantine — review r7
    pass 2)."""
    import zipfile as _zf

    from datawarehouseproject_spark.functions.zipscan import scan_zip

    buf = io.BytesIO()
    with _zf.ZipFile(buf, "w") as zf:
        zf.comment = b"PK\x01\x02 lurking"
        zf.writestr("a.txt", b"hello")
    payload = bytearray(buf.getvalue())
    j = payload.rfind(b"PK\x05\x06")
    payload[j + 10] = 2  # claim two entries; the walk must bound pos
    with pytest.raises(ValueError):
        scan_zip(bytes(payload))


def test_gzip_decode_and_trailer_verification():
    import gzip as _gz

    from datawarehouseproject_spark.functions.zipscan import (
        decode_gzip,
        synth_gzip,
        synth_gzip_plan,
    )

    for seed in range(25):
        p = synth_gzip(seed)
        got = decode_gzip(p)
        plan = synth_gzip_plan(seed)
        assert got["fname"] == plan["fname"]
        assert got["content"] == plan["content"]
        assert _gz.decompress(p) == plan["content"]  # stdlib agrees
    good = bytearray(synth_gzip(3))
    # flip a bit in the stored CRC: decode must refuse
    good[-6] ^= 0x01
    with pytest.raises(ValueError, match="CRC32 mismatch"):
        decode_gzip(bytes(good))
    bad_isize = bytearray(synth_gzip(3))
    bad_isize[-1] ^= 0x01
    with pytest.raises(ValueError, match="ISIZE mismatch"):
        decode_gzip(bytes(bad_isize))
    with pytest.raises(ValueError, match="magic"):
        decode_gzip(b"\x1f\x8c rest")
    # stdlib GzipFile output (no FNAME path) also decodes
    alt = _gz.compress(b"hello world", mtime=0)
    assert decode_gzip(alt)["content"] == b"hello world"


# ---------------------------------------------------------------------------
# ZIP64 + tar pax/GNU long names (round 8 — VERDICT r7 item 2).
# ---------------------------------------------------------------------------


def test_zip64_sparse_archive_scans_with_declared_4gib_sizes():
    from datawarehouseproject_spark.functions.zipscan import (
        scan_zip,
        synth_zip64,
        synth_zip_members,
    )

    for seed in (0, 4, 8, 12):
        got = scan_zip(synth_zip64(seed))
        plan = synth_zip_members(seed)
        assert got["n_members"] == len(plan)
        assert got["n_stored"] == len(plan) and got["n_deflated"] == 0
        assert got["total_uncompressed"] == sum(
            (1 << 32) + len(m["content"]) for m in plan
        )
        assert got["member_names"] == ",".join(
            sorted(m["name"] for m in plan)
        )
        for m in got["members"]:
            assert m["uncomp_size"] > (1 << 32)  # true 64-bit value


def test_zip64_eocd64_pinned_against_stdlib_producer():
    """>65535 members forces the STDLIB zipfile writer to emit the
    saturated EOCD + locator + EOCD64 layout — the independent-
    producer pin for the ZIP64 read path."""
    import io
    import zipfile

    from datawarehouseproject_spark.functions.zipscan import scan_zip

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", allowZip64=True) as zf:
        for i in range(65545):
            zf.writestr(
                zipfile.ZipInfo(f"m{i}", date_time=(2026, 1, 1, 0, 0, 0)),
                b"",
            )
    data = buf.getvalue()
    assert b"PK\x06\x06" in data and b"PK\x06\x07" in data
    got = scan_zip(data)
    assert got["n_members"] == 65545
    assert got["total_uncompressed"] == 0


def test_zip64_malformed_structures_raise():
    import struct

    from datawarehouseproject_spark.functions.zipscan import (
        scan_zip,
        synth_zip64,
    )

    good = synth_zip64(0)
    # saturated EOCD with the locator signature clobbered: the scan
    # falls back to the LITERAL EOCD values (a 65535-member archive
    # legally has count 0xFFFF with no EOCD64 — review r8 pass 1),
    # and the nonsense literal offsets then quarantine in the walk
    no_loc = bytearray(good)
    loc_at = good.rfind(b"PK\x06\x07")
    no_loc[loc_at + 3] ^= 0xFF
    with pytest.raises(ValueError, match="overlaps|runs past"):
        scan_zip(bytes(no_loc))
    # saturated member sizes but the 0x0001 extra id clobbered
    no_extra = bytearray(good)
    cd_at = good.find(b"PK\x01\x02")
    # extra follows the 46-byte fixed header + name
    name_len = struct.unpack_from("<H", good, cd_at + 28)[0]
    no_extra[cd_at + 46 + name_len] = 0x7F
    with pytest.raises(ValueError, match="without ZIP64 extra"):
        scan_zip(bytes(no_extra))


def test_tar_dialects_pax_gnu_ustar_roundtrip():
    from datawarehouseproject_spark.functions.zipscan import (
        scan_tar,
        synth_tar,
        synth_tar_members,
    )

    for seed in range(15):
        data = synth_tar(seed)
        if seed % 3 == 0:
            assert b"@PaxHeader" in data  # pax x-headers present
        elif seed % 3 == 1:
            assert b"././@LongLink" in data  # GNU L entries present
        got = scan_tar(data)
        plan = synth_tar_members(seed)
        assert got["n_members"] == len(plan), seed
        assert got["member_names"] == ",".join(
            sorted(m["name"] for m in plan)
        ), seed
        assert got["total_bytes"] == sum(len(m["content"]) for m in plan)
        if seed % 3 != 2:
            assert all(len(m["name"]) > 100 for m in got["members"])


def test_tar_pax_size_record_overrides_header_field():
    """pax is also how >8 GiB members are expressed (the octal size
    field tops out at 8 GiB): a handcrafted x-header with a ``size``
    record must override the following member's header field — for
    BOTH the reported size and the 512-aligned data skip."""
    import io
    import tarfile

    from datawarehouseproject_spark.functions.zipscan import scan_tar

    # build with stdlib, then verify a genuine pax size override by
    # constructing records by hand over a REAL small payload
    def hdr(name, size, typeflag):
        h = bytearray(512)
        h[0:len(name)] = name.encode()
        h[100:108] = b"0000644\x00"
        h[108:116] = h[116:124] = b"0000000\x00"
        h[124:136] = (b"%011o" % size) + b"\x00"
        h[136:148] = b"00000000000\x00"
        h[156:157] = typeflag
        h[257:263] = b"ustar\x00"
        h[263:265] = b"00"
        h[148:156] = b" " * 8
        ck = sum(h)
        h[148:156] = (b"%06o" % ck) + b"\x00 "
        return bytes(h)

    content = b"xyz"
    # LEN counts the whole record: "10 size=3\n" is exactly 10 bytes
    pax_rec = b"10 size=3\n"
    pax_data = pax_rec + b"\x00" * (512 - len(pax_rec))
    member = hdr("data.bin", 999, b"0")  # LYING header field
    body = content + b"\x00" * (512 - len(content))
    payload = (
        hdr("./PaxHeaders/data.bin", len(pax_rec), b"x")
        + pax_data
        + member
        + body
        + b"\x00" * 1024
    )
    got = scan_tar(payload)
    assert got["n_members"] == 1
    assert got["members"][0]["size"] == 3  # pax record wins
    # malformed pax record lengths quarantine
    bad = payload.replace(b"10 size=3\n", b"99 size=3\n", 1)
    with pytest.raises(ValueError, match="pax record"):
        scan_tar(bad)


def test_tar_ustar_prefix_field_extends_name():
    import io
    import tarfile

    from datawarehouseproject_spark.functions.zipscan import scan_tar

    buf = io.BytesIO()
    name = "q" * 90 + "/" + "r" * 60 + ".bin"  # needs the prefix field
    with tarfile.open(
        fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
    ) as tf:
        info = tarfile.TarInfo(name)
        info.size = 3
        info.mtime = 1
        info.mode = 0o644
        tf.addfile(info, io.BytesIO(b"abc"))
    got = scan_tar(buf.getvalue())
    assert got["member_names"] == name


def test_exactly_65535_members_is_legal_without_zip64():
    """0xFFFF is also the LEGAL literal count of an exactly-65535-
    member archive; CPython's zipfile writes it with a plain EOCD
    and NO EOCD64 (review r8 pass 1 — the first ZIP64 detection
    quarantined these as malformed)."""
    import io
    import zipfile

    from datawarehouseproject_spark.functions.zipscan import scan_zip

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", allowZip64=True) as zf:
        for i in range(65535):
            zf.writestr(
                zipfile.ZipInfo(f"m{i}", date_time=(2026, 1, 1, 0, 0, 0)),
                b"",
            )
    data = buf.getvalue()
    assert b"PK\x06\x06" not in data  # stdlib wrote NO EOCD64
    got = scan_zip(data)
    assert got["n_members"] == 65535
