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
    with pytest.raises(ValueError, match="end-of-archive"):
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
