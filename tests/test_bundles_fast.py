"""The fast USTAR codec in ``functions/bundles.py`` must be
byte-identical (write) and dict-identical (read) to the tarfile
implementation it replaced, and every malformed/unusual shape must
keep the old ValueError fencing by falling back to tarfile."""

import io
import tarfile

import pytest

from datawarehouseproject_spark.functions.bundles import (
    _read_fast,
    _write_slow,
    read_tar_bundle,
    write_tar_bundle,
)


CASES = [
    {},
    {"a.json": b""},
    {"_delta_log/00000000000000000000.json": b'{"x":1}' * 100},
    {
        "part-00000.parquet": b"PAR1" + bytes(3000),
        "_delta_log/0.json": b"{}",
        "metadata/v1.metadata.json": b"m" * 511,
        "data/pb=3/part-0.parquet": b"q" * 513,
        "z" * 99: b"edge-name",
    },
    {f"f{i:03d}.bin": bytes(i * 37 % 256 for _ in range(i)) for i in range(40)},
]


@pytest.mark.parametrize("files", CASES)
def test_write_byte_identical_to_tarfile(files):
    assert write_tar_bundle(files) == _write_slow(files)


@pytest.mark.parametrize("files", CASES)
def test_read_roundtrip_and_parity(files):
    payload = write_tar_bundle(files)
    assert read_tar_bundle(payload) == files
    assert _read_fast(payload) == files


def test_long_name_falls_back_and_roundtrips():
    files = {"d/" + "n" * 120: b"long-name member"}
    payload = write_tar_bundle(files)
    assert payload == _write_slow(files)
    assert read_tar_bundle(payload) == files  # pax record -> tarfile path


def test_malformed_payloads_raise_valueerror():
    good = write_tar_bundle({"a.bin": b"x" * 700})
    for bad in (b"", b"garbage" * 100, good[:512], good[:700], good[:100]):
        with pytest.raises(ValueError):
            read_tar_bundle(bad)


def test_corrupt_checksum_falls_back_to_tarfile_error():
    # flip a payload byte inside the NAME field without fixing the
    # checksum: tarfile raises ReadError -> ValueError; the fast path
    # must not silently parse it (ADVICE r14)
    payload = bytearray(write_tar_bundle({"a.bin": b"x" * 100}))
    payload[0] ^= 0xFF
    assert _read_fast(bytes(payload)) is None
    with pytest.raises(ValueError):
        read_tar_bundle(bytes(payload))


def _forge_member(name: bytes, typeflag: bytes) -> bytes:
    hdr = bytearray(512)
    hdr[0 : len(name)] = name
    hdr[100:108] = b"0000644\x00"
    hdr[108:116] = b"0000000\x00"
    hdr[116:124] = b"0000000\x00"
    hdr[124:136] = b"00000000000\x00"
    hdr[136:148] = b"00000000000\x00"
    hdr[148:156] = b"        "
    hdr[156:157] = typeflag
    hdr[257:265] = b"ustar\x0000"
    hdr[148:156] = ("%06o" % sum(hdr)).encode() + b"\x00 "
    return bytes(hdr) + b"\x00" * 1024


def test_trailing_slash_members_defer_to_tarfile():
    # ADVICE r14: a '/'-ending name must go through tarfile, which
    # reclassifies the V7 AREGTYPE (\x00) form as a DIRECTORY (the
    # "non-file tar member" fence) but keeps the REGTYPE ('0') form a
    # regular file — the fast path defers on both so the verdicts
    # stay tarfile's either way
    v7 = _forge_member(b"d/", b"\x00")
    assert _read_fast(v7) is None
    with pytest.raises(ValueError, match="non-file tar member"):
        read_tar_bundle(v7)
    reg = _forge_member(b"d/", b"0")
    assert _read_fast(reg) is None
    assert read_tar_bundle(reg) == {"d/": b""}


def test_zero_block_archive_matches_tarfile():
    # ADVICE r14 suspected a divergence here; in fact tarfile "r:"
    # yields NO members for a zero-block-only archive (it is the
    # zero-LENGTH payload that raises "empty file") — pin both
    with tarfile.open(fileobj=io.BytesIO(b"\x00" * 10240), mode="r:") as tf:
        assert tf.getmembers() == []
    assert _read_fast(b"\x00" * 10240) == {}
    assert read_tar_bundle(b"\x00" * 10240) == {}
    with pytest.raises(ValueError, match="empty file"):
        read_tar_bundle(b"")


def test_size_cap_enforced():
    # forge a header declaring a huge member without carrying it:
    # the fast path must reject it with the cap error, not OOM
    files = {"big.bin": b"x"}
    payload = bytearray(write_tar_bundle(files))
    payload[124:136] = ("%011o" % (1 << 29)).encode() + b"\x00"
    chk = sum(payload[0:148]) + sum(payload[156:512]) + 8 * 32
    payload[148:156] = ("%06o" % chk).encode() + b"\x00 "
    with pytest.raises(ValueError, match="size cap"):
        read_tar_bundle(bytes(payload))


def test_read_parquet_blob_equals_read_table():
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datawarehouseproject_spark.functions.bundles import (
        read_parquet_blob,
    )

    cases = [
        pa.table({"v": list(range(60))}),
        pa.table(
            {"v": pa.array([1, None, 3], pa.int64()), "s": ["a", "b", None]}
        ),
        pa.table({"add": [{"path": "x", "size": 3}], "remove": [None]}),
        pa.table({"v": pa.array([], pa.int64())}),
    ]
    for t in cases:
        buf = io.BytesIO()
        pq.write_table(t, buf)
        got = read_parquet_blob(buf.getvalue())
        want = pq.read_table(io.BytesIO(buf.getvalue()))
        assert got.equals(want) and got.schema == want.schema
    with pytest.raises(Exception):
        read_parquet_blob(b"garbage" * 10)
