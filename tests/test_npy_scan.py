"""NPY/NPZ tensor reading — functions/npy_scan.py (round 9):
regex-grammar header parse (no eval), struct data decode with the
fortran-order remap, ZIP+inflate composition for .npz; pinned
against the numpy producer."""

from __future__ import annotations

import io

import numpy as np
import pytest

from datawarehouseproject_spark.functions.npy_scan import (
    parse_npy,
    scan_npz,
    synth_npz,
    synth_npz_plan,
)


def _npy(arr) -> bytes:
    b = io.BytesIO()
    np.save(b, arr)
    return b.getvalue()


def _expected(arr):
    flat = arr.astype(np.int64).ravel(order="C")
    return int(flat.sum()), int(
        sum(int(v) * (i + 1) for i, v in enumerate(flat))
    )


@pytest.mark.parametrize(
    "arr",
    [
        np.arange(12, dtype=np.int64).reshape(3, 4),
        np.asfortranarray(np.arange(12, dtype=np.int32).reshape(3, 4)),
        np.array([], dtype=np.uint8),
        np.arange(24, dtype=np.int16).reshape(2, 3, 4),
        np.asfortranarray(np.arange(24, dtype=np.uint16).reshape(2, 3, 4)),
        np.array([True, False, True]),
        np.arange(7, dtype=np.uint64),
        np.arange(12, dtype=np.int8).reshape(4, 3) - 5,
        np.arange(12).reshape(3, 4).astype(">i4"),  # big-endian descr
        np.int64(41) * np.ones((1, 1), dtype=np.int64),
    ],
    ids=lambda a: f"{a.dtype}-{a.shape}-{'F' if a.flags.f_contiguous and a.ndim > 1 and not a.flags.c_contiguous else 'C'}",
)
def test_parse_npy_matches_numpy(arr):
    st = parse_npy(_npy(arr))
    want_sum, want_w = _expected(arr)
    assert st["n_elements"] == arr.size
    assert st["value_sum"] == want_sum
    assert st["weighted_sum"] == want_w
    assert st["ndim"] == arr.ndim


def test_fortran_weighted_sum_differs_from_naive_read():
    """The weighted checksum is the point: misreading a column-major
    buffer as row-major keeps the plain sum but changes the weighted
    one — prove the two orders genuinely disagree on this array."""
    a = np.arange(12, dtype=np.int64).reshape(3, 4)
    f = np.asfortranarray(a)
    naive = sum(
        int(v) * (i + 1)
        for i, v in enumerate(a.ravel(order="F").astype(np.int64))
    )
    st = parse_npy(_npy(f))
    _, want_w = _expected(f)
    assert st["weighted_sum"] == want_w != naive


def test_header_is_not_evaled():
    """A header whose dict literal carries a call must be rejected by
    the regex grammar, not executed."""
    payload = bytearray(_npy(np.arange(4, dtype=np.int64)))
    # splice a hostile descr into the header text
    hostile = payload.replace(b"'descr': '<i8'", b"'descr': __import__")
    with pytest.raises(ValueError):
        parse_npy(bytes(hostile))


def test_npz_container_modes():
    for seed in range(24):
        plan = synth_npz_plan(seed)
        st = scan_npz(synth_npz(seed))
        assert st["n_arrays"] == plan["n_arrays"], seed
        assert st["n_deflated"] == (
            plan["n_arrays"] if plan["compressed"] else 0
        ), seed
        assert st["n_fortran"] == sum(
            1 for a in plan["arrays"] if a["fortran"]
        ), seed


def test_npz_crc_is_verified():
    payload = bytearray(synth_npz(1))  # uncompressed (STORED) container
    # flip a data byte inside the first member's tensor body
    payload[120] ^= 0x01
    with pytest.raises(ValueError):
        scan_npz(bytes(payload))


def test_truncations_raise():
    good = _npy(np.arange(10, dtype=np.int32))
    for cut in (0, 5, 9, len(good) - 2):
        with pytest.raises(ValueError):
            parse_npy(good[:cut])
    z = synth_npz(2)
    with pytest.raises(ValueError):
        scan_npz(z[: len(z) // 2])


def test_float_dtype_is_a_loud_boundary():
    with pytest.raises(ValueError):
        parse_npy(_npy(np.array([1.5, 2.5])))


def test_local_header_pointing_at_file_tail_quarantines():
    """A central-directory local_off aimed at a 'PK\\x03\\x04' inside
    the file's last 30 bytes passes the magic check but has no room
    for a full local header; that must be ValueError (quarantine),
    never struct.error."""
    import struct as _struct
    import zipfile

    buf = io.BytesIO()
    np.savez(buf, a=np.arange(5, dtype=np.int64))
    with zipfile.ZipFile(buf, "a") as zf:
        zf.comment = b"PK\x03\x04" + b"\x00" * 10
    payload = bytearray(buf.getvalue())
    cd = payload.rfind(b"PK\x01\x02")
    assert cd != -1
    fake_off = len(payload) - 14  # start of the comment bytes
    _struct.pack_into("<I", payload, cd + 42, fake_off)
    with pytest.raises(ValueError):
        scan_npz(bytes(payload))
