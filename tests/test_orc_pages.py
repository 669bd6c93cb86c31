"""ORC stripe-data decoder (functions/orc_pages.py): RLEv2 pinned
against the Apache ORC spec's published worked examples AND the
independent pyarrow producer."""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.orc as orc
import pytest

from datawarehouseproject_spark.functions.orc_pages import (
    rle_v2_decode,
    scan_orc_values,
    synth_orc_values,
    synth_orc_values_plan,
)


def _orc_bytes(cols: dict) -> bytes:
    buf = io.BytesIO()
    orc.write_table(pa.table(cols), buf, compression="uncompressed")
    return buf.getvalue()


# --- the ORC spec's own worked examples (§ Run Length Encoding v2) ---


def test_spec_short_repeat():
    # 10000 repeated 5 times -> 0x0a 0x27 0x10
    assert rle_v2_decode(bytes([0x0A, 0x27, 0x10]), 5, signed=False) == [10000] * 5


def test_spec_direct():
    # [23713, 43806, 57005, 48879] -> 5e 03 5c a1 ab 1e de ad be ef
    assert rle_v2_decode(
        bytes.fromhex("5e035ca1ab1edeadbeef"), 4, signed=False
    ) == [23713, 43806, 57005, 48879]


def test_spec_delta():
    # [2,3,5,7,11,13,17,19,23,29] -> c6 09 02 02 22 42 42 46
    assert rle_v2_decode(
        bytes.fromhex("c609020222424246"), 10, signed=False
    ) == [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]


def test_patched_base_via_producer():
    """PATCHED_BASE has no compact spec vector; pin it through the
    producer: sparse huge outliers over small values make the ORC
    writer emit kind-2 runs (verified by header inspection), and the
    decoded sum must be exact — including negative bases
    (sign-magnitude, not two's complement)."""
    vals = [(i * 37) % 120 + (10_000_000 if i % 97 == 0 else 0) for i in range(500)]
    out = scan_orc_values(_orc_bytes({"k": pa.array(vals, type=pa.int64())}))
    assert out["int_sum"] == sum(vals)
    neg = [-(i % 50) - ((1 << 40) if i % 83 == 0 else 0) for i in range(400)]
    out = scan_orc_values(_orc_bytes({"k": pa.array(neg, type=pa.int64())}))
    assert out["int_sum"] == sum(neg)


def test_rle_malformed_rejected():
    with pytest.raises(ValueError, match="exhausted"):
        rle_v2_decode(bytes([0x0A, 0x27, 0x10]), 6, signed=False)  # too few
    with pytest.raises(ValueError, match="declares"):
        rle_v2_decode(bytes([0x0A, 0x27, 0x10]), 4, signed=False)  # too many
    with pytest.raises(ValueError, match="truncated"):
        rle_v2_decode(bytes([0x5E, 0x03, 0x5C]), 4, signed=False)
    with pytest.raises(ValueError):
        rle_v2_decode(b"", 1, signed=False)


def test_producer_roundtrip_plans():
    for seed in (0, 1, 7, 33, 58):
        plan = synth_orc_values_plan(seed)
        out = scan_orc_values(synth_orc_values(seed))
        assert out["n_rows"] == plan["n"]
        assert out["int_sum"] == sum(plan["k"])
        assert out["str_bytes"] == sum(len(s) for s in plan["s"])
        assert out["int_count"] == out["str_count"] == plan["n"]
        assert out["n_stripes"] == 1


def test_multi_stripe_rows_crosscheck():
    """Force several stripes and verify per-stripe decode + the
    rows_seen == footer total consistency gate."""
    vals = list(range(9000))
    buf = io.BytesIO()
    orc.write_table(
        pa.table({"k": pa.array(vals, type=pa.int64())}),
        buf,
        compression="uncompressed",
        stripe_size=16 * 1024,
    )
    out = scan_orc_values(buf.getvalue())
    assert out["n_stripes"] > 1
    assert out["n_rows"] == 9000
    assert out["int_sum"] == sum(vals)


def test_out_of_scope_profiles_quarantine():
    with pytest.raises(ValueError, match="compressed ORC"):
        buf = io.BytesIO()
        orc.write_table(pa.table({"k": [1, 2, 3]}), buf, compression="zlib")
        scan_orc_values(buf.getvalue())
    with pytest.raises(ValueError, match="PRESENT|scope"):
        scan_orc_values(
            _orc_bytes({"k": pa.array([1, None, 3], type=pa.int64())})
        )
    with pytest.raises(ValueError, match="out of scope"):
        scan_orc_values(_orc_bytes({"f": pa.array([1.5, 2.5])}))
    with pytest.raises(ValueError, match="ORC"):
        scan_orc_values(b"PAR1 not orc")


# round 11: compressed stripes + PRESENT + dictionary


def test_rich_scan_matches_plan_all_seeds():
    from datawarehouseproject_spark.functions.orc_pages import (
        scan_orc_rich,
        synth_orc_rich,
        synth_orc_rich_plan,
    )

    for seed in range(6):
        p = synth_orc_rich_plan(seed)
        r = scan_orc_rich(synth_orc_rich(seed))
        nn = [x for x in p["k"] if x is not None]
        ss = [x for x in p["s"] if x is not None]
        assert r["n_rows"] == p["n"]
        assert r["codec"] == (1 if p["compression"] == "zlib" else 2)
        assert r["int_sum"] == sum(nn)
        assert r["int_count"] == len(nn)
        assert r["int_nulls"] == p["n"] - len(nn)
        assert r["str_bytes"] == sum(len(x) for x in ss)
        assert r["str_count"] == len(ss)
        assert r["str_nulls"] == p["n"] - len(ss)
        assert r["dict_entries"] == r["n_stripes"] * len(set(ss))


def test_byte_rle_run_and_literal_forms():
    from datawarehouseproject_spark.functions.orc_pages import (
        _byte_rle_decode,
    )

    # header 0 -> 3 copies; header 130 -> 126 literals... use small:
    assert _byte_rle_decode(b"\x00\xab") == b"\xab" * 3
    assert _byte_rle_decode(b"\x7f\x01") == b"\x01" * 130
    assert _byte_rle_decode(b"\xfe\x05\x06") == b"\x05\x06"
    with pytest.raises(ValueError, match="truncated"):
        _byte_rle_decode(b"\x00")
    with pytest.raises(ValueError, match="truncated"):
        _byte_rle_decode(b"\xfd\x01")


def test_bool_rle_length_fences():
    from datawarehouseproject_spark.functions.orc_pages import (
        _bool_rle_decode,
    )

    # one literal byte 0b10110000 -> 8 bits
    blob = b"\xff\xb0"
    assert _bool_rle_decode(blob, 8) == [1, 0, 1, 1, 0, 0, 0, 0]
    assert _bool_rle_decode(blob, 5) == [1, 0, 1, 1, 0]
    with pytest.raises(ValueError, match="shorter"):
        _bool_rle_decode(blob, 9)
    with pytest.raises(ValueError, match="longer"):
        _bool_rle_decode(blob + blob, 3)


def test_dictionary_index_out_of_range_quarantines():
    """Corrupt the DATA (index) stream of a dictionary column: any
    escape would be an IndexError, not ValueError."""
    from datawarehouseproject_spark.functions.orc_pages import (
        scan_orc_rich,
        synth_orc_rich,
    )

    blob = bytearray(synth_orc_rich(0))
    # brute-force single-byte corruption across the data region and
    # require the quarantine contract to hold
    seen_error = 0
    for pos in range(3, min(len(blob) - 30, 400), 7):
        old = blob[pos]
        blob[pos] = old ^ 0xFF
        try:
            scan_orc_rich(bytes(blob))
        except ValueError:
            seen_error += 1
        finally:
            blob[pos] = old
    assert seen_error > 0
