"""Protobuf wire-format codec tests — functions/protowire.py:
round-trip, zigzag negatives, unknown-field skipping, packed
repeated, malformed-stream quarantine."""

from __future__ import annotations

import struct

import pytest

from datawarehouseproject_spark.functions.protowire import (
    _tag,
    _varint,
    _zigzag,
    parse_record,
    synth_record,
    synth_record_fields,
)


def test_round_trip_all_seeds():
    for seed in range(120):
        assert parse_record(synth_record(seed)) == synth_record_fields(seed)


def test_zigzag_negative_values():
    """Seeds whose balance is negative must decode exactly (zigzag
    maps -1 -> 1, -1000 -> 1999)."""
    seen_negative = False
    for seed in range(60):
        f = synth_record_fields(seed)
        if f["balance"] < 0:
            seen_negative = True
            assert parse_record(synth_record(seed))["balance"] == f["balance"]
    assert seen_negative


def test_unknown_field_skipped_not_fatal():
    """Append extra unknown fields of every wire type: decode must
    survive and count them."""
    extra = (
        _tag(99, 0) + _varint(12345)
        + _tag(98, 5) + struct.pack("<I", 7)
        + _tag(97, 2) + _varint(3) + b"abc"
        + _tag(96, 1) + struct.pack("<Q", 9)
    )
    out = parse_record(synth_record(4) + extra)
    want = synth_record_fields(4)
    assert out["event_count"] == want["event_count"]
    assert out["n_unknown"] == want["n_unknown"] + 4


def test_truncated_and_malformed_raise():
    good = synth_record(7)
    with pytest.raises(ValueError):
        parse_record(good[:-3])  # truncated fixed64 tail
    with pytest.raises(ValueError, match="truncated varint"):
        parse_record(b"\x08\xff")  # continuation bit set, no next byte
    with pytest.raises(ValueError, match="wire type"):
        parse_record(_varint((1 << 3) | 3))  # deprecated group wire type
    with pytest.raises(ValueError, match="64 bits"):
        parse_record(b"\x08" + b"\xff" * 10 + b"\x01")


def test_spark_permissive_quarantine(spark):
    from datawarehouseproject_spark.operators.multimodal import (
        extract_proto_records,
    )

    rows = [
        (5, bytearray(synth_record(5))),
        (66, bytearray(b"\x08\xff")),  # truncated varint
    ]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {
        r["media_id"]: r
        for r in extract_proto_records(media, permissive=True).collect()
    }
    assert out[66]["decode_error"] is not None and out[66]["name"] is None
    assert out[5]["decode_error"] is None
    assert out[5]["balance"] == synth_record_fields(5)["balance"]


def test_zigzag_helper_reference_values():
    assert _zigzag(0) == 0
    assert _zigzag(-1) == 1
    assert _zigzag(1) == 2
    assert _zigzag(-1000) == 1999


def test_varint_twos_complement_like_standard_decoders():
    """Conforming encoders emit negative plain-varint ints as
    10-byte values in [2^63, 2^64): these must DECODE by 64-bit
    truncation + two's complement (review r7, both passes — the
    first fix quarantined them; real int64 -1 is 0xFF..FF). The
    decoded value also fits Arrow's LongType, so nothing escapes
    the quarantine either."""
    # canonical protobuf encoding of int64 -1 in field 1
    payload = b"\x08" + b"\xff" * 9 + b"\x01"
    assert parse_record(payload)["event_count"] == -1
    # 70 low bits all set truncates to 2^64-1 -> -1 as well
    payload2 = b"\x08" + b"\xff" * 9 + b"\x7f"
    assert parse_record(payload2)["event_count"] == -1
    # a negative LENGTH is structural corruption and must still raise
    neg_len = b"\x22" + b"\xff" * 9 + b"\x01" + b"abc"
    with pytest.raises(ValueError, match="negative length"):
        parse_record(neg_len)


def test_sint_large_magnitude_remasked_before_unzigzag():
    """ADVICE r7: sint64 magnitudes >= 2^62 zigzag-encode to values
    >= 2^63, which _read_varint reinterprets as negative int64; the
    decode must re-mask to unsigned before unzigzag. -2^63 decoded
    to 0 before the fix."""
    for want in (-(2**63), 2**63 - 1, -(2**62) - 5, 2**62 + 7):
        enc = _varint(_zigzag(want))
        assert parse_record(b"\x10" + enc)["balance"] == want
