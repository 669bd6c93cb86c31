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


# --- round 11: BLOOM_FILTER_UTF8 data skipping -----------------------


def _bloom_orc(ints, strs, **kw) -> bytes:
    buf = io.BytesIO()
    orc.write_table(
        pa.table(
            {"k": pa.array(ints, type=pa.int64()), "s": pa.array(strs)}
        ),
        buf,
        bloom_filter_columns=[1, 2],
        bloom_filter_fpp=0.05,
        **kw,
    )
    return buf.getvalue()


def test_long_bloom_hash_pinned_against_producer():
    """Every written int must test present in the pyarrow-written
    bloom (a bloom has no false negatives) — the battery includes
    negatives, >32-bit, int64 extremes and 0, which pins the SIGNED
    Thomas Wang mix: the unsigned textbook variant diverges on any
    value that goes negative mid-mix."""
    from datawarehouseproject_spark.functions.orc_pages import (
        bloom_might_contain,
        orc_long_bloom_hash,
        read_orc_blooms,
    )

    vals = [0, 1, -1, 7, -50000, 2**33 + 123, -(2**40) - 9,
            2**62, -(2**62), 2**63 - 1, -(2**63)]
    blooms = read_orc_blooms(_bloom_orc(vals, [str(v) for v in vals]))
    assert 1 in blooms and blooms[1]
    for v in vals:
        h = orc_long_bloom_hash(v)
        assert any(
            bloom_might_contain(bits, k, h) for k, bits in blooms[1]
        ), f"false negative for int {v}"


def test_unsigned_wang_variant_would_miss():
    """The pin that the mix is signed: re-run the same membership
    probes through the UNSIGNED Wang mix and require at least one
    written value to go missing — if both variants always agreed the
    docstring's claim would be vacuous."""
    from datawarehouseproject_spark.functions.orc_pages import (
        bloom_might_contain,
        read_orc_blooms,
    )

    M = (1 << 64) - 1

    def unsigned_wang(key: int) -> int:
        key &= M
        key = ((~key) + (key << 21)) & M
        key ^= key >> 24
        key = ((key + (key << 3)) + (key << 8)) & M
        key ^= key >> 14
        key = ((key + (key << 2)) + (key << 4)) & M
        key ^= key >> 28
        key = (key + (key << 31)) & M
        return key

    vals = [-1, -50000, -(2**40) - 9, -(2**62), -(2**63)]
    blooms = read_orc_blooms(_bloom_orc(vals, [str(v) for v in vals]))
    misses = sum(
        1 for v in vals
        if not any(
            bloom_might_contain(bits, k, unsigned_wang(v))
            for k, bits in blooms[1]
        )
    )
    assert misses > 0


def test_bytes_bloom_hash_pinned_against_producer():
    """Strings spanning every murmur tail length 0..7 plus
    multi-block (>8, >16 bytes) and non-ASCII UTF-8 — all must test
    present; pins the Hive hash64 h1 lane with seed 104729."""
    from datawarehouseproject_spark.functions.orc_pages import (
        bloom_might_contain,
        orc_bytes_bloom_hash,
        read_orc_blooms,
    )

    strs = ["", "a", "ab", "abc", "abcd", "abcde", "abcdef",
            "abcdefg", "abcdefgh", "abcdefghi", "0123456789abcdef",
            "0123456789abcdefX", "xin chào thế giới", "naïve café"]
    blooms = read_orc_blooms(_bloom_orc(list(range(len(strs))), strs))
    assert 2 in blooms and blooms[2]
    for s in strs:
        h = orc_bytes_bloom_hash(s.encode())
        assert any(
            bloom_might_contain(bits, k, h) for k, bits in blooms[2]
        ), f"false negative for string {s!r}"


def test_bloom_scan_matches_plan_all_seeds():
    from datawarehouseproject_spark.functions.orc_pages import (
        scan_orc_bloom,
        synth_orc_bloom,
        synth_orc_bloom_plan,
    )

    for seed in range(8):
        n = synth_orc_bloom_plan(seed)["n"]
        out = scan_orc_bloom(synth_orc_bloom(seed))
        assert out["n_rows"] == n
        assert out["n_bloom_columns"] == 2
        assert out["hash_functions"] == 4
        assert out["int_present_hits"] == n
        assert out["str_present_hits"] == n
        assert out["int_fp_bounded"] and out["str_fp_bounded"]


def test_bloom_legacy_fixed64_rejects():
    """A BloomFilterIndex carrying the pre-1.6 repeated-fixed64
    bitset (field 2) must loud-reject, not silently mis-probe."""
    from datawarehouseproject_spark.functions.orc_pages import (
        parse_bloom_index,
    )

    # protobuf: msg{1: bf{1: varint 4, 2: fixed64 0}}
    bf = bytes([0x08, 0x04, 0x11]) + b"\x00" * 8
    blob = bytes([0x0A, len(bf)]) + bf
    with pytest.raises(ValueError, match="legacy fixed64"):
        parse_bloom_index(blob)


def test_bloom_shape_fences():
    from datawarehouseproject_spark.functions.orc_pages import (
        bloom_might_contain,
        parse_bloom_index,
    )

    with pytest.raises(ValueError, match="malformed"):
        bloom_might_contain(b"", 4, 12345)
    with pytest.raises(ValueError, match="malformed"):
        bloom_might_contain(b"\xff" * 8, 0, 12345)
    with pytest.raises(ValueError, match="malformed"):
        bloom_might_contain(b"\xff" * 8, 65, 12345)
    with pytest.raises(ValueError, match="no filters"):
        parse_bloom_index(b"")


# --- round 11 continuation: scalar types ------------------------------


def test_scalar_scan_matches_plan_all_seeds():
    import datetime

    from datawarehouseproject_spark.functions.orc_pages import (
        scan_orc_scalars,
        synth_orc_scalars,
        synth_orc_scalars_plan,
    )

    for seed in range(6):
        n = synth_orc_scalars_plan(seed)["n"]
        out = scan_orc_scalars(synth_orc_scalars(seed))
        base_us = (
            int(
                datetime.datetime(
                    2014, 6, 1, tzinfo=datetime.timezone.utc
                ).timestamp()
            )
            + seed % 1000
        ) * 10**6
        assert out["n_rows"] == n
        assert out["bool_true"] == sum(
            1 for i in range(n) if i % 11 != 0 and i % 3 == 0
        )
        assert out["double_sum"] == sum(
            i * 0.25 for i in range(n) if i % 13 != 0
        )
        assert out["ts_micros_sum"] == sum(
            base_us + i * 1_000_003 for i in range(n) if i % 7 != 0
        )
        assert out["date_days_sum"] == sum(
            18000 + seed % 50 + i * 3 - 40
            for i in range(n)
            if i % 17 != 0
        )
        assert out["dec_cents_sum"] == sum(
            (i - 30) * 7 + seed % 100 for i in range(n) if i % 5 != 4
        )


def test_ts_nanos_scale_pinned_vectors():
    """The empirical producer pin, kept as explicit vectors (each
    observed from pyarrow's ORC writer): low bits b scale the
    payload by 10^(b+1)."""
    from datawarehouseproject_spark.functions.orc_pages import _ts_nanos

    assert _ts_nanos(10) == 1_000          # 1<<3 | 2
    assert _ts_nanos(11) == 10_000         # 1<<3 | 3
    assert _ts_nanos(15) == 100_000_000    # 1<<3 | 7
    assert _ts_nanos(47) == 500_000_000    # 5<<3 | 7
    assert _ts_nanos(989) == 123_000_000   # 123<<3 | 5
    assert _ts_nanos(7_999_994) == 999_999_000
    with pytest.raises(ValueError, match="nanos outside"):
        _ts_nanos((10**9) << 3)


def test_decimal_varint_roundtrip_and_fences():
    from datawarehouseproject_spark.functions.orc_pages import (
        _unbounded_varint,
    )

    # zigzag(1234) = 2468 -> a4 13 (observed from pyarrow's writer)
    assert _unbounded_varint(bytes.fromhex("a413"), 0) == (1234, 2)
    assert _unbounded_varint(bytes.fromhex("0d"), 0) == (-7, 1)
    with pytest.raises(ValueError, match="truncated"):
        _unbounded_varint(b"\x80", 0)
    with pytest.raises(ValueError, match="size cap"):
        _unbounded_varint(b"\x80" * 25, 0)


def test_scalar_scan_rejects_wrong_schema():
    from datawarehouseproject_spark.functions.orc_pages import (
        scan_orc_scalars,
        synth_orc_bloom,
    )

    with pytest.raises(ValueError, match="schema mismatch"):
        scan_orc_scalars(synth_orc_bloom(0))


# --- nested types (struct / list / map) ---------------------------------


def test_nested_scan_matches_pyarrow_reread():
    """Value-exact cross-check against the independent producer's own
    reader: every aggregate the hand stripe walker reports must equal
    what pyarrow computes from the same file."""
    import datetime
    import io

    import pyarrow.orc as orc

    EPOCH = datetime.date(1970, 1, 1)

    from datawarehouseproject_spark.functions.orc_pages import (
        scan_orc_nested,
        synth_orc_nested,
    )

    for seed in range(6):
        payload = synth_orc_nested(seed)
        r = scan_orc_nested(payload)
        t = orc.ORCFile(io.BytesIO(payload)).read()
        st = t.column("st").to_pylist()
        li = t.column("li").to_pylist()
        mp = t.column("mp").to_pylist()
        a = [row["a"] for row in st]
        assert r["n_rows"] == len(st)
        assert r["a_sum"] == sum(v for v in a if v is not None)
        assert r["a_nulls"] == sum(1 for v in a if v is None)
        assert r["a_count"] == len(a) - r["a_nulls"]
        assert r["b_bytes"] == sum(len(row["b"]) for row in st)
        c = [row["c"] for row in st]
        assert r["c_cents_sum"] == sum(
            int(v.scaleb(2)) for v in c if v is not None
        )
        assert r["c_nulls"] == sum(1 for v in c if v is None)
        assert r["d_days_sum"] == sum(
            (row["d"] - EPOCH).days for row in st
        )
        ts_epoch = datetime.datetime(
            1970, 1, 1, tzinfo=datetime.timezone.utc
        )
        assert r["e_micros_sum"] == sum(
            (row["e"] - ts_epoch) // datetime.timedelta(microseconds=1)
            for row in st
        )
        assert r["list_nulls"] == sum(1 for v in li if v is None)
        assert r["list_count"] == sum(len(v) for v in li if v is not None)
        assert r["list_sum"] == sum(
            x for v in li if v is not None for x in v
        )
        assert r["map_count"] == sum(len(v) for v in mp)
        assert r["map_key_bytes"] == sum(
            len(k) for v in mp for k, _x in v
        )
        assert r["map_val_sum"] == sum(x for v in mp for _k, x in v)


def test_nested_scan_multi_stripe():
    """Force multiple stripes: per-stripe child recursion must keep
    parent/child counts straight across stripe boundaries."""
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    from datawarehouseproject_spark.functions.orc_pages import (
        scan_orc_nested,
    )

    n = 5000
    import decimal as _dec

    st = pa.array(
        [{"a": None if i % 5 == 0 else i, "b": f"x{i % 13}",
          "c": _dec.Decimal(i % 70).scaleb(-2), "d": i % 300,
          "e": 1_600_000_000_000_000 + i * 1000}
         for i in range(n)],
        type=pa.struct([("a", pa.int64()), ("b", pa.string()),
                        ("c", pa.decimal128(10, 2)),
                        ("d", pa.date32()),
                        ("e", pa.timestamp("us", tz="UTC"))]),
    )
    li = pa.array(
        [None if i % 7 == 6 else [i % 9] * (i % 4) for i in range(n)],
        type=pa.list_(pa.int64()),
    )
    mp = pa.array(
        [[(f"k{j}", i % 50) for j in range(i % 3)] for i in range(n)],
        type=pa.map_(pa.string(), pa.int64()),
    )
    buf = io.BytesIO()
    orc.write_table(
        pa.table({"st": st, "li": li, "mp": mp}), buf,
        compression="uncompressed",
        stripe_size=16 * 1024,
        row_index_stride=1024,
    )
    r = scan_orc_nested(buf.getvalue())
    assert r["n_rows"] == n
    assert r["n_stripes"] >= 2, "fixture failed to force stripes"
    assert r["a_sum"] == sum(i for i in range(n) if i % 5 != 0)
    assert r["list_count"] == sum(
        i % 4 for i in range(n) if i % 7 != 6
    )
    assert r["map_count"] == sum(i % 3 for i in range(n))


def test_nested_dictionary_strings_match_direct():
    """DICTIONARY_V2 inside nested columns (struct child + map keys):
    the dictionary- and direct-encoded forms of the SAME values must
    produce identical aggregates — the encoding is invisible to the
    readout."""
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    from datawarehouseproject_spark.functions.orc_pages import (
        scan_orc_nested,
        synth_orc_nested,
        synth_orc_nested_plan,
    )

    # the synth rotation: odd seed = dictionary, seed+7 (even) =
    # direct; compare a pair built from identical rows instead
    import decimal as _dec

    st = pa.array(
        [{"a": i, "b": f"x{i % 3}",
          "c": _dec.Decimal(i).scaleb(-2), "d": i,
          "e": 1_600_000_000_000_000 + i} for i in range(50)],
        type=pa.struct([("a", pa.int64()), ("b", pa.string()),
                        ("c", pa.decimal128(10, 2)),
                        ("d", pa.date32()),
                        ("e", pa.timestamp("us", tz="UTC"))]),
    )
    li = pa.array([[i] for i in range(50)], type=pa.list_(pa.int64()))
    mp = pa.array(
        [[(f"k{i % 4}", i)] for i in range(50)],
        type=pa.map_(pa.string(), pa.int64()),
    )
    results = []
    for thresh in (0.0, 1.0):
        buf = io.BytesIO()
        orc.write_table(
            pa.table({"st": st, "li": li, "mp": mp}), buf,
            compression="uncompressed",
            dictionary_key_size_threshold=thresh,
        )
        results.append(scan_orc_nested(buf.getvalue()))
    assert results[0] == results[1]
    assert results[0]["b_bytes"] == 50 * 2
    # and the fixture's own odd-seed rotation decodes green
    seed = 7
    plan = synth_orc_nested_plan(seed)
    r = scan_orc_nested(synth_orc_nested(seed))
    assert r["n_rows"] == plan["n"]


def test_nested_scan_unsupported_kind_is_loud():
    """A union-typed column must loud-reject, not silently skip."""
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    from datawarehouseproject_spark.functions.orc_pages import (
        scan_orc_nested,
    )

    # double child inside the struct: kind 6 is outside the nested
    # scan's int/string child scope
    st = pa.array(
        [{"a": float(i), "b": f"x{i}"} for i in range(40)],
        type=pa.struct([("a", pa.float64()), ("b", pa.string())]),
    )
    li = pa.array([[i] for i in range(40)], type=pa.list_(pa.int64()))
    mp = pa.array(
        [[("k", i)] for i in range(40)],
        type=pa.map_(pa.string(), pa.int64()),
    )
    buf = io.BytesIO()
    orc.write_table(
        pa.table({"st": st, "li": li, "mp": mp}), buf,
        compression="uncompressed",
    )
    with pytest.raises(ValueError, match="out of scope"):
        scan_orc_nested(buf.getvalue())


def test_nested_type_tree_fences():
    from datawarehouseproject_spark.functions.orc_pages import (
        _parse_type_tree,
    )

    # subtype id past the type count
    with pytest.raises(ValueError, match="out of range"):
        _parse_type_tree({4: [bytes([0x08, 12, 0x12, 0x01, 0x05])]})
    # non-bytes type entry
    with pytest.raises(ValueError, match="length-delimited"):
        _parse_type_tree({4: [7]})


def test_nested_walk_recurses_list_of_struct():
    """Depth-2 nesting (list<struct<x,y>>): the walk must recurse
    LENGTH -> struct -> children with the child value counts derived
    from the summed lengths — any bookkeeping slip raises inside the
    RLEv2/PRESENT decoders.  The fixture readout keys off the
    schema's top-level names, so n_rows/list_count/a_sum stay
    checkable."""
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    from datawarehouseproject_spark.functions.orc_pages import (
        scan_orc_nested,
    )

    n = 60
    import decimal as _dec

    st = pa.array(
        [{"a": i, "b": f"x{i % 3}",
          "c": _dec.Decimal(i).scaleb(-2), "d": i,
          "e": 1_600_000_000_000_000 + i} for i in range(n)],
        type=pa.struct([("a", pa.int64()), ("b", pa.string()),
                        ("c", pa.decimal128(10, 2)),
                        ("d", pa.date32()),
                        ("e", pa.timestamp("us", tz="UTC"))]),
    )
    li = pa.array(
        [[{"x": i + j, "y": f"y{j}"} for j in range(i % 3)]
         for i in range(n)],
        type=pa.list_(
            pa.struct([("x", pa.int64()), ("y", pa.string())])
        ),
    )
    mp = pa.array(
        [[("k", i)] for i in range(n)],
        type=pa.map_(pa.string(), pa.int64()),
    )
    buf = io.BytesIO()
    orc.write_table(
        pa.table({"st": st, "li": li, "mp": mp}), buf,
        compression="uncompressed",
    )
    r = scan_orc_nested(buf.getvalue())
    assert r["n_rows"] == n
    assert r["list_count"] == sum(i % 3 for i in range(n))
    assert r["a_sum"] == sum(range(n))
    assert r["map_count"] == n


def test_nested_nullable_struct_column():
    """PRESENT on the struct COLUMN itself: children decode at the
    struct's present-count, and a child's own PRESENT composes on
    top (null struct rows contribute nothing to child nulls)."""
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    from datawarehouseproject_spark.functions.orc_pages import (
        scan_orc_nested,
    )

    n = 70
    import decimal as _dec

    st = pa.array(
        [
            None if i % 6 == 2
            else {"a": None if i % 5 == 0 else i, "b": f"x{i % 3}",
                  "c": _dec.Decimal(i).scaleb(-2), "d": i,
                  "e": 1_600_000_000_000_000 + i}
            for i in range(n)
        ],
        type=pa.struct([("a", pa.int64()), ("b", pa.string()),
                        ("c", pa.decimal128(10, 2)),
                        ("d", pa.date32()),
                        ("e", pa.timestamp("us", tz="UTC"))]),
    )
    li = pa.array([[i] for i in range(n)], type=pa.list_(pa.int64()))
    mp = pa.array(
        [[("k", i)] for i in range(n)],
        type=pa.map_(pa.string(), pa.int64()),
    )
    buf = io.BytesIO()
    orc.write_table(
        pa.table({"st": st, "li": li, "mp": mp}), buf,
        compression="uncompressed",
    )
    r = scan_orc_nested(buf.getvalue())
    present = [i for i in range(n) if i % 6 != 2]
    assert r["a_sum"] == sum(i for i in present if i % 5 != 0)
    assert r["a_nulls"] == sum(1 for i in present if i % 5 == 0)
    assert r["a_count"] == sum(1 for i in present if i % 5 != 0)
    assert r["b_count"] == len(present)


def test_type_tree_preorder_invariants():
    """ADVICE r12: a crafted footer that repeats one subtype id at
    every level turns the recursive column walk exponential.  The
    spec's pre-order invariant (child id > parent id, each id claimed
    once) makes parsing linear and rejects the bomb loudly."""
    from datawarehouseproject_spark.functions.orc_pages import (
        _parse_type_tree,
    )

    # struct<kind=12> claiming subtype 1 twice
    with pytest.raises(ValueError, match="claimed twice"):
        _parse_type_tree({4: [
            bytes([0x08, 12, 0x12, 0x02, 0x01, 0x01]),
            bytes([0x08, 0x05]),
        ]})
    # backward reference (type 1 points at type 0)
    with pytest.raises(ValueError, match="violates pre-order"):
        _parse_type_tree({4: [
            bytes([0x08, 12, 0x12, 0x01, 0x01]),
            bytes([0x08, 12, 0x12, 0x01, 0x00]),
        ]})
    # self reference
    with pytest.raises(ValueError, match="violates pre-order"):
        _parse_type_tree({4: [
            bytes([0x08, 12, 0x12, 0x01, 0x00]),
        ]})
    # the 50^8 bomb shape: every level repeats one id many times —
    # must reject in O(types), not hang
    bomb = [bytes([0x08, 12, 0x12, 0x32] + [0x01] * 50)] + [
        bytes([0x08, 12, 0x12, 0x32] + [i + 1] * 50)
        for i in range(1, 8)
    ] + [bytes([0x08, 0x05])] * 8
    with pytest.raises(ValueError):
        _parse_type_tree({4: bomb})
