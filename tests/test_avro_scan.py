"""Avro object container reader — functions/avro_scan.py (round 10):
spec-layout walk (metadata map, schema JSON, block framing, sync
markers), codec rotation, and the quarantine contract."""

from __future__ import annotations

import struct
import zlib

import pytest

from datawarehouseproject_spark.functions.avro_scan import (
    iter_avro_records,
    parse_avro_schema,
    scan_avro,
    synth_avro,
    synth_avro_plan,
)


def test_scan_matches_plan_across_codecs():
    for seed in range(9):  # seeds 0-8 hit all three codecs 3x
        p = synth_avro_plan(seed)
        nb, npb = p["n_blocks"], p["recs_per_block"]
        r = scan_avro(synth_avro(seed))
        assert r["n_records"] == nb * npb
        assert r["id_sum"] == sum(
            (seed * 13 + i * 7 + b) % 5000 - 1000
            for b in range(nb) for i in range(npb)
        )
        assert r["ratio_sum"] == sum(
            ((seed + i * 3 + b) % 16) * 0.25
            for b in range(nb) for i in range(npb)
        )


def test_sync_marker_mismatch_refused():
    blob = bytearray(synth_avro(0))  # null codec
    # the sync marker repeats after every block; corrupt the last one
    blob[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync marker"):
        scan_avro(bytes(blob))


def test_snappy_crc_verified():
    blob = bytearray(synth_avro(2))  # seed%3==2 -> snappy
    # last 20 bytes: 4-byte CRC + 16-byte sync; flip a CRC byte
    blob[-20] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        scan_avro(bytes(blob))


def test_schema_boundaries_are_loud():
    with pytest.raises(ValueError, match="not a record"):
        parse_avro_schema(b'{"type": "array", "items": "long"}')
    with pytest.raises(ValueError, match="union beyond"):
        parse_avro_schema(
            b'{"type":"record","name":"r","fields":'
            b'[{"name":"x","type":["long","string"]}]}'
        )
    with pytest.raises(ValueError, match="unsupported"):
        parse_avro_schema(
            b'{"type":"record","name":"r","fields":'
            b'[{"name":"x","type":"bytes"}]}'
        )


def test_block_decode_must_consume_exactly():
    """Extra trailing bytes inside a block are corruption, not
    ignorable padding — build a one-record block with a stray byte."""
    from datawarehouseproject_spark.functions.avro_scan import (
        _MAGIC,
        _SCHEMA_JSON,
        _encode_record,
        _zigzag_write,
    )

    sync = bytes(range(16))
    out = bytearray(_MAGIC)
    out += _zigzag_write(2)
    for k, v in ((b"avro.schema", _SCHEMA_JSON), (b"avro.codec", b"null")):
        out += _zigzag_write(len(k)) + k
        out += _zigzag_write(len(v)) + v
    out += _zigzag_write(0)
    out += sync
    body = _encode_record(0, 0, 0) + b"\x00"  # stray trailing byte
    out += _zigzag_write(1) + _zigzag_write(len(body)) + body + sync
    with pytest.raises(ValueError, match="decoded"):
        scan_avro(bytes(out))


def test_union_branch_and_bool_validation():
    records = list(iter_avro_records(synth_avro(1)))
    assert all(isinstance(r["ok"], bool) for r in records)
    assert any(r["opt"] is None for r in records)
    assert any(isinstance(r["opt"], int) for r in records)


def test_reversed_union_order_decodes():
    """Review r10 pass 2: ['long', 'null'] is legal Avro with null =
    branch 1; hardcoding branch 0 = null silently corrupts values."""
    import json
    import zlib

    from datawarehouseproject_spark.functions.avro_scan import (
        _MAGIC,
        _zigzag_write,
    )

    schema = json.dumps({
        "type": "record", "name": "r",
        "fields": [
            {"name": "a", "type": ["long", "null"]},
            {"name": "b", "type": "long"},
        ],
    }).encode()
    sync = bytes(range(16))
    out = bytearray(_MAGIC)
    out += _zigzag_write(2)
    for k, v in ((b"avro.schema", schema), (b"avro.codec", b"null")):
        out += _zigzag_write(len(k)) + k
        out += _zigzag_write(len(v)) + v
    out += _zigzag_write(0)
    out += sync
    # record 1: a = 5 (branch 0 = long), b = 7
    # record 2: a = null (branch 1), b = 9
    body = (
        _zigzag_write(0) + _zigzag_write(5) + _zigzag_write(7)
        + _zigzag_write(1) + _zigzag_write(9)
    )
    out += _zigzag_write(2) + _zigzag_write(len(body)) + body + sync
    recs = list(iter_avro_records(bytes(out)))
    assert recs == [{"a": 5, "b": 7}, {"a": None, "b": 9}]


def test_oversized_varint_masked_to_int64():
    """Review r10 pass 2: a 10-byte varint carries up to 70 raw bits;
    unmasked it escapes as OverflowError at the Arrow boundary."""
    from datawarehouseproject_spark.functions.avro_scan import (
        _zigzag_read,
        _zigzag_write,
    )

    v, _ = _zigzag_read(b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x3f", 0)
    assert -(1 << 63) <= v < (1 << 63)
    # round-trip stays exact for genuine int64 extremes
    for x in (0, -1, (1 << 63) - 1, -(1 << 63)):
        got, _ = _zigzag_read(_zigzag_write(x), 0)
        assert got == x


def test_deflate_trailing_garbage_refused():
    import zlib

    from datawarehouseproject_spark.functions.avro_scan import (
        _MAGIC,
        _SCHEMA_JSON,
        _encode_record,
        _zigzag_write,
    )

    sync = bytes(range(16))
    out = bytearray(_MAGIC)
    out += _zigzag_write(2)
    for k, v in ((b"avro.schema", _SCHEMA_JSON), (b"avro.codec", b"deflate")):
        out += _zigzag_write(len(k)) + k
        out += _zigzag_write(len(v)) + v
    out += _zigzag_write(0)
    out += sync
    comp = zlib.compressobj(9, zlib.DEFLATED, -15)
    body = comp.compress(_encode_record(0, 0, 0)) + comp.flush()
    body += b"GARBAGE"  # inside the declared block length
    out += _zigzag_write(1) + _zigzag_write(len(body)) + body + sync
    with pytest.raises(ValueError, match="trailing bytes"):
        scan_avro(bytes(out))


def test_union_with_record_branch_raises_valueerror_not_typeerror():
    """ADVICE r10: ['null', {'type': 'record', ...}] made the flat
    parser do an unhashable set-membership test -> TypeError escaping
    the ValueError-only quarantine."""
    import json

    from datawarehouseproject_spark.functions.avro_scan import (
        parse_avro_schema,
    )

    schema = json.dumps({
        "type": "record", "name": "r",
        "fields": [
            {"name": "a", "type": ["null", {"type": "record",
                                            "name": "inner",
                                            "fields": []}]},
        ],
    }).encode()
    with pytest.raises(ValueError, match="unsupported"):
        parse_avro_schema(schema)
    # a bare dict type (no union) hits the same fence
    schema2 = json.dumps({
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": {"type": "fixed",
                                          "name": "f", "size": 4}}],
    }).encode()
    with pytest.raises(ValueError, match="unsupported"):
        parse_avro_schema(schema2)


def test_id_sum_overflow_quarantined():
    """ADVICE r10: per-record ids are int64-masked but their SUM can
    leave int64; Arrow's LongType conversion would raise OverflowError
    after the quarantine."""
    import json

    from datawarehouseproject_spark.functions.avro_scan import (
        _MAGIC,
        _zigzag_write,
    )

    schema = json.dumps({
        "type": "record", "name": "doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "ratio", "type": "double"},
            {"name": "ok", "type": "boolean"},
            {"name": "opt", "type": ["null", "long"]},
        ],
    }).encode()
    sync = bytes(range(16))
    out = bytearray(_MAGIC)
    out += _zigzag_write(2)
    for k, v in ((b"avro.schema", schema), (b"avro.codec", b"null")):
        out += _zigzag_write(len(k)) + k
        out += _zigzag_write(len(v)) + v
    out += _zigzag_write(0)
    out += sync
    big = (1 << 63) - 1
    rec = (
        _zigzag_write(big)                       # id
        + _zigzag_write(1) + b"x"                # name
        + struct.pack("<d", 0.5)                 # ratio
        + b"\x01"                                # ok
        + _zigzag_write(0)                       # opt -> null branch
    )
    body = rec + rec + rec
    out += _zigzag_write(3) + _zigzag_write(len(body)) + body + sync
    with pytest.raises(ValueError, match="overflows int64"):
        scan_avro(bytes(out))


def test_complex_types_roundtrip():
    """Round 11: array/map/enum/fixed/general-union container."""
    from datawarehouseproject_spark.functions.avro_scan import (
        scan_avro_complex,
        synth_avro_complex,
        synth_avro_complex_plan,
    )

    for seed in range(6):
        n = synth_avro_complex_plan(seed)["n_records"]
        r = scan_avro_complex(synth_avro_complex(seed))
        assert r["n_records"] == n
        assert r["tag_chars"] == 2 * r["tag_count"]
        assert r["n_red"] + r["n_green"] + r["n_blue"] == n
        assert r["u_nulls"] == sum(1 for i in range(n) if i % 3 == 2)


def test_general_union_branch_out_of_range_quarantines():
    from datawarehouseproject_spark.functions.avro_scan import (
        _COMPLEX_SCHEMA_JSON,
        _zigzag_write,
        decode_avro_blocks,
        encode_avro_container,
    )

    # record with union branch 3 (only 0..2 exist)
    body = (
        _zigzag_write(1)            # id
        + _zigzag_write(0)          # tags: empty
        + _zigzag_write(0)          # props: empty
        + _zigzag_write(0)          # enum RED
        + bytes(4)                  # fixed
        + _zigzag_write(3)          # union branch out of range
    )
    blob = encode_avro_container(_COMPLEX_SCHEMA_JSON, [body], bytes(16))
    with pytest.raises(ValueError, match="union branch 3 out of range"):
        decode_avro_blocks(blob)


def test_enum_index_out_of_range_quarantines():
    from datawarehouseproject_spark.functions.avro_scan import (
        _COMPLEX_SCHEMA_JSON,
        _zigzag_write,
        decode_avro_blocks,
        encode_avro_container,
    )

    body = (
        _zigzag_write(1)
        + _zigzag_write(0)
        + _zigzag_write(0)
        + _zigzag_write(7)          # enum index 7 of 3
        + bytes(4)
        + _zigzag_write(2)          # union: null
    )
    blob = encode_avro_container(_COMPLEX_SCHEMA_JSON, [body], bytes(16))
    with pytest.raises(ValueError, match="enum index 7 out of range"):
        decode_avro_blocks(blob)


def test_map_nonstring_value_framing():
    """Map decode honors the negative-count skippable form."""
    import json as _json

    from datawarehouseproject_spark.functions.avro_scan import (
        _zigzag_write,
        decode_avro_blocks,
        encode_avro_container,
    )

    schema = _json.dumps({
        "type": "record", "name": "r",
        "fields": [
            {"name": "m", "type": {"type": "map", "values": "long"}},
        ],
    }).encode()
    key = b"k1"
    inner = _zigzag_write(len(key)) + key + _zigzag_write(42)
    body = (
        _zigzag_write(-1)                    # skippable form: 1 entry
        + _zigzag_write(len(inner))          # block byte size
        + inner
        + _zigzag_write(0)
    )
    blob = encode_avro_container(schema, [body], bytes(16))
    (rec,) = decode_avro_blocks(blob)
    assert rec == {"m": {"k1": 42}}


def test_logical_types_roundtrip_and_fences():
    import json as _json

    from datawarehouseproject_spark.functions.avro_scan import (
        decode_decimal_unscaled,
        parse_logical_types,
        scan_avro_logical,
        synth_avro_logical,
    )

    r = scan_avro_logical(synth_avro_logical(3))
    assert r["n_records"] == 15
    assert r["n_negative"] > 0  # two's complement exercised

    # decimal precision fence
    with pytest.raises(ValueError, match="precision"):
        decode_decimal_unscaled((10**9).to_bytes(5, "big"), 9)
    assert decode_decimal_unscaled(b"\xff", 2) == -1

    # unknown annotation ignored per spec; bad decimal loud-rejects
    ok = _json.dumps({
        "type": "record", "name": "r",
        "fields": [
            {"name": "a", "type": {"type": "long",
                                   "logicalType": "future-thing"}},
        ],
    }).encode()
    assert parse_logical_types(ok) == {}
    bad = _json.dumps({
        "type": "record", "name": "r",
        "fields": [
            {"name": "a", "type": {"type": "bytes",
                                   "logicalType": "decimal",
                                   "precision": 99, "scale": 2}},
        ],
    }).encode()
    with pytest.raises(ValueError, match="precision"):
        parse_logical_types(bad)


def test_logical_duplicate_field_schema_quarantines():
    """Review r11 pass 5 (reproduced escape): a schema listing
    'amount' twice — date first, plain bytes second — made the two
    schema validators disagree and decode_decimal_unscaled received
    precision=None -> TypeError past the quarantine."""
    import json as _json

    from datawarehouseproject_spark.functions.avro_scan import (
        _zigzag_write,
        encode_avro_container,
        scan_avro_logical,
    )

    schema = _json.dumps({
        "type": "record", "name": "txn",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "amount",
             "type": {"type": "int", "logicalType": "date"}},
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "ts",
             "type": {"type": "long",
                      "logicalType": "timestamp-micros"}},
            {"name": "amount", "type": "bytes"},
        ],
    }).encode()
    body = (
        _zigzag_write(1) + _zigzag_write(19000) + _zigzag_write(19000)
        + _zigzag_write(1_700_000_000_000_000)
        + _zigzag_write(1) + b"\x05"
    )
    blob = encode_avro_container(schema, [body], bytes(16))
    with pytest.raises(ValueError, match="annotations mismatch"):
        scan_avro_logical(blob)


# --- schema resolution (reader vs writer) -----------------------------


def test_evolved_scan_matches_plan_all_seeds():
    from datawarehouseproject_spark.functions.avro_scan import (
        scan_avro_evolved,
        synth_avro_evolved,
        synth_avro_evolved_plan,
    )

    for seed in range(8):
        p = synth_avro_evolved_plan(seed)
        n = p["n"]
        out = scan_avro_evolved(synth_avro_evolved(seed))
        assert out["n_records"] == n
        assert out["id_sum"] == sum(i + seed % 50 for i in range(n))
        assert out["score_sum"] == sum(i * 0.25 for i in range(n))
        assert out["name_bytes"] == sum(
            1 + len(str(i)) for i in range(n)
        )
        want_emea = (
            n if seed % 2 == 0
            else sum(1 for i in range(n) if i % 4 != 0)
        )
        assert out["region_emea"] == want_emea
        assert out["color_code_sum"] == sum(
            (1, 2, 0)[i % 3] for i in range(n)
        )


def test_resolution_rules_unit():
    from datawarehouseproject_spark.functions.avro_scan import (
        _decode_resolved,
        _zigzag_write,
        resolve_avro_schemas,
    )

    # promotion int -> long on the wire
    plan = resolve_avro_schemas("int", "long")
    assert plan == ("promote", "int", "long")
    v, pos = _decode_resolved(_zigzag_write(-7), 0, plan)
    assert v == -7 and pos == 1
    # string -> bytes and back
    plan = resolve_avro_schemas("string", "bytes")
    data = _zigzag_write(2) + b"hi"
    assert _decode_resolved(data, 0, plan)[0] == b"hi"
    plan = resolve_avro_schemas("bytes", "string")
    assert _decode_resolved(data, 0, plan)[0] == "hi"
    # enum matched by NAME across different symbol orders
    w = {"type": "enum", "name": "c", "symbols": ["red", "green"]}
    r = {"type": "enum", "name": "c", "symbols": ["green", "red"]}
    plan = resolve_avro_schemas(w, r)
    assert plan == ("enum", ("red", "green"))
    # unknown writer symbol falls back to the reader default
    w2 = {"type": "enum", "name": "c", "symbols": ["red", "pink"]}
    r2 = {
        "type": "enum", "name": "c", "symbols": ["red", "green"],
        "default": "green",
    }
    assert resolve_avro_schemas(w2, r2) == ("enum", ("red", "green"))


def test_resolution_failures_are_valueerrors():
    import pytest

    from datawarehouseproject_spark.functions.avro_scan import (
        resolve_avro_schemas,
    )

    with pytest.raises(ValueError, match="cannot resolve"):
        resolve_avro_schemas("double", "int")  # demotion
    with pytest.raises(ValueError, match="cannot resolve"):
        resolve_avro_schemas("string", "long")
    w = {
        "type": "record", "name": "d",
        "fields": [{"name": "a", "type": "int"}],
    }
    r = {
        "type": "record", "name": "d",
        "fields": [
            {"name": "a", "type": "int"},
            {"name": "b", "type": "string"},  # no default
        ],
    }
    with pytest.raises(ValueError, match="no default"):
        resolve_avro_schemas(w, r)
    with pytest.raises(ValueError, match="not in reader enum"):
        resolve_avro_schemas(
            {"type": "enum", "name": "c", "symbols": ["x"]},
            {"type": "enum", "name": "c", "symbols": ["y"]},
        )


def test_resolution_union_and_defaults():
    from datawarehouseproject_spark.functions.avro_scan import (
        _decode_resolved,
        _zigzag_write,
        resolve_avro_schemas,
    )

    # writer ['null','int'] vs reader ['null','long']: branch-wise
    plan = resolve_avro_schemas(["null", "int"], ["null", "long"])
    assert plan[0] == "union"
    data = _zigzag_write(1) + _zigzag_write(5)
    assert _decode_resolved(data, 0, plan)[0] == 5
    assert _decode_resolved(_zigzag_write(0), 0, plan)[0] is None
    # record default fills and reader order is delivered
    w = {
        "type": "record", "name": "d",
        "fields": [{"name": "a", "type": "int"}],
    }
    r = {
        "type": "record", "name": "d",
        "fields": [
            {"name": "z", "type": "string", "default": "zz"},
            {"name": "a", "type": "long"},
        ],
    }
    plan = resolve_avro_schemas(w, r)
    rec, _ = _decode_resolved(_zigzag_write(9), 0, plan)
    assert list(rec) == ["z", "a"] and rec == {"z": "zz", "a": 9}


# --- named-type references ----------------------------------------------


def test_named_reference_resolves_record_enum_fixed():
    from datawarehouseproject_spark.functions.avro_scan import (
        _parse_type_spec,
    )

    spec = _parse_type_spec(
        {
            "type": "record",
            "name": "top",
            "fields": [
                {
                    "name": "c1",
                    "type": {
                        "type": "enum",
                        "name": "Color",
                        "symbols": ["R", "G"],
                    },
                },
                {"name": "c2", "type": "Color"},
                {
                    "name": "f1",
                    "type": {"type": "fixed", "name": "Fp", "size": 2},
                },
                {"name": "f2", "type": "Fp"},
                {
                    "name": "r1",
                    "type": {
                        "type": "record",
                        "name": "Pair",
                        "fields": [{"name": "x", "type": "long"}],
                    },
                },
                {"name": "r2", "type": "Pair"},
            ],
        }
    )
    fields = dict(spec[1])
    assert fields["c2"] == fields["c1"] == ("enum", ("R", "G"))
    assert fields["f2"] == fields["f1"] == ("fixed", 2)
    assert fields["r2"] == fields["r1"]


def test_named_reference_namespace_fullname():
    from datawarehouseproject_spark.functions.avro_scan import (
        _parse_type_spec,
    )

    spec = _parse_type_spec(
        {
            "type": "record",
            "name": "top",
            "fields": [
                {
                    "name": "a",
                    "type": {
                        "type": "fixed",
                        "name": "Fp",
                        "namespace": "com.example",
                        "size": 3,
                    },
                },
                {"name": "b", "type": "com.example.Fp"},
                {"name": "c", "type": "Fp"},
            ],
        }
    )
    fields = dict(spec[1])
    assert fields["b"] == fields["c"] == ("fixed", 3)


def test_recursive_named_type_parses_lazily():
    """Round 13 flipped the r12 loud-reject: an in-progress record
    reference parses to a lazy ('ref', name, env) node (decode-time
    bounded by the value depth cap — see
    test_recursive_named_type_bounded)."""
    from datawarehouseproject_spark.functions.avro_scan import (
        _parse_type_spec,
    )

    spec = _parse_type_spec(
        {
            "type": "record",
            "name": "Node",
            "fields": [
                {"name": "v", "type": "long"},
                {"name": "next", "type": ["null", "Node"]},
            ],
        }
    )
    next_spec = dict(spec[1])["next"]
    assert next_spec[0] == "union"
    ref = next_spec[1][1]
    assert ref[0] == "ref" and ref[1] == "Node"
    # the env resolved after the full parse
    assert ref[2]["Node"] is spec


def test_named_type_redefinition_is_loud():
    from datawarehouseproject_spark.functions.avro_scan import (
        _parse_type_spec,
    )

    with pytest.raises(ValueError, match="redefined"):
        _parse_type_spec(
            {
                "type": "record",
                "name": "top",
                "fields": [
                    {
                        "name": "a",
                        "type": {"type": "fixed", "name": "Fp", "size": 2},
                    },
                    {
                        "name": "b",
                        "type": {"type": "fixed", "name": "Fp", "size": 3},
                    },
                ],
            }
        )


def test_unknown_name_still_rejects():
    from datawarehouseproject_spark.functions.avro_scan import (
        _parse_type_spec,
    )

    with pytest.raises(ValueError, match="unsupported"):
        _parse_type_spec(
            {
                "type": "record",
                "name": "top",
                "fields": [{"name": "a", "type": "Mystery"}],
            }
        )


def test_complex_rotation_odd_seed_reuses_fp_by_name():
    """The odd-seed container's schema text really does reference
    ``Fp`` by bare name, and the decoded values land in fp_sum."""
    import json as _json

    from datawarehouseproject_spark.functions.avro_scan import (
        _iter_avro_blocks,
        scan_avro_complex,
        synth_avro_complex,
        synth_avro_complex_plan,
    )

    seed = 7
    payload = synth_avro_complex(seed)
    blocks = _iter_avro_blocks(payload)
    meta = next(blocks)
    schema = _json.loads(meta["avro.schema"])
    assert {"name": "fp2", "type": "Fp"} in schema["fields"]
    plan = synth_avro_complex_plan(seed)
    n = plan["n_records"]
    r = scan_avro_complex(payload)
    want = sum((seed + i + b) % 256 for i in range(n) for b in range(4))
    want += sum((i + b) % 256 for i in range(n) for b in range(4))
    assert r["fp_sum"] == want


def test_recursive_named_type_bounded():
    """Round 13: the linked-list schema decodes to nested dicts;
    value depth past the cap quarantines (never a RecursionError)."""
    import json as _json

    from datawarehouseproject_spark.functions.avro_scan import (
        _decode_spec,
        _parse_type_spec,
        _zigzag_write,
    )

    schema = {
        "type": "record", "name": "Node",
        "fields": [
            {"name": "v", "type": "long"},
            {"name": "next", "type": ["null", "Node"]},
        ],
    }
    spec = _parse_type_spec(schema)
    body = (
        _zigzag_write(5) + _zigzag_write(1)
        + _zigzag_write(7) + _zigzag_write(1)
        + _zigzag_write(9) + _zigzag_write(0)
    )
    val, pos = _decode_spec(body, 0, spec)
    assert val == {"v": 5, "next": {"v": 7, "next": {"v": 9,
                                                     "next": None}}}
    assert pos == len(body)
    bomb = b"".join(
        _zigzag_write(1) + _zigzag_write(1) for _ in range(100)
    ) + _zigzag_write(0)
    with pytest.raises(ValueError, match="nests too deep"):
        _decode_spec(bomb, 0, spec)
    # a reference to a name that never completes must not decode
    from datawarehouseproject_spark.functions.avro_scan import (
        scan_avro_complex,
        synth_avro_complex,
    )

    # the rotation's recursive seeds round-trip end to end
    r = scan_avro_complex(synth_avro_complex(2))
    assert r["chain_nodes"] > 0


def test_avro_zstandard_and_bzip2_codecs():
    """Round 13: zstandard blocks (pyarrow-compressed, hand-decoded)
    and bzip2 blocks decode to the same records as the null codec."""
    import pyarrow as pa
    import bz2 as _bz2

    from datawarehouseproject_spark.functions.avro_scan import (
        decode_avro_blocks,
        encode_avro_container,
        _zigzag_write,
    )

    schema = (b'{"type":"record","name":"r","fields":'
              b'[{"name":"x","type":"long"}]}')
    recs = [_zigzag_write(i * 3 - 5) for i in range(50)]
    sync = bytes(range(16))
    base = decode_avro_blocks(
        encode_avro_container(schema, recs, sync)
    )
    zst = encode_avro_container(schema, recs, sync, codec="zstandard")
    assert decode_avro_blocks(zst) == base
    # bzip2: hand-assemble (encoder doesn't emit it; stdlib produces)
    body = b"".join(recs)
    comp = _bz2.compress(body)
    null_blob = encode_avro_container(schema, recs, sync)
    # splice: rebuild the container with the bzip2 codec + body
    out = bytearray(b"Obj\x01")
    out += _zigzag_write(2)
    for k, v in ((b"avro.schema", schema), (b"avro.codec", b"bzip2")):
        out += _zigzag_write(len(k)) + k
        out += _zigzag_write(len(v)) + v
    out += _zigzag_write(0)
    out += sync
    out += _zigzag_write(len(recs)) + _zigzag_write(len(comp)) + comp
    out += sync
    assert decode_avro_blocks(bytes(out)) == base
    # corrupt zstd bytes quarantine
    bad = bytearray(zst)
    bad[-20] ^= 0xFF
    with pytest.raises(ValueError):
        decode_avro_blocks(bytes(bad))
