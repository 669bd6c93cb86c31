"""Protocol-buffers WIRE-FORMAT codec (stdlib only) for opaque
binary record columns.

Real training-data pipelines land event logs as serialized protobuf;
the engine must decode them without a schema compiler in the loop.
This module implements the public wire encoding (protobuf.dev
encoding spec): varints (7-bit groups, LSB-first, MSB continuation),
the four wire types (0 varint, 1 fixed64, 2 length-delimited,
5 fixed32), tag = field_number << 3 | wire_type, ZigZag for signed
ints, nested messages, PACKED repeated scalars, and — the part that
makes protobuf evolvable — skipping unknown fields by wire type.

Same scaffolding as the other codecs: a deterministic synthesizer
(every field modular arithmetic over the id, so the DuckDB oracle
recomputes all of it) plus the REAL parser. The synthesized record
deliberately includes a field the parser does NOT know (it must be
skipped, not break decode) and a negative ZigZag value.
"""

from __future__ import annotations

import struct


def _varint(n: int) -> bytes:
    if n < 0:
        raise ValueError("varint encodes non-negative ints; zigzag first")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def synth_record_fields(seed: int) -> dict:
    """Deterministic record values, mirrored in the DuckDB oracle."""
    return {
        "event_count": seed % 1000,
        "balance": (seed * 37) % 2001 - 1000,  # negative half: zigzag
        "checksum": (seed * 2654435761) % (1 << 32),
        "name": f"rec-{seed % 50}",
        "sub_kind": seed % 7,
        "sub_tag": f"tag{seed % 13}",
        "packed_sum": seed % 5 + seed % 11 + seed % 17,
        "n_unknown": 1,
    }


def synth_record(seed: int) -> bytes:
    """Serialize the record: varint, zigzag sint64, fixed32,
    string, nested message, packed repeated varints, plus an
    UNKNOWN field (15, fixed64) the parser must skip."""
    f = synth_record_fields(seed)
    sub = (
        _tag(1, 0)
        + _varint(f["sub_kind"])
        + _tag(2, 2)
        + _varint(len(f["sub_tag"]))
        + f["sub_tag"].encode()
    )
    packed = b"".join(
        _varint(v) for v in (seed % 5, seed % 11, seed % 17)
    )
    name = f["name"].encode()
    return (
        _tag(1, 0)
        + _varint(f["event_count"])
        + _tag(2, 0)
        + _varint(_zigzag(f["balance"]))
        + _tag(3, 5)
        + struct.pack("<I", f["checksum"])
        + _tag(4, 2)
        + _varint(len(name))
        + name
        + _tag(5, 2)
        + _varint(len(sub))
        + sub
        + _tag(6, 2)
        + _varint(len(packed))
        + packed
        + _tag(15, 1)  # unknown to the parser: must be skipped
        + struct.pack("<Q", seed % (1 << 40))
    )


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            # standard decoders truncate to 64 bits and reinterpret
            # as two's complement: conforming encoders emit negative
            # plain-varint ints as 10-byte values in [2^63, 2^64)
            # (int64 -1 -> 0xFF..FF), which must DECODE, not
            # quarantine — and the raw >64-bit value must never
            # escape into the Arrow LongType conversion (review r7,
            # both passes)
            out &= (1 << 64) - 1
            if out >= 1 << 63:
                out -= 1 << 64
            return out, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint longer than 64 bits")


def _walk(data: bytes):
    """Yield (field, wire, value) over one message's wire stream;
    value is int for wire 0/1/5 and bytes for wire 2."""
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        if key < 0:
            raise ValueError("negative field key")
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_varint(data, pos)
        elif wire == 1:
            if pos + 8 > len(data):
                raise ValueError("truncated fixed64")
            (v,) = struct.unpack_from("<Q", data, pos)
            pos += 8
        elif wire == 5:
            if pos + 4 > len(data):
                raise ValueError("truncated fixed32")
            (v,) = struct.unpack_from("<I", data, pos)
            pos += 4
        elif wire == 2:
            ln, pos = _read_varint(data, pos)
            if ln < 0:
                raise ValueError("negative length-delimited size")
            if pos + ln > len(data):
                raise ValueError("truncated length-delimited field")
            v = data[pos : pos + ln]
            pos += ln
        else:
            raise ValueError(f"unsupported wire type {wire} (groups are"
                             " deprecated)")
        yield field, wire, v


def parse_record(payload: bytes) -> dict:
    """Decode the known fields of the synthesized record schema;
    unknown fields are skipped by wire type and counted (the
    forward-compatibility contract). Raises ``ValueError`` on
    malformed wire data."""
    out: dict = {
        "event_count": None,
        "balance": None,
        "checksum": None,
        "name": None,
        "sub_kind": None,
        "sub_tag": None,
        "packed_sum": None,
        "n_unknown": 0,
    }
    for field, wire, v in _walk(payload):
        if field == 1 and wire == 0:
            out["event_count"] = v
        elif field == 2 and wire == 0:
            # zigzag decode operates on the raw UNSIGNED 64-bit
            # encoding; _read_varint reinterprets >=2^63 as negative
            # int64, so re-mask before unzigzag (sint64 magnitudes
            # >= 2^62 decode wrong otherwise).
            out["balance"] = _unzigzag(v & ((1 << 64) - 1))
        elif field == 3 and wire == 5:
            out["checksum"] = v
        elif field == 4 and wire == 2:
            out["name"] = v.decode("utf-8")
        elif field == 5 and wire == 2:
            for sf, sw, sv in _walk(v):
                if sf == 1 and sw == 0:
                    out["sub_kind"] = sv
                elif sf == 2 and sw == 2:
                    out["sub_tag"] = sv.decode("utf-8")
                else:
                    out["n_unknown"] += 1
        elif field == 6 and wire == 2:
            total = 0
            pos = 0
            while pos < len(v):
                x, pos = _read_varint(v, pos)
                total += x
            out["packed_sum"] = total
        else:
            out["n_unknown"] += 1
    return out
