"""TFRecord container framing with masked CRC32C, by hand.

TFRecord is the sharded-training-data container of the TensorFlow
ecosystem — exactly the kind of file a 100 TB training corpus ships
in — and its framing is public (TensorFlow's file-format docs):

    u64le  data length
    u32le  masked_crc32c(length bytes)
    bytes  data
    u32le  masked_crc32c(data)

with ``mask(c) = ((c >> 15) | (c << 17)) + 0xA282EAD8 (mod 2^32)``
and CRC32C the Castagnoli CRC (reflected polynomial 0x82F63B78).

The container doesn't care what the data is, but in practice each
record is a protobuf (``tf.Example``) — so the records here are the
protobuf messages of :mod:`.protowire` (round-7's hand wire codec),
making the scan a two-layer composition: framing walk + CRC verify,
then full wire decode of every record.

Pinning: this container has no stdlib producer, so the synthesis is
hand-rolled from the spec (documented boundary — the ONLY writer in
the codec family without an independent producer twin).  What IS
independently pinned: CRC32C against its published check vector
(``crc32c(b"123456789") == 0xE3069283``, the standard CRC catalogue
value), the mask function against the algebraic unmask round-trip,
and the record payloads against the protowire codec whose own
producer/parser pair predates this module.
"""

from __future__ import annotations

import struct

_MASK_DELTA = 0xA282EAD8
_M32 = 0xFFFFFFFF


def _crc32c_table() -> list[int]:
    table = []
    for byte in range(256):
        crc = byte
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
        table.append(crc)
    return table


_TABLE = _crc32c_table()


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= _M32
    for b in data:
        crc = (crc >> 8) ^ _TABLE[(crc ^ b) & 0xFF]
    return crc ^ _M32


def mask_crc(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & _M32


def unmask_crc(masked: int) -> int:
    rot = (masked - _MASK_DELTA) & _M32
    return ((rot >> 17) | (rot << 15)) & _M32


def write_record(data: bytes) -> bytes:
    header = struct.pack("<Q", len(data))
    return (
        header
        + struct.pack("<I", mask_crc(crc32c(header)))
        + data
        + struct.pack("<I", mask_crc(crc32c(data)))
    )


def iter_records(payload: bytes):
    """Yield each record's data bytes, verifying BOTH masked CRCs.
    Raises ValueError on truncation or checksum mismatch."""
    pos = 0
    n = len(payload)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("truncated tfrecord length header")
        header = payload[pos : pos + 8]
        (length,) = struct.unpack("<Q", header)
        (len_crc,) = struct.unpack_from("<I", payload, pos + 8)
        if mask_crc(crc32c(header)) != len_crc:
            raise ValueError(f"tfrecord length CRC mismatch at {pos}")
        data_start = pos + 12
        if data_start + length + 4 > n:
            raise ValueError("truncated tfrecord data")
        data = payload[data_start : data_start + length]
        (data_crc,) = struct.unpack_from("<I", payload, data_start + length)
        if mask_crc(crc32c(data)) != data_crc:
            raise ValueError(f"tfrecord data CRC mismatch at {data_start}")
        yield data
        pos = data_start + length + 4


def scan_tfrecord(payload: bytes) -> dict:
    """Walk a TFRecord file: framing + both CRCs per record, then a
    FULL protobuf wire decode of each record payload
    (:func:`.protowire.parse_record`), aggregated.

    COMPRESSED shards (round 10) are sniffed by magic and inflated
    FIRST — ``.tfrecord.gz`` (TF's ``TFRecordOptions('GZIP')``
    layout: the whole framed stream inside gzip members, decoded
    member-by-member with trailer verification) and ``.tfrecord.zst``
    (file-level zstd) — then the framing CRCs verify the
    decompressed bytes, so a codec bug upstream cannot reach the
    aggregates."""
    raw_len = len(payload)
    # container sniff ONLY when the bytes cannot be raw framing: a
    # first record of exactly 35615 bytes makes the length u64le
    # start 1f 8b — the masked length-CRC at bytes 8-12 disambiguates
    # (a compressed container matches it with probability 2^-32)
    raw_framing = len(payload) >= 12 and struct.unpack_from(
        "<I", payload, 8
    )[0] == mask_crc(crc32c(payload[:8]))
    if payload[:2] == b"\x1f\x8b" and not raw_framing:
        from .warc import split_gzip_members

        payload = b"".join(split_gzip_members(payload))
    elif payload[:4] == b"\x28\xb5\x2f\xfd" and not raw_framing:
        from .zstd_codec import decode_zstd

        payload = decode_zstd(payload)
    from .protowire import parse_record

    n_records = 0
    data_bytes = 0
    event_sum = 0
    balance_sum = 0
    name_chars = 0
    packed_sum = 0
    for data in iter_records(payload):
        rec = parse_record(data)
        n_records += 1
        data_bytes += len(data)
        event_sum += rec["event_count"] or 0
        balance_sum += rec["balance"] or 0
        name_chars += len(rec["name"] or "")
        packed_sum += rec["packed_sum"] or 0
    if n_records == 0:
        raise ValueError("tfrecord file with no records")
    return {
        "n_records": n_records,
        "data_bytes": data_bytes,
        "event_sum": event_sum,
        "balance_sum": balance_sum,
        "name_chars": name_chars,
        "packed_sum": packed_sum,
        "payload_bytes": raw_len,
    }


def synth_tfrecord_plan(seed: int) -> dict:
    """Plan mirrored in the DuckDB oracle: ``3 + seed%6`` records;
    record r is the protowire message for sub-seed
    ``seed * 31 + r``."""
    return {"n_records": 3 + seed % 6}


def synth_tfrecord(seed: int) -> bytes:
    from .protowire import synth_record

    plan = synth_tfrecord_plan(seed)
    return b"".join(
        write_record(synth_record(seed * 31 + r))
        for r in range(plan["n_records"])
    )


def synth_tfrecord_compressed_plan(seed: int) -> dict:
    """Plan mirrored in the DuckDB oracle: ``4 + seed%5`` records of
    sub-seed ``seed * 47 + r``; container rotating by ``seed % 2``
    between gzip (stdlib producer, two members splitting the framed
    stream mid-record — the multi-member shard layout) and zstd
    (pyarrow/libzstd producer, one frame)."""
    return {
        "n_records": 4 + seed % 5,
        "codec": ("gzip", "zstd")[seed % 2],
    }


def synth_tfrecord_compressed(seed: int) -> bytes:
    from .protowire import synth_record

    plan = synth_tfrecord_compressed_plan(seed)
    framed = b"".join(
        write_record(synth_record(seed * 47 + r))
        for r in range(plan["n_records"])
    )
    if plan["codec"] == "gzip":
        import gzip
        import io

        # two gzip members split mid-stream: record framing must be
        # reassembled ACROSS member boundaries, like real rotated
        # shards concatenated with `cat`
        cut = len(framed) // 2
        out = io.BytesIO()
        for part in (framed[:cut], framed[cut:]):
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(part)
            out.write(buf.getvalue())
        return out.getvalue()
    import pyarrow as pa

    return bytes(pa.Codec("zstd", compression_level=3).compress(framed))
