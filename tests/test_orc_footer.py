"""ORC tail scanner — functions/orc_footer.py (round 8): protobuf
wire reuse over pyarrow-produced files; multi-stripe consistency and
the compressed-footer boundary."""

from __future__ import annotations

import io

import pytest

from datawarehouseproject_spark.functions.orc_footer import (
    scan_orc_footer,
    synth_orc,
    synth_orc_plan,
)


def test_scan_matches_pyarrow_writer_plan():
    for seed in range(20):
        plan = synth_orc_plan(seed)
        payload = synth_orc(seed)
        got = scan_orc_footer(payload)
        assert got["n_rows"] == plan["n_rows"]
        assert got["n_columns"] == plan["n_columns"]
        assert got["n_stripes"] == 1
        assert got["compression"] == "none"
        assert got["payload_bytes"] == len(payload)


def test_multi_stripe_rows_consistent():
    import pyarrow as pa
    import pyarrow.orc as orc

    buf = io.BytesIO()
    w = orc.ORCWriter(buf, compression="uncompressed", stripe_size=1024)
    w.write(pa.table({"a": list(range(200000))}))
    w.close()
    got = scan_orc_footer(buf.getvalue())
    assert got["n_rows"] == 200000
    assert got["n_stripes"] > 100  # 1 KB stripes really split


def test_compressed_footers_decode_all_codecs():
    """Round 10: compressed tails decode through the chunk framing
    composed with the hand-rolled codec family (zlib=raw deflate,
    snappy, lz4 block, zstd)."""
    from datawarehouseproject_spark.functions.orc_footer import (
        synth_orc_compressed,
        synth_orc_compressed_plan,
    )

    for seed in range(16):
        plan = synth_orc_compressed_plan(seed)
        got = scan_orc_footer(synth_orc_compressed(seed))
        assert got["n_rows"] == plan["n_rows"]
        assert got["n_columns"] == plan["n_columns"]
        assert got["compression"] == plan["compression"]


def test_multi_stripe_compressed_consistency():
    import pyarrow as pa
    import pyarrow.orc as orc

    buf = io.BytesIO()
    w = orc.ORCWriter(buf, compression="zstd", stripe_size=1024)
    # hash-hex strings so zstd cannot crush the stripe under the
    # stripe_size threshold (sequential ints compress to one stripe)
    w.write(
        pa.table(
            {"a": [f"{(i * 2654435761) % 2**32:08x}" for i in range(60000)]}
        )
    )
    w.close()
    got = scan_orc_footer(buf.getvalue())
    assert got["n_rows"] == 60000
    assert got["compression"] == "zstd"
    assert got["n_stripes"] > 1


def test_lzo_stays_a_boundary():
    """No LZO decoder in the family: the postscript names codec 3 and
    the scan must refuse loudly, not mis-frame."""
    from datawarehouseproject_spark.functions.orc_footer import (
        synth_orc_compressed,
    )

    blob = bytearray(synth_orc_compressed(0))  # zlib
    # postscript: field 2 varint holds the codec enum — patch 1 -> 3
    ps_len = blob[-1]
    ps = bytes(blob[len(blob) - 1 - ps_len : len(blob) - 1])
    at = ps.find(b"\x10\x01")  # field 2, value 1 (zlib)
    assert at >= 0
    blob[len(blob) - 1 - ps_len + at + 1] = 3
    with pytest.raises(ValueError, match="no decoder"):
        scan_orc_footer(bytes(blob))


def test_malformed_and_inconsistent_quarantine():
    good = bytearray(synth_orc(4))
    with pytest.raises(ValueError, match="ORC magic"):
        scan_orc_footer(b"PAR1 not orc")
    with pytest.raises(ValueError, match="postscript length|truncated|magic"):
        scan_orc_footer(bytes(good[:10]) + b"\x00")
    # hand-build an inconsistent footer: numberOfRows=9 but the one
    # stripe says 5  (field 6 varint / field 3 submessage{field 5})
    footer = bytes([0x30, 9, 0x1A, 2, 0x28, 5])
    ps = bytes([0x08, len(footer), 0x10, 0]) + b"\x82\xf4\x03\x03ORC"
    fake = b"ORC\n" + footer + ps + bytes([len(ps)])
    with pytest.raises(ValueError, match="inconsistent footer"):
        scan_orc_footer(fake)


def test_spark_permissive_quarantine(spark):
    from datawarehouseproject_spark.operators.multimodal import (
        extract_orc_footer,
    )

    rows = [
        (3, bytearray(synth_orc(3))),
        (8, bytearray(b"ORC\n garbage tail\x05")),
    ]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {
        r["media_id"]: r
        for r in extract_orc_footer(media, permissive=True).collect()
    }
    plan = synth_orc_plan(3)
    assert out[3]["decode_error"] is None
    assert out[3]["n_rows"] == plan["n_rows"]
    assert out[8]["decode_error"] is not None and out[8]["n_rows"] is None
