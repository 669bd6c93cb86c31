"""Arrow IPC triage — functions/arrow_ipc.py (round 9): hand-rolled
flatbuffer walk pinned against pyarrow's IPC writer."""

from __future__ import annotations

import io
import struct

import pytest

from datawarehouseproject_spark.functions.arrow_ipc import (
    scan_arrow_ipc,
    synth_arrow_ipc,
    synth_arrow_plan,
)


def test_fixture_plan_roundtrip():
    for seed in range(12):
        plan = synth_arrow_plan(seed)
        got = scan_arrow_ipc(synth_arrow_ipc(seed))
        assert got["n_columns"] == plan["n_columns"]
        assert got["n_batches"] == plan["n_batches"]
        assert got["n_rows"] == plan["n_batches"] * plan["rows_per_batch"]
        assert got["n_dict_batches"] == 0
        assert got["body_bytes"] > 0


def test_dictionary_batches_and_strings():
    import pyarrow as pa
    import pyarrow.ipc as ipc

    t = pa.table(
        {
            "d": pa.array(["a", "b", "a", "c"]).dictionary_encode(),
            "s": pa.array(["x", "y", "z", "w"]),
        }
    )
    buf = io.BytesIO()
    with ipc.new_file(buf, t.schema) as w:
        w.write_table(t)
    got = scan_arrow_ipc(buf.getvalue())
    assert got["n_dict_batches"] == 1
    assert got["n_columns"] == 2
    assert got["n_rows"] == 4


def test_empty_file_zero_batches():
    import pyarrow as pa
    import pyarrow.ipc as ipc

    buf = io.BytesIO()
    with ipc.new_file(buf, pa.schema([("a", pa.int64())])):
        pass
    got = scan_arrow_ipc(buf.getvalue())
    assert got["n_batches"] == 0 and got["n_rows"] == 0
    assert got["n_columns"] == 1


def test_malformed_quarantine():
    with pytest.raises(ValueError, match="magic"):
        scan_arrow_ipc(b"not arrow" + b"\x00" * 30)
    good = synth_arrow_ipc(1)
    with pytest.raises(ValueError, match="trailing"):
        scan_arrow_ipc(good[:-6] + b"NOTMAG")
    # footer length pointing past the file start
    bad = bytearray(good)
    struct.pack_into("<I", bad, len(bad) - 10, 2**24)
    with pytest.raises(ValueError, match="footer length"):
        scan_arrow_ipc(bytes(bad))
    # block offset pointing outside the file: flip a block offset
    with pytest.raises(ValueError):
        scan_arrow_ipc(good[: len(good) // 2] + good[-40:])


def test_spark_permissive_quarantine(spark):
    from datawarehouseproject_spark.operators.multimodal import (
        extract_arrow_scan,
    )

    rows = [
        (4, bytearray(synth_arrow_ipc(4))),
        (9, bytearray(b"ARROW1\x00\x00 garbage tail ARROW1")),
    ]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {
        r["media_id"]: r
        for r in extract_arrow_scan(media, permissive=True).collect()
    }
    plan = synth_arrow_plan(4)
    assert out[4]["decode_error"] is None
    assert out[4]["n_rows"] == plan["n_batches"] * plan["rows_per_batch"]
    assert out[9]["decode_error"] is not None
