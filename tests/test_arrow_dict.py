"""Arrow IPC dictionary-encoded columns — pyarrow's default for
low-cardinality strings (the round-9 verdict's #3 gap): schema-side
DictionaryEncoding resolution, DictionaryBatch decode (file footer
blocks + stream messages), DELTA accumulation, and the refusal
contract (index out of range, missing dictionary, delta-before-
initial)."""

from __future__ import annotations

import io

import pytest

from datawarehouseproject_spark.functions.arrow_ipc import (
    decode_arrow_stream,
    decode_arrow_values,
    scan_arrow_ipc,
    synth_arrow_dict,
    synth_arrow_dict_plan,
    synth_arrow_dict_stream,
    synth_arrow_dict_stream_plan,
)


def _expected_file(seed: int) -> dict:
    p = synth_arrow_dict_plan(seed)
    n, k, k2, nb = (
        p["rows_per_batch"], p["n_cats"], p["n_codes"], p["n_batches"],
    )
    out = {"str_chars": 0, "str_nulls": 0, "int_sum": 0, "int_nulls": 0}
    for b in range(nb):
        for i in range(n):
            if (i + b) % 6 == 5:
                out["str_nulls"] += 1
            else:
                out["str_chars"] += len(f"cat{(seed + i * 7 + b) % k}")
            out["int_sum"] += seed + 100 * ((i + b) % k2)
            if (seed + i) % 9 == 2:
                out["int_nulls"] += 1
            else:
                out["int_sum"] += (seed * 11 + i * 13 + b * 5) % 3000 - 1000
    out["n_rows"] = nb * n
    return out


@pytest.mark.parametrize("seed", range(8))
def test_dict_file_decode_matches_plan(seed):
    got = decode_arrow_values(synth_arrow_dict(seed))
    want = _expected_file(seed)
    for key, v in want.items():
        assert got[key] == v, (seed, key, got, want)


@pytest.mark.parametrize("seed", range(8))
def test_dict_delta_stream_matches_plan(seed):
    p = synth_arrow_dict_stream_plan(seed)
    n, k0, nb = p["rows_per_batch"], p["k0"], p["n_batches"]
    want_chars = want_snull = want_sum = want_inull = 0
    for b in range(nb):
        size_b = k0 + 2 * b
        for i in range(n):
            if (i + b) % 4 == 3:
                want_snull += 1
            else:
                want_chars += len(f"w{(seed + i * 5 + b) % size_b}")
            if (i + seed) % 8 == 6:
                want_inull += 1
            else:
                want_sum += (seed * 7 + i * 11 + b * 3) % 1000
    got = decode_arrow_stream(synth_arrow_dict_stream(seed))
    assert got["n_rows"] == nb * n
    assert got["str_chars"] == want_chars
    assert got["str_nulls"] == want_snull
    assert got["int_sum"] == want_sum
    assert got["int_nulls"] == want_inull


def test_delta_batches_actually_emitted():
    """Seeds with n_batches > 1 must carry delta dictionary batches
    on the wire (else the fixture stops exercising the delta path)."""
    import pyarrow.ipc as ipc

    blob = synth_arrow_dict_stream(2)  # 3 batches
    # pyarrow's own reader agrees with the growth plan
    r = ipc.open_stream(io.BytesIO(blob)).read_all()
    assert r.num_rows == 3 * synth_arrow_dict_stream_plan(2)["rows_per_batch"]
    # count tag-2 messages by walking frames
    import struct

    pos = tags2 = 0
    while pos < len(blob):
        (cont,) = struct.unpack_from("<I", blob, pos)
        meta_len, ms = (
            (struct.unpack_from("<I", blob, pos + 4)[0], pos + 8)
            if cont == 0xFFFFFFFF
            else (cont, pos + 4)
        )
        if meta_len == 0:
            break
        root = struct.unpack_from("<I", blob, ms)[0]
        tbl = ms + root
        soff = struct.unpack_from("<i", blob, tbl)[0]
        vt = tbl - soff
        vsz = struct.unpack_from("<H", blob, vt)[0]

        def fld(fid):
            slot = 4 + 2 * fid
            if slot + 2 > vsz:
                return None
            off = struct.unpack_from("<H", blob, vt + slot)[0]
            return tbl + off if off else None

        tp = fld(1)
        if tp is not None and blob[tp] == 2:
            tags2 += 1
        bp = fld(3)
        bl = struct.unpack_from("<q", blob, bp)[0] if bp else 0
        pos = ms + meta_len + bl
    assert tags2 == 3  # initial + 2 deltas


def test_dict_footer_blocks_counted():
    s = scan_arrow_ipc(synth_arrow_dict(0))
    assert s["n_dict_batches"] == 2  # one per dictionary id


def test_out_of_range_index_refused():
    """Corrupt an index so it addresses past the dictionary."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    d = pa.array(["a", "bb"], pa.utf8())
    idx = pa.array([0, 1, 0], pa.int32())
    da = pa.DictionaryArray.from_arrays(idx, d)
    schema = pa.schema([pa.field("c", da.type)])
    buf = io.BytesIO()
    with ipc.new_file(buf, schema) as w:
        w.write_batch(pa.record_batch([da], schema=schema))
    blob = bytearray(buf.getvalue())
    # index values live in the record batch body as little-endian
    # int32 0,1,0 — flip the middle one to 9
    needle = (0).to_bytes(4, "little") + (1).to_bytes(4, "little") + (
        0
    ).to_bytes(4, "little")
    at = bytes(blob).rfind(needle)
    assert at > 0
    blob[at + 4 : at + 8] = (9).to_bytes(4, "little")
    with pytest.raises(ValueError, match="outside the"):
        decode_arrow_values(bytes(blob))


def test_record_batch_before_dictionary_refused():
    """A stream whose dictionary batch is missing: strip the tag-2
    message and the record batch must refuse, not decode garbage."""
    import struct

    blob = synth_arrow_dict_stream(0)  # 1 batch
    # walk: schema msg, dict msg, record batch, EOS — excise the dict
    frames = []
    pos = 0
    while pos < len(blob):
        (cont,) = struct.unpack_from("<I", blob, pos)
        meta_len, ms = (
            (struct.unpack_from("<I", blob, pos + 4)[0], pos + 8)
            if cont == 0xFFFFFFFF
            else (cont, pos + 4)
        )
        if meta_len == 0:
            frames.append(blob[pos:])
            break
        root = struct.unpack_from("<I", blob, ms)[0]
        tbl = ms + root
        soff = struct.unpack_from("<i", blob, tbl)[0]
        vt = tbl - soff
        vsz = struct.unpack_from("<H", blob, vt)[0]

        def fld(fid):
            slot = 4 + 2 * fid
            if slot + 2 > vsz:
                return None
            off = struct.unpack_from("<H", blob, vt + slot)[0]
            return tbl + off if off else None

        tp = fld(1)
        tag = blob[tp] if tp is not None else 0
        bp = fld(3)
        bl = struct.unpack_from("<q", blob, bp)[0] if bp else 0
        end = ms + meta_len + bl
        frames.append((tag, blob[pos:end]))
        pos = end
    stripped = b"".join(
        f[1] for f in frames[:-1] if isinstance(f, tuple) and f[0] != 2
    ) + frames[-1]
    with pytest.raises(ValueError, match="before any dictionary batch"):
        decode_arrow_stream(stripped)


def test_shared_dictionary_id_type_conflict_refused():
    """Review r10: two fields sharing one dictionary id with
    DIFFERENT value types must refuse (decoding one dictionary under
    two types would type-confuse the stats)."""
    from datawarehouseproject_spark.functions.arrow_ipc import (
        _dict_value_kinds,
    )

    types = [
        ("dict", 32, ("utf8", 0), 0),
        ("dict", 8, ("int", 32), 0),
    ]
    with pytest.raises(ValueError, match="shared by fields"):
        _dict_value_kinds(types)
    # same id, same type: fine
    assert _dict_value_kinds(types[:1] + types[:1]) == {0: ("utf8", 0)}
