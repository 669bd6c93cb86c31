"""Delta Lake _delta_log reader: checkpoint + replay + tombstones."""

from __future__ import annotations

import io
import json
import tarfile

import pytest

from datawarehouseproject_spark.functions.delta_log import (
    scan_delta,
    synth_delta,
    synth_delta_plan,
)


def _untar(blob: bytes) -> dict[str, bytes]:
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:") as tf:
        return {
            m.name: tf.extractfile(m).read()
            for m in tf.getmembers()
            if m.isfile()
        }


def _retar(files: dict[str, bytes]) -> bytes:
    out = io.BytesIO()
    with tarfile.open(fileobj=out, mode="w") as tf:
        for name in sorted(files):
            info = tarfile.TarInfo(name)
            info.size = len(files[name])
            tf.addfile(info, io.BytesIO(files[name]))
    return out.getvalue()


def test_all_seeds_match_plan():
    for seed in range(12):
        plan = synth_delta_plan(seed)
        r = scan_delta(synth_delta(seed))
        assert r["checkpoint_version"] == 1
        assert r["current_version"] == 2
        assert r["json_commits_replayed"] == 1
        assert r["files_at_checkpoint"] == plan["n_live"]
        assert r["live_files"] == plan["n_live"]
        assert r["files_pruned"] == plan["n_live"] - 1
        assert r["files_scanned"] == 1
        assert r["rows_scanned"] == plan["rows_scanned"]
        assert r["probe_matches"] == plan["probe_matches"]


def test_precheckpoint_jsons_are_vacuumed():
    """The fixture must NOT contain version 0/1 JSON commits — that's
    what proves the reader starts from the checkpoint."""
    files = _untar(synth_delta(4))
    names = set(files)
    assert "_delta_log/00000000000000000000.json" not in names
    assert "_delta_log/00000000000000000001.json" not in names
    assert "_delta_log/00000000000000000002.json" in names
    assert "_delta_log/00000000000000000001.checkpoint.parquet" in names


def test_remove_tombstone_actually_skips_the_file():
    """seed 0 probes slot 0 (the replaced window). Dropping the
    remove action must change the result — proving the tombstone is
    honored in the real scan."""
    seed = 0
    plan = synth_delta_plan(seed)
    assert plan["probe_slot"] == 0
    base = scan_delta(synth_delta(seed))
    files = _untar(synth_delta(seed))
    path = "_delta_log/00000000000000000002.json"
    lines = [
        ln
        for ln in files[path].splitlines()
        if b'"remove"' not in ln
    ]
    files[path] = b"\n".join(lines) + b"\n"
    r = scan_delta(_retar(files))
    assert r["live_files"] == base["live_files"] + 1
    assert r["files_scanned"] == 2
    assert r["rows_scanned"] > base["rows_scanned"]
    assert r["probe_matches"] > base["probe_matches"]


def test_unsupported_reader_version_quarantines():
    files = _untar(synth_delta(1))
    path = "_delta_log/00000000000000000002.json"
    extra = json.dumps(
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}}
    ).encode()
    files[path] = files[path] + extra + b"\n"
    with pytest.raises(ValueError, match="minReaderVersion 3 unsupported"):
        scan_delta(_retar(files))


def test_noncontiguous_commit_quarantines():
    files = _untar(synth_delta(2))
    files["_delta_log/00000000000000000004.json"] = json.dumps(
        {"commitInfo": {"operation": "WRITE"}}
    ).encode()
    with pytest.raises(ValueError, match="not contiguous"):
        scan_delta(_retar(files))


def test_stats_footer_mismatch_quarantines():
    """An add whose stats.numRecords disagrees with the actual
    parquet footer must quarantine (the two metadata systems cannot
    drift)."""
    seed = 0  # probe slot 0 -> the replacement file is scanned
    files = _untar(synth_delta(seed))
    path = "_delta_log/00000000000000000002.json"
    out = []
    for ln in files[path].splitlines():
        if b'"add"' in ln:
            act = json.loads(ln)
            st = json.loads(act["add"]["stats"])
            st["numRecords"] += 1
            act["add"]["stats"] = json.dumps(st)
            ln = json.dumps(act).encode()
        out.append(ln)
    files[path] = b"\n".join(out) + b"\n"
    with pytest.raises(ValueError, match="numRecords"):
        scan_delta(_retar(files))


def test_checkpoint_size_mismatch_quarantines():
    files = _untar(synth_delta(3))
    lc = json.loads(files["_delta_log/_last_checkpoint"])
    lc["size"] += 2
    files["_delta_log/_last_checkpoint"] = json.dumps(lc).encode()
    with pytest.raises(ValueError, match="size disagrees"):
        scan_delta(_retar(files))


def test_multiple_fields_in_one_action_quarantines():
    files = _untar(synth_delta(5))
    path = "_delta_log/00000000000000000002.json"
    files[path] = files[path] + json.dumps(
        {"add": {"path": "x.parquet", "stats": "{}"},
         "remove": {"path": "y.parquet"}}
    ).encode() + b"\n"
    with pytest.raises(ValueError, match="exactly one field"):
        scan_delta(_retar(files))


def test_version_past_int32_quarantines():
    """Review r11: versions/minReaderVersion feed IntegerType Arrow
    columns — values past int32 must quarantine, not overflow after
    the ValueError fence."""
    files = _untar(synth_delta(1))
    big = 2**33
    lc = {"version": big, "size": 7}
    files["_delta_log/_last_checkpoint"] = json.dumps(lc).encode()
    with pytest.raises(ValueError, match="_last_checkpoint malformed"):
        scan_delta(_retar(files))


def test_negative_min_reader_version_quarantines():
    files = _untar(synth_delta(1))
    path = "_delta_log/00000000000000000002.json"
    extra = json.dumps(
        {"protocol": {"minReaderVersion": -(2**40), "minWriterVersion": 2}}
    ).encode()
    files[path] = files[path] + extra + b"\n"
    with pytest.raises(ValueError, match="minReaderVersion malformed"):
        scan_delta(_retar(files))


def test_partitioned_scan_matches_plan():
    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta_partitioned,
        synth_delta_partitioned,
        synth_delta_partitioned_plan,
    )

    for seed in range(12):
        p = synth_delta_partitioned_plan(seed)
        r = scan_delta_partitioned(synth_delta_partitioned(seed))
        assert r["files_pruned_partition"] == p["files_pruned_partition"]
        assert r["files_pruned_stats"] == p["files_pruned_stats"]
        assert r["files_scanned"] == p["files_scanned"]
        assert r["rows_scanned"] == p["rows_scanned"]
        assert r["probe_matches"] == p["probe_matches"]


def test_statsless_file_only_prunable_by_partition():
    """Remove partitionValues from a stats-less add: the scan must
    quarantine rather than guess."""
    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta_partitioned,
        synth_delta_partitioned,
    )

    files = _untar(synth_delta_partitioned(0))
    path = "_delta_log/00000000000000000000.json"
    out = []
    for ln in files[path].splitlines():
        if b'"add"' in ln:
            act = json.loads(ln)
            act["add"].pop("partitionValues", None)
            ln = json.dumps(act).encode()
        out.append(ln)
    files[path] = b"\n".join(out) + b"\n"
    with pytest.raises(ValueError, match="partition value"):
        scan_delta_partitioned(_retar(files))


def _rebuild_checkpoint(files, actions):
    """Write a checkpoint parquet from a list of
    {metaData|protocol|add|remove: body} dicts and fix
    _last_checkpoint."""
    import io as _io

    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = {"metaData": [], "protocol": [], "add": [], "remove": []}
    for act in actions:
        (kind, body), = act.items()
        for k in cols:
            cols[k].append(body if k == kind else None)
    cp = pa.table(cols)
    buf = _io.BytesIO()
    pq.write_table(cp, buf)
    # normalize to the single-file form (odd seeds synthesize the
    # 2-part layout; the rebuild replaces whichever form was there)
    for name in [n for n in files if ".checkpoint." in n]:
        del files[name]
    files["_delta_log/00000000000000000001.checkpoint.parquet"] = (
        buf.getvalue()
    )
    files["_delta_log/_last_checkpoint"] = json.dumps(
        {"version": 1, "size": len(actions)}
    ).encode()


def _checkpoint_actions(files):
    """Decode the fixture checkpoint (single-file or 2-part) back to
    action dicts."""
    import io as _io

    import pyarrow.parquet as pq

    single = files.get("_delta_log/00000000000000000001.checkpoint.parquet")
    blobs = [single] if single is not None else [
        files[n] for n in sorted(files)
        if "/00000000000000000001.checkpoint.00" in n
    ]
    out = []
    for blob in blobs:
        cp = pq.read_table(_io.BytesIO(blob))
        for kind in ("metaData", "protocol", "add"):
            for body in cp.column(kind).to_pylist():
                if body is not None:
                    out.append({kind: body})
    return out


def test_checkpoint_carried_tombstone_drops_the_file():
    """Real checkpoints retain remove tombstones (vacuum
    bookkeeping); the replay must honor one found IN the checkpoint,
    not only in JSON commits."""
    seed = 1
    base = scan_delta(synth_delta(seed))
    files = _untar(synth_delta(seed))
    actions = _checkpoint_actions(files)
    # tombstone a file the probe does NOT hit (seed 1 probes slot 1
    # of 6; remove slot 2's file) so live_files drops but the scan
    # still succeeds
    actions.append({"remove": {"path": "part-00002.parquet"}})
    _rebuild_checkpoint(files, actions)
    r = scan_delta(_retar(files))
    assert r["live_files"] == base["live_files"] - 1
    assert r["files_at_checkpoint"] == base["files_at_checkpoint"] - 1
    assert r["probe_matches"] == base["probe_matches"]


def test_commit_readd_overrides_checkpoint_state():
    """Last-action-wins: a commit re-adding a path present in the
    checkpoint replaces its stats (here: a bigger numRecords backed
    by a matching parquet)."""
    import io as _io

    import pyarrow as pa
    import pyarrow.parquet as pq

    seed = 1
    plan = synth_delta_plan(seed)
    k = plan["probe_slot"]
    assert k == 1  # seed 1 probes slot 1
    files = _untar(synth_delta(seed))
    # replacement for slot 1's file: same window, 3 extra copies of
    # the probe value appended
    lo = 100 + seed % 50
    rows = 40 + (seed + 1) % 60
    vals = [lo + (r % 40) for r in range(rows)] + [plan["probe"]] * 3
    buf = _io.BytesIO()
    pq.write_table(pa.table({"v": vals}), buf)
    files["part-00001.parquet"] = buf.getvalue()
    add = {
        "path": "part-00001.parquet",
        "size": len(files["part-00001.parquet"]),
        "dataChange": True,
        "stats": json.dumps({
            "numRecords": len(vals),
            "minValues": {"v": lo},
            "maxValues": {"v": lo + 39},
        }),
    }
    path = "_delta_log/00000000000000000002.json"
    files[path] = files[path] + json.dumps({"add": add}).encode() + b"\n"
    r = scan_delta(_retar(files))
    base = scan_delta(synth_delta(seed))
    assert r["probe_matches"] == base["probe_matches"] + 3
    assert r["rows_scanned"] == base["rows_scanned"] + 3
    assert r["live_files"] == base["live_files"]


# --- deletion vectors (reader version 3) ------------------------------


def test_z85_rfc_vector_and_roundtrip():
    """The ZeroMQ RFC 32/Z85 published test vector, plus roundtrip
    and reject fences."""
    from datawarehouseproject_spark.functions.delta_log import (
        z85_decode,
        z85_encode,
    )

    assert z85_encode(bytes.fromhex("864FD26FB559F75B")) == "HelloWorld"
    assert z85_decode("HelloWorld") == bytes.fromhex("864FD26FB559F75B")
    blob = bytes(range(64))
    assert z85_decode(z85_encode(blob)) == blob
    with pytest.raises(ValueError, match="aligned"):
        z85_encode(b"abc")
    with pytest.raises(ValueError, match="aligned"):
        z85_decode("abcd")
    with pytest.raises(ValueError, match="alphabet"):
        z85_decode("abc~d")
    with pytest.raises(ValueError, match="overflows"):
        z85_decode("#####")  # 84 in every digit > 2^32 - 1


def test_roaring_spec_golden_array_container():
    """Hand-traced from the RoaringFormatSpec portable layout:
    {1,2,3,1000} = cookie 12346, one array container, offset header
    pointing at byte 16."""
    from datawarehouseproject_spark.functions.delta_log import (
        _roaring32_deserialize,
        _roaring32_serialize,
    )

    golden = bytes.fromhex(
        "3a300000" "01000000" "0000" "0300" "10000000"
        "0100" "0200" "0300" "e803"
    )
    vals, pos = _roaring32_deserialize(golden, 0)
    assert vals == [1, 2, 3, 1000] and pos == len(golden)
    assert _roaring32_serialize([(0, [1, 2, 3, 1000], False)]) == golden


def test_roaring_spec_golden_run_container():
    """{5..10} as a run container: cookie 12347 | 0<<16, run-flag
    byte 0x01, no offset header below 4 containers, one run
    (start 5, length-1 5)."""
    from datawarehouseproject_spark.functions.delta_log import (
        _roaring32_deserialize,
        _roaring32_serialize,
    )

    golden = bytes.fromhex("3b300000" "01" "0000" "0500" "0100" "0500" "0500")
    vals, pos = _roaring32_deserialize(golden, 0)
    assert vals == list(range(5, 11)) and pos == len(golden)
    assert _roaring32_serialize([(0, list(range(5, 11)), True)]) == golden


def test_roaring_bitmap_container_roundtrip():
    from datawarehouseproject_spark.functions.delta_log import (
        _roaring32_deserialize,
        _roaring32_serialize,
    )

    lows = list(range(0, 10000, 2))  # 5000 > 4096 -> bitmap container
    blob = _roaring32_serialize([(3, lows, False)])
    vals, pos = _roaring32_deserialize(blob, 0)
    assert vals == [(3 << 16) | v for v in lows] and pos == len(blob)


def test_rbm_array_64bit_roundtrip_and_fences():
    from datawarehouseproject_spark.functions.delta_log import (
        rbm_array_deserialize,
        rbm_array_serialize,
    )

    vals = [0, 5, 70000, (1 << 32) + 7, (1 << 33), (1 << 33) + 65537]
    assert rbm_array_deserialize(rbm_array_serialize(vals)) == vals
    with pytest.raises(ValueError, match="sorted unique"):
        rbm_array_serialize([3, 3])
    with pytest.raises(ValueError, match="trailing"):
        rbm_array_deserialize(rbm_array_serialize([1]) + b"\x00")


def test_dv_scan_matches_plan_all_seeds():
    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta_dv,
        synth_delta_dv,
        synth_delta_dv_plan,
    )

    for seed in range(10):
        plan = synth_delta_dv_plan(seed)
        out = scan_delta_dv(synth_delta_dv(seed))
        assert out["total_rows"] == plan["total_rows"]
        assert out["deleted_rows"] == plan["deleted_rows"]
        assert out["live_rows"] == plan["live_rows"]
        assert out["surviving_v_sum"] == plan["surviving_v_sum"]
        assert (
            out["replaced_dv_cardinality"]
            == plan["replaced_dv_cardinality"]
            == len(plan["d1b"])
        )
        assert out["files_with_dv"] == 3
        assert out["inline_dvs"] == 1 and out["file_dvs"] == 2
        assert out["min_reader_version"] == 3


def test_dv_checksum_mismatch_quarantines():
    """Flip the trailing CRC byte of the shared .bin (slot 2's
    entry) — the scan must loud-reject, not serve a half-decoded
    bitmap."""
    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta_dv,
        synth_delta_dv,
    )

    files = _untar(synth_delta_dv(1))
    bin_name = next(
        n for n in files
        if n.startswith("ab/deletion_vector_") and n.endswith(".bin")
    )
    blob = bytearray(files[bin_name])
    blob[-1] ^= 0xFF
    files[bin_name] = bytes(blob)
    with pytest.raises(ValueError, match="checksum"):
        scan_delta_dv(_retar(files))


def test_dv_position_past_rows_quarantines():
    """Rewrite the v3 commit so slot 1's superseding DV is INLINE
    with a position at numRecords — merge-on-read must refuse."""
    from datawarehouseproject_spark.functions.delta_log import (
        dv_data_encode,
        scan_delta_dv,
        synth_delta_dv,
        synth_delta_dv_plan,
        z85_encode,
    )

    seed = 2
    plan = synth_delta_dv_plan(seed)
    files = _untar(synth_delta_dv(seed))
    v3_name = f"_delta_log/{3:020d}.json"
    lines = files[v3_name].decode().splitlines()
    add = json.loads(lines[1])["add"]
    data = dv_data_encode([plan["rows"][1]])  # == numRecords: invalid
    pad = (-len(data)) % 4
    add["deletionVector"] = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
        "sizeInBytes": len(data),
        "cardinality": 1,
    }
    lines[1] = json.dumps({"add": add})
    files[v3_name] = ("\n".join(lines) + "\n").encode()
    with pytest.raises(ValueError, match="past file rows"):
        scan_delta_dv(_retar(files))


def test_dv_descriptor_cardinality_mismatch_quarantines():
    from datawarehouseproject_spark.functions.delta_log import (
        _dv_positions,
        dv_data_encode,
        z85_encode,
    )

    data = dv_data_encode([1, 2, 3])
    pad = (-len(data)) % 4
    dv = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
        "offset": None,
        "sizeInBytes": len(data),
        "cardinality": 2,
    }
    with pytest.raises(ValueError, match="cardinality disagrees"):
        _dv_positions({}, dv)


def test_dv_protocol_fences():
    """minReaderVersion 2 (column mapping) refuses on every path;
    unknown reader features refuse; a DV add without the protocol
    feature refuses; the non-DV scans refuse a v3 table outright."""
    from datawarehouseproject_spark.functions.delta_log import (
        _State,
        scan_delta,
        synth_delta_dv,
    )

    st = _State(allow_dv=True)
    with pytest.raises(ValueError, match="minReaderVersion 2"):
        st.apply({"protocol": {"minReaderVersion": 2}})
    with pytest.raises(ValueError, match="unsupported"):
        st.apply(
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "readerFeatures": ["deletionVectors", "v2Checkpoint"],
                }
            }
        )
    with pytest.raises(ValueError, match="readerFeatures malformed"):
        st.apply({"protocol": {"minReaderVersion": 3}})
    # feature not enabled -> DV adds refuse even on the DV-aware path
    st.apply({"protocol": {"minReaderVersion": 1}})
    with pytest.raises(ValueError, match="protocol feature"):
        st.apply(
            {
                "add": {
                    "path": "p.parquet",
                    "stats": json.dumps(
                        {
                            "numRecords": 1,
                            "minValues": {"v": 0},
                            "maxValues": {"v": 0},
                        }
                    ),
                    "deletionVector": {
                        "storageType": "i",
                        "pathOrInlineDv": "aaaaa",
                        "sizeInBytes": 4,
                        "cardinality": 0,
                    },
                }
            }
        )
    # the plain scan hits the version fence before any DV logic
    with pytest.raises(ValueError, match="minReaderVersion 3"):
        scan_delta(synth_delta_dv(0))


def test_dv_absolute_path_storage_rejects():
    from datawarehouseproject_spark.functions.delta_log import (
        _parse_dv_descriptor,
    )

    with pytest.raises(ValueError, match="absolute-path"):
        _parse_dv_descriptor(
            {
                "storageType": "p",
                "pathOrInlineDv": "s3://bucket/dv.bin",
                "offset": 1,
                "sizeInBytes": 10,
                "cardinality": 1,
            }
        )


# --- column mapping (reader version 2) --------------------------------


def test_cm_scan_matches_plan_all_seeds():
    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta_cm,
        synth_delta_cm,
        synth_delta_cm_plan,
    )

    for seed in range(10):
        plan = synth_delta_cm_plan(seed)
        out = scan_delta_cm(synth_delta_cm(seed))
        assert out["mapping_mode"] == plan["mode"]
        assert out["min_reader_version"] == 2
        assert out["live_files"] == plan["n"]
        assert out["files_pruned"] == plan["n"] - 1
        assert out["files_scanned"] == 1
        assert out["rows_scanned"] == plan["rows_scanned"]
        assert out["probe_matches"] == 1
        assert out["total_rows"] == plan["total_rows"]
        assert out["sum_v"] == plan["sum_v"]


def test_cm_rejected_without_the_capability():
    """A mapped table must refuse on BOTH non-CM fences: the
    protocol version (plain scan) and the configuration mode (a
    hypothetical v1-but-mapped log)."""
    from datawarehouseproject_spark.functions.delta_log import (
        _State,
        scan_delta_partitioned,
        synth_delta_cm,
    )

    # the young-table scan reads the same version-0-only layout, so
    # it reaches the protocol fence (scan_delta stops earlier at the
    # missing checkpoint)
    with pytest.raises(ValueError, match="minReaderVersion 2"):
        scan_delta_partitioned(synth_delta_cm(0))
    st = _State()
    with pytest.raises(ValueError, match="column mapping unsupported"):
        st.apply(
            {
                "metaData": {
                    "id": "m",
                    "configuration": {"delta.columnMapping.mode": "name"},
                }
            }
        )


def test_cm_schema_invariants_reject():
    from datawarehouseproject_spark.functions.delta_log import (
        _parse_mapping_schema,
    )

    def schema(fields):
        return json.dumps({"type": "struct", "fields": fields})

    good = {
        "name": "v",
        "type": "long",
        "nullable": False,
        "metadata": {
            "delta.columnMapping.id": 1,
            "delta.columnMapping.physicalName": "col-x",
        },
    }
    assert _parse_mapping_schema(schema([good])) == {"v": (1, "col-x")}
    dup_id = dict(good, name="w")
    with pytest.raises(ValueError, match="not unique"):
        _parse_mapping_schema(schema([good, dup_id]))
    no_md = dict(good, metadata={})
    with pytest.raises(ValueError, match="metadata malformed"):
        _parse_mapping_schema(schema([no_md]))
    with pytest.raises(ValueError, match="without fields"):
        _parse_mapping_schema(schema([]))


def test_cm_unknown_mode_rejects():
    from datawarehouseproject_spark.functions.delta_log import _State

    st = _State(allow_cm=True)
    with pytest.raises(ValueError, match="mode unknown"):
        st.apply(
            {
                "metaData": {
                    "id": "m",
                    "configuration": {
                        "delta.columnMapping.mode": "physical"
                    },
                }
            }
        )


def test_cm_logical_name_in_data_file_rejects():
    """Plant the logical name into a data file: the scan must flag
    it rather than silently prefer either column."""
    import io as _io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta_cm,
        synth_delta_cm,
        synth_delta_cm_plan,
    )

    seed = 0
    plan = synth_delta_cm_plan(seed)
    files = _untar(synth_delta_cm(seed))
    rows, lo = plan["rows"][0], plan["lo"][0]
    buf = _io.BytesIO()
    pq.write_table(
        pa.table({"v": [lo + r for r in range(rows)]}), buf
    )
    files["part-00000.parquet"] = buf.getvalue()
    with pytest.raises(ValueError, match="logical name"):
        scan_delta_cm(_retar(files))


def test_v3_feature_gate_is_per_scan_capability():
    """A v3 table's declared readerFeatures must be refused unless
    THIS scan implements them: columnMapping under allow_cm, not
    under allow_dv — and vice versa (review pass: the allowance was
    previously unreachable)."""
    from datawarehouseproject_spark.functions.delta_log import _State

    cm_proto = {
        "protocol": {
            "minReaderVersion": 3,
            "readerFeatures": ["columnMapping"],
        }
    }
    st = _State(allow_cm=True)
    st.apply(cm_proto)
    assert st.min_reader == 3
    assert st.reader_features == {"columnMapping"}
    with pytest.raises(ValueError, match="unsupported"):
        _State(allow_dv=True).apply(cm_proto)
    dv_proto = {
        "protocol": {
            "minReaderVersion": 3,
            "readerFeatures": ["deletionVectors"],
        }
    }
    with pytest.raises(ValueError, match="unsupported"):
        _State(allow_cm=True).apply(dv_proto)


def test_time_travel_matches_plan_all_seeds():
    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta_time_travel,
        synth_delta_tt,
        synth_delta_tt_plan,
    )

    for seed in range(10):
        p = synth_delta_tt_plan(seed)
        out = scan_delta_time_travel(synth_delta_tt(seed))
        assert out["versions_readable"] == 3
        assert out["live_files_v1"] == p["n_live"]
        assert out["live_files_current"] == p["n_live"] + 1
        assert out["total_rows_v1"] == p["total_rows_v1"]
        assert out["total_rows_v2"] == p["total_rows_v2"]
        assert out["total_rows_current"] == p["total_rows_current"]
        assert out["probe_matches_v1"] == p["probe_matches_v1"]
        assert out["probe_matches_current"] == p["probe_matches_current"]


def test_time_travel_v1_is_prereplace_state():
    """Drop the v2 remove action: v1 must be unchanged but current
    gains a file — proving versions are reconstructed independently,
    not by un-applying actions backwards."""
    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta_time_travel,
        synth_delta_tt,
        synth_delta_tt_plan,
    )

    seed = 0
    p = synth_delta_tt_plan(seed)
    base = scan_delta_time_travel(synth_delta_tt(seed))
    files = _untar(synth_delta_tt(seed))
    path = "_delta_log/00000000000000000002.json"
    lines = [
        ln for ln in files[path].splitlines() if b'"remove"' not in ln
    ]
    files[path] = b"\n".join(lines) + b"\n"
    out = scan_delta_time_travel(_retar(files))
    assert out["total_rows_v1"] == base["total_rows_v1"] == p["total_rows_v1"]
    assert out["probe_matches_v1"] == base["probe_matches_v1"]
    assert out["live_files_current"] == base["live_files_current"] + 1
    assert out["total_rows_current"] > base["total_rows_current"]


# --- v2 checkpoints ----------------------------------------------------


def test_v2cp_matches_plan_all_seeds():
    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta_v2cp,
        synth_delta_v2cp,
        synth_delta_v2cp_plan,
    )

    for seed in range(10):
        p = synth_delta_v2cp_plan(seed)
        out = scan_delta_v2cp(synth_delta_v2cp(seed))
        assert out["sidecar_files"] == 2
        assert out["live_files"] == p["n"]
        assert out["files_pruned"] == p["n"] - 1
        assert out["rows_scanned"] == p["rows_scanned"]
        assert out["total_live_rows"] == p["total_live_rows"]
        assert out["probe_matches"] == p["probe_matches"]


def test_v2cp_fences():
    """Version disagreement in checkpointMetadata, a missing sidecar,
    and the classic scan's inability to even FIND the v2 checkpoint
    all loud-reject."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta,
        scan_delta_v2cp,
        synth_delta_v2cp,
    )

    blob = synth_delta_v2cp(1)
    # the classic reader cannot read a v2-checkpoint-only table
    with pytest.raises(ValueError, match="checkpoint parquet missing"):
        scan_delta(blob)
    files = _untar(blob)
    cp_name = next(
        n for n in files
        if ".checkpoint." in n and n.endswith(".parquet")
    )
    # checkpointMetadata version disagreement
    table = pq.read_table(io.BytesIO(files[cp_name]))
    rows = table.to_pylist()
    for r in rows:
        if r.get("checkpointMetadata") is not None:
            r["checkpointMetadata"] = {"version": 9}
    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pylist(rows), buf)
    bad = dict(files)
    bad[cp_name] = buf.getvalue()
    with pytest.raises(ValueError, match="version disagrees"):
        scan_delta_v2cp(_retar(bad))
    # missing sidecar file
    bad = dict(files)
    gone = next(n for n in bad if "_sidecars/" in n)
    del bad[gone]
    with pytest.raises(ValueError, match="missing from log"):
        scan_delta_v2cp(_retar(bad))


def test_v2cp_inline_form_and_mixing():
    """An inline-form v2 checkpoint (no sidecars, add actions in the
    checkpoint itself) reads fine; adding a sidecar pointer next to
    inline adds loud-rejects (the spec's either/or)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta_v2cp,
        synth_delta_v2cp,
        synth_delta_v2cp_plan,
    )

    seed = 2
    p = synth_delta_v2cp_plan(seed)
    files = _untar(synth_delta_v2cp(seed))
    cp_name = next(
        n for n in files
        if ".checkpoint." in n and n.endswith(".parquet")
    )
    rows = pq.read_table(io.BytesIO(files[cp_name])).to_pylist()
    # collect the sidecar-held adds, inline them, drop sidecars
    adds = []
    for n, blob in files.items():
        if "_sidecars/" in n:
            adds.extend(
                a for a in pq.read_table(io.BytesIO(blob))
                .column("add").to_pylist() if a is not None
            )
    keys = ("metaData", "protocol", "checkpointMetadata", "add")
    inline = [
        {k: r.get(k) for k in keys}
        for r in rows
        if any(r.get(k) is not None for k in keys[:3])
    ]
    inline += [
        {"metaData": None, "protocol": None,
         "checkpointMetadata": None, "add": a}
        for a in adds
    ]
    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pylist(inline), buf)
    good = {
        n: b for n, b in files.items() if "_sidecars/" not in n
    }
    good[cp_name] = buf.getvalue()
    good["_delta_log/_last_checkpoint"] = json.dumps(
        {"version": 1, "size": len(inline)}
    ).encode()
    out = scan_delta_v2cp(_retar(good))
    assert out["sidecar_files"] == 0
    assert out["total_live_rows"] == p["total_live_rows"]
    assert out["probe_matches"] == p["probe_matches"]
    # now mix: inline adds AND a sidecar pointer
    mixed_rows = [dict(r, sidecar=None) for r in inline] + [
        {"metaData": None, "protocol": None,
         "checkpointMetadata": None, "add": None,
         "sidecar": {"path": "sc-x.parquet", "sizeInBytes": 1}}
    ]
    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pylist(mixed_rows), buf)
    mixed = dict(good)
    mixed[cp_name] = buf.getvalue()
    mixed["_delta_log/_last_checkpoint"] = json.dumps(
        {"version": 1, "size": len(mixed_rows)}
    ).encode()
    with pytest.raises(ValueError, match="mixes inline and sidecar"):
        scan_delta_v2cp(_retar(mixed))


def test_v2cp_under_classic_name_still_reads_sidecars():
    """The spec allows a v2 checkpoint under the CLASSIC file name —
    v2-ness is the checkpointMetadata action, not the name (review
    finding: the name-only test dropped sidecar actions silently)."""
    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta_v2cp,
        synth_delta_v2cp,
        synth_delta_v2cp_plan,
    )

    seed = 3
    p = synth_delta_v2cp_plan(seed)
    files = _untar(synth_delta_v2cp(seed))
    cp_name = next(
        n for n in files
        if ".checkpoint." in n and n.endswith(".parquet")
    )
    files["_delta_log/00000000000000000001.checkpoint.parquet"] = (
        files.pop(cp_name)
    )
    out = scan_delta_v2cp(_retar(files))
    assert out["sidecar_files"] == 2
    assert out["total_live_rows"] == p["total_live_rows"]
    assert out["probe_matches"] == p["probe_matches"]


def test_uuid_named_checkpoint_without_metadata_rejects():
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta_v2cp,
        synth_delta_v2cp,
    )

    files = _untar(synth_delta_v2cp(0))
    cp_name = next(
        n for n in files
        if ".checkpoint." in n and n.endswith(".parquet")
    )
    rows = pq.read_table(io.BytesIO(files[cp_name])).to_pylist()
    for r in rows:
        r["checkpointMetadata"] = None
    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pylist(rows), buf)
    files[cp_name] = buf.getvalue()
    with pytest.raises(ValueError, match="without checkpointMetadata"):
        scan_delta_v2cp(_retar(files))


# --- feature composition: DV on a column-mapped table ------------------


def test_dvcm_matches_plan_all_seeds():
    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta_dvcm,
        synth_delta_dvcm,
        synth_delta_dvcm_plan,
    )

    for seed in range(10):
        p = synth_delta_dvcm_plan(seed)
        out = scan_delta_dvcm(synth_delta_dvcm(seed))
        assert out["files_with_dv"] == 1
        assert out["total_rows"] == p["total_rows"]
        assert out["deleted_rows"] == p["deleted_rows"]
        assert out["live_rows"] == p["live_rows"]
        assert out["surviving_v_sum"] == p["surviving_v_sum"]
        assert out["probe_matches"] == 1


def test_dvcm_single_capability_scans_refuse():
    """A both-features table must refuse on the DV-only AND the
    CM-only capability — each lacks one declared reader feature."""
    from datawarehouseproject_spark.functions.delta_log import (
        _State,
        scan_delta_cm,
        synth_delta_dvcm,
    )

    with pytest.raises(ValueError, match="unsupported"):
        scan_delta_cm(synth_delta_dvcm(0))
    # the DV-only capability hits the same feature gate (the
    # checkpoint-path scan would stop earlier on the young-table
    # layout, so pin the gate at the state level)
    with pytest.raises(ValueError, match="unsupported"):
        _State(allow_dv=True).apply(
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "readerFeatures": [
                        "deletionVectors", "columnMapping",
                    ],
                }
            }
        )


def test_dvcm_deleted_probe_row_is_invisible():
    """Re-point the probe at a DELETED position: matches must drop
    to zero — the row exists in the parquet but not in the table."""
    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta_dvcm,
        synth_delta_dvcm,
        synth_delta_dvcm_plan,
    )

    seed = 1
    p = synth_delta_dvcm_plan(seed)
    deleted_value = p["lo"][0] + p["d0"][0]
    files = _untar(synth_delta_dvcm(seed))
    path = "_delta_log/00000000000000000000.json"
    out = []
    for ln in files[path].splitlines():
        act = json.loads(ln)
        if "metaData" in act and act["metaData"] is not None:
            act["metaData"]["configuration"]["fixture.probe"] = str(
                deleted_value
            )
            ln = json.dumps(act).encode()
        out.append(ln)
    files[path] = b"\n".join(out) + b"\n"
    r = scan_delta_dvcm(_retar(files))
    assert r["probe_matches"] == 0


# ---------------------------------------------------------------------------
# change data feed
# ---------------------------------------------------------------------------

def _cdf_imports():
    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta_cdf,
        synth_delta_cdf,
        synth_delta_cdf_plan,
    )

    return scan_delta_cdf, synth_delta_cdf, synth_delta_cdf_plan


def test_cdf_matches_plan_all_seeds():
    scan, synth, plan_fn = _cdf_imports()
    for seed in range(12):
        plan = plan_fn(seed)
        r = scan(synth(seed))
        assert r["commits_read"] == 4
        assert r["cdc_commits"] == 1
        assert r["derived_commits"] == 2
        assert r["skipped_commits"] == 1
        assert r["cdc_files_read"] == 1
        assert r["inserts"] == plan["inserts"]
        assert r["insert_sum"] == plan["insert_sum"]
        assert r["update_pre"] == r["update_post"] == plan["u"]
        assert r["pre_sum"] == plan["pre_sum"]
        assert r["post_sum"] == plan["post_sum"]
        assert r["deletes"] == plan["deletes"]
        assert r["delete_sum"] == plan["delete_sum"]
        assert r["change_rows"] == (
            plan["inserts"] + 2 * plan["u"] + plan["deletes"]
        )


def test_cdf_cdc_presence_suppresses_derivation():
    """The version-1 add/remove pair carries dataChange=true; a
    reader that also derives from it double-counts.  Dropping the
    cdc line turns the SAME commit into a derived rewrite — the
    counts that appear are exactly what the cdc-honoring read must
    NOT have added."""
    scan, synth, plan_fn = _cdf_imports()
    seed = 5
    plan = plan_fn(seed)
    files = _untar(synth(seed))
    v1 = "_delta_log/00000000000000000001.json"
    lines = [
        ln for ln in files[v1].decode().splitlines()
        if '"cdc"' not in ln
    ]
    files[v1] = ("\n".join(lines) + "\n").encode()
    r = scan(_retar(files))
    rows_0 = 20 + seed % 30
    assert r["cdc_commits"] == 0
    assert r["derived_commits"] == 3
    assert r["update_pre"] == r["update_post"] == 0
    # the rewrite's full add/remove now surface as insert+delete rows
    assert r["inserts"] == plan["inserts"] + rows_0
    assert r["deletes"] == plan["deletes"] + rows_0


def test_cdf_compaction_commit_contributes_nothing():
    scan, synth, plan_fn = _cdf_imports()
    seed = 3
    plan = plan_fn(seed)
    files = _untar(synth(seed))
    v3 = "_delta_log/00000000000000000003.json"
    body = files[v3].decode().replace(
        '"dataChange": false', '"dataChange": true'
    )
    files[v3] = body.encode()
    r = scan(_retar(files))
    rows_0 = 20 + seed % 30
    assert r["skipped_commits"] == 0
    assert r["derived_commits"] == 3
    assert r["inserts"] == plan["inserts"] + rows_0
    assert r["deletes"] == plan["deletes"] + rows_0


def test_cdf_disabled_rejects():
    scan, synth, _ = _cdf_imports()
    files = _untar(synth(2))
    v0 = "_delta_log/00000000000000000000.json"
    body = files[v0].decode().replace(
        '"delta.enableChangeDataFeed": "true", ', ""
    )
    assert body != files[v0].decode()
    files[v0] = body.encode()
    with pytest.raises(ValueError, match="not enabled"):
        scan(_retar(files))


def test_cdf_vacuumed_prefix_rejects():
    scan, synth, _ = _cdf_imports()
    files = _untar(synth(2))
    del files["_delta_log/00000000000000000000.json"]
    with pytest.raises(ValueError, match="version 0"):
        scan(_retar(files))


def test_cdf_tombstone_vacuumed_rejects():
    """The derived-delete path must READ the removed file; once it
    is physically vacuumed the change rows are unservable."""
    scan, synth, _ = _cdf_imports()
    files = _untar(synth(2))
    del files["part-00001.parquet"]
    with pytest.raises(ValueError, match="missing from bundle"):
        scan(_retar(files))


def test_cdf_unbalanced_update_images_reject():
    import pyarrow as pa
    import pyarrow.parquet as pq

    scan, synth, plan_fn = _cdf_imports()
    seed = 7
    u = plan_fn(seed)["u"]
    files = _untar(synth(seed))
    buf = io.BytesIO()
    pq.write_table(
        pa.table({
            "v": list(range(2 * u - 1)),
            "_change_type": ["update_preimage"] * u
            + ["update_postimage"] * (u - 1),
        }),
        buf,
    )
    cdc = "_change_data/cdc-00001.parquet"
    files[cdc] = buf.getvalue()
    # keep the declared size honest so ONLY the balance check fires
    v1 = "_delta_log/00000000000000000001.json"
    lines = []
    for ln in files[v1].decode().splitlines():
        if '"cdc"' in ln:
            action = json.loads(ln)
            action["cdc"]["size"] = len(files[cdc])
            ln = json.dumps(action)
        lines.append(ln)
    files[v1] = ("\n".join(lines) + "\n").encode()
    with pytest.raises(ValueError, match="unbalanced"):
        scan(_retar(files))


def test_cdf_unknown_change_type_rejects():
    import pyarrow as pa
    import pyarrow.parquet as pq

    scan, synth, _ = _cdf_imports()
    files = _untar(synth(1))
    buf = io.BytesIO()
    pq.write_table(
        pa.table({"v": [1], "_change_type": ["upsert"]}), buf
    )
    cdc = "_change_data/cdc-00001.parquet"
    files[cdc] = buf.getvalue()
    v1 = "_delta_log/00000000000000000001.json"
    lines = []
    for ln in files[v1].decode().splitlines():
        if '"cdc"' in ln:
            action = json.loads(ln)
            action["cdc"]["size"] = len(files[cdc])
            ln = json.dumps(action)
        lines.append(ln)
    files[v1] = ("\n".join(lines) + "\n").encode()
    with pytest.raises(ValueError, match="_change_type"):
        scan(_retar(files))


def test_cdf_cdc_datachange_true_rejects():
    scan, synth, _ = _cdf_imports()
    files = _untar(synth(1))
    v1 = "_delta_log/00000000000000000001.json"
    lines = []
    for ln in files[v1].decode().splitlines():
        if '"cdc"' in ln:
            action = json.loads(ln)
            action["cdc"]["dataChange"] = True
            ln = json.dumps(action)
        lines.append(ln)
    files[v1] = ("\n".join(lines) + "\n").encode()
    with pytest.raises(ValueError, match="dataChange"):
        scan(_retar(files))


def test_cdf_version_range_knobs():
    scan, synth, plan_fn = _cdf_imports()
    seed = 4
    plan = plan_fn(seed)
    files = _untar(synth(seed))
    v0 = "_delta_log/00000000000000000000.json"
    body = files[v0].decode().replace(
        '"fixture.cdf.start": "0"', '"fixture.cdf.start": "1"'
    ).replace('"fixture.cdf.end": "3"', '"fixture.cdf.end": "2"')
    files[v0] = body.encode()
    r = scan(_retar(files))
    assert (r["start_version"], r["end_version"]) == (1, 2)
    assert r["commits_read"] == 2
    assert r["inserts"] == 0  # version 0 excluded
    assert r["update_pre"] == plan["u"]
    assert r["deletes"] == plan["deletes"]
    assert r["skipped_commits"] == 0


def test_snapshot_state_ignores_cdc_actions():
    """PROTOCOL.md: change files are not table data — a snapshot
    replay skips cdc actions (round 11 loud-rejected them); a
    malformed cdc action still quarantines."""
    from datawarehouseproject_spark.functions.delta_log import _State

    state = _State(require_stats=False)
    state.apply({"cdc": {"path": "_change_data/x.parquet",
                         "size": 1, "dataChange": False}})
    assert state.adds == {}
    with pytest.raises(ValueError, match="cdc"):
        state.apply({"cdc": {"size": 1}})


# ---------------------------------------------------------------------------
# multi-part classic checkpoints
# ---------------------------------------------------------------------------

def test_multipart_checkpoint_form_and_equivalence():
    """Odd seeds synthesize the 2-part layout; replay must be
    IDENTICAL to the same actions rebuilt as a single file."""
    seed = 5
    files = _untar(synth_delta(seed))
    names = set(files)
    assert "_delta_log/00000000000000000001.checkpoint.parquet" \
        not in names
    assert ("_delta_log/00000000000000000001.checkpoint."
            "0000000001.0000000002.parquet") in names
    assert ("_delta_log/00000000000000000001.checkpoint."
            "0000000002.0000000002.parquet") in names
    assert json.loads(files["_delta_log/_last_checkpoint"])["parts"] == 2
    multi = scan_delta(synth_delta(seed))
    actions = _checkpoint_actions(files)
    _rebuild_checkpoint(files, actions)  # normalizes to single-file
    single = scan_delta(_retar(files))
    assert multi == single


def test_multipart_missing_part_rejects():
    seed = 3
    files = _untar(synth_delta(seed))
    del files["_delta_log/00000000000000000001.checkpoint."
              "0000000002.0000000002.parquet"]
    with pytest.raises(ValueError, match="part 2/2 missing"):
        scan_delta(_retar(files))


def test_multipart_plus_single_rejects():
    """One version carrying both forms: picking either silently
    ignores the other's actions — must refuse."""
    seed = 3
    files = _untar(synth_delta(seed))
    part1 = files["_delta_log/00000000000000000001.checkpoint."
                  "0000000001.0000000002.parquet"]
    files["_delta_log/00000000000000000001.checkpoint.parquet"] = part1
    with pytest.raises(ValueError, match="both single and multi-part"):
        scan_delta(_retar(files))


def test_multipart_size_sums_across_parts():
    """_last_checkpoint.size counts actions across ALL parts."""
    seed = 3
    files = _untar(synth_delta(seed))
    lc = json.loads(files["_delta_log/_last_checkpoint"])
    lc["size"] += 1
    files["_delta_log/_last_checkpoint"] = json.dumps(lc).encode()
    with pytest.raises(ValueError, match="size disagrees"):
        scan_delta(_retar(files))


def test_multipart_parts_fences():
    seed = 3
    files = _untar(synth_delta(seed))
    for bad in (0, -1, 65, "2", True):
        lc = json.loads(files["_delta_log/_last_checkpoint"])
        lc["parts"] = bad
        f2 = dict(files)
        f2["_delta_log/_last_checkpoint"] = json.dumps(lc).encode()
        with pytest.raises(ValueError, match="parts malformed"):
            scan_delta(_retar(f2))


def test_cdf_null_sibling_key_stays_valueerror():
    """Review r12 pass 1: an action with an extra NULL-valued key
    passes the exactly-one-non-null validation; the change-derive
    loop must not re-derive the kind by raw membership (it picked
    the null sibling and TypeError'd past the quarantine)."""
    scan, synth, _ = _cdf_imports()
    # {"remove": {...}, "add": null} — kind is remove
    files = _untar(synth(2))
    v2 = "_delta_log/00000000000000000002.json"
    lines = []
    for ln in files[v2].decode().splitlines():
        if '"remove"' in ln:
            action = json.loads(ln)
            action["add"] = None
            ln = json.dumps(action)
        lines.append(ln)
    files[v2] = ("\n".join(lines) + "\n").encode()
    r = scan(_retar(files))  # must not raise: add=null is ignored
    base = scan(synth(2))
    assert r == base
    # {"add": {...}, "cdc": null} — kind is add; must not enter the
    # cdc branch with a None body
    files = _untar(synth(2))
    v0 = "_delta_log/00000000000000000000.json"
    lines = []
    for ln in files[v0].decode().splitlines():
        if '"add"' in ln and "part-00000" in ln:
            action = json.loads(ln)
            action["cdc"] = None
            ln = json.dumps(action)
        lines.append(ln)
    files[v0] = ("\n".join(lines) + "\n").encode()
    r = scan(_retar(files))
    assert r == base


def test_cdf_malformed_size_rejects():
    """A cdc size of the wrong type refuses like every sibling size
    fence (review r12 pass 1: it silently skipped the check)."""
    scan, synth, _ = _cdf_imports()
    for bad in ("1234", -1, True):
        files = _untar(synth(1))
        v1 = "_delta_log/00000000000000000001.json"
        lines = []
        for ln in files[v1].decode().splitlines():
            if '"cdc"' in ln:
                action = json.loads(ln)
                action["cdc"]["size"] = bad
                ln = json.dumps(action)
            lines.append(ln)
        files[v1] = ("\n".join(lines) + "\n").encode()
        with pytest.raises(ValueError, match="size malformed"):
            scan(_retar(files))


def test_cdf_cm_composition():
    """The mapped CDF table serves change sums identical to the
    unmapped one; a non-CM CDF scan refuses it at the protocol
    fence; the cdc file carries the PHYSICAL column name."""
    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta_cdf,
        scan_delta_cdf_cm,
        synth_delta_cdf,
        synth_delta_cdf_cm,
    )

    for seed in (0, 3, 7):
        plain = scan_delta_cdf(synth_delta_cdf(seed))
        mapped = scan_delta_cdf_cm(synth_delta_cdf_cm(seed))
        assert mapped["mapping_mode"] == "name"
        for k in plain:
            if k != "mapping_mode":
                assert mapped[k] == plain[k], (seed, k)
        with pytest.raises(ValueError, match="unsupported"):
            scan_delta_cdf(synth_delta_cdf_cm(seed))
    # physical name really is in the cdc parquet
    import io as _io

    import pyarrow.parquet as pq

    files = _untar(synth_delta_cdf_cm(3))
    t = pq.read_table(
        _io.BytesIO(files["_change_data/cdc-00001.parquet"])
    )
    assert "_change_type" in t.column_names
    assert "v" not in t.column_names
    phys = [c for c in t.column_names if c.startswith("col-")]
    assert len(phys) == 1


def test_cdf_id_mode_mapping_is_loud():
    from datawarehouseproject_spark.functions.delta_log import (
        scan_delta_cdf_cm,
        synth_delta_cdf_cm,
    )

    files = _untar(synth_delta_cdf_cm(1))
    v0 = "_delta_log/00000000000000000000.json"
    body = files[v0].decode().replace(
        '"delta.columnMapping.mode": "name"',
        '"delta.columnMapping.mode": "id"',
    )
    assert body != files[v0].decode()
    files[v0] = body.encode()
    with pytest.raises(ValueError, match="id-mode"):
        scan_delta_cdf_cm(_retar(files))


def test_multipart_stray_denominator_rejects():
    """Part files for the same version with a DIFFERENT totalParts
    denominator are a second, conflicting checkpoint set — the
    declared-count fetch would silently ignore them (ADVICE r12)."""
    seed = 3
    files = _untar(synth_delta(seed))
    part1 = files["_delta_log/00000000000000000001.checkpoint."
                  "0000000001.0000000002.parquet"]
    files["_delta_log/00000000000000000001.checkpoint."
          "0000000001.0000000003.parquet"] = part1
    with pytest.raises(ValueError, match="conflicting totalParts"):
        scan_delta(_retar(files))


# ---------------------------------------------------------------------------
# DESCRIBE HISTORY + VACUUM candidates
# ---------------------------------------------------------------------------

def _history_bundle(seed):
    from datawarehouseproject_spark.functions.delta_log import (
        synth_delta_history,
    )

    return synth_delta_history(seed)


def test_history_metrics_crosscheck_rejects_drift():
    from datawarehouseproject_spark.functions.delta_log import (
        delta_history_table,
    )

    files = _untar(_history_bundle(2))
    blob = files["_delta_log/00000000000000000001.json"]
    files["_delta_log/00000000000000000001.json"] = blob.replace(
        b'"numFiles": "1"', b'"numFiles": "2"'
    )
    with pytest.raises(ValueError, match="disagrees with adds"):
        delta_history_table(_retar(files))


def test_history_version_gap_rejects():
    from datawarehouseproject_spark.functions.delta_log import (
        delta_history_table,
    )

    files = _untar(_history_bundle(2))
    del files["_delta_log/00000000000000000001.json"]
    with pytest.raises(ValueError, match="version gaps"):
        delta_history_table(_retar(files))


def test_vacuum_live_tombstone_rejects():
    """A remove for a path that is still live must refuse — vacuuming
    it would corrupt the table."""
    import json as _json

    from datawarehouseproject_spark.functions.delta_log import (
        delta_vacuum_candidates,
    )

    files = _untar(_history_bundle(0))
    extra = _json.dumps({"remove": {
        "path": "part-00002.parquet",  # still live (added at v1)
        "deletionTimestamp": 1700000000000,
        "dataChange": True,
    }}) + "\n" + _json.dumps({"add": {
        "path": "part-00002.parquet",
        "size": 1, "dataChange": True,
        "stats": "{\"numRecords\": 1, \"minValues\": {\"v\": 0}, "
                 "\"maxValues\": {\"v\": 0}}",
    }}) + "\n"
    # craft a v3 that tombstones then re-adds: the re-add clears the
    # tombstone, so part-00002 must NOT appear in the listing
    files["_delta_log/00000000000000000003.json"] = (
        _json.dumps({"commitInfo": {
            "operation": "WRITE", "timestamp": 1700001200000,
            "operationMetrics": {"numFiles": "1",
                                 "numRemovedFiles": "1"},
        }}) + "\n" + extra
    ).encode()
    rows = delta_vacuum_candidates(_retar(files))
    assert [r["path"] for r in rows] == ["part-00000.parquet"]


def test_vacuum_eligibility_boundary():
    from datawarehouseproject_spark.functions.delta_log import (
        delta_vacuum_candidates,
        synth_delta_history_plan,
    )

    for seed in (1, 5):
        plan = synth_delta_history_plan(seed)
        rows = {r["path"]: r for r in
                delta_vacuum_candidates(_history_bundle(seed))}
        assert rows["part-00000.parquet"]["eligible"] is True
        assert rows["part-00001.parquet"]["eligible"] is False
        assert rows["part-00002.parquet"]["eligible"] is False
        assert plan["has_optimize"]


def test_detail_counts_survive_optimize():
    from datawarehouseproject_spark.functions.delta_log import (
        delta_detail_table,
        synth_delta_history_plan,
    )

    for seed in (6, 7):
        plan = synth_delta_history_plan(seed)
        r = plan["rows"]
        d = delta_detail_table(_history_bundle(seed))
        assert d["num_records"] == r[1] + r[2]
        assert d["num_files"] == (1 if plan["has_optimize"] else 2)
