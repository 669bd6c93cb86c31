"""Iceberg snapshot scan — functions/iceberg_scan.py (round 10):
metadata JSON -> manifest-list avro -> manifest avro (nested records
+ bounds arrays through the generic Avro decoder) -> pruned parquet
read, with the manifest/parquet cross-check."""

from __future__ import annotations

import io
import json
import tarfile

import pytest

from datawarehouseproject_spark.functions.iceberg_scan import (
    _file_rows,
    scan_iceberg,
    synth_iceberg,
    synth_iceberg_plan,
)


def _retar(payload: bytes, edit) -> bytes:
    """Unpack, apply ``edit(files dict)``, repack."""
    files = {}
    with tarfile.open(fileobj=io.BytesIO(payload)) as tf:
        for m in tf.getmembers():
            files[m.name] = tf.extractfile(m).read()
    edit(files)
    out = io.BytesIO()
    with tarfile.open(fileobj=out, mode="w") as tf:
        for name in sorted(files):
            info = tarfile.TarInfo(name)
            info.size = len(files[name])
            tf.addfile(info, io.BytesIO(files[name]))
    return out.getvalue()


def test_scan_matches_plan():
    for seed in range(10):
        p = synth_iceberg_plan(seed)
        r = scan_iceberg(synth_iceberg(seed))
        n, k = p["n_files"], p["probe_file"]
        assert r["n_data_files"] == n and r["files_pruned"] == n - 1
        assert r["files_scanned"] == 1
        assert r["rows_scanned"] == _file_rows(seed, k)
        assert r["n_deleted_entries"] == 1
        assert r["total_rows"] == sum(_file_rows(seed, j) for j in range(n))


def test_current_snapshot_wins_over_history():
    """Point current-snapshot-id at snapshot 1 (which sees only the
    first manifest): the scan must see FEWER files, proving it reads
    the named snapshot rather than unioning history."""
    seed = 3
    n = synth_iceberg_plan(seed)["n_files"]

    def edit(files):
        meta = json.loads(files["metadata/v2.metadata.json"])
        meta["current-snapshot-id"] = 1
        files["metadata/v2.metadata.json"] = json.dumps(meta).encode()

    r = scan_iceberg(_retar(synth_iceberg(seed), edit))
    assert r["n_manifests"] == 1
    assert r["n_data_files"] == (n + 1) // 2  # only m0's files


def test_record_count_drift_refused():
    """Manifest record_count disagreeing with the parquet footer is
    metadata corruption, not something to average over."""
    seed = 1
    k = synth_iceberg_plan(seed)["probe_file"]
    blob = synth_iceberg(seed)

    def edit(files):
        # truncate the probed parquet file's rows by rewriting it
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = f"data/f{k:02d}.parquet"
        t = pq.read_table(io.BytesIO(files[path]))
        buf = io.BytesIO()
        pq.write_table(t.slice(0, t.num_rows - 1), buf)
        files[path] = buf.getvalue()

    with pytest.raises(ValueError, match="record_count"):
        scan_iceberg(_retar(blob, edit))


def test_deleted_entries_never_scanned():
    """The DELETED entry points at file 0 with valid bounds; if
    planning respected it, file 0 would double-count whenever the
    probe lands there (seed with probe_file == 0)."""
    seed = 0
    assert synth_iceberg_plan(seed)["probe_file"] == 0
    r = scan_iceberg(synth_iceberg(seed))
    assert r["files_scanned"] == 1
    assert r["rows_scanned"] == _file_rows(seed, 0)


def test_missing_layers_refuse():
    blob = synth_iceberg(2)
    for victim, msg in (
        ("metadata/v2.metadata.json", "metadata"),
        ("metadata/snap-2.avro", "manifest list"),
        ("metadata/m0.avro", "manifest"),
    ):
        def edit(files, victim=victim):
            del files[victim]

        with pytest.raises(ValueError, match=msg):
            scan_iceberg(_retar(blob, edit))


def test_manifest_length_checked():
    blob = synth_iceberg(4)

    def edit(files):
        files["metadata/m0.avro"] += b"\x00"

    with pytest.raises(ValueError, match="manifest_length"):
        scan_iceberg(_retar(blob, edit))


def test_not_a_tar_refuses():
    with pytest.raises(ValueError, match="tar|metadata"):
        scan_iceberg(b"not a tar bundle at all" * 40)


def test_crafted_schema_shapes_quarantine():
    """Review r10 pass 3: the manifest's embedded schema is attacker
    bytes — missing fields, wrong types, and non-record shapes must
    all land as ValueError, never KeyError/TypeError."""
    from datawarehouseproject_spark.functions.avro_scan import (
        _parse_type_spec,
        encode_avro_container,
    )
    from datawarehouseproject_spark.functions.avro_scan import (
        _zigzag_write,
    )
    import json as _json

    for bad in (
        {"type": "record", "name": "r", "fields": [42]},
        {"type": "record", "name": "r", "fields": [{"type": "long"}]},
        {"type": ["long"]},
        {"type": "record", "name": "r", "fields": []},
    ):
        with pytest.raises(ValueError):
            _parse_type_spec(bad)
    # end-to-end: a manifest whose data_file lacks file_path
    blob = synth_iceberg(0)
    schema = _json.dumps({
        "type": "record", "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {"name": "data_file", "type": {
                "type": "record", "name": "data_file",
                "fields": [{"name": "nope", "type": "long"}],
            }},
        ],
    }).encode()
    evil = encode_avro_container(
        schema,
        [_zigzag_write(1) + _zigzag_write(0) + _zigzag_write(5)],
        bytes(16),
    )

    def edit(files):
        files["metadata/m0.avro"] = evil
        files["metadata/m1.avro"] = evil

    with pytest.raises(ValueError):
        scan_iceberg(_retar(blob, edit))


def test_metadata_json_shapes_quarantine():
    blob = synth_iceberg(1)
    for mutate in (
        lambda m: m.__setitem__("current-snapshot-id", [1]),
        lambda m: m.__setitem__("snapshots", 5),
        lambda m: m["snapshots"][0].__setitem__("snapshot-id", [1]),
        lambda m: m["snapshots"][1].__setitem__("manifest-list", ["x"]),
    ):
        def edit(files, mutate=mutate):
            meta = json.loads(files["metadata/v2.metadata.json"])
            mutate(meta)
            files["metadata/v2.metadata.json"] = json.dumps(meta).encode()

        with pytest.raises(ValueError):
            scan_iceberg(_retar(blob, edit))


def test_gzip_compressed_bundle_refused_loudly():
    """mode='r:' keeps transparent decompression (and its non-TarError
    exception types) out of the quarantine surface."""
    import gzip

    blob = gzip.compress(synth_iceberg(2))
    with pytest.raises(ValueError):
        scan_iceberg(blob)
    # and a corrupted gzip stream must ALSO be ValueError, not
    # BadGzipFile
    broken = bytearray(blob)
    broken[len(broken) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        scan_iceberg(bytes(broken))


def test_wrong_column_name_quarantines():
    import pyarrow as pa
    import pyarrow.parquet as pq

    seed = 1
    k = synth_iceberg_plan(seed)["probe_file"]
    rows = _file_rows(seed, k)

    def edit(files):
        buf = io.BytesIO()
        pq.write_table(pa.table({"w": list(range(rows))}), buf)
        files[f"data/f{k:02d}.parquet"] = buf.getvalue()

    with pytest.raises(ValueError, match="predicate column"):
        scan_iceberg(_retar(synth_iceberg(seed), edit))


def test_positional_deletes_subtract_matches():
    """v2 merge-on-read: probe hits at i ≡ 17 (mod 40); deletes kill
    i % 7 == 3, so the i ≡ 17 (mod 280) overlap must vanish."""
    for seed in range(8):
        p = synth_iceberg_plan(seed)
        r = scan_iceberg(synth_iceberg(seed))
        rk = _file_rows(seed, p["probe_file"])
        all_m = (rk - 18) // 40 + 1
        dead_m = (rk - 18) // 280 + 1
        assert r["probe_matches"] == all_m - dead_m
        assert r["positions_deleted_scanned"] == (rk - 4) // 7 + 1
        assert r["n_delete_files"] == 1 and r["n_manifests"] == 3


def test_ignoring_delete_files_would_overcount():
    """Strip the delete manifest from the current snapshot's list:
    matches go back UP — proving the delete path actually subtracts
    (and that the fixture would catch a reader that skips it)."""
    from datawarehouseproject_spark.functions.avro_scan import (
        decode_avro_blocks,
    )

    seed = 2
    blob = synth_iceberg(seed)

    def edit(files):
        # snapshot 1 has no delete manifest: point current at it but
        # keep both data manifests by rebuilding snap-1 = snap-2 minus
        # the delete entry. Easiest: copy snap-2's records sans
        # content=1 via re-encode.
        from datawarehouseproject_spark.functions.avro_scan import (
            encode_avro_container,
        )
        from datawarehouseproject_spark.functions.iceberg_scan import (
            _MANIFEST_LIST_SCHEMA,
            _enc_string,
        )
        from datawarehouseproject_spark.functions.avro_scan import (
            _zigzag_write,
        )

        recs = decode_avro_blocks(files["metadata/snap-2.avro"])
        keep = []
        for r in recs:
            if r["content"] == 1:
                continue
            keep.append(
                _enc_string(r["manifest_path"])
                + _zigzag_write(r["manifest_length"])
                + _zigzag_write(r["partition_spec_id"])
                + _zigzag_write(r["content"])
                + _zigzag_write(r["added_snapshot_id"])
                + _zigzag_write(r["added_data_files_count"])
            )
        files["metadata/snap-2.avro"] = encode_avro_container(
            _MANIFEST_LIST_SCHEMA, keep, bytes(16)
        )
        meta = json.loads(files["metadata/v2.metadata.json"])
        files["metadata/v2.metadata.json"] = json.dumps(meta).encode()

    r_no_del = scan_iceberg(_retar(blob, edit))
    r_with = scan_iceberg(blob)
    assert r_no_del["probe_matches"] > r_with["probe_matches"]
    assert r_no_del["n_delete_files"] == 0


def test_delete_position_past_file_refused():
    import pyarrow as pa
    import pyarrow.parquet as pq

    seed = 1
    k = synth_iceberg_plan(seed)["probe_file"]

    def edit(files):
        buf = io.BytesIO()
        pq.write_table(
            pa.table(
                {
                    "file_path": [f"data/f{k:02d}.parquet"],
                    "pos": [10_000],
                }
            ),
            buf,
        )
        old = files["data/d00.parquet"]
        files["data/d00.parquet"] = buf.getvalue()
        # keep the delete manifest's record_count/length consistent
        from datawarehouseproject_spark.functions.avro_scan import (
            encode_avro_container,
        )
        from datawarehouseproject_spark.functions.iceberg_scan import (
            _MANIFEST_SCHEMA,
            _enc_bounds,
            _enc_string,
        )
        from datawarehouseproject_spark.functions.avro_scan import (
            _zigzag_write,
        )

        entry = (
            _zigzag_write(1)
            + _zigzag_write(1) + _zigzag_write(2)
            + _zigzag_write(1)  # data_file.content = POSITION_DELETES
            + _enc_string("data/d00.parquet")
            + _enc_string("PARQUET")
            + _zigzag_write(1)
            + _zigzag_write(len(files["data/d00.parquet"]))
            + _enc_bounds(0)
            + _enc_bounds(39)
            + _zigzag_write(0)  # equality_ids: empty
        )
        files["metadata/md.avro"] = encode_avro_container(
            _MANIFEST_SCHEMA, [entry], bytes(16)
        )
        # snap-2's manifest_length for md.avro must match: rebuild
        from datawarehouseproject_spark.functions.avro_scan import (
            decode_avro_blocks,
        )
        from datawarehouseproject_spark.functions.iceberg_scan import (
            _MANIFEST_LIST_SCHEMA,
        )

        recs = decode_avro_blocks(files["metadata/snap-2.avro"])
        out = []
        for r in recs:
            ln = (
                len(files["metadata/md.avro"])
                if r["manifest_path"] == "metadata/md.avro"
                else r["manifest_length"]
            )
            out.append(
                _enc_string(r["manifest_path"])
                + _zigzag_write(ln)
                + _zigzag_write(r["partition_spec_id"])
                + _zigzag_write(r["content"])
                + _zigzag_write(r["added_snapshot_id"])
                + _zigzag_write(r["added_data_files_count"])
            )
        files["metadata/snap-2.avro"] = encode_avro_container(
            _MANIFEST_LIST_SCHEMA, out, bytes(16)
        )

    with pytest.raises(ValueError, match="past its data file"):
        scan_iceberg(_retar(synth_iceberg(seed), edit))


# ---------------------------------------------------------------------------
# round 11: equality deletes + partition transforms
# ---------------------------------------------------------------------------


def test_murmur3_spec_vectors():
    """Iceberg table spec Appendix B published bucket-hash vectors —
    the independent pin for the hand murmur3."""
    import struct

    from datawarehouseproject_spark.functions.iceberg_scan import (
        bucket_transform,
        murmur3_x86_32,
        truncate_transform,
    )

    assert murmur3_x86_32(struct.pack("<i", 34).ljust(8, b"\0")) \
        == murmur3_x86_32(struct.pack("<q", 34))
    assert murmur3_x86_32(struct.pack("<q", 34)) == 2017239379
    assert murmur3_x86_32(b"iceberg") == 1210000089
    assert bucket_transform(34, 16) == 2017239379 % 16
    # spec: truncate floors toward -inf
    assert truncate_transform(-1, 10) == -10
    assert truncate_transform(1, 10) == 0
    assert truncate_transform(-10, 10) == -10


def test_positional_scan_loud_rejects_equality_delete_file():
    """r10 verdict item 2 step 1: a content=2 (EQUALITY) delete file
    in the positional scan's input must quarantine loudly — silently
    treating it as positional resurrects deleted rows."""
    import io
    import tarfile

    from datawarehouseproject_spark.functions.avro_scan import (
        _zigzag_write,
        decode_avro_blocks,
        encode_avro_container,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        _MANIFEST_SCHEMA,
        _enc_bounds,
        _enc_string,
    )

    seed = 5
    blob = synth_iceberg(seed)

    def retag(files):
        # rebuild the delete manifest with data_file.content = 2
        recs = decode_avro_blocks(files["metadata/md.avro"])
        (r,) = recs
        df = r["data_file"]
        entry = (
            _zigzag_write(r["status"])
            + _zigzag_write(1) + _zigzag_write(2)
            + _zigzag_write(2)  # content = EQUALITY_DELETES
            + _enc_string(df["file_path"])
            + _enc_string(df["file_format"])
            + _zigzag_write(df["record_count"])
            + _zigzag_write(df["file_size_in_bytes"])
            + _enc_bounds(0)
            + _enc_bounds(39)
            + _zigzag_write(1) + _zigzag_write(1) + _zigzag_write(0)
        )
        files["metadata/md.avro"] = encode_avro_container(
            _MANIFEST_SCHEMA, [entry], bytes(16)
        )
        # fix snap-2's manifest_length for md.avro
        from datawarehouseproject_spark.functions.iceberg_scan import (
            _MANIFEST_LIST_SCHEMA,
        )

        out = []
        for r2 in decode_avro_blocks(files["metadata/snap-2.avro"]):
            ln = (
                len(files["metadata/md.avro"])
                if r2["manifest_path"] == "metadata/md.avro"
                else r2["manifest_length"]
            )
            out.append(
                _enc_string(r2["manifest_path"])
                + _zigzag_write(ln)
                + _zigzag_write(r2["partition_spec_id"])
                + _zigzag_write(r2["content"])
                + _zigzag_write(r2["added_snapshot_id"])
                + _zigzag_write(r2["added_data_files_count"])
            )
        files["metadata/snap-2.avro"] = encode_avro_container(
            _MANIFEST_LIST_SCHEMA, out, bytes(16)
        )

    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:") as tf:
        files = {
            m.name: tf.extractfile(m).read()
            for m in tf.getmembers()
            if m.isfile()
        }
    retag(files)
    out = io.BytesIO()
    with tarfile.open(fileobj=out, mode="w") as tf:
        for name in sorted(files):
            info = tarfile.TarInfo(name)
            info.size = len(files[name])
            tf.addfile(info, io.BytesIO(files[name]))
    with pytest.raises(ValueError, match="equality-delete file unsupported"):
        scan_iceberg(out.getvalue())


def test_v2_scan_all_seeds_match_plan():
    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_v2,
        synth_iceberg_v2,
        synth_iceberg_v2_plan,
    )

    for seed in range(10):
        plan = synth_iceberg_v2_plan(seed)
        r = scan_iceberg_v2(synth_iceberg_v2(seed))
        assert r["transform"] == plan["transform"].split("[")[0]
        assert r["n_data_files"] == 4
        assert r["files_pruned_partition"] == 3
        assert r["files_pruned_bounds"] == 0
        assert r["files_scanned"] == 1
        assert r["rows_scanned"] == plan["rows_scanned"]
        assert r["equality_deleted_rows"] == plan["equality_deleted_rows"]
        assert r["live_rows"] == (
            plan["rows_scanned"] - plan["equality_deleted_rows"]
        )
        assert r["probe_matches"] == 1
        assert r["total_rows"] == plan["total_rows"]


def test_v2_bucket_bounds_interleave():
    """The bucket fixture's file bounds must OVERLAP — otherwise the
    files_pruned_partition=3 assertion could be bounds pruning in
    disguise."""
    from datawarehouseproject_spark.functions.iceberg_scan import (
        _v2_file_values,
    )

    vals = _v2_file_values(0)  # even seed -> bucket[8]
    spans = [(min(v), max(v)) for v in vals]
    overlapping = sum(
        1
        for i in range(len(spans))
        for j in range(i + 1, len(spans))
        if spans[i][0] <= spans[j][1] and spans[j][0] <= spans[i][1]
    )
    assert overlapping == 6  # all pairs overlap


def test_v2_equality_values_actually_removed():
    """A deleted value must not match the probe: rebuild seed 2's
    bundle with the probe pointed at a DELETED value (index 2) and
    expect zero matches."""
    import io
    import json
    import tarfile

    from datawarehouseproject_spark.functions.iceberg_scan import (
        _v2_file_values,
        scan_iceberg_v2,
        synth_iceberg_v2,
        synth_iceberg_v2_plan,
    )

    seed = 2
    plan = synth_iceberg_v2_plan(seed)
    k = plan["probe_file"]
    deleted_probe = _v2_file_values(seed)[k][2]  # index 2 -> deleted
    blob = synth_iceberg_v2(seed)
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:") as tf:
        files = {
            m.name: tf.extractfile(m).read()
            for m in tf.getmembers()
            if m.isfile()
        }
    meta = json.loads(files["metadata/v2.metadata.json"])
    meta["properties"]["fixture.probe"] = str(deleted_probe)
    files["metadata/v2.metadata.json"] = json.dumps(meta).encode()
    out = io.BytesIO()
    with tarfile.open(fileobj=out, mode="w") as tf:
        for name in sorted(files):
            info = tarfile.TarInfo(name)
            info.size = len(files[name])
            tf.addfile(info, io.BytesIO(files[name]))
    r = scan_iceberg_v2(out.getvalue())
    assert r["probe_matches"] == 0
    assert r["equality_deleted_rows"] == plan["equality_deleted_rows"]


def test_v2_unknown_transform_quarantines():
    import io
    import json
    import tarfile

    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_v2,
        synth_iceberg_v2,
    )

    blob = synth_iceberg_v2(1)
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:") as tf:
        files = {
            m.name: tf.extractfile(m).read()
            for m in tf.getmembers()
            if m.isfile()
        }
    meta = json.loads(files["metadata/v2.metadata.json"])
    meta["partition-specs"][0]["fields"][0]["transform"] = "void"
    files["metadata/v2.metadata.json"] = json.dumps(meta).encode()
    out = io.BytesIO()
    with tarfile.open(fileobj=out, mode="w") as tf:
        for name in sorted(files):
            info = tarfile.TarInfo(name)
            info.size = len(files[name])
            tf.addfile(info, io.BytesIO(files[name]))
    with pytest.raises(ValueError, match="transform"):
        scan_iceberg_v2(out.getvalue())


def test_nonobject_metadata_json_quarantines():
    """Review r11 pass 3: metadata JSON that parses but isn't an
    object must quarantine, not AttributeError out of .get()."""
    import io
    import tarfile

    from datawarehouseproject_spark.functions.bundles import (
        write_tar_bundle,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_v2,
        synth_iceberg_v2,
    )

    blob = synth_iceberg_v2(0)
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:") as tf:
        files = {
            m.name: tf.extractfile(m).read()
            for m in tf.getmembers()
            if m.isfile()
        }
    files["metadata/v2.metadata.json"] = b"[1, 2, 3]"
    out = write_tar_bundle(files)
    with pytest.raises(ValueError, match="not a JSON object"):
        scan_iceberg_v2(out)
    with pytest.raises(ValueError, match="not a JSON object"):
        scan_iceberg(out)


def test_unhashable_current_snapshot_id_quarantines():
    """Review r11 pass 3: current-snapshot-id = [7] hashed in the
    `in snaps` test raised TypeError in the v2 copy."""
    import io
    import json
    import tarfile

    from datawarehouseproject_spark.functions.bundles import (
        write_tar_bundle,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_v2,
        synth_iceberg_v2,
    )

    blob = synth_iceberg_v2(1)
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:") as tf:
        files = {
            m.name: tf.extractfile(m).read()
            for m in tf.getmembers()
            if m.isfile()
        }
    meta = json.loads(files["metadata/v2.metadata.json"])
    meta["current-snapshot-id"] = [7]
    files["metadata/v2.metadata.json"] = json.dumps(meta).encode()
    with pytest.raises(ValueError, match="not an integer"):
        scan_iceberg_v2(write_tar_bundle(files))


def test_time_travel_snapshot_isolation():
    """Snapshot 1 must see neither the later files nor the delete
    manifest; the current snapshot must see both."""
    from datawarehouseproject_spark.functions.iceberg_scan import (
        _file_rows,
        scan_iceberg_time_travel,
        synth_iceberg,
        synth_iceberg_plan,
    )

    for seed in range(8):
        plan = synth_iceberg_plan(seed)
        n, k = plan["n_files"], plan["probe_file"]
        half = (n + 1) // 2
        rows_k = _file_rows(seed, k)
        r = scan_iceberg_time_travel(synth_iceberg(seed))
        assert r["files_s1"] == half
        assert r["files_current"] == n
        assert r["delete_files_s1"] == 0
        assert r["delete_files_current"] == 1
        exp_s1 = (rows_k - 18) // 40 + 1 if k < half else 0
        assert r["matches_s1"] == exp_s1
        assert r["matches_current"] == (
            (rows_k - 18) // 40 - (rows_k - 18) // 280
        )


# --- time transforms (hour/day/month/year) ----------------------------


def test_time_transforms_pinned_against_datetime():
    """The spec's ordinal-since-epoch semantics, pinned against
    stdlib datetime as the independent calendar producer — including
    leap years and pre-epoch floor behavior."""
    import datetime as dt

    from datawarehouseproject_spark.functions.iceberg_scan import (
        time_transform,
    )

    cases = [
        dt.datetime(1970, 1, 1, 0, 0, 0),
        dt.datetime(2017, 11, 16, 22, 31, 8),
        dt.datetime(2000, 2, 29, 23, 59, 59),   # leap day
        dt.datetime(2024, 12, 31, 0, 0, 1),
        dt.datetime(1969, 12, 31, 23, 59, 59),  # pre-epoch
        dt.datetime(1901, 7, 4, 12, 0, 0),
    ]
    epoch = dt.datetime(1970, 1, 1)
    for d in cases:
        micros = round((d - epoch).total_seconds()) * 1_000_000
        days_floor = (d.date() - epoch.date()).days
        assert time_transform("day", micros) == days_floor, d
        hours_floor = days_floor * 24 + d.hour
        assert time_transform("hour", micros) == hours_floor, d
        assert time_transform("month", micros) == (
            (d.year - 1970) * 12 + d.month - 1
        ), d
        assert time_transform("year", micros) == d.year - 1970, d
    # floor semantics one microsecond before epoch
    assert time_transform("hour", -1) == -1
    assert time_transform("day", -1) == -1
    assert time_transform("month", -1) == -1
    assert time_transform("year", -1) == -1


def test_time_transform_parse_and_fences():
    from datawarehouseproject_spark.functions.iceberg_scan import (
        parse_transform,
        time_transform,
    )

    assert parse_transform("day") == ("day", 0)
    assert parse_transform("hour") == ("hour", 0)
    assert parse_transform("month") == ("month", 0)
    assert parse_transform("year") == ("year", 0)
    assert parse_transform("identity") == ("identity", 0)
    from datawarehouseproject_spark.functions.iceberg_scan import (
        apply_transform,
    )

    assert apply_transform("identity", 0, -12345) == -12345
    with pytest.raises(ValueError, match="unsupported"):
        parse_transform("day[2]")
    with pytest.raises(ValueError, match="unsupported"):
        parse_transform("void")
    # int64 min is a legal micros value but outside the calendar:
    # must be a ValueError, never an uncaught OverflowError
    with pytest.raises(ValueError, match="calendar range"):
        time_transform("year", -(2**63))
    with pytest.raises(ValueError, match="outside int64"):
        time_transform("day", 2**63)


def test_time_fixture_matches_plan_all_seeds():
    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_v2,
        synth_iceberg_time,
        synth_iceberg_time_plan,
    )

    for seed in range(8):
        plan = synth_iceberg_time_plan(seed)
        out = scan_iceberg_v2(synth_iceberg_time(seed))
        assert out["transform"] == plan["transform"]
        assert out["transform_arg"] == 0
        assert out["files_pruned_partition"] == 3
        assert out["files_pruned_bounds"] == 0
        assert out["files_scanned"] == 1
        assert out["rows_scanned"] == plan["rows_scanned"]
        assert out["equality_deleted_rows"] == plan["equality_deleted_rows"]
        assert out["total_rows"] == plan["total_rows"]
        assert out["probe_matches"] == 1


# --- sequence numbers -------------------------------------------------


def test_sequence_fixture_matches_plan_all_seeds():
    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_v2,
        synth_iceberg_seq,
        synth_iceberg_seq_plan,
    )

    for seed in range(10):
        plan = synth_iceberg_seq_plan(seed)
        out = scan_iceberg_v2(synth_iceberg_seq(seed))
        assert out["files_scanned"] == 2
        assert out["rows_scanned"] == plan["rows_scanned"]
        assert out["equality_deleted_rows"] == plan["equality_deleted_rows"]
        assert out["live_rows"] == plan["live_rows"]
        assert out["total_rows"] == plan["total_rows"]
        # the re-added probe value survives EXACTLY once: killed in
        # the seq-1 file, alive in the seq-3 re-add
        assert out["probe_matches"] == 1


def test_sequence_inheritance_vs_explicit_agree():
    """The seq-1 manifest inherits (null data_sequence_number), the
    seq-3 entries declare explicitly — if inheritance silently
    yielded None the all-or-none fence would trip; if it yielded the
    wrong number the delete scoping would change the counts.  Green
    seeds prove both carriers decode to the same ordering."""
    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_v2,
        synth_iceberg_seq,
    )

    out = scan_iceberg_v2(synth_iceberg_seq(4))
    assert out["probe_matches"] == 1


def test_partially_sequenced_table_rejects():
    """Strip the delete manifest's sequence number (rebuild its
    manifest-list record with the legacy schema shape is heavy;
    instead splice a legacy manifest into a sequenced table): mixing
    sequenced data files with an unsequenced delete must loud-reject
    rather than guess the ordering."""
    import io as _io
    import tarfile

    from datawarehouseproject_spark.functions import iceberg_scan as ice

    blob = ice.synth_iceberg_seq(3)
    with tarfile.open(fileobj=_io.BytesIO(blob), mode="r:") as tf:
        files = {
            m.name: tf.extractfile(m).read()
            for m in tf.getmembers()
            if m.isfile()
        }
    # rebuild the manifest list with the delete manifest's
    # sequence_number null-ed out via the LEGACY list schema (no
    # sequence_number field) for that one record: simplest is to
    # write the whole list legacy -> every mseq None -> data entries
    # that DECLARE seq remain sequenced -> mixed -> reject
    sync = files["metadata/snap-7.avro"][-16:]

    def ml_record_legacy(mpath: str, nfiles: int, content: int) -> bytes:
        return (
            ice._enc_string(mpath)
            + ice._zigzag_write(len(files[mpath]))
            + ice._zigzag_write(0)
            + ice._zigzag_write(content)
            + ice._zigzag_write(7)
            + ice._zigzag_write(nfiles)
        )

    files["metadata/snap-7.avro"] = ice.encode_avro_container(
        ice._MANIFEST_LIST_SCHEMA,
        [
            ml_record_legacy("metadata/m_old.avro", 2, 0),
            ml_record_legacy("metadata/m_del.avro", 1, 1),
            ml_record_legacy("metadata/m_new.avro", 2, 0),
        ],
        sync,
    )
    out = _io.BytesIO()
    with tarfile.open(fileobj=out, mode="w") as tf:
        for name in sorted(files):
            info = tarfile.TarInfo(name)
            info.size = len(files[name])
            tf.addfile(info, _io.BytesIO(files[name]))
    with pytest.raises(ValueError, match="partially declared"):
        ice.scan_iceberg_v2(out.getvalue())


# --- multi-field partition specs --------------------------------------


def test_multi_field_spec_matches_plan_all_seeds():
    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_v2,
        synth_iceberg_multi,
        synth_iceberg_multi_plan,
    )

    for seed in range(8):
        p = synth_iceberg_multi_plan(seed)
        out = scan_iceberg_v2(synth_iceberg_multi(seed))
        assert out["transform"] == "truncate,bucket"
        assert out["transform_arg"] == 2
        assert out["files_pruned_partition"] == 3
        assert out["files_scanned"] == 1
        assert out["rows_scanned"] == p["rows_scanned"]
        assert out["total_rows"] == p["total_rows"]
        assert out["probe_matches"] == 1


def test_multi_field_conjunction_is_required():
    """Neither dimension alone reaches the pruning the conjunction
    does: rewrite the metadata's spec to each SINGLE field and the
    scan must keep two files (the fixture's whole point)."""
    import io as _io
    import json
    import tarfile

    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_v2,
        synth_iceberg_multi,
    )

    blob = synth_iceberg_multi(5)
    with tarfile.open(fileobj=_io.BytesIO(blob), mode="r:") as tf:
        files = {
            m.name: tf.extractfile(m).read()
            for m in tf.getmembers()
            if m.isfile()
        }
    meta = json.loads(files["metadata/v2.metadata.json"])
    for keep in (0, 1):
        m2 = json.loads(json.dumps(meta))
        m2["partition-specs"][0]["fields"] = [
            meta["partition-specs"][0]["fields"][keep]
        ]
        files["metadata/v2.metadata.json"] = json.dumps(m2).encode()
        out = _io.BytesIO()
        with tarfile.open(fileobj=out, mode="w") as tf:
            for name in sorted(files):
                info = tarfile.TarInfo(name)
                info.size = len(files[name])
                tf.addfile(info, _io.BytesIO(files[name]))
        r = scan_iceberg_v2(out.getvalue())
        assert r["files_pruned_partition"] == 2  # one dim -> 2 kept
        if keep == 0:
            # truncate-only: the same-window sibling's bounds overlap
            # the probe, so it gets SCANNED — the over-read the
            # conjunction avoids
            assert r["files_scanned"] == 2
        else:
            # bucket-only: the same-bucket sibling sits in the other
            # window, so bounds still prune it
            assert r["files_scanned"] == 1


def test_multi_field_spec_fences():
    import json

    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_v2,
        synth_iceberg_multi,
    )
    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
        write_tar_bundle,
    )

    files = dict(read_tar_bundle(synth_iceberg_multi(2)))
    meta = json.loads(files["metadata/v2.metadata.json"])
    dup = json.loads(json.dumps(meta))
    dup["partition-specs"][0]["fields"][1]["name"] = "p"  # duplicate
    files["metadata/v2.metadata.json"] = json.dumps(dup).encode()
    with pytest.raises(ValueError, match="not unique"):
        scan_iceberg_v2(write_tar_bundle(files))
    four = json.loads(json.dumps(meta))
    four["partition-specs"][0]["fields"] = (
        meta["partition-specs"][0]["fields"] * 2
    )
    files["metadata/v2.metadata.json"] = json.dumps(four).encode()
    with pytest.raises(ValueError, match="field count"):
        scan_iceberg_v2(write_tar_bundle(files))


# --- Puffin deletion vectors ------------------------------------------


def test_puffin_scan_matches_plan_all_seeds():
    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_puffin,
        synth_iceberg_puffin,
        synth_iceberg_puffin_plan,
    )

    for seed in range(10):
        p = synth_iceberg_puffin_plan(seed)
        out = scan_iceberg_puffin(synth_iceberg_puffin(seed))
        assert out["n_data_files"] == 3 and out["n_dv_blobs"] == 2
        assert out["total_rows"] == p["total_rows"]
        assert out["deleted_rows"] == p["deleted_rows"]
        assert out["live_rows"] == p["live_rows"]
        assert out["surviving_v_sum"] == p["surviving_v_sum"]
        assert out["probe_matches"] == 1


def test_puffin_framing_fences():
    from datawarehouseproject_spark.functions.iceberg_scan import (
        parse_puffin,
        synth_iceberg_puffin,
    )
    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
    )

    files = dict(read_tar_bundle(synth_iceberg_puffin(0)))
    puffin = bytearray(files["deletes/dv.puffin"])
    blobs, props = parse_puffin(bytes(puffin))
    assert len(blobs) == 2 and props == {"created-by": "fixture"}
    # wrong trailing magic
    bad = puffin[:-4] + b"XXXX"
    with pytest.raises(ValueError, match="footer magic"):
        parse_puffin(bytes(bad))
    # compressed-footer flag without an lz4 frame behind it is a
    # quarantine, not a crash (the legit compressed path is pinned
    # in test_puffin_compressed_footer)
    bad = bytearray(puffin)
    bad[-8] |= 1
    with pytest.raises(ValueError, match="lz4"):
        parse_puffin(bytes(bad))
    # unknown flag bits
    bad = bytearray(puffin)
    bad[-7] |= 0x80
    with pytest.raises(ValueError, match="unknown puffin footer flags"):
        parse_puffin(bytes(bad))
    # truncated payload size
    bad = bytearray(puffin)
    bad[-12:-8] = (1 << 25).to_bytes(4, "little")
    with pytest.raises(ValueError, match="size out of bounds"):
        parse_puffin(bytes(bad))


def test_puffin_dv_crc_and_cardinality_fences():
    import json as _json

    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_puffin,
        synth_iceberg_puffin,
    )
    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
        write_tar_bundle,
    )

    # seed 3: blob codec rotation = uncompressed, so the flip lands
    # in the DV framing itself (compressed seeds are fenced by their
    # own frame checksums — pinned separately)
    files = dict(read_tar_bundle(synth_iceberg_puffin(3)))
    puffin = bytearray(files["deletes/dv.puffin"])
    # flip a bitmap byte inside blob 0 (starts at offset 4, after
    # its own 4-byte size prefix)
    puffin[9] ^= 0xFF
    files["deletes/dv.puffin"] = bytes(puffin)
    with pytest.raises(ValueError, match="checksum mismatch"):
        scan_iceberg_puffin(write_tar_bundle(files))
    # cardinality property disagreement
    files = dict(read_tar_bundle(synth_iceberg_puffin(3)))
    puffin = files["deletes/dv.puffin"]
    size = int.from_bytes(puffin[-12:-8], "little")
    start = len(puffin) - 12 - size
    footer = _json.loads(puffin[start : start + size])
    footer["blobs"][0]["properties"]["cardinality"] = "999"
    new_footer = _json.dumps(footer).encode()
    rebuilt = (
        puffin[: start - 4]
        + b"PFA1"
        + new_footer
        + len(new_footer).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + b"PFA1"
    )
    files["deletes/dv.puffin"] = rebuilt
    with pytest.raises(ValueError, match="cardinality disagrees"):
        scan_iceberg_puffin(write_tar_bundle(files))


def test_puffin_dv_manifest_referencing_fences():
    """Rebuild the DELETE manifest: a ghost referenced_data_file and
    a byte range not declared in the puffin footer both
    loud-reject."""
    from datawarehouseproject_spark.functions import iceberg_scan as ice
    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
        write_tar_bundle,
    )

    base = dict(read_tar_bundle(ice.synth_iceberg_puffin(2)))
    plan = ice.synth_iceberg_puffin_plan(2)
    sync = base["metadata/mdv.avro"][-16:]
    puffin = base["deletes/dv.puffin"]

    def dv_entry(ref, off, size, card):
        return (
            ice._zigzag_write(1)
            + ice._zigzag_write(1) + ice._zigzag_write(7)
            + ice._zigzag_write(1)
            + ice._enc_string("deletes/dv.puffin")
            + ice._enc_string("PUFFIN")
            + ice._zigzag_write(card)
            + ice._zigzag_write(len(puffin))
            + ice._enc_string(ref)
            + ice._zigzag_write(off)
            + ice._zigzag_write(size)
        )

    blobs, _ = ice.parse_puffin(puffin)
    (o0, l0), (o1, l1) = (
        (b["offset"], b["length"]) for b in blobs
    )
    # ghost referenced file
    files = dict(base)
    files["metadata/mdv.avro"] = ice.encode_avro_container(
        ice._DV_MANIFEST_SCHEMA,
        [
            dv_entry("data/f00.parquet", o0, l0, len(plan["d0"])),
            dv_entry("data/ghost.parquet", o1, l1, len(plan["d1"])),
        ],
        sync,
    )
    _fix_ml(files, ice, sync)
    with pytest.raises(ValueError, match="missing file"):
        ice.scan_iceberg_puffin(write_tar_bundle(files))
    # byte range not declared in the footer
    files = dict(base)
    files["metadata/mdv.avro"] = ice.encode_avro_container(
        ice._DV_MANIFEST_SCHEMA,
        [
            dv_entry("data/f00.parquet", o0 + 1, l0, len(plan["d0"])),
            dv_entry("data/f01.parquet", o1, l1, len(plan["d1"])),
        ],
        sync,
    )
    _fix_ml(files, ice, sync)
    with pytest.raises(ValueError, match="not declared"):
        ice.scan_iceberg_puffin(write_tar_bundle(files))


def _fix_ml(files, ice, sync):
    """Re-point the manifest list at the rebuilt DV manifest with
    the correct length."""
    files["metadata/snap-7.avro"] = ice.encode_avro_container(
        ice._MANIFEST_LIST_SCHEMA,
        [
            ice._enc_string("metadata/m0.avro")
            + ice._zigzag_write(len(files["metadata/m0.avro"]))
            + ice._zigzag_write(0)
            + ice._zigzag_write(0)
            + ice._zigzag_write(7)
            + ice._zigzag_write(3),
            ice._enc_string("metadata/mdv.avro")
            + ice._zigzag_write(len(files["metadata/mdv.avro"]))
            + ice._zigzag_write(0)
            + ice._zigzag_write(1)
            + ice._zigzag_write(7)
            + ice._zigzag_write(2),
        ],
        sync,
    )


# --- string/date/decimal transforms ------------------------------------


def test_typed_bucket_hashes_pin_spec_appendix_b():
    """EVERY published Appendix B hash vector: int/long, decimal
    (minimal two's-complement big-endian of the unscaled value),
    date (days-as-long), time/timestamp (micros-as-long), string
    (UTF-8), uuid and fixed (raw bytes)."""
    import struct

    from datawarehouseproject_spark.functions.iceberg_scan import (
        _min_twos_complement,
        bucket_transform_date,
        bucket_transform_decimal,
        bucket_transform_str,
        murmur3_x86_32,
    )

    def signed(h):
        return h - 2**32 if h >= 2**31 else h

    assert signed(murmur3_x86_32(struct.pack("<q", 34))) == 2017239379
    assert signed(murmur3_x86_32(b"iceberg")) == 1210000089
    # decimal(9,2) 14.20 -> unscaled 1420 -> bytes 05 8C
    assert _min_twos_complement(1420) == b"\x05\x8c"
    assert signed(murmur3_x86_32(_min_twos_complement(1420))) \
        == -500754589
    # date 2017-11-16 = 17486 days since epoch
    assert signed(murmur3_x86_32(struct.pack("<q", 17486))) \
        == -653330422
    # time 22:31:08 = 81068000000 micros
    assert signed(murmur3_x86_32(struct.pack("<q", 81068000000))) \
        == -662762989
    # timestamp 2017-11-16T22:31:08 = 1510871468000000 micros
    assert signed(
        murmur3_x86_32(struct.pack("<q", 1510871468000000))
    ) == -2047944441
    assert signed(murmur3_x86_32(
        bytes.fromhex("f79c3e09677c4bbda4793f349cb785e7")
    )) == 1488055340
    assert signed(murmur3_x86_32(bytes([0, 1, 2, 3]))) == -188683207
    # the transform compositions over those hashes
    assert bucket_transform_str("iceberg", 16) \
        == (1210000089 & 0x7FFFFFFF) % 16
    assert bucket_transform_decimal(1420, 16) \
        == ((-500754589) & 0x7FFFFFFF) % 16
    assert bucket_transform_date(17486, 16) \
        == ((-653330422) & 0x7FFFFFFF) % 16


def test_min_twos_complement_is_minimal():
    """Java BigInteger.toByteArray() semantics at the byte-length
    boundaries — the exact input the decimal hash mandates."""
    from datawarehouseproject_spark.functions.iceberg_scan import (
        _min_twos_complement,
    )

    assert _min_twos_complement(0) == b"\x00"
    assert _min_twos_complement(127) == b"\x7f"
    assert _min_twos_complement(128) == b"\x00\x80"
    assert _min_twos_complement(-128) == b"\x80"
    assert _min_twos_complement(-129) == b"\xff\x7f"
    assert _min_twos_complement(255) == b"\x00\xff"
    assert _min_twos_complement(-1) == b"\xff"
    for v in (1420, -1420, 2**31, -(2**31), 10**18):
        b = _min_twos_complement(v)
        assert int.from_bytes(b, "big", signed=True) == v


def test_truncate_transforms_strings_and_decimals():
    from datawarehouseproject_spark.functions.iceberg_scan import (
        truncate_transform_decimal,
        truncate_transform_str,
    )

    # spec: substring of W code points, never split a character
    assert truncate_transform_str("iceberg", 3) == "ice"
    assert truncate_transform_str("ab", 5) == "ab"
    assert truncate_transform_str("ééxyz", 2) == "éé"
    # spec Appendix B example: truncate[50] of 10.65 -> 10.50
    assert truncate_transform_decimal(1065, 50) == 1050
    assert truncate_transform_decimal(-1065, 50) == -1100  # floors


def test_string_scan_matches_plan_all_seeds():
    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_str,
        synth_iceberg_str,
        synth_iceberg_str_plan,
    )

    for seed in range(8):
        p = synth_iceberg_str_plan(seed)
        r = scan_iceberg_str(synth_iceberg_str(seed))
        assert r["n_data_files"] == 4
        assert r["files_pruned_partition"] == 3
        assert r["files_scanned"] == 1
        assert r["rows_scanned"] == p["rows_scanned"]
        assert r["total_rows"] == p["total_rows"]
        assert r["probe_matches"] == 1
        assert r["probe_bucket"] == p["bucket"]
        assert r["probe_prefix"] == p["prefix"]


def test_string_conjunction_is_required():
    """Single-field rewrites keep two files — only the two-field
    conjunction reaches files_pruned_partition = 3."""
    import json

    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
        write_tar_bundle,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_str,
        synth_iceberg_str,
    )

    base = dict(read_tar_bundle(synth_iceberg_str(5)))
    meta = json.loads(base["metadata/v2.metadata.json"])
    for keep in (0, 1):
        files = dict(base)
        m2 = json.loads(json.dumps(meta))
        m2["partition-specs"][0]["fields"] = [
            meta["partition-specs"][0]["fields"][keep]
        ]
        files["metadata/v2.metadata.json"] = json.dumps(m2).encode()
        with pytest.raises(ValueError, match="bucket AND truncate"):
            scan_iceberg_str(write_tar_bundle(files))


def test_string_scan_row_transform_audit_fires():
    """Corrupt one manifest partition value: the per-row audit (not
    just pruning) must quarantine when the file IS scanned, and the
    pruning count shifts when it is not."""
    import json

    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
        write_tar_bundle,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_str,
        synth_iceberg_str,
        synth_iceberg_str_plan,
    )

    import io as _io

    import pyarrow as pa
    import pyarrow.parquet as pq

    seed = 3
    files = dict(read_tar_bundle(synth_iceberg_str(seed)))
    plan = synth_iceberg_str_plan(seed)
    meta = json.loads(files["metadata/v2.metadata.json"])
    probe = meta["properties"]["fixture.probe"]
    assert probe.startswith(plan["prefix"])
    # replace the SCANNED file's rows with same-count strings from a
    # foreign prefix: record_count and manifest bounds still agree
    # with the manifest, so only the per-row transform audit can
    # catch the declared-partition/actual-rows drift
    rows = plan["rows"][0]
    buf = _io.BytesIO()
    pq.write_table(
        pa.table({"s": [probe] + [f"zz{k:05d}" for k in range(rows - 1)]}),
        buf,
    )
    files["data/f00.parquet"] = buf.getvalue()
    with pytest.raises(ValueError, match="disagrees with manifest"):
        scan_iceberg_str(write_tar_bundle(files))


def test_string_bounds_prune_after_partition():
    """Rewrite file 0's bounds window to exclude the probe: the file
    survives partition pruning but bounds-prunes, proving the string
    comparison path is real."""
    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
        write_tar_bundle,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_str,
        synth_iceberg_str,
    )

    files = dict(read_tar_bundle(synth_iceberg_str(7)))
    # the probe is file 0's LEXICALLY SMALLEST value (pick() walks k
    # ascending), so raising the lower bound excludes exactly it
    blob = files["metadata/m0.avro"]
    import json as _json

    meta = _json.loads(files["metadata/v2.metadata.json"])
    probe = meta["properties"]["fixture.probe"].encode()
    # bump the last digit of the lower bound occurrence in the
    # manifest avro (bounds are raw UTF-8 in the container)
    idx = blob.index(probe)
    bumped = blob[:idx] + probe[:-1] + bytes([probe[-1] + 1]) \
        + blob[idx + len(probe):]
    files["metadata/m0.avro"] = bumped
    r = scan_iceberg_str(write_tar_bundle(files))
    assert r["files_pruned_partition"] == 3
    assert r["files_pruned_bounds"] == 1
    assert r["files_scanned"] == 0
    assert r["probe_matches"] == 0


def test_puffin_compressed_blob_codecs():
    """The lz4/zstd rotation round-trips through the hand frame
    decoders, a corrupted compressed blob quarantines, and an
    unknown codec loud-rejects."""
    import json as _json

    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
        write_tar_bundle,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_puffin,
        synth_iceberg_puffin,
        synth_iceberg_puffin_plan,
    )

    for seed, codec in ((1, "lz4"), (2, "zstd")):
        plan = synth_iceberg_puffin_plan(seed)
        r = scan_iceberg_puffin(synth_iceberg_puffin(seed))
        assert r["blob_codec"] == codec
        assert r["deleted_rows"] == len(plan["d0"]) + len(plan["d1"])
        # corrupt a byte inside the compressed payload of blob 0
        files = dict(read_tar_bundle(synth_iceberg_puffin(seed)))
        puffin = bytearray(files["deletes/dv.puffin"])
        puffin[12] ^= 0xFF
        files["deletes/dv.puffin"] = bytes(puffin)
        with pytest.raises(ValueError):
            scan_iceberg_puffin(write_tar_bundle(files))
    # unknown codec in the descriptor refuses before serving bytes
    files = dict(read_tar_bundle(synth_iceberg_puffin(1)))
    puffin = files["deletes/dv.puffin"]
    size = int.from_bytes(puffin[-12:-8], "little")
    start = len(puffin) - 12 - size
    footer = _json.loads(puffin[start : start + size])
    for b in footer["blobs"]:
        b["compression-codec"] = "brotli"
    new_footer = _json.dumps(footer).encode()
    files["deletes/dv.puffin"] = (
        puffin[: start - 4]
        + b"PFA1"
        + new_footer
        + len(new_footer).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + b"PFA1"
    )
    with pytest.raises(ValueError, match="codec 'brotli'"):
        scan_iceberg_puffin(write_tar_bundle(files))


def test_decimal_scan_matches_plan_all_seeds():
    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_dec,
        synth_iceberg_dec,
        synth_iceberg_dec_plan,
    )

    for seed in range(8):
        p = synth_iceberg_dec_plan(seed)
        r = scan_iceberg_dec(synth_iceberg_dec(seed))
        assert r["n_data_files"] == 4
        assert r["files_pruned_partition"] == 3
        assert r["files_scanned"] == 1
        assert r["rows_scanned"] == p["rows_scanned"]
        assert r["total_rows"] == p["total_rows"]
        assert r["probe_matches"] == 1
        assert r["probe_bucket"] == p["bucket"]
        assert r["probe_window"] == p["window"]


def test_decimal_scan_scale_fences():
    """A probe off the declared scale, a bad scale, and a data value
    off the scale all quarantine."""
    import json

    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
        write_tar_bundle,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_dec,
        synth_iceberg_dec,
    )

    base = dict(read_tar_bundle(synth_iceberg_dec(2)))

    def mutate(**props):
        files = dict(base)
        meta = json.loads(files["metadata/v2.metadata.json"])
        meta["properties"].update(props)
        files["metadata/v2.metadata.json"] = json.dumps(meta).encode()
        return write_tar_bundle(files)

    with pytest.raises(ValueError, match="more digits than the scale"):
        scan_iceberg_dec(mutate(**{"fixture.probe": "1.234"}))
    with pytest.raises(ValueError, match="scale malformed"):
        scan_iceberg_dec(mutate(**{"fixture.probe.scale": "x"}))
    with pytest.raises(ValueError, match="not parseable"):
        scan_iceberg_dec(mutate(**{"fixture.probe": "pi"}))


def test_decimal_probe_nonfinite_quarantines():
    """Decimal('Infinity')/'NaN'/'sNaN' parse successfully; without
    the finiteness fence the scale math raises OverflowError /
    InvalidOperation past the quarantine (review r12 pass 3)."""
    import json

    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
        write_tar_bundle,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        scan_iceberg_dec,
        synth_iceberg_dec,
    )

    base = dict(read_tar_bundle(synth_iceberg_dec(2)))
    for probe in ("Infinity", "-Inf", "sNaN", "NaN"):
        files = dict(base)
        meta = json.loads(files["metadata/v2.metadata.json"])
        meta["properties"]["fixture.probe"] = probe
        files["metadata/v2.metadata.json"] = json.dumps(meta).encode()
        with pytest.raises(ValueError):
            scan_iceberg_dec(write_tar_bundle(files))


def test_files_metadata_table_rows():
    from datawarehouseproject_spark.functions.iceberg_scan import (
        list_iceberg_files,
        synth_iceberg_seq,
        synth_iceberg_seq_plan,
    )

    for seed in range(6):
        p = synth_iceberg_seq_plan(seed)
        rows = list_iceberg_files(synth_iceberg_seq(seed))
        assert len(rows) == 5
        by = {r["file_path"]: r for r in rows}
        # inheritance: f0/f1 carry NO explicit seq and resolve to 1
        assert by["data/f0.parquet"]["sequence_number"] == 1
        assert by["data/f1.parquet"]["sequence_number"] == 1
        # declared: the delete at 2, the re-add at 3
        assert by["data/eq.parquet"]["sequence_number"] == 2
        assert by["data/eq.parquet"]["content"] == 2
        assert by["data/f2.parquet"]["sequence_number"] == 3
        assert by["data/f0.parquet"]["record_count"] == p["rows0"]
        lo = p["lo"]
        assert by["data/f0.parquet"]["lower_bound"] == lo
        assert by["data/f2.parquet"]["upper_bound"] == (
            lo + 3 * ((p["rows0"] - 1) // 3)
        )


def test_files_metadata_never_opens_data_parquet():
    """The metadata table must be manifest-only: corrupt EVERY data
    parquet in the bundle and the listing is unchanged."""
    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
        write_tar_bundle,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        list_iceberg_files,
        synth_iceberg_seq,
    )

    blob = synth_iceberg_seq(4)
    base = list_iceberg_files(blob)
    files = dict(read_tar_bundle(blob))
    for name in files:
        if name.startswith("data/"):
            files[name] = b"not parquet at all"
    assert list_iceberg_files(write_tar_bundle(files)) == base


def test_puffin_compressed_footer():
    """Spec flag bit 0: the FooterPayload is one lz4 frame and
    PayloadSize is the COMPRESSED size — rebuild a fixture's footer
    compressed and the whole scan must read identically."""
    import pyarrow as pa

    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
        write_tar_bundle,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        parse_puffin,
        scan_iceberg_puffin,
        synth_iceberg_puffin,
    )

    blob = synth_iceberg_puffin(0)
    base = scan_iceberg_puffin(blob)
    files = dict(read_tar_bundle(blob))
    puffin = files["deletes/dv.puffin"]
    size = int.from_bytes(puffin[-12:-8], "little")
    start = len(puffin) - 12 - size
    comp = bytes(pa.Codec("lz4").compress(puffin[start : start + size]))
    rebuilt = (
        puffin[: start - 4]
        + b"PFA1"
        + comp
        + len(comp).to_bytes(4, "little")
        + (1).to_bytes(4, "little")  # flag bit 0 = compressed
        + b"PFA1"
    )
    blobs, props = parse_puffin(rebuilt)
    assert len(blobs) == 2 and props == {"created-by": "fixture"}
    files["deletes/dv.puffin"] = rebuilt
    assert scan_iceberg_puffin(write_tar_bundle(files)) == base


def test_files_metadata_partition_field_from_spec():
    """ADVICE r12: the partition record key comes from the DEFAULT
    partition spec, not a hardcoded 'p' — a metadata rename that the
    manifest schema does not follow is a loud mismatch, and a
    multi-field spec is a declared boundary (flat rows can't carry a
    partition struct)."""
    import json as _json

    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
        write_tar_bundle,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        list_iceberg_files,
        synth_iceberg_seq,
    )

    files = dict(read_tar_bundle(synth_iceberg_seq(2)))
    meta = _json.loads(files["metadata/v2.metadata.json"])
    meta["partition-specs"][0]["fields"][0]["name"] = "pt"
    f2 = dict(files)
    f2["metadata/v2.metadata.json"] = _json.dumps(meta).encode()
    with pytest.raises(ValueError, match="partition value malformed"):
        list_iceberg_files(write_tar_bundle(f2))

    meta = _json.loads(files["metadata/v2.metadata.json"])
    meta["partition-specs"][0]["fields"].append(
        {"name": "q", "transform": "bucket[4]", "source-id": 1,
         "field-id": 1001}
    )
    f3 = dict(files)
    f3["metadata/v2.metadata.json"] = _json.dumps(meta).encode()
    with pytest.raises(ValueError, match="single-field specs only"):
        list_iceberg_files(write_tar_bundle(f3))


def test_files_metadata_missing_sequence_rejects():
    """ADVICE r12: an entry with null data_sequence_number under a
    manifest that ALSO lacks a sequence number is a malformed v2
    manifest — loud reject, not sequence_number=null output."""
    import json as _json

    from datawarehouseproject_spark.functions.avro_scan import (
        decode_avro_blocks,
    )
    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
        write_tar_bundle,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        _enc_string,
        _zigzag_write,
        encode_avro_container,
        list_iceberg_files,
        synth_iceberg_seq,
    )

    files = dict(read_tar_bundle(synth_iceberg_seq(3)))
    schema = _json.dumps({
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
            {"name": "content", "type": "int"},
            {"name": "sequence_number", "type": ["null", "long"]},
            {"name": "added_snapshot_id", "type": "long"},
            {"name": "added_data_files_count", "type": "int"},
        ],
    }).encode()
    recs = []
    for mf in decode_avro_blocks(files["metadata/snap-7.avro"]):
        seq = mf["sequence_number"]
        # m_old (seq 1) holds the inheriting entries: null its seq
        seq_b = (
            _zigzag_write(0) if seq == 1
            else _zigzag_write(1) + _zigzag_write(seq)
        )
        recs.append(
            _enc_string(mf["manifest_path"])
            + _zigzag_write(mf["manifest_length"])
            + _zigzag_write(mf["partition_spec_id"])
            + _zigzag_write(mf["content"])
            + seq_b
            + _zigzag_write(mf["added_snapshot_id"])
            + _zigzag_write(mf["added_data_files_count"])
        )
    sync = bytes(range(16))
    files["metadata/snap-7.avro"] = encode_avro_container(
        schema, recs, sync
    )
    with pytest.raises(ValueError, match="no sequence number"):
        list_iceberg_files(write_tar_bundle(files))


# ---------------------------------------------------------------------------
# inspection tables: snapshots / history / manifests / partitions
# ---------------------------------------------------------------------------

def _inspect_bundle(seed):
    from datawarehouseproject_spark.functions.iceberg_scan import (
        synth_iceberg_inspect,
    )

    return synth_iceberg_inspect(seed)


def test_inspect_fixture_has_no_data_parquet():
    """The inspection fixture deliberately ships NO data file: all
    four tables must serve from metadata bytes alone."""
    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
    )

    names = set(read_tar_bundle(_inspect_bundle(5)))
    assert not any(n.startswith("data/") for n in names)


def test_history_rollback_ancestry():
    from datawarehouseproject_spark.functions.iceberg_scan import (
        iceberg_history_table,
    )

    linear = iceberg_history_table(_inspect_bundle(4))
    assert [e["is_current_ancestor"] for e in linear] == [True] * 3
    rolled = iceberg_history_table(_inspect_bundle(5))
    assert len(rolled) == 4
    assert [e["snapshot_id"] for e in rolled] == [11, 22, 33, 22]
    assert [e["is_current_ancestor"] for e in rolled] == [
        True, True, False, True,
    ]


def test_manifests_count_drift_rejects():
    """The manifest-list's declared added/existing/deleted counts are
    cross-checked against actual entry statuses."""
    import json as _json

    from datawarehouseproject_spark.functions.avro_scan import (
        decode_avro_blocks,
    )
    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
        write_tar_bundle,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        iceberg_manifests_table,
    )

    files = dict(read_tar_bundle(_inspect_bundle(2)))
    # drop m3's only entry by pointing its path at m1r's twin length?
    # simpler: swap m3's blob for m1r's (2 entries, different counts)
    m1r = files["metadata/m1r.avro"]
    files["metadata/m3.avro"] = m1r
    with pytest.raises(ValueError, match="disagrees|counts"):
        iceberg_manifests_table(write_tar_bundle(files))


def test_partitions_excludes_tombstones_and_rollback():
    from datawarehouseproject_spark.functions.iceberg_scan import (
        iceberg_partitions_table,
        synth_iceberg_inspect_plan,
    )

    for seed in (6, 7):
        p = synth_iceberg_inspect_plan(seed)
        r = p["rows"]
        rows = {
            e["partition_p"]: e
            for e in iceberg_partitions_table(_inspect_bundle(seed))
        }
        assert rows[0]["record_count"] == r[0] + r[2]
        assert rows[0]["file_count"] == 2
        # rollback flips partition 100 from the overwrite's f4 back
        # to the deleted f1; tombstone rows never count
        expect_100 = r[1] if p["rollback"] else r[4]
        assert rows[100]["record_count"] == expect_100
        assert rows[100]["file_count"] == 1
        assert rows[200]["record_count"] == r[3]


def test_snapshots_parent_fences():
    import json as _json

    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
        write_tar_bundle,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        iceberg_snapshots_table,
    )

    files = dict(read_tar_bundle(_inspect_bundle(0)))
    meta = _json.loads(files["metadata/v2.metadata.json"])
    meta["snapshots"][2]["parent-snapshot-id"] = 99  # unknown parent
    f2 = dict(files)
    f2["metadata/v2.metadata.json"] = _json.dumps(meta).encode()
    with pytest.raises(ValueError, match="parent-snapshot-id"):
        iceberg_snapshots_table(write_tar_bundle(f2))

    meta = _json.loads(files["metadata/v2.metadata.json"])
    meta["snapshots"][2]["timestamp-ms"] = (
        meta["snapshots"][0]["timestamp-ms"] - 1
    )  # child committed before parent
    f3 = dict(files)
    f3["metadata/v2.metadata.json"] = _json.dumps(meta).encode()
    with pytest.raises(ValueError, match="before its parent"):
        iceberg_snapshots_table(write_tar_bundle(f3))

    meta = _json.loads(files["metadata/v2.metadata.json"])
    meta["snapshots"][1]["summary"]["operation"] = "compact"
    f4 = dict(files)
    f4["metadata/v2.metadata.json"] = _json.dumps(meta).encode()
    with pytest.raises(ValueError, match="operation"):
        iceberg_snapshots_table(write_tar_bundle(f4))


def test_history_log_fences():
    import json as _json

    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
        write_tar_bundle,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        iceberg_history_table,
    )

    files = dict(read_tar_bundle(_inspect_bundle(0)))
    meta = _json.loads(files["metadata/v2.metadata.json"])
    meta["snapshot-log"] = meta["snapshot-log"][:2]  # ends at 22 != 33
    f2 = dict(files)
    f2["metadata/v2.metadata.json"] = _json.dumps(meta).encode()
    with pytest.raises(ValueError, match="does not end at current"):
        iceberg_history_table(write_tar_bundle(f2))

    meta = _json.loads(files["metadata/v2.metadata.json"])
    meta["snapshot-log"][1]["timestamp-ms"] = 0  # decreasing
    f3 = dict(files)
    f3["metadata/v2.metadata.json"] = _json.dumps(meta).encode()
    with pytest.raises(ValueError, match="decrease"):
        iceberg_history_table(write_tar_bundle(f3))


def test_refs_table_fences():
    import json as _json

    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
        write_tar_bundle,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        iceberg_refs_table,
    )

    files = dict(read_tar_bundle(_inspect_bundle(0)))

    def mutate(fn, pattern):
        meta = _json.loads(files["metadata/v2.metadata.json"])
        fn(meta)
        f2 = dict(files)
        f2["metadata/v2.metadata.json"] = _json.dumps(meta).encode()
        with pytest.raises(ValueError, match=pattern):
            iceberg_refs_table(write_tar_bundle(f2))

    # main must track the current snapshot
    mutate(lambda m: m["refs"]["main"].update({"snapshot-id": 11}),
           "main branch")
    # main must exist
    mutate(lambda m: m["refs"].pop("main"), "main branch")
    # a tag cannot carry branch-only retention knobs
    mutate(lambda m: m["refs"]["v1"].update(
        {"min-snapshots-to-keep": 2}), "branch-only")
    # dangling ref
    mutate(lambda m: m["refs"]["v1"].update({"snapshot-id": 99}),
           "unknown snapshot")
    # unknown type
    mutate(lambda m: m["refs"]["v1"].update({"type": "bookmark"}),
           "ref type")


def test_all_manifests_covers_history_and_reuse():
    from datawarehouseproject_spark.functions.iceberg_scan import (
        iceberg_all_manifests_table,
    )

    for seed in (4, 5):  # rollback-invariant across parities
        rows = iceberg_all_manifests_table(_inspect_bundle(seed))
        pairs = [(r["reference_snapshot_id"], r["manifest_path"])
                 for r in rows]
        assert pairs == [
            (11, "metadata/m1.avro"),
            (22, "metadata/m1.avro"),
            (22, "metadata/m2.avro"),
            (33, "metadata/m1r.avro"),
            (33, "metadata/m2.avro"),
            (33, "metadata/m3.avro"),
        ]


def test_expire_shared_manifest_never_orphaned():
    """m_base is reachable from every snapshot: no removable
    snapshot may count it as orphaned (the delete-live-data trap)."""
    from datawarehouseproject_spark.functions.bundles import (
        read_tar_bundle,
    )
    from datawarehouseproject_spark.functions.iceberg_scan import (
        decode_avro_blocks,
        iceberg_expire_snapshots_plan,
        synth_iceberg_expire,
    )

    blob = synth_iceberg_expire(3)  # seed 3: 10/20/30/40 removable
    rows = {r["snapshot_id"]: r
            for r in iceberg_expire_snapshots_plan(blob)}
    assert [rows[sid]["removable"] for sid in (10, 20, 30, 40, 50)] \
        == [True, True, True, True, False]
    # every removable snapshot orphans exactly its OWN manifest,
    # never the shared m_base
    assert all(rows[sid]["orphaned_manifests"] == 1
               for sid in (10, 20, 30, 40))
    files = read_tar_bundle(blob)
    for k, sid in ((1, 10), (2, 20)):
        mls = list(decode_avro_blocks(files[f"metadata/ml{k}.avro"]))
        assert {m["manifest_path"] for m in mls} == {
            "metadata/m_base.avro", f"metadata/m{k}.avro",
        }


def test_expire_keep_last_floor():
    from datawarehouseproject_spark.functions.iceberg_scan import (
        iceberg_expire_snapshots_plan,
        synth_iceberg_expire,
    )

    blob = synth_iceberg_expire(3)
    rows = {r["snapshot_id"]: r
            for r in iceberg_expire_snapshots_plan(blob, keep_last=4)}
    # the floor keeps the 4 newest regardless of refs
    assert [rows[sid]["removable"] for sid in (10, 20, 30, 40, 50)] \
        == [True, False, False, False, False]
    assert rows[20]["kept_reason"] == "recent"
    with pytest.raises(ValueError, match="keep_last"):
        iceberg_expire_snapshots_plan(blob, keep_last=0)
