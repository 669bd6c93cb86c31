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
    files["_delta_log/00000000000000000001.checkpoint.parquet"] = (
        buf.getvalue()
    )
    files["_delta_log/_last_checkpoint"] = json.dumps(
        {"version": 1, "size": len(actions)}
    ).encode()


def _checkpoint_actions(files):
    """Decode the fixture checkpoint back to action dicts."""
    import io as _io

    import pyarrow.parquet as pq

    cp = pq.read_table(_io.BytesIO(
        files["_delta_log/00000000000000000001.checkpoint.parquet"]
    ))
    out = []
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
