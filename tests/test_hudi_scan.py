"""Hudi COPY_ON_WRITE layout semantics — functions/hudi_scan.py.
Timeline state machine, file-slice resolution, write-stats
cross-checks, loud boundaries."""

from __future__ import annotations

import json

import pytest

from datawarehouseproject_spark.functions.bundles import (
    read_tar_bundle,
    write_tar_bundle,
)
from datawarehouseproject_spark.functions.hudi_scan import (
    scan_hudi,
    synth_hudi,
    synth_hudi_plan,
)


def _mutate(seed: int, fn):
    files = read_tar_bundle(synth_hudi(seed))
    fn(files)
    return write_tar_bundle(files)


def test_plan_agreement_many_seeds():
    for seed in range(24):
        plan = synth_hudi_plan(seed)
        got = scan_hudi(synth_hudi(seed))
        assert got["total_rows"] == plan["total_rows"]
        assert got["v_sum"] == plan["v_sum"]
        assert got["file_groups"] == plan["ng"]
        assert got["replaced_slices"] == plan["replaced_slices"]
        assert got["rows_asof_first"] == plan["rows_asof_first"]
        assert got["rows_written_by_last"] \
            == plan["rows_written_by_last"]
        assert got["skipped_inflight_files"] == 1


def test_inflight_files_are_invisible():
    """Promote the inflight instant to completed (fake a .commit)
    and the orphan junk values ENTER the snapshot — proving the
    unpromoted reader genuinely excluded them, not that they were
    unreadable."""
    seed = 5
    base = scan_hudi(synth_hudi(seed))

    def promote(files):
        files[".hoodie/20240101001000000.commit"] = json.dumps({
            "operationType": "UPSERT",
            "partitionToWriteStats": {"p=0": [{
                "fileId": f"fg-000-{seed % 7:02d}",
                "path": (
                    f"p=0/fg-000-{seed % 7:02d}_0-0-0_"
                    "20240101001000000.parquet"
                ),
                "prevCommit": "20240101000000000",
                "numWrites": 7,
                "fileSizeInBytes": len(files[
                    f"p=0/fg-000-{seed % 7:02d}_0-0-0_"
                    "20240101001000000.parquet"
                ]),
            }]},
        }).encode()

    got = scan_hudi(_mutate(seed, promote))
    assert got["n_completed"] == 3
    assert got["skipped_inflight_files"] == 0
    # group 0's slice advances to the junk file: 7 rows of >= 10^6
    assert got["v_sum"] > base["v_sum"]
    plan = synth_hudi_plan(seed)
    g0_live = plan["live"][0]
    assert got["total_rows"] == plan["total_rows"] - g0_live + 7


def test_orphan_instant_is_loud():
    def drop_timeline(files):
        del files[".hoodie/20240101001000000.commit.requested"]
        del files[".hoodie/20240101001000000.commit.inflight"]

    with pytest.raises(ValueError, match="orphan"):
        scan_hudi(_mutate(3, drop_timeline))


def test_stats_row_count_mismatch_is_loud():
    def lie(files):
        t = "20240101000000000"
        meta = json.loads(files[f".hoodie/{t}.commit"])
        meta["partitionToWriteStats"]["p=0"][0]["numWrites"] += 1
        files[f".hoodie/{t}.commit"] = json.dumps(meta).encode()

    with pytest.raises(ValueError, match="numWrites"):
        scan_hudi(_mutate(3, lie))


def test_undeclared_completed_file_is_loud():
    """A base file stamped with a completed instant but absent from
    that commit's write stats is corruption, not data."""
    def smuggle(files):
        src = next(n for n in files if n.endswith(".parquet"))
        part, _, base = src.rpartition("/")
        fid = "fg-999-00"
        files[f"{part}/{fid}_0-0-0_20240101000000000.parquet"] = \
            files[src]

    with pytest.raises(ValueError, match="write stats"):
        scan_hudi(_mutate(3, smuggle))


def test_merge_on_read_is_a_loud_boundary():
    def flip(files):
        files[".hoodie/hoodie.properties"] = files[
            ".hoodie/hoodie.properties"
        ].replace(b"COPY_ON_WRITE", b"MERGE_ON_READ")

    with pytest.raises(ValueError, match="MERGE_ON_READ"):
        scan_hudi(_mutate(3, flip))


def test_malformed_base_name_is_loud():
    def rename(files):
        src = next(n for n in files if n.endswith(".parquet"))
        files["p=0/not-a-hudi-name.parquet"] = files.pop(src)

    with pytest.raises(ValueError, match="malformed"):
        scan_hudi(_mutate(3, rename))


def test_no_completed_instants_is_loud():
    def gut(files):
        for n in list(files):
            if n.endswith(".commit"):
                del files[n]

    with pytest.raises(ValueError, match="no completed"):
        scan_hudi(_mutate(3, gut))
