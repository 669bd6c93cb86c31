"""Apache Hudi COPY_ON_WRITE table reader: timeline + file-slice
resolution, by hand.

Format scope (Hudi's published table layout — the "Technical
Specification" and storage-layout docs on hudi.apache.org; no Hudi
code consulted or available here):

- ``.hoodie/hoodie.properties`` — java-properties table config;
  ``hoodie.table.type`` must be COPY_ON_WRITE (MERGE_ON_READ adds
  avro log files this reader loud-rejects rather than mis-serving).
- The TIMELINE: instants named ``<instantTime>.<action>[.state]``
  under ``.hoodie/`` — an action transitions
  ``requested -> inflight -> completed``, the completed state being
  the bare ``<instantTime>.commit`` file.  Only COMPLETED instants
  publish data: base files written by an instant that never
  completed (``.inflight``/``.requested`` only) are INVISIBLE — the
  core crash-consistency rule of the layout, and the one a naive
  "latest file wins" directory reader gets wrong.
- BASE FILES named ``<fileId>_<writeToken>_<instantTime>.parquet``
  inside (Hive-style) partition directories.  All base files with
  one ``fileId`` in one partition form a FILE GROUP; each write to
  the group lays a new FILE SLICE (a new base file stamped with its
  commit's instant).  A snapshot read picks, per group, the newest
  slice whose instant is completed and <= the target instant;
  superseded slices stay on disk for time travel until cleaning.
- Completed-commit metadata (``<t>.commit``, JSON) carries
  ``partitionToWriteStats``: per partition, one record per written
  file with ``fileId`` / ``path`` / ``numWrites`` /
  ``fileSizeInBytes`` / ``prevCommit``.  The reader cross-checks
  every declared stat against the actual file (size, parquet row
  count, name fields) — a disagreement is corruption, not noise.

Validation contract: ValueError-only (quarantine-compatible), with
the same synth/scan twin structure as the Delta/Iceberg forensics
modules — ``synth_hudi_plan`` is the deterministic formula the
DuckDB oracle mirrors.
"""

from __future__ import annotations

import io
import json
import re

from .bundles import (
    read_parquet_blob,
    read_tar_bundle,
    write_tar_bundle,
)

_HOODIE = ".hoodie"
_T1 = "20240101000000000"
_T2 = "20240101000500000"
_T3 = "20240101001000000"  # never completes (inflight)
_BASE_RE = re.compile(
    r"^([A-Za-z0-9\-]+)_(\d+-\d+-\d+)_(\d{17})\.parquet$"
)
_MAX_INSTANTS = 10_000
_MAX_FILES = 100_000


# ---------------------------------------------------------------------------
# synth
# ---------------------------------------------------------------------------

def synth_hudi_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracle: ``ng = 3 + seed%3`` file
    groups, group i in partition ``p=i%2`` with first-commit rows
    ``rows1_i = 20 + (seed+i)%30`` of ``v = lo_i + r``
    (``lo_i = 1000*i + seed%50``).  Commit t2 UPSERTS the groups
    with ``i%3 == seed%3`` to ``rows1_i + 5`` rows (a new file
    slice; the old slice stays on disk).  An INFLIGHT instant t3
    leaves an orphan base file for group 0 that a correct reader
    never serves."""
    ng = 3 + seed % 3
    rows1 = [20 + (seed + i) % 30 for i in range(ng)]
    lo = [1000 * i + seed % 50 for i in range(ng)]
    updated = [i % 3 == seed % 3 for i in range(ng)]
    live = [rows1[i] + (5 if updated[i] else 0) for i in range(ng)]
    v_sum = sum(
        lo[i] * live[i] + live[i] * (live[i] - 1) // 2
        for i in range(ng)
    )
    return {
        "ng": ng,
        "rows1": rows1,
        "lo": lo,
        "updated": updated,
        "live": live,
        "total_rows": sum(live),
        "v_sum": v_sum,
        "rows_asof_first": sum(rows1),
        "rows_written_by_last": sum(
            live[i] for i in range(ng) if updated[i]
        ),
        "replaced_slices": sum(updated),
    }


def _parquet_file(values: list[int]) -> bytes:
    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(pa.table({"v": values}), buf)
    return buf.getvalue()


def synth_hudi(seed: int) -> bytes:
    """A COPY_ON_WRITE Hudi table bundle per the module-docstring
    layout: 2 Hive partitions, ``ng`` file groups, two completed
    commits (t2 upserting a subset of groups), one inflight instant
    with an orphan base file, and full write-stats metadata."""
    plan = synth_hudi_plan(seed)
    ng = plan["ng"]
    files: dict[str, bytes] = {}
    files[f"{_HOODIE}/hoodie.properties"] = (
        f"hoodie.table.name=synth_{seed}\n"
        "hoodie.table.type=COPY_ON_WRITE\n"
        "hoodie.table.version=6\n"
        "hoodie.datasource.write.hive_style_partitioning=true\n"
        "hoodie.table.partition.fields=p\n"
    ).encode()

    def fid(i: int) -> str:
        return f"fg-{i:03d}-{seed % 7:02d}"

    def base_name(i: int, t: str) -> str:
        return f"{fid(i)}_0-0-0_{t}.parquet"

    stats1: dict[str, list] = {}
    for i in range(ng):
        part = f"p={i % 2}"
        vals = [plan["lo"][i] + r for r in range(plan["rows1"][i])]
        rel = f"{part}/{base_name(i, _T1)}"
        files[rel] = _parquet_file(vals)
        stats1.setdefault(part, []).append({
            "fileId": fid(i),
            "path": rel,
            "prevCommit": "null",
            "numWrites": plan["rows1"][i],
            "fileSizeInBytes": len(files[rel]),
        })
    stats2: dict[str, list] = {}
    for i in range(ng):
        if not plan["updated"][i]:
            continue
        part = f"p={i % 2}"
        vals = [plan["lo"][i] + r for r in range(plan["live"][i])]
        rel = f"{part}/{base_name(i, _T2)}"
        files[rel] = _parquet_file(vals)
        stats2.setdefault(part, []).append({
            "fileId": fid(i),
            "path": rel,
            "prevCommit": _T1,
            "numWrites": plan["live"][i],
            "fileSizeInBytes": len(files[rel]),
        })
    # inflight t3: orphan base file (junk values) that must stay
    # invisible — the instant never reached completed
    orphan = f"p=0/{base_name(0, _T3)}"
    files[orphan] = _parquet_file(
        [10**6 + r for r in range(7)]
    )
    for t, stats in ((_T1, stats1), (_T2, stats2)):
        files[f"{_HOODIE}/{t}.commit.requested"] = b""
        files[f"{_HOODIE}/{t}.commit.inflight"] = b""
        files[f"{_HOODIE}/{t}.commit"] = json.dumps({
            "operationType": "BULK_INSERT" if t == _T1 else "UPSERT",
            "partitionToWriteStats": stats,
        }).encode()
    files[f"{_HOODIE}/{_T3}.commit.requested"] = b""
    files[f"{_HOODIE}/{_T3}.commit.inflight"] = b""
    return write_tar_bundle(files)


# ---------------------------------------------------------------------------
# scan
# ---------------------------------------------------------------------------

def _parse_properties(blob: bytes) -> dict[str, str]:
    props: dict[str, str] = {}
    try:
        text = blob.decode("utf-8")
    except UnicodeDecodeError as e:
        raise ValueError(f"hoodie.properties not utf-8: {e}") from None
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if "=" not in line:
            raise ValueError("hoodie.properties line without '='")
        k, _, v = line.partition("=")
        props[k.strip()] = v.strip()
    return props


def _timeline(files: dict[str, bytes]) -> tuple[list[str], list[str]]:
    """(completed instant times sorted, inflight-only instant times
    sorted).  An instant is completed when its bare ``.commit``
    exists; requested/inflight markers alone mean the write never
    published."""
    completed: set[str] = set()
    seen: set[str] = set()
    for name in files:
        if not name.startswith(_HOODIE + "/"):
            continue
        base = name[len(_HOODIE) + 1:]
        if "/" in base or base == "hoodie.properties":
            continue
        m = re.match(r"^(\d{17})\.commit(\.(requested|inflight))?$",
                     base)
        if m is None:
            raise ValueError(f"unknown timeline file {base!r}")
        seen.add(m.group(1))
        if m.group(2) is None:
            completed.add(m.group(1))
    if len(seen) > _MAX_INSTANTS:
        raise ValueError("timeline past instant cap")
    if not completed:
        raise ValueError("no completed instants (boundary)")
    return sorted(completed), sorted(seen - completed)


def _base_files(files: dict[str, bytes]) -> list[tuple]:
    """[(partition, fileId, writeToken, instant, rel path)] for
    every base file outside ``.hoodie``."""
    out = []
    for name in files:
        if name.startswith(_HOODIE + "/"):
            continue
        if not name.endswith(".parquet"):
            raise ValueError(f"non-parquet data file {name!r}")
        part, _, base = name.rpartition("/")
        m = _BASE_RE.match(base)
        if m is None:
            raise ValueError(f"base file name {base!r} malformed")
        out.append((part, m.group(1), m.group(2), m.group(3), name))
    if len(out) > _MAX_FILES:
        raise ValueError("base file count past cap")
    return out


def _read_rows(files: dict[str, bytes], rel: str) -> list[int]:
    import pyarrow.parquet as pq

    blob = files.get(rel)
    if blob is None:
        raise ValueError(f"base file {rel!r} missing from bundle")
    try:
        table = read_parquet_blob(blob)
    except Exception as e:
        raise ValueError(f"base file unreadable: {e}") from None
    if "v" not in table.column_names:
        raise ValueError("base file missing the value column")
    vals = table.column("v").to_pylist()
    if not all(isinstance(v, int) for v in vals):
        raise ValueError("base file value not an integer")
    return vals


def _slices_asof(
    bases: list[tuple], completed: list[str], target: str
) -> dict[tuple[str, str], tuple[str, str]]:
    """Per (partition, fileId): (instant, rel) of the newest
    completed slice <= target."""
    pick: dict[tuple[str, str], tuple[str, str]] = {}
    cset = set(completed)
    for part, fid, _tok, t, rel in bases:
        if t not in cset or t > target:
            continue
        key = (part, fid)
        if key not in pick or t > pick[key][0]:
            pick[key] = (t, rel)
    return pick


def scan_hudi(payload: bytes) -> dict:
    """Snapshot + time-travel + incremental readout over one synth
    COW bundle, every commit-stats claim cross-checked (module
    docstring)."""
    files = read_tar_bundle(payload)
    # per-call memo: the stats cross-check, snapshot aggregate,
    # as-of-first and written-by-last passes all read the same
    # immutable base files; one decode serves all four
    _rows_memo: dict[str, list[int]] = {}

    def read_rows(rel: str) -> list[int]:
        if rel not in _rows_memo:
            _rows_memo[rel] = _read_rows(files, rel)
        return _rows_memo[rel]

    props_blob = files.get(f"{_HOODIE}/hoodie.properties")
    if props_blob is None:
        raise ValueError("hoodie.properties missing")
    props = _parse_properties(props_blob)
    ttype = props.get("hoodie.table.type")
    if ttype != "COPY_ON_WRITE":
        raise ValueError(
            f"hoodie table type {ttype!r} unsupported (boundary: "
            "MERGE_ON_READ log files need the avro log-block format)"
        )
    completed, inflight = _timeline(files)
    bases = _base_files(files)
    cset = set(completed)
    iset = set(inflight)
    skipped_inflight = 0
    for _part, _fid, _tok, t, rel in bases:
        if t in cset:
            continue
        if t in iset:
            skipped_inflight += 1
        else:
            raise ValueError(
                f"base file {rel!r} from an instant absent from the "
                "timeline (orphan)"
            )
    # cross-check every completed commit's write stats
    declared: set[str] = set()
    for t in completed:
        try:
            meta = json.loads(files[f"{_HOODIE}/{t}.commit"])
        except json.JSONDecodeError as e:
            raise ValueError(f"commit {t} not JSON: {e}") from None
        pws = meta.get("partitionToWriteStats")
        if not isinstance(pws, dict):
            raise ValueError("partitionToWriteStats malformed")
        for part, stats in pws.items():
            if not isinstance(stats, list):
                raise ValueError("write stats list malformed")
            for st in stats:
                rel = st.get("path")
                blob = files.get(rel) if isinstance(rel, str) else None
                if blob is None:
                    raise ValueError(
                        f"commit {t} stats path {rel!r} missing"
                    )
                if st.get("fileSizeInBytes") != len(blob):
                    raise ValueError(
                        "fileSizeInBytes disagrees with file"
                    )
                base = rel.rpartition("/")[2]
                m = _BASE_RE.match(base)
                if m is None or m.group(1) != st.get("fileId") \
                        or m.group(3) != t:
                    raise ValueError(
                        "write stats disagree with base file name"
                    )
                if not rel.startswith(part + "/"):
                    raise ValueError(
                        "write stats partition disagrees with path"
                    )
                vals = read_rows(rel)
                if st.get("numWrites") != len(vals):
                    raise ValueError(
                        "numWrites disagrees with parquet rows"
                    )
                declared.add(rel)
    for _part, _fid, _tok, t, rel in bases:
        if t in cset and rel not in declared:
            raise ValueError(
                f"completed base file {rel!r} missing from its "
                "commit's write stats"
            )

    snapshot = _slices_asof(bases, completed, completed[-1])
    total_rows = 0
    v_sum = 0
    replaced = 0
    for (part, fid), (t, rel) in sorted(snapshot.items()):
        vals = read_rows(rel)
        total_rows += len(vals)
        v_sum += sum(vals)
        older = [
            1 for p2, f2, _tok, t2, _rel in bases
            if (p2, f2) == (part, fid) and t2 in cset and t2 < t
        ]
        replaced += 1 if older else 0
    first = _slices_asof(bases, completed, completed[0])
    rows_asof_first = sum(
        len(read_rows(rel)) for _t, rel in first.values()
    )
    last_t = completed[-1]
    rows_written_by_last = sum(
        len(read_rows(rel))
        for _part, _fid, _tok, t, rel in bases
        if t == last_t
    )
    for total in (total_rows, v_sum):
        if not -(2**63) <= total < 2**63:
            raise ValueError("hudi aggregate overflows int64")
    return {
        "n_instants": len(completed) + len(inflight),
        "n_completed": len(completed),
        "file_groups": len(snapshot),
        "live_files": len(snapshot),
        "skipped_inflight_files": skipped_inflight,
        "replaced_slices": replaced,
        "total_rows": total_rows,
        "v_sum": v_sum,
        "rows_asof_first": rows_asof_first,
        "rows_written_by_last": rows_written_by_last,
    }
