"""Delta Lake ``_delta_log`` read path: checkpoint parquet + JSON
commit replay → current-snapshot reconstruction, stats-based file
skipping, and time travel by version — the most widely deployed
lakehouse format's transaction log, from the PUBLIC protocol spec
(github.com/delta-io/delta/blob/master/PROTOCOL.md):

- the log directory holds one JSON file per commit
  (``{version:020d}.json``), each line one ACTION object:
  ``metaData`` (table schema/id), ``protocol``
  (``minReaderVersion``/``minWriterVersion`` — a reader MUST refuse
  tables above its supported reader version), ``add`` (a data file:
  ``path``, ``size``, ``dataChange``, and ``stats`` as a JSON STRING
  with ``numRecords``/``minValues``/``maxValues``), ``remove`` (a
  tombstone — the file is no longer part of the table), and
  ``commitInfo`` (informational, ignored);
- a CHECKPOINT (``{version:020d}.checkpoint.parquet``) materializes
  the replay state at a version as one action per parquet row
  (struct columns ``add``/``remove``/``metaData``/``protocol``);
  ``_last_checkpoint`` (JSON: ``version``, ``size``) points at it.
  After metadata cleanup (``delta.logRetentionDuration``) the
  pre-checkpoint JSON commits are GONE — a reader that cannot start
  from the checkpoint cannot read the table at all, which is exactly
  how the fixture proves the checkpoint path is real;
- snapshot at version V = checkpoint state + replay of the JSON
  commits ``checkpoint_version+1 .. V`` in order, where ``add`` wins
  over a prior state for the same path and ``remove`` drops it
  (last-action-wins reconciliation keyed by path);
- planning: prune ``add`` files whose stats exclude the probe
  (``minValues.v <= probe <= maxValues.v``), read only survivors.

Fixture bundle (tar, like :mod:`.iceberg_scan`): REAL pyarrow
parquet data files + checkpoint parquet, and protocol-shaped JSON
log lines. The commit at version 2 REMOVES the version-0 file
``f00`` and adds a replacement over the same value window, so a
reader that ignores tombstones scans two files for slot-0 probes
and over-counts — oracle-visible. Layered pinning (no independent
Delta writer ships in this container): the parquet layer is
pyarrow-real and every add's ``stats.numRecords`` is cross-checked
against the actual parquet footer; the JSON action layer is
spec-synthesized with every aggregate recomputed by the DuckDB
oracle; the checkpoint parquet is written AND read by pyarrow
(independent of the JSON path it must agree with).
"""

from __future__ import annotations

import io
import json
import re
import tarfile

from .bundles import read_tar_bundle, write_tar_bundle

_LOG = "_delta_log"
_SUPPORTED_READER_VERSION = 1
_JSON_RE = re.compile(r"^(\d{20})\.json$")


def _file_rows(seed: int, i: int) -> int:
    return 40 + (seed + i) % 60


def _file_lo(seed: int, i: int) -> int:
    return i * 100 + seed % 50


def synth_delta_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracle: version 0 adds ``3 + seed%3``
    files (slot i covers ``[lo_i, lo_i+39]``, ``lo_i = i*100 +
    seed%50``, ``rows_i = 40 + (seed+i)%60`` values ``lo_i + (r %
    40)``); version 1 adds two more slots; the checkpoint lands at
    version 1 and the pre-checkpoint JSONs are vacuumed; version 2
    removes slot 0's file and adds a replacement with ``rows_0 + 5``
    rows over the same window.  Probe = ``lo_k + 17`` with
    ``k = seed % (n0 + 2)``."""
    n0 = 3 + seed % 3
    n_live = n0 + 2
    k = seed % n_live
    rows_k = _file_rows(seed, k) + (5 if k == 0 else 0)
    return {
        "n0": n0,
        "n_live": n_live,
        "probe_slot": k,
        "probe": _file_lo(seed, k) + 17,
        "rows_scanned": rows_k,
        "probe_matches": (rows_k - 18) // 40 + 1,
    }


def synth_delta(seed: int) -> bytes:
    """One Delta table as a tar bundle: data parquet, checkpoint
    parquet, ``_last_checkpoint``, and the post-checkpoint commit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    plan = synth_delta_plan(seed)
    n0, n_live = plan["n0"], plan["n_live"]
    files: dict[str, bytes] = {}

    def write_data(path: str, rows: int, lo: int) -> dict:
        buf = io.BytesIO()
        pq.write_table(pa.table({"v": [lo + (r % 40) for r in range(rows)]}), buf)
        files[path] = buf.getvalue()
        return {
            "path": path,
            "size": len(files[path]),
            "dataChange": True,
            "stats": json.dumps(
                {
                    "numRecords": rows,
                    "minValues": {"v": lo},
                    "maxValues": {"v": lo + 39},
                }
            ),
        }

    adds_cp = []  # state at the version-1 checkpoint: slots 0..n0+1
    for i in range(n_live):
        adds_cp.append(
            write_data(f"part-{i:05d}.parquet", _file_rows(seed, i),
                       _file_lo(seed, i))
        )
    meta = {
        "id": f"00000000-0000-4000-8000-{seed:012d}",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps(
            {
                "type": "struct",
                "fields": [
                    {
                        "name": "v",
                        "type": "long",
                        "nullable": False,
                        "metadata": {},
                    }
                ],
            }
        ),
        "partitionColumns": [],
        "configuration": {"fixture.probe": str(plan["probe"])},
    }
    # checkpoint parquet at version 1: one action per row, struct cols
    n_actions = 2 + len(adds_cp)
    add_col = [None, None] + [
        {"path": a["path"], "size": a["size"], "stats": a["stats"]}
        for a in adds_cp
    ]
    cp = pa.table(
        {
            "metaData": [
                {
                    "id": meta["id"],
                    "schemaString": meta["schemaString"],
                    "configuration": meta["configuration"],
                }
            ]
            + [None] * (n_actions - 1),
            "protocol": [None]
            + [
                {
                    "minReaderVersion": 1,
                    "minWriterVersion": 2,
                }
            ]
            + [None] * (n_actions - 2),
            "add": add_col,
        }
    )
    buf = io.BytesIO()
    pq.write_table(cp, buf)
    files[f"{_LOG}/{1:020d}.checkpoint.parquet"] = buf.getvalue()
    files[f"{_LOG}/_last_checkpoint"] = json.dumps(
        {"version": 1, "size": n_actions}
    ).encode()

    # version 2: remove slot 0, add its replacement (same window)
    repl = write_data(
        "part-r0000.parquet", _file_rows(seed, 0) + 5, _file_lo(seed, 0)
    )
    v2_lines = [
        json.dumps(
            {
                "commitInfo": {
                    "operation": "WRITE",
                    "operationParameters": {"mode": "Overwrite"},
                }
            }
        ),
        json.dumps(
            {
                "remove": {
                    "path": "part-00000.parquet",
                    "deletionTimestamp": 1700000000000 + seed,
                    "dataChange": True,
                }
            }
        ),
        json.dumps({"add": repl}),
    ]
    files[f"{_LOG}/{2:020d}.json"] = ("\n".join(v2_lines) + "\n").encode()

    return write_tar_bundle(files)


def _parse_stats(raw) -> tuple[int, int, int]:
    """stats JSON string -> (numRecords, min_v, max_v)."""
    if not isinstance(raw, str):
        raise ValueError("add action without stats string")
    try:
        st = json.loads(raw)
    except json.JSONDecodeError as e:
        raise ValueError(f"add stats not JSON: {e}") from None
    if not isinstance(st, dict):
        raise ValueError("add stats not an object")
    nr = st.get("numRecords")
    mins = st.get("minValues")
    maxs = st.get("maxValues")
    if (
        not isinstance(nr, int) or isinstance(nr, bool) or nr < 0
        or not isinstance(mins, dict) or not isinstance(maxs, dict)
    ):
        raise ValueError("add stats malformed")
    lo, hi = mins.get("v"), maxs.get("v")
    if (
        not isinstance(lo, int) or isinstance(lo, bool)
        or not isinstance(hi, int) or isinstance(hi, bool) or lo > hi
    ):
        raise ValueError("add stats bounds malformed")
    return nr, lo, hi


class _State:
    """Replay state: path -> (stats | None, partitionValues);
    metaData/protocol.  ``require_stats`` preserves the strict
    contract of the unpartitioned scan; the partitioned scan relaxes
    it because real Delta writers may omit stats, in which case ONLY
    partition pruning can skip the file (the conservative fallback
    is scan-it)."""

    def __init__(self, require_stats: bool = True) -> None:
        #: path -> ((numRecords, lo, hi) | None, {part col -> value})
        self.adds: dict[str, tuple] = {}
        self.meta_id: str | None = None
        self.min_reader: int | None = None
        self.configuration: dict = {}
        self.require_stats = require_stats

    def apply(self, action: dict) -> None:
        if not isinstance(action, dict):
            raise ValueError("log action is not an object")
        known = {"add", "remove", "metaData", "protocol", "commitInfo",
                 "txn", "cdc"}
        keys = [k for k in action if action.get(k) is not None]
        if len(keys) != 1:
            raise ValueError("log action must carry exactly one field")
        kind = keys[0]
        if kind not in known:
            raise ValueError(f"unknown log action {kind!r}")
        body = action[kind]
        if kind in ("commitInfo", "txn"):
            return
        if kind == "cdc":
            raise ValueError("change-data-feed actions unsupported")
        if not isinstance(body, dict):
            raise ValueError(f"{kind} action is not an object")
        if kind == "metaData":
            mid = body.get("id")
            if not isinstance(mid, str):
                raise ValueError("metaData without id")
            self.meta_id = mid
            conf = body.get("configuration")
            if conf is not None:
                if not isinstance(conf, dict):
                    raise ValueError("metaData configuration malformed")
                self.configuration = conf
            return
        if kind == "protocol":
            mrv = body.get("minReaderVersion")
            if (
                not isinstance(mrv, int) or isinstance(mrv, bool)
                or not 0 <= mrv < 2**31
            ):
                # int32 fence: the Arrow IntegerType column would
                # overflow AFTER the quarantine otherwise (review r11)
                raise ValueError("protocol minReaderVersion malformed")
            # the spec REQUIRES refusing tables above the supported
            # reader version (silently reading e.g. a deletion-vector
            # table would resurrect deleted rows)
            if mrv > _SUPPORTED_READER_VERSION:
                raise ValueError(
                    f"delta minReaderVersion {mrv} unsupported (boundary)"
                )
            self.min_reader = mrv
            return
        path = body.get("path")
        if not isinstance(path, str) or not path:
            raise ValueError(f"{kind} action without path")
        if kind == "remove":
            self.adds.pop(path, None)
            return
        raw_stats = body.get("stats")
        if raw_stats is None and not self.require_stats:
            stats = None
        else:
            stats = _parse_stats(raw_stats)
        pv = body.get("partitionValues", {})
        if pv is None:
            pv = {}
        if not isinstance(pv, dict) or not all(
            isinstance(k, str) and isinstance(v, str)
            for k, v in pv.items()
        ):
            raise ValueError("add partitionValues malformed")
        self.adds[path] = (stats, pv)


def _replay_log(
    files: dict[str, bytes], require_stats: bool = True
):
    """Shared _delta_log walk: _last_checkpoint -> checkpoint parquet
    -> contiguous post-checkpoint JSON replay.  Returns
    ``(state, cp_version, current, replayed, files_at_checkpoint)``."""
    import pyarrow.parquet as pq

    lc_blob = files.get(f"{_LOG}/_last_checkpoint")
    if lc_blob is None:
        raise ValueError("_last_checkpoint missing (boundary)")
    try:
        lc = json.loads(lc_blob)
    except json.JSONDecodeError as e:
        raise ValueError(f"_last_checkpoint not JSON: {e}") from None
    cp_version = lc.get("version") if isinstance(lc, dict) else None
    cp_size = lc.get("size") if isinstance(lc, dict) else None
    if (
        not isinstance(cp_version, int) or isinstance(cp_version, bool)
        or not 0 <= cp_version < 2**31
        or not isinstance(cp_size, int) or isinstance(cp_size, bool)
        or cp_size < 0
    ):
        # versions fenced to int32: checkpoint_version/current_version
        # feed IntegerType Arrow columns (review r11 — the same
        # overflow-after-quarantine class as the avro sum fences)
        raise ValueError("_last_checkpoint malformed")
    cp_blob = files.get(f"{_LOG}/{cp_version:020d}.checkpoint.parquet")
    if cp_blob is None:
        raise ValueError("checkpoint parquet missing from log")
    try:
        cp = pq.read_table(io.BytesIO(cp_blob))
    except Exception as e:
        raise ValueError(f"checkpoint unreadable: {e}") from None
    if cp.num_rows != cp_size:
        raise ValueError("_last_checkpoint size disagrees with parquet")
    state = _State(require_stats)
    cols = cp.column_names
    for kind in ("metaData", "protocol", "add", "remove"):
        if kind not in cols:
            continue
        for body in cp.column(kind).to_pylist():
            if body is not None:
                state.apply({kind: body})
    if state.min_reader is None or state.meta_id is None:
        raise ValueError("checkpoint without protocol/metaData")
    files_at_checkpoint = len(state.adds)

    # replay post-checkpoint JSON commits, contiguous versions only.
    # Match DIRECT children of _delta_log by full path — a basename
    # match would collect `_delta_log/sub/<v>.json` into `versions`
    # and then KeyError on the top-level fetch (review r11 pass 2:
    # KeyError is not ValueError and escapes the quarantine).
    by_version: dict[int, str] = {}
    for n in files:
        if not n.startswith(f"{_LOG}/"):
            continue
        rest = n[len(_LOG) + 1 :]
        m = _JSON_RE.match(rest)
        if m:
            by_version[int(m.group(1))] = n
    replayed = 0
    current = cp_version
    for v in sorted(by_version):
        if v <= cp_version:
            continue
        if v != current + 1:
            raise ValueError("commit versions not contiguous (boundary)")
        if v >= 2**31:
            raise ValueError("commit version overflows int32 (boundary)")
        blob = files[by_version[v]]
        if len(blob) > 1 << 24:
            raise ValueError("commit JSON exceeds size cap")
        for line in blob.splitlines():
            if not line.strip():
                continue
            try:
                action = json.loads(line)
            except json.JSONDecodeError as e:
                raise ValueError(f"commit line not JSON: {e}") from None
            state.apply(action)
        current = v
        replayed += 1
    return state, cp_version, current, replayed, files_at_checkpoint


def _probe_from_config(state: _State) -> int:
    """The point lookup rides in the table configuration (a fixture
    knob, same as the Iceberg fixture's table property; a real
    engine gets it from the query)."""
    if "fixture.probe" not in state.configuration:
        raise ValueError("table configuration missing the probe")
    try:
        return int(state.configuration["fixture.probe"])
    except (TypeError, ValueError):
        raise ValueError("non-integer probe configuration") from None


def _scan_parquet_matches(
    files: dict[str, bytes], path: str, probe: int, declared: int | None
) -> tuple[int, int]:
    """Read one live data file; returns (rows, probe matches) with
    the declared numRecords cross-checked when stats carried one."""
    import pyarrow.parquet as pq

    blob = files.get(path)
    if blob is None:
        raise ValueError(f"data file {path!r} missing from bundle")
    try:
        table = pq.read_table(io.BytesIO(blob))
    except Exception as e:
        raise ValueError(f"data file unreadable: {e}") from None
    if declared is not None and table.num_rows != declared:
        raise ValueError(
            f"stats numRecords {declared} != parquet rows {table.num_rows}"
        )
    if "v" not in table.column_names:
        raise ValueError("data file missing the predicate column")
    matches = 0
    for v in table.column("v").to_pylist():
        if not isinstance(v, int):
            raise ValueError("data value not an integer")
        if v == probe:
            matches += 1
    return table.num_rows, matches


def scan_delta(payload: bytes) -> dict:
    """Reconstruct the current snapshot from ``_delta_log`` and serve
    the point lookup ``v = probe``.  The probe rides in
    ``metaData.configuration["fixture.probe"]`` — the same
    fixture-knob pattern as the Iceberg scan's table property (a
    real engine gets it from the query).  ``files_at_checkpoint`` is
    the TIME TRAVEL readout: the live-file count of the snapshot AT
    the checkpoint version, before the replayed commits."""
    files = read_tar_bundle(payload)
    state, cp_version, current, replayed, files_at_checkpoint = (
        _replay_log(files, require_stats=True)
    )
    if not state.adds:
        raise ValueError("current snapshot has no live files")
    live = sorted(state.adds.items())
    n_live = len(live)
    probe = _probe_from_config(state)
    survivors = [
        (path, st[0], st[1], st[2])
        for path, (st, _pv) in live
        if st[1] <= probe <= st[2]
    ]
    rows_scanned = 0
    matches = 0
    for path, nr, _lo, _hi in survivors:
        rows, m = _scan_parquet_matches(files, path, probe, nr)
        rows_scanned += rows
        matches += m
    total_live_rows = sum(st[0] for _, (st, _pv) in live)
    if not (0 <= total_live_rows < 2**63):
        raise ValueError("delta total rows overflows int64 (boundary)")
    return {
        "checkpoint_version": cp_version,
        "current_version": current,
        "json_commits_replayed": replayed,
        "files_at_checkpoint": files_at_checkpoint,
        "live_files": n_live,
        "min_reader_version": state.min_reader,
        "files_pruned": n_live - len(survivors),
        "files_scanned": len(survivors),
        "rows_scanned": rows_scanned,
        "total_live_rows": total_live_rows,
        "probe_matches": matches,
    }


# ---------------------------------------------------------------------------
# partitioned table: partitionValues pruning + stats-less adds
# ---------------------------------------------------------------------------

def synth_delta_partitioned_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracle: ``n = 6 + seed%3`` files; file
    i lives in partition ``p = i % 4`` under ``p=<p>/`` with rows
    ``30 + (seed+i)%20`` of ``v = p*100 + 35*(i//4) + (r % 30)`` (two
    files of one partition occupy disjoint 30-wide windows).  Files
    at ODD index carry NO stats (a writer that skipped them — legal
    Delta), so only partitionValues can prune them.  Probe = window
    start of file ``k = seed % n`` + 11."""
    n = 6 + seed % 3
    k = seed % n
    rows = [30 + (seed + i) % 20 for i in range(n)]
    tp = k % 4
    # scanned = target-partition files that are k itself, or lack
    # stats (odd index), or whose stats include the probe (none —
    # windows are disjoint)
    same_part = [i for i in range(n) if i % 4 == tp]
    scanned = [i for i in same_part if i == k or i % 2 == 1]
    return {
        "n": n,
        "probe_file": k,
        "probe": tp * 100 + 35 * (k // 4) + 11,
        "target_partition": tp,
        "files_pruned_partition": n - len(same_part),
        "files_pruned_stats": len(same_part) - len(scanned),
        "files_scanned": len(scanned),
        "rows_scanned": sum(rows[i] for i in scanned),
        "probe_matches": (rows[k] - 12) // 30 + 1,
        "files_without_stats": sum(1 for i in range(n) if i % 2 == 1),
    }


def synth_delta_partitioned(seed: int) -> bytes:
    """Single-commit partitioned Delta table (version 0 JSON only —
    no checkpoint yet, the young-table shape), partition column
    ``p``, half the adds without stats."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    plan = synth_delta_partitioned_plan(seed)
    n = plan["n"]
    files: dict[str, bytes] = {}
    lines = []
    meta = {
        "id": f"10000000-0000-4000-8000-{seed:012d}",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps(
            {
                "type": "struct",
                "fields": [
                    {"name": "v", "type": "long", "nullable": False,
                     "metadata": {}},
                    {"name": "p", "type": "integer", "nullable": False,
                     "metadata": {}},
                ],
            }
        ),
        "partitionColumns": ["p"],
        "configuration": {
            "fixture.probe": str(plan["probe"]),
            # the partition predicate: a real engine prunes on an
            # explicit partition-column predicate from the query,
            # never by inferring a layout from the data column
            "fixture.probe.p": str(plan["target_partition"]),
        },
    }
    lines.append(json.dumps({"metaData": meta}))
    lines.append(json.dumps(
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
    ))
    for i in range(n):
        p_val = i % 4
        rows = 30 + (seed + i) % 20
        lo = p_val * 100 + 35 * (i // 4)
        buf = io.BytesIO()
        pq.write_table(
            pa.table({"v": [lo + (r % 30) for r in range(rows)]}), buf
        )
        path = f"p={p_val}/part-{i:05d}.parquet"
        files[path] = buf.getvalue()
        add = {
            "path": path,
            "size": len(files[path]),
            "dataChange": True,
            "partitionValues": {"p": str(p_val)},
        }
        if i % 2 == 0:
            add["stats"] = json.dumps(
                {
                    "numRecords": rows,
                    "minValues": {"v": lo},
                    "maxValues": {"v": lo + 29},
                }
            )
        lines.append(json.dumps({"add": add}))
    files[f"{_LOG}/{0:020d}.json"] = ("\n".join(lines) + "\n").encode()
    return write_tar_bundle(files)


def scan_delta_partitioned(payload: bytes) -> dict:
    """Partitioned-table planning: prune by ``partitionValues``
    FIRST (the only pruning available for stats-less adds), then by
    stats where present; scan the remainder.  A young table with no
    checkpoint yet replays from the version-0 JSON directly (the
    ``_last_checkpoint``-less path real tables start life in)."""
    files = read_tar_bundle(payload)
    if f"{_LOG}/_last_checkpoint" in files:
        raise ValueError("partitioned fixture must be pre-checkpoint")
    blob = files.get(f"{_LOG}/{0:020d}.json")
    if blob is None:
        raise ValueError("version-0 commit missing (boundary)")
    if len(blob) > 1 << 24:
        raise ValueError("commit JSON exceeds size cap")
    state = _State(require_stats=False)
    for line in blob.splitlines():
        if not line.strip():
            continue
        try:
            action = json.loads(line)
        except json.JSONDecodeError as e:
            raise ValueError(f"commit line not JSON: {e}") from None
        state.apply(action)
    if state.min_reader is None or state.meta_id is None:
        raise ValueError("log without protocol/metaData")
    if not state.adds:
        raise ValueError("current snapshot has no live files")
    live = sorted(state.adds.items())
    probe = _probe_from_config(state)
    # partition pruning keys off the QUERY's partition predicate
    # (review r11 pass 4: deriving it from the data column would
    # bake the fixture layout into the reader and silently
    # mis-prune any other table)
    target = state.configuration.get("fixture.probe.p")
    if not isinstance(target, str):
        raise ValueError("table configuration missing the partition probe")
    part_survivors = []
    for path, (st, pv) in live:
        if "p" not in pv:
            raise ValueError("add missing the partition value")
        if pv["p"] == target:
            part_survivors.append((path, st))
    files_pruned_partition = len(live) - len(part_survivors)
    survivors = [
        (path, st)
        for path, st in part_survivors
        if st is None or st[1] <= probe <= st[2]
    ]
    files_pruned_stats = len(part_survivors) - len(survivors)
    rows_scanned = 0
    matches = 0
    for path, st in survivors:
        rows, m = _scan_parquet_matches(
            files, path, probe, st[0] if st else None
        )
        rows_scanned += rows
        matches += m
    return {
        "live_files": len(live),
        "files_without_stats": sum(
            1 for _, (st, _pv) in live if st is None
        ),
        "files_pruned_partition": files_pruned_partition,
        "files_pruned_stats": files_pruned_stats,
        "files_scanned": len(survivors),
        "rows_scanned": rows_scanned,
        "probe_matches": matches,
    }
