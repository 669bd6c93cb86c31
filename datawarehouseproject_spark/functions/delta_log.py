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

from .bundles import (
    read_parquet_blob,
    read_tar_bundle,
    write_tar_bundle,
)

_LOG = "_delta_log"
_SUPPORTED_READER_VERSION = 1
_CM_READER_VERSION = 2
_DV_READER_VERSION = 3
_JSON_RE = re.compile(r"^(\d{20})\.json$")


def _file_rows(seed: int, i: int) -> int:
    return 40 + (seed + i) % 60


def _file_lo(seed: int, i: int) -> int:
    return i * 100 + seed % 50


def _write_data_file(
    files: dict[str, bytes], path: str, rows: int, lo: int
) -> dict:
    """Shared fixture data writer (review pass: three copies had
    grown): parquet of ``lo + (r % 40)`` plus its add action with
    window stats."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(
        pa.table({"v": [lo + (r % 40) for r in range(rows)]}), buf
    )
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


def _stats_point_lookup(
    files: dict[str, bytes], live: list, probe: int
) -> tuple[int, int, int, int]:
    """Shared probe block (review pass): stats-window survivors ->
    (n_survivors, rows_scanned, probe_matches, total_declared_rows)
    with footers cross-checked and the int64 fence applied."""
    survivors = [
        (path, st) for path, (st, _pv, _dv) in live
        if st[1] <= probe <= st[2]
    ]
    rows_scanned = matches = 0
    for path, st in survivors:
        rows, m = _scan_parquet_matches(files, path, probe, st[0])
        rows_scanned += rows
        matches += m
    total = sum(st[0] for _, (st, _pv, _dv) in live)
    if not 0 <= total < 2**63:
        raise ValueError("delta total rows overflows int64 (boundary)")
    return len(survivors), rows_scanned, matches, total


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
        return _write_data_file(files, path, rows, lo)

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
    if seed % 2 == 1:
        # multi-part CLASSIC checkpoint rotation (round 12 — VERDICT
        # r11 item 7): the same actions split across two parts named
        # <version>.checkpoint.<part>.<totalParts>.parquet, with
        # _last_checkpoint declaring parts=2 — replay must be
        # IDENTICAL to the single-file form (same oracle values)
        half = (n_actions + 1) // 2
        for p, piece in ((1, cp.slice(0, half)), (2, cp.slice(half))):
            buf = io.BytesIO()
            pq.write_table(piece, buf)
            files[
                f"{_LOG}/{1:020d}.checkpoint.{p:010d}.{2:010d}.parquet"
            ] = buf.getvalue()
        files[f"{_LOG}/_last_checkpoint"] = json.dumps(
            {"version": 1, "size": n_actions, "parts": 2}
        ).encode()
    else:
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


def _parse_stats(raw, col: str = "v") -> tuple[int, int, int]:
    """stats JSON string -> (numRecords, min, max) of ``col`` — the
    PHYSICAL column name once column mapping is active."""
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
    lo, hi = mins.get(col), maxs.get(col)
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

    def __init__(
        self,
        require_stats: bool = True,
        allow_dv: bool = False,
        allow_cm: bool = False,
        allow_v2cp: bool = False,
    ) -> None:
        #: path -> ((numRecords, lo, hi) | None, {part col -> value},
        #:          deletionVector descriptor | None)
        self.adds: dict[str, tuple] = {}
        self.meta_id: str | None = None
        self.min_reader: int | None = None
        self.configuration: dict = {}
        self.require_stats = require_stats
        self.allow_dv = allow_dv
        self.allow_cm = allow_cm
        self.allow_v2cp = allow_v2cp
        self.sidecar_files = 0
        self.reader_features: set[str] = set()
        self.mapping_mode: str | None = None
        #: logical name -> (columnMapping.id, physicalName)
        self.column_mapping: dict[str, tuple[int, str]] = {}
        #: the column key add stats are recorded under (PHYSICAL name
        #: once column mapping is active — PROTOCOL.md: per-column
        #: statistics refer to physical names)
        self.stats_col = "v"

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
            # PROTOCOL.md "Add CDC File": change files are NOT part
            # of the table data — a snapshot read ignores them; the
            # change-feed read path is :func:`scan_delta_cdf`
            if not isinstance(body, dict) or not isinstance(
                body.get("path"), str
            ):
                raise ValueError("cdc action malformed")
            return
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
            mode = self.configuration.get("delta.columnMapping.mode")
            if mode not in (None, "none"):
                if not self.allow_cm:
                    # same contract as DVs: a name/id-mapped table read
                    # by logical names silently returns wrong columns
                    raise ValueError("column mapping unsupported (boundary)")
                if mode not in ("name", "id"):
                    raise ValueError("column mapping mode unknown")
                self.mapping_mode = mode
                self.column_mapping = _parse_mapping_schema(
                    body.get("schemaString")
                )
                if "v" not in self.column_mapping:
                    raise ValueError("mapped schema missing the value column")
                self.stats_col = self.column_mapping["v"][1]
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
            # table would resurrect deleted rows).  Version 2 (column
            # mapping) stays refused on every path; version 3 is
            # accepted only by the DV-aware scan AND only when every
            # declared readerFeature is implemented here.
            ok = (
                mrv <= _SUPPORTED_READER_VERSION
                or (mrv == _CM_READER_VERSION and self.allow_cm)
                or (
                    mrv == _DV_READER_VERSION
                    and (self.allow_dv or self.allow_cm
                         or self.allow_v2cp)
                )
            )
            if not ok:
                raise ValueError(
                    f"delta minReaderVersion {mrv} unsupported (boundary)"
                )
            if mrv >= 3:
                feats = body.get("readerFeatures")
                if not isinstance(feats, list) or not all(
                    isinstance(f, str) for f in feats
                ):
                    raise ValueError("protocol readerFeatures malformed")
                # only the features THIS scan can actually honor: a
                # declared feature the scan lacks must refuse here,
                # before any data is served
                supported = set()
                if self.allow_dv:
                    supported.add("deletionVectors")
                if self.allow_cm:
                    supported.add("columnMapping")
                if self.allow_v2cp:
                    supported.add("v2Checkpoint")
                unknown = set(feats) - supported
                if unknown:
                    raise ValueError(
                        f"reader features {sorted(unknown)} "
                        "unsupported (boundary)"
                    )
                self.reader_features = set(feats)
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
            stats = _parse_stats(raw_stats, self.stats_col)
        pv = body.get("partitionValues", {})
        if pv is None:
            pv = {}
        if not isinstance(pv, dict) or not all(
            isinstance(k, str) and isinstance(v, str)
            for k, v in pv.items()
        ):
            raise ValueError("add partitionValues malformed")
        dv = body.get("deletionVector")
        if dv is not None:
            if not self.allow_dv:
                # belt alongside the protocol-version fence: even a
                # mis-versioned log cannot make a non-DV scan silently
                # resurrect deleted rows
                raise ValueError("deletion vectors unsupported (boundary)")
            if "deletionVectors" not in self.reader_features:
                raise ValueError(
                    "deletionVector add without the protocol feature"
                )
            dv = _parse_dv_descriptor(dv)
        self.adds[path] = (stats, pv, dv)


def _commit_versions(files: dict[str, bytes]) -> dict[int, str]:
    """JSON commit discovery shared by the snapshot replay and the
    CDF scan: DIRECT children of _delta_log matched by full path — a
    basename match would collect `_delta_log/sub/<v>.json` and then
    KeyError on the top-level fetch (review r11 pass 2: KeyError is
    not ValueError and escapes the quarantine)."""
    by_version: dict[int, str] = {}
    for n in files:
        if not n.startswith(f"{_LOG}/"):
            continue
        m = _JSON_RE.match(n[len(_LOG) + 1 :])
        if m:
            by_version[int(m.group(1))] = n
    return by_version


def _replay_log(
    files: dict[str, bytes],
    require_stats: bool = True,
    allow_dv: bool = False,
    allow_cm: bool = False,
    trace: list | None = None,
    allow_v2cp: bool = False,
):
    """Shared _delta_log walk: _last_checkpoint -> checkpoint parquet
    -> contiguous post-checkpoint JSON replay.  Returns
    ``(state, cp_version, current, replayed, files_at_checkpoint)``.
    When ``trace`` is a list, a ``(version, {path: add_tuple})``
    snapshot of the live-file state is appended at the checkpoint
    and after every replayed commit — the time-travel readout."""
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
    v2_name = None
    if cp_blob is None and allow_v2cp:
        # v2 checkpoints are UUID-named:
        # <version>.checkpoint.<uuid>.parquet
        pat = re.compile(
            rf"^{_LOG}/{cp_version:020d}\.checkpoint\."
            r"[0-9a-f\-]{36}\.parquet$"
        )
        matches = sorted(n for n in files if pat.match(n))
        if len(matches) > 1:
            raise ValueError("multiple v2 checkpoints for one version")
        if matches:
            v2_name = matches[0]
            cp_blob = files[v2_name]
    # multi-part CLASSIC checkpoints (round 12 — VERDICT r11 item 7):
    # the pre-v2 large-table layout, parts named
    # <version>.checkpoint.<part>.<totalParts>.parquet with
    # _last_checkpoint declaring "parts"; one action per row across
    # the part set, order irrelevant to the reconciliation but the
    # SET must be complete — a missing part silently drops files
    parts = lc.get("parts")
    part_blobs = None
    if parts is not None:
        if (
            not isinstance(parts, int) or isinstance(parts, bool)
            or not 1 <= parts <= 64
        ):
            raise ValueError("_last_checkpoint parts malformed")
        if cp_blob is not None:
            # one version cannot carry both forms: picking either
            # silently ignores the other's actions
            raise ValueError(
                "both single and multi-part checkpoints for one version"
            )
        # stray-part fence (ADVICE r12): part files for this version
        # with a DIFFERENT totalParts denominator would be silently
        # ignored by the declared-count fetch below — a second,
        # conflicting checkpoint set is the same ambiguity as the
        # single-vs-multi conflict above, so reject it loudly too
        stray_pat = re.compile(
            rf"^{_LOG}/{cp_version:020d}\.checkpoint\."
            r"(\d{10})\.(\d{10})\.parquet$"
        )
        for n in files:
            sm = stray_pat.match(n)
            if sm is not None and int(sm.group(2)) != parts:
                raise ValueError(
                    "checkpoint parts with conflicting totalParts"
                )
        part_blobs = []
        for p in range(1, parts + 1):
            name = (
                f"{_LOG}/{cp_version:020d}.checkpoint."
                f"{p:010d}.{parts:010d}.parquet"
            )
            blob = files.get(name)
            if blob is None:
                raise ValueError(
                    f"checkpoint part {p}/{parts} missing from log"
                )
            part_blobs.append(blob)
    if cp_blob is None and part_blobs is None:
        raise ValueError("checkpoint parquet missing from log")
    tables = []
    for blob in part_blobs if part_blobs is not None else [cp_blob]:
        try:
            tables.append(read_parquet_blob(blob))
        except Exception as e:
            raise ValueError(f"checkpoint unreadable: {e}") from None
    if sum(t.num_rows for t in tables) != cp_size:
        raise ValueError("_last_checkpoint size disagrees with parquet")
    state = _State(require_stats, allow_dv, allow_cm, allow_v2cp)
    cp = tables[0]
    cols = cp.column_names
    # v2-ness is decided by the checkpointMetadata ACTION, not the
    # file name: the spec allows a v2 checkpoint under the classic
    # name too (review finding — the name-only test silently dropped
    # such a checkpoint's sidecar actions).  Non-v2cp scans are safe
    # either way: the v3 protocol row refuses before any data.
    is_v2 = allow_v2cp and "checkpointMetadata" in cols and any(
        b is not None
        for b in cp.column("checkpointMetadata").to_pylist()
    )
    if v2_name is not None and not is_v2:
        raise ValueError(
            "uuid-named checkpoint without checkpointMetadata"
        )
    if part_blobs is not None and any(
        "checkpointMetadata" in t.column_names for t in tables
    ):
        # the spec's v2 form is single-file + sidecars; a "v2
        # multi-part" has no defined reconciliation
        raise ValueError("v2 checkpoint cannot be multi-part")
    inline_actions = []  # v2: file actions deferred until the
    # sidecar block decides whether this checkpoint is inline-form
    for table in tables:
        tcols = table.column_names
        for kind in ("metaData", "protocol", "add", "remove"):
            if kind not in tcols:
                continue
            for body in table.column(kind).to_pylist():
                if body is not None:
                    if is_v2 and kind in ("add", "remove"):
                        inline_actions.append({kind: body})
                    else:
                        state.apply({kind: body})
    if state.min_reader is None or state.meta_id is None:
        raise ValueError("checkpoint without protocol/metaData")
    if is_v2:
        _apply_v2_checkpoint(
            files, cp, cols, cp_version, state, inline_actions
        )
    files_at_checkpoint = len(state.adds)
    if trace is not None:
        trace.append((cp_version, dict(state.adds)))

    # replay post-checkpoint JSON commits, contiguous versions only
    by_version = _commit_versions(files)
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
        if trace is not None:
            trace.append((v, dict(state.adds)))
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
        table = read_parquet_blob(blob)
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
    n_survivors, rows_scanned, matches, total_live_rows = (
        _stats_point_lookup(files, live, probe)
    )
    return {
        "checkpoint_version": cp_version,
        "current_version": current,
        "json_commits_replayed": replayed,
        "files_at_checkpoint": files_at_checkpoint,
        "live_files": n_live,
        "min_reader_version": state.min_reader,
        "files_pruned": n_live - n_survivors,
        "files_scanned": n_survivors,
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
    for path, (st, pv, _dv) in live:
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
            1 for _, (st, _pv, _dv) in live if st is None
        ),
        "files_pruned_partition": files_pruned_partition,
        "files_pruned_stats": files_pruned_stats,
        "files_scanned": len(survivors),
        "rows_scanned": rows_scanned,
        "probe_matches": matches,
    }


# ---------------------------------------------------------------------------
# deletion vectors (reader version 3, readerFeatures=["deletionVectors"])
# ---------------------------------------------------------------------------
# PROTOCOL.md "Deletion Vectors" + "Deletion Vector Format": an add
# action may carry a ``deletionVector`` descriptor {storageType,
# pathOrInlineDv, offset, sizeInBytes, cardinality} marking row
# POSITIONS of the data file as deleted — merge-on-read, the rows
# stay in the parquet.  A reader that ignores the descriptor
# resurrects deleted rows, which is why the protocol gates the
# feature behind minReaderVersion 3 + the named readerFeature.
#
#   - storageType "u": the DV lives in a sibling file; pathOrInlineDv
#     is ``<random prefix><z85-encoded 16-byte uuid>`` (the last 20
#     chars are the uuid) naming ``<prefix>/deletion_vector_<uuid>.bin``
#     relative to the table root; ``offset`` points into the file at
#     ``<dataSize: int32 BE><data><crc32 of data: int32 BE>`` with the
#     file's first byte a format-version marker (1).
#   - storageType "i": pathOrInlineDv is the z85 encoding of the data
#     itself (zero-padded to the codec's 4-byte alignment; sizeInBytes
#     recovers the true length).
#   - storageType "p" (absolute path) loud-rejects here: a bundle
#     fixture has no absolute filesystem (boundary).
#
# The data blob is ``<magic 1681511377: int32 LE><64-bit
# RoaringBitmapArray "portable">``: an int64 LE count of 32-bit
# bitmaps, then per bitmap an int32 LE key (the high 32 bits) and a
# standard 32-bit RoaringBitmap in the RoaringFormatSpec portable
# layout (cookie 12346/12347, run flags, descriptive + offset
# headers, array/bitmap/run containers) — the roaring layer is
# pinned by hand-traced goldens from that published spec, the delta
# layer by descriptor/decoded-cardinality/parquet-footer
# cross-checks recomputed by the DuckDB oracle (layered pinning: no
# independent Delta or roaring producer ships in this container).

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}
_DV_MAGIC = 1681511377
_DV_SIZE_CAP = 1 << 22
_DV_CARD_CAP = 1 << 20
_SERIAL_COOKIE = 12347
_SERIAL_COOKIE_NO_RUN = 12346
_NO_OFFSET_THRESHOLD = 4


def z85_encode(data: bytes) -> str:
    """ZeroMQ Z85 (RFC 32/Z85): 4 bytes -> 5 chars, big-endian."""
    if len(data) % 4:
        raise ValueError("z85 input not 4-byte aligned")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 text not 5-char aligned")
    if len(text) > 5 * (_DV_SIZE_CAP // 4):
        raise ValueError("z85 text past size cap")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            d = _Z85_INV.get(c)
            if d is None:
                raise ValueError("z85 text has a non-alphabet character")
            v = v * 85 + d
        if v > 0xFFFFFFFF:
            raise ValueError("z85 group overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


def _roaring32_deserialize(data: bytes, pos: int) -> tuple[list[int], int]:
    """One standard 32-bit RoaringBitmap (RoaringFormatSpec
    'portable' layout) -> (ascending values, new position).  Every
    structural invariant the spec states is enforced as ValueError:
    ascending keys, sorted containers, cardinality agreement, offset
    header agreement."""
    start = pos
    if pos + 4 > len(data):
        raise ValueError("roaring bitmap truncated at cookie")
    word = int.from_bytes(data[pos : pos + 4], "little")
    pos += 4
    if (word & 0xFFFF) == _SERIAL_COOKIE:
        n = (word >> 16) + 1
        nflag = (n + 7) // 8
        if pos + nflag > len(data):
            raise ValueError("roaring run flags truncated")
        flags = data[pos : pos + nflag]
        pos += nflag
        runs = [(flags[i >> 3] >> (i & 7)) & 1 for i in range(n)]
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif word == _SERIAL_COOKIE_NO_RUN:
        if pos + 4 > len(data):
            raise ValueError("roaring container count truncated")
        n = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        runs = [0] * n
        has_offsets = True
    else:
        raise ValueError("roaring cookie unknown")
    if not 0 < n <= 1 << 16:
        raise ValueError("roaring container count out of range")
    if pos + 4 * n > len(data):
        raise ValueError("roaring descriptive header truncated")
    keys, cards = [], []
    prev_key = -1
    for _ in range(n):
        key = int.from_bytes(data[pos : pos + 2], "little")
        if key <= prev_key:
            raise ValueError("roaring keys not strictly increasing")
        prev_key = key
        keys.append(key)
        cards.append(int.from_bytes(data[pos + 2 : pos + 4], "little") + 1)
        pos += 4
    if sum(cards) > _DV_CARD_CAP:
        raise ValueError("roaring cardinality past cap")
    offsets = None
    if has_offsets:
        if pos + 4 * n > len(data):
            raise ValueError("roaring offset header truncated")
        offsets = [
            int.from_bytes(data[pos + 4 * i : pos + 4 * i + 4], "little")
            for i in range(n)
        ]
        pos += 4 * n
    values: list[int] = []
    for i in range(n):
        if offsets is not None and offsets[i] != pos - start:
            raise ValueError("roaring offset header disagrees with layout")
        base = keys[i] << 16
        if runs[i]:
            if pos + 2 > len(data):
                raise ValueError("run container truncated")
            n_runs = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
            if pos + 4 * n_runs > len(data):
                raise ValueError("run container truncated")
            got, prev = 0, -1
            for _ in range(n_runs):
                s0 = int.from_bytes(data[pos : pos + 2], "little")
                ln = int.from_bytes(data[pos + 2 : pos + 4], "little")
                pos += 4
                if s0 <= prev:
                    raise ValueError("run container not sorted")
                if s0 + ln > 0xFFFF:
                    raise ValueError("run past container range")
                values.extend(base | v for v in range(s0, s0 + ln + 1))
                got += ln + 1
                prev = s0 + ln
            if got != cards[i]:
                raise ValueError("run container cardinality disagrees")
        elif cards[i] <= 4096:
            if pos + 2 * cards[i] > len(data):
                raise ValueError("array container truncated")
            prev = -1
            for _ in range(cards[i]):
                v = int.from_bytes(data[pos : pos + 2], "little")
                pos += 2
                if v <= prev:
                    raise ValueError("array container not sorted")
                prev = v
                values.append(base | v)
        else:
            if pos + 8192 > len(data):
                raise ValueError("bitmap container truncated")
            chunk = data[pos : pos + 8192]
            pos += 8192
            got = 0
            for byte_i, b in enumerate(chunk):
                while b:
                    low = b & -b
                    values.append(
                        base | (byte_i << 3) | (low.bit_length() - 1)
                    )
                    b ^= low
                    got += 1
            if got != cards[i]:
                raise ValueError("bitmap container cardinality disagrees")
    return values, pos


def _roaring32_serialize(lows_by_key: list[tuple[int, list[int], bool]]) -> bytes:
    """Synth-side serializer: ``[(key, sorted 16-bit lows, as_run)]``
    -> portable bytes.  ``as_run`` collapses consecutive lows into
    run containers so the fixture exercises all three container
    kinds the deserializer supports."""
    any_run = any(r for _, _, r in lows_by_key)
    n = len(lows_by_key)
    body = io.BytesIO()
    header = io.BytesIO()
    if any_run:
        header.write(
            (_SERIAL_COOKIE | ((n - 1) << 16)).to_bytes(4, "little")
        )
        flags = bytearray((n + 7) // 8)
        for i, (_, _, r) in enumerate(lows_by_key):
            if r:
                flags[i >> 3] |= 1 << (i & 7)
        header.write(bytes(flags))
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    else:
        header.write(_SERIAL_COOKIE_NO_RUN.to_bytes(4, "little"))
        header.write(n.to_bytes(4, "little"))
        has_offsets = True
    for key, lows, _ in lows_by_key:
        header.write(key.to_bytes(2, "little"))
        header.write((len(lows) - 1).to_bytes(2, "little"))
    chunks = []
    for key, lows, as_run in lows_by_key:
        if as_run:
            runs = []
            for v in lows:
                if runs and v == runs[-1][0] + runs[-1][1] + 1:
                    runs[-1][1] += 1
                else:
                    runs.append([v, 0])
            c = len(runs).to_bytes(2, "little") + b"".join(
                s.to_bytes(2, "little") + ln.to_bytes(2, "little")
                for s, ln in runs
            )
        elif len(lows) <= 4096:
            c = b"".join(v.to_bytes(2, "little") for v in lows)
        else:
            bits = bytearray(8192)
            for v in lows:
                bits[v >> 3] |= 1 << (v & 7)
            c = bytes(bits)
        chunks.append(c)
    base = header.tell() + (4 * n if has_offsets else 0)
    if has_offsets:
        off = base
        for c in chunks:
            header.write(off.to_bytes(4, "little"))
            off += len(c)
    for c in chunks:
        body.write(c)
    return header.getvalue() + body.getvalue()


def rbm_array_serialize(values: list[int]) -> bytes:
    """Sorted unique uint64 row indexes -> Delta's 64-bit
    RoaringBitmapArray portable bytes (array containers; the synth
    fixtures that want run/bitmap containers build
    ``_roaring32_serialize`` input directly)."""
    by_key32: dict[int, dict[int, list[int]]] = {}
    prev = -1
    for v in values:
        if v <= prev or not 0 <= v < 1 << 64:
            raise ValueError("row indexes must be sorted unique uint64")
        prev = v
        low32 = v & 0xFFFFFFFF
        by_key32.setdefault(v >> 32, {}).setdefault(
            low32 >> 16, []
        ).append(low32 & 0xFFFF)
    out = io.BytesIO()
    out.write(len(by_key32).to_bytes(8, "little"))
    for key32 in sorted(by_key32):
        containers = by_key32[key32]
        lows = [(k, containers[k], False) for k in sorted(containers)]
        out.write(key32.to_bytes(4, "little"))
        out.write(_roaring32_serialize(lows))
    return out.getvalue()


def rbm_array_deserialize(data: bytes) -> list[int]:
    """64-bit RoaringBitmapArray portable bytes -> ascending row
    indexes; trailing bytes loud-reject."""
    if len(data) < 8:
        raise ValueError("roaring array truncated at count")
    n = int.from_bytes(data[:8], "little")
    if not 0 <= n <= 1 << 16:
        raise ValueError("roaring array bitmap count out of range")
    pos = 8
    values: list[int] = []
    prev_key = -1
    for _ in range(n):
        if pos + 4 > len(data):
            raise ValueError("roaring array truncated at key")
        key = int.from_bytes(data[pos : pos + 4], "little")
        if key <= prev_key:
            raise ValueError("roaring array keys not strictly increasing")
        prev_key = key
        pos += 4
        vals32, pos = _roaring32_deserialize(data, pos)
        values.extend((key << 32) | v for v in vals32)
        # incremental: run containers amplify ~4 bytes into up to
        # 65536 values, so an end-only check would let a small
        # payload materialize billions of values first
        if len(values) > _DV_CARD_CAP:
            raise ValueError("roaring array cardinality past cap")
    if pos != len(data):
        raise ValueError("roaring array has trailing bytes")
    return values


def dv_data_encode(values: list[int]) -> bytes:
    return _DV_MAGIC.to_bytes(4, "little") + rbm_array_serialize(values)


def dv_data_decode(data: bytes) -> list[int]:
    if len(data) < 4 or int.from_bytes(data[:4], "little") != _DV_MAGIC:
        raise ValueError("deletion vector magic mismatch")
    return rbm_array_deserialize(data[4:])


def _parse_dv_descriptor(dv) -> dict:
    if not isinstance(dv, dict):
        raise ValueError("deletionVector descriptor malformed")
    st = dv.get("storageType")
    if st not in ("u", "i", "p"):
        raise ValueError("deletionVector storageType unknown")
    if st == "p":
        raise ValueError(
            "absolute-path deletion vectors unsupported (boundary)"
        )
    raw = dv.get("pathOrInlineDv")
    if not isinstance(raw, str) or not raw:
        raise ValueError("deletionVector pathOrInlineDv malformed")
    size = dv.get("sizeInBytes")
    card = dv.get("cardinality")
    for v, what in ((size, "sizeInBytes"), (card, "cardinality")):
        if (
            not isinstance(v, int) or isinstance(v, bool)
            or not 0 <= v <= _DV_SIZE_CAP
        ):
            raise ValueError(f"deletionVector {what} malformed")
    off = dv.get("offset")
    if st == "u":
        if (
            not isinstance(off, int) or isinstance(off, bool)
            or not 0 <= off < 2**31
        ):
            raise ValueError("deletionVector offset malformed")
    elif off is not None:
        raise ValueError("inline deletionVector with offset")
    return {
        "storageType": st,
        "pathOrInlineDv": raw,
        "offset": off,
        "sizeInBytes": size,
        "cardinality": card,
    }


def _dv_relative_path(token: str) -> str:
    """storageType "u" pathOrInlineDv -> bundle-relative file name:
    the last 20 chars are the z85 uuid, anything before is the
    writer's scatter prefix (a directory)."""
    import uuid as _uuid

    if len(token) < 20:
        raise ValueError("deletion vector path token too short")
    prefix, enc = token[:-20], token[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc))
    name = f"deletion_vector_{u}.bin"
    if not prefix:
        return name
    if "/" in prefix or "\\" in prefix or ".." in prefix:
        raise ValueError("deletion vector prefix malformed")
    return f"{prefix}/{name}"


def _dv_positions(files: dict[str, bytes], dv: dict) -> list[int]:
    """Resolve + decode one descriptor to ascending row positions,
    cross-checking every size/checksum/cardinality the format
    declares."""
    import zlib

    if dv["storageType"] == "i":
        decoded = z85_decode(dv["pathOrInlineDv"])
        size = dv["sizeInBytes"]
        if not size <= len(decoded) < size + 4:
            raise ValueError("inline deletion vector size disagrees")
        if any(decoded[size:]):
            raise ValueError("inline deletion vector padding not zero")
        data = decoded[:size]
    else:
        blob = files.get(_dv_relative_path(dv["pathOrInlineDv"]))
        if blob is None:
            raise ValueError("deletion vector file missing from bundle")
        if not blob or blob[0] != 1:
            raise ValueError("deletion vector file version unsupported")
        off = dv["offset"]
        if off + 4 > len(blob):
            raise ValueError("deletion vector offset past file end")
        size = int.from_bytes(blob[off : off + 4], "big")
        if size != dv["sizeInBytes"]:
            raise ValueError("deletion vector size disagrees with descriptor")
        end = off + 4 + size
        if end + 4 > len(blob):
            raise ValueError("deletion vector data truncated")
        data = blob[off + 4 : end]
        crc = int.from_bytes(blob[end : end + 4], "big")
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError("deletion vector checksum mismatch")
    positions = dv_data_decode(data)
    if len(positions) != dv["cardinality"]:
        raise ValueError("descriptor cardinality disagrees with bitmap")
    return positions


def synth_delta_dv_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracle: ``n = 4 + seed%3`` data files,
    file i with ``rows_i = 50 + (seed+i)%50`` rows of ``v = lo_i + r``
    (``lo_i = i*1000 + seed%100``).  Deletion vectors: slot 0 INLINE
    (positions ``r%5 == seed%5`` — array container, carried by the
    CHECKPOINT itself), slot 1 file-based (v2 deletes ``r%7 ==
    seed%7``; v3 RE-ADDS the file with a superseding DV deleting
    ``r%7 in {seed%7, (seed+1)%7}`` — last-add-wins), slot 2
    file-based sharing slot 1's v2 ``.bin`` at a second offset
    (positions ``10..15+seed%9`` — run container).  Slots 3+ carry no
    DV."""
    n = 4 + seed % 3
    rows = [50 + (seed + i) % 50 for i in range(n)]
    lo = [i * 1000 + seed % 100 for i in range(n)]
    d0 = [r for r in range(rows[0]) if r % 5 == seed % 5]
    d1a = [r for r in range(rows[1]) if r % 7 == seed % 7]
    d1b = [
        r for r in range(rows[1])
        if r % 7 in (seed % 7, (seed + 1) % 7)
    ]
    d2 = list(range(10, 16 + seed % 9))
    deleted = len(d0) + len(d1b) + len(d2)
    total = sum(rows)
    surviving = sum(
        lo[i] * rows[i] + rows[i] * (rows[i] - 1) // 2 for i in range(n)
    )
    surviving -= sum(lo[0] + r for r in d0)
    surviving -= sum(lo[1] + r for r in d1b)
    surviving -= sum(lo[2] + r for r in d2)
    return {
        "n": n,
        "rows": rows,
        "lo": lo,
        "d0": d0,
        "d1a": d1a,
        "d1b": d1b,
        "d2": d2,
        "total_rows": total,
        "deleted_rows": deleted,
        "live_rows": total - deleted,
        "surviving_v_sum": surviving,
        "replaced_dv_cardinality": len(d1b),
    }


def _dv_file_entry(values: list[int], run: bool = False) -> bytes:
    """``<dataSize BE><data><crc32(data) BE>`` for one stored DV."""
    import zlib

    if run:
        lows = [(0, values, True)]
        data = (
            _DV_MAGIC.to_bytes(4, "little")
            + (1).to_bytes(8, "little")
            + (0).to_bytes(4, "little")
            + _roaring32_serialize(lows)
        )
    else:
        data = dv_data_encode(values)
    return (
        len(data).to_bytes(4, "big")
        + data
        + (zlib.crc32(data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def synth_delta_dv(seed: int) -> bytes:
    """A reader-version-3 Delta table exercising every supported DV
    surface: checkpoint-carried inline DV, two stored DVs sharing one
    ``.bin`` at different offsets, a run-container bitmap, and a DV
    superseded by a later re-add."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    plan = synth_delta_dv_plan(seed)
    n = plan["n"]
    files: dict[str, bytes] = {}

    adds = []
    for i in range(n):
        rows, lo = plan["rows"][i], plan["lo"][i]
        buf = io.BytesIO()
        pq.write_table(pa.table({"v": [lo + r for r in range(rows)]}), buf)
        path = f"part-{i:05d}.parquet"
        files[path] = buf.getvalue()
        adds.append(
            {
                "path": path,
                "size": len(files[path]),
                "dataChange": True,
                "stats": json.dumps(
                    {
                        "numRecords": rows,
                        "minValues": {"v": lo},
                        "maxValues": {"v": lo + rows - 1},
                    }
                ),
            }
        )

    def dv_descriptor(st: str, token: str, offset, data_len: int,
                      card: int) -> dict:
        return {
            "storageType": st,
            "pathOrInlineDv": token,
            "offset": offset,
            "sizeInBytes": data_len,
            "cardinality": card,
        }

    # slot 0: inline DV, zero-padded to the z85 4-byte alignment
    d0_data = dv_data_encode(plan["d0"])
    pad = (-len(d0_data)) % 4
    inline_token = z85_encode(d0_data + b"\x00" * pad)
    dv0 = dv_descriptor("i", inline_token, None, len(d0_data),
                        len(plan["d0"]))

    # shared .bin #1: slot 1's v2 DV at offset 1, slot 2's run DV after
    uuid_a = bytes((seed + 11 * j) % 256 for j in range(16))
    entry_1a = _dv_file_entry(plan["d1a"])
    entry_2 = _dv_file_entry(plan["d2"], run=True)
    files[_dv_relative_path("ab" + z85_encode(uuid_a))] = (
        b"\x01" + entry_1a + entry_2
    )
    dv1a = dv_descriptor("u", "ab" + z85_encode(uuid_a), 1,
                         len(entry_1a) - 8, len(plan["d1a"]))
    dv2 = dv_descriptor("u", "ab" + z85_encode(uuid_a),
                        1 + len(entry_1a), len(entry_2) - 8,
                        len(plan["d2"]))

    # .bin #2 (no scatter prefix): slot 1's superseding v3 DV
    uuid_b = bytes((seed + 17 * j + 5) % 256 for j in range(16))
    entry_1b = _dv_file_entry(plan["d1b"])
    files[_dv_relative_path(z85_encode(uuid_b))] = b"\x01" + entry_1b
    dv1b = dv_descriptor("u", z85_encode(uuid_b), 1,
                         len(entry_1b) - 8, len(plan["d1b"]))

    meta = {
        "id": f"00000000-0000-4000-8000-{seed:012d}",
        "schemaString": json.dumps(
            {
                "type": "struct",
                "fields": [
                    {"name": "v", "type": "long", "nullable": False,
                     "metadata": {}}
                ],
            }
        ),
        "configuration": {"fixture.replaced": "part-00001.parquet"},
    }
    protocol = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }
    # checkpoint at version 1: slot 0 already carries its inline DV
    cp_adds = []
    for i, a in enumerate(adds):
        entry = {"path": a["path"], "size": a["size"], "stats": a["stats"]}
        entry["deletionVector"] = dv0 if i == 0 else None
        cp_adds.append(entry)
    n_actions = 2 + len(cp_adds)
    cp = pa.table(
        {
            "metaData": [meta] + [None] * (n_actions - 1),
            "protocol": [None, protocol] + [None] * (n_actions - 2),
            "add": [None, None] + cp_adds,
        }
    )
    buf = io.BytesIO()
    pq.write_table(cp, buf)
    files[f"{_LOG}/{1:020d}.checkpoint.parquet"] = buf.getvalue()
    files[f"{_LOG}/_last_checkpoint"] = json.dumps(
        {"version": 1, "size": n_actions}
    ).encode()

    # v2: DVs land on slots 1 and 2 (re-adds with descriptors)
    v2 = [
        json.dumps({"commitInfo": {"operation": "DELETE"}}),
        json.dumps({"add": {**adds[1], "deletionVector": dv1a}}),
        json.dumps({"add": {**adds[2], "deletionVector": dv2}}),
    ]
    files[f"{_LOG}/{2:020d}.json"] = ("\n".join(v2) + "\n").encode()
    # v3: slot 1's DV grows — the re-add supersedes v2's descriptor
    v3 = [
        json.dumps({"commitInfo": {"operation": "DELETE"}}),
        json.dumps({"add": {**adds[1], "deletionVector": dv1b}}),
    ]
    files[f"{_LOG}/{3:020d}.json"] = ("\n".join(v3) + "\n").encode()
    return write_tar_bundle(files)


def scan_delta_dv(payload: bytes) -> dict:
    """Merge-on-read over deletion vectors: reconstruct the snapshot
    (checkpoint + replay), decode each live file's DV, and serve
    row-level results with deleted positions masked out.  Every
    declared size, checksum, and cardinality is cross-checked; a
    position at or past the file's row count loud-rejects."""
    import pyarrow.parquet as pq

    files = read_tar_bundle(payload)
    state, cp_version, current, replayed, _fac = _replay_log(
        files, require_stats=True, allow_dv=True
    )
    if not state.adds:
        raise ValueError("current snapshot has no live files")
    if state.min_reader != _DV_READER_VERSION:
        raise ValueError("deletion-vector fixture must be reader v3")
    replaced_path = state.configuration.get("fixture.replaced")
    if not isinstance(replaced_path, str):
        raise ValueError("table configuration missing the replaced path")
    live = sorted(state.adds.items())
    total_rows = deleted_rows = surviving = 0
    files_with_dv = inline_dvs = file_dvs = 0
    replaced_card = -1
    for path, (st, _pv, dv) in live:
        blob = files.get(path)
        if blob is None:
            raise ValueError(f"data file {path!r} missing from bundle")
        try:
            table = read_parquet_blob(blob)
        except Exception as e:
            raise ValueError(f"data file unreadable: {e}") from None
        if st is not None and table.num_rows != st[0]:
            raise ValueError(
                f"stats numRecords {st[0]} != parquet rows {table.num_rows}"
            )
        if "v" not in table.column_names:
            raise ValueError("data file missing the value column")
        values = table.column("v").to_pylist()
        if not all(isinstance(v, int) for v in values):
            raise ValueError("data value not an integer")
        total_rows += table.num_rows
        if dv is None:
            surviving += sum(values)
            continue
        files_with_dv += 1
        if dv["storageType"] == "i":
            inline_dvs += 1
        else:
            file_dvs += 1
        positions = _dv_positions(files, dv)
        if positions and positions[-1] >= table.num_rows:
            raise ValueError("deleted position past file rows")
        deleted_rows += len(positions)
        pset = set(positions)
        surviving += sum(
            v for r, v in enumerate(values) if r not in pset
        )
        if path == replaced_path:
            replaced_card = len(positions)
    if replaced_card < 0:
        raise ValueError("replaced file missing a deletion vector")
    for total in (total_rows, deleted_rows, surviving):
        if not -(2**63) <= total < 2**63:
            raise ValueError("delta dv aggregate overflows int64")
    return {
        "checkpoint_version": cp_version,
        "current_version": current,
        "json_commits_replayed": replayed,
        "live_files": len(live),
        "files_with_dv": files_with_dv,
        "inline_dvs": inline_dvs,
        "file_dvs": file_dvs,
        "min_reader_version": state.min_reader,
        "total_rows": total_rows,
        "deleted_rows": deleted_rows,
        "live_rows": total_rows - deleted_rows,
        "surviving_v_sum": surviving,
        "replaced_dv_cardinality": replaced_card,
    }


# ---------------------------------------------------------------------------
# column mapping (reader version 2: modes "name" and "id")
# ---------------------------------------------------------------------------
# PROTOCOL.md "Column Mapping": once delta.columnMapping.mode is
# name/id, the parquet files no longer carry the table's LOGICAL
# column names — each schema field's metadata records
# ``delta.columnMapping.physicalName`` (a uuid-flavored name the
# files actually use) and ``delta.columnMapping.id`` (the parquet
# field_id to resolve by in id mode).  Per-column statistics in add
# actions are keyed by PHYSICAL names.  A reader that projects by
# logical name gets a missing column (best case) or, after a rename
# recycles a name, silently the WRONG column — which is why the
# protocol gates the feature behind minReaderVersion 2.


def _parse_mapping_schema(raw) -> dict[str, tuple[int, str]]:
    """metaData.schemaString -> {logical name: (mapping id,
    physical name)} with every invariant enforced: ids positive and
    unique, physical names non-empty and unique."""
    if not isinstance(raw, str):
        raise ValueError("mapped metaData without schemaString")
    try:
        schema = json.loads(raw)
    except json.JSONDecodeError as e:
        raise ValueError(f"schemaString not JSON: {e}") from None
    if not isinstance(schema, dict) or schema.get("type") != "struct":
        raise ValueError("schemaString not a struct schema")
    fields = schema.get("fields")
    if not isinstance(fields, list) or not fields:
        raise ValueError("schemaString without fields")
    if len(fields) > 10000:
        raise ValueError("schemaString field count past cap")
    out: dict[str, tuple[int, str]] = {}
    seen_ids: set[int] = set()
    seen_phys: set[str] = set()
    for f in fields:
        if not isinstance(f, dict):
            raise ValueError("schema field malformed")
        name = f.get("name")
        md = f.get("metadata")
        if not isinstance(name, str) or not name or not isinstance(md, dict):
            raise ValueError("schema field malformed")
        cid = md.get("delta.columnMapping.id")
        phys = md.get("delta.columnMapping.physicalName")
        if (
            not isinstance(cid, int) or isinstance(cid, bool) or cid < 1
            or not isinstance(phys, str) or not phys
        ):
            raise ValueError("column mapping metadata malformed")
        if cid in seen_ids or phys in seen_phys or name in out:
            raise ValueError("column mapping ids/names not unique")
        seen_ids.add(cid)
        seen_phys.add(phys)
        out[name] = (cid, phys)
    return out


def synth_delta_cm_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracle: mode = name (even seed) / id
    (odd seed); ``n = 3 + seed%3`` files, file i holding
    ``rows_i = 30 + (seed+i)%40`` contiguous values ``lo_i .. ``
    (``lo_i = i*500 + seed%50``); probe = ``lo_k + 7`` with
    ``k = seed%n`` → disjoint windows prune all but one file."""
    n = 3 + seed % 3
    k = seed % n
    rows = [30 + (seed + i) % 40 for i in range(n)]
    lo = [i * 500 + seed % 50 for i in range(n)]
    return {
        "mode": ("name", "id")[seed % 2],
        "n": n,
        "rows": rows,
        "lo": lo,
        "probe": lo[k] + 7,
        "rows_scanned": rows[k],
        "total_rows": sum(rows),
        "sum_v": sum(
            lo[i] * rows[i] + rows[i] * (rows[i] - 1) // 2
            for i in range(n)
        ),
    }


def synth_delta_cm(seed: int) -> bytes:
    """A reader-version-2 table: physical parquet columns named
    ``col-<uuid>`` (never the logical ``v``), stats keyed by the
    physical name, and — in id mode — a decoy column so ordinal
    shortcuts fail and only field_id resolution survives."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    plan = synth_delta_cm_plan(seed)
    n, mode = plan["n"], plan["mode"]
    phys = f"col-{seed:08x}-aaaa-4bbb-8ccc-d{seed % 10}e2f3a4b5c6"
    decoy = f"col-{seed + 1:08x}-dddd-4eee-8fff-0123456789ab"
    files: dict[str, bytes] = {}
    adds = []
    for i in range(n):
        rows, lo = plan["rows"][i], plan["lo"][i]
        vals = [lo + r for r in range(rows)]
        if mode == "id":
            schema = pa.schema(
                [
                    pa.field(decoy, pa.int64(),
                             metadata={b"PARQUET:field_id": b"99"}),
                    pa.field(phys, pa.int64(),
                             metadata={b"PARQUET:field_id": b"1"}),
                ]
            )
            table = pa.table(
                {decoy: [0] * rows, phys: vals}, schema=schema
            )
        else:
            table = pa.table({phys: vals})
        buf = io.BytesIO()
        pq.write_table(table, buf)
        path = f"part-{i:05d}.parquet"
        files[path] = buf.getvalue()
        adds.append(
            {
                "path": path,
                "size": len(files[path]),
                "dataChange": True,
                "stats": json.dumps(
                    {
                        "numRecords": rows,
                        "minValues": {phys: lo},
                        "maxValues": {phys: lo + rows - 1},
                    }
                ),
            }
        )
    meta = {
        "id": f"00000000-0000-4000-8000-{seed:012d}",
        "schemaString": json.dumps(
            {
                "type": "struct",
                "fields": [
                    {
                        "name": "v",
                        "type": "long",
                        "nullable": False,
                        "metadata": {
                            "delta.columnMapping.id": 1,
                            "delta.columnMapping.physicalName": phys,
                        },
                    }
                ],
            }
        ),
        "configuration": {
            "delta.columnMapping.mode": mode,
            "delta.columnMapping.maxColumnId": "1",
            "fixture.probe": str(plan["probe"]),
        },
    }
    protocol = {"minReaderVersion": 2, "minWriterVersion": 5}
    lines = [
        json.dumps({"commitInfo": {"operation": "WRITE"}}),
        json.dumps({"protocol": protocol}),
        json.dumps({"metaData": meta}),
    ] + [json.dumps({"add": a}) for a in adds]
    files[f"{_LOG}/{0:020d}.json"] = ("\n".join(lines) + "\n").encode()
    return write_tar_bundle(files)


def scan_delta_cm(payload: bytes) -> dict:
    """Column-mapped snapshot scan: resolve the logical ``v`` to its
    physical column (by name in name mode, by parquet ``field_id``
    in id mode), prune by physically-keyed stats, and serve the
    point lookup.  The logical name must NOT appear in any data file
    (asserted — that is the whole point of the feature), and in id
    mode the field-id match must agree with the declared
    physicalName."""
    import pyarrow.parquet as pq

    files = read_tar_bundle(payload)
    blob = files.get(f"{_LOG}/{0:020d}.json")
    if blob is None:
        raise ValueError("version-0 commit missing (boundary)")
    if len(blob) > 1 << 24:
        raise ValueError("commit JSON exceeds size cap")
    state = _State(require_stats=True, allow_cm=True)
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
    if state.mapping_mode is None:
        raise ValueError("column-mapping fixture without the mode set")
    if not state.adds:
        raise ValueError("current snapshot has no live files")
    cid, phys = state.column_mapping["v"]
    probe = _probe_from_config(state)
    live = sorted(state.adds.items())
    survivor_paths = {
        path for path, (st, _pv, _dv) in live
        if st[1] <= probe <= st[2]
    }
    rows_scanned = matches = 0
    total_rows = sum_v = 0
    for path, (st, _pv, _dv) in live:
        if state.mapping_mode == "name":
            vals = _read_mapped_column(files, path, st, phys)
            total_rows += len(vals)
            sum_v += sum(vals)
            if path in survivor_paths:
                rows_scanned += len(vals)
                matches += sum(1 for v in vals if v == probe)
            continue
        blob = files.get(path)
        if blob is None:
            raise ValueError(f"data file {path!r} missing from bundle")
        try:
            table = read_parquet_blob(blob)
        except Exception as e:
            raise ValueError(f"data file unreadable: {e}") from None
        if "v" in table.column_names:
            raise ValueError("mapped data file carries the logical name")
        if table.num_rows != st[0]:
            raise ValueError(
                f"stats numRecords {st[0]} != parquet rows {table.num_rows}"
            )
        # id mode: resolve by parquet field_id
        matched = [
            f.name for f in table.schema
            if (f.metadata or {}).get(b"PARQUET:field_id")
            == str(cid).encode()
        ]
        if len(matched) != 1:
            raise ValueError("field_id resolution not unique")
        if matched[0] != phys:
            raise ValueError("field_id column disagrees with physicalName")
        vals = table.column(matched[0]).to_pylist()
        if not all(isinstance(v, int) for v in vals):
            raise ValueError("data value not an integer")
        total_rows += table.num_rows
        sum_v += sum(vals)
        if path in survivor_paths:
            rows_scanned += table.num_rows
            matches += sum(1 for v in vals if v == probe)
    for total in (total_rows, sum_v):
        if not -(2**63) <= total < 2**63:
            raise ValueError("delta cm aggregate overflows int64")
    return {
        "mapping_mode": state.mapping_mode,
        "min_reader_version": state.min_reader,
        "live_files": len(live),
        "files_pruned": len(live) - len(survivor_paths),
        "files_scanned": len(survivor_paths),
        "rows_scanned": rows_scanned,
        "probe_matches": matches,
        "total_rows": total_rows,
        "sum_v": sum_v,
    }


# ---------------------------------------------------------------------------
# time travel by version
# ---------------------------------------------------------------------------

def synth_delta_tt_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracle: the base table
    (:func:`synth_delta_plan` — checkpoint at v1, slot 0 replaced
    with +5 rows at v2) plus a v3 commit adding a brand-new slot
    ``n_live`` in its own value window.  The probe (slot ``k``'s
    window) therefore matches MORE rows from v2 on iff ``k == 0``,
    and the new v3 file never affects it."""
    base = synth_delta_plan(seed)
    n_live = base["n_live"]
    k = base["probe_slot"]
    rows_k_v1 = _file_rows(seed, k)
    rows_k_v2 = rows_k_v1 + (5 if k == 0 else 0)
    total_v1 = sum(_file_rows(seed, i) for i in range(n_live))
    return {
        "n_live": n_live,
        "total_rows_v1": total_v1,
        "total_rows_v2": total_v1 + 5,
        "total_rows_current": total_v1 + 5 + _file_rows(seed, n_live),
        "probe_matches_v1": (rows_k_v1 - 18) // 40 + 1,
        "probe_matches_current": (rows_k_v2 - 18) // 40 + 1,
    }


def synth_delta_tt(seed: int) -> bytes:
    """The base bundle plus a version-3 commit that adds one fresh
    file — three distinct readable versions (1 = checkpoint,
    2 = replace, 3 = append)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    files = dict(read_tar_bundle(synth_delta(seed)))
    plan = synth_delta_plan(seed)
    j = plan["n_live"]
    rows, lo = _file_rows(seed, j), _file_lo(seed, j)
    add = _write_data_file(files, f"part-{j:05d}.parquet", rows, lo)
    files[f"{_LOG}/{3:020d}.json"] = (
        json.dumps({"commitInfo": {"operation": "WRITE"}})
        + "\n"
        + json.dumps({"add": add})
        + "\n"
    ).encode()
    return write_tar_bundle(files)


def scan_delta_time_travel(payload: bytes) -> dict:
    """Serve the SAME point lookup at every version in the log
    (checkpoint state, then after each replayed commit) — the
    reproducibility primitive ("rerun the job exactly as the table
    stood at version V").  Each version's snapshot is the replay
    trace; planning and the parquet scan run per version, so a
    reader that unions history or applies later removes
    retroactively breaks the per-version counts."""
    files = read_tar_bundle(payload)
    trace: list = []
    state, cp_version, current, replayed, _fac = _replay_log(
        files, require_stats=True, trace=trace
    )
    if not state.adds:
        raise ValueError("current snapshot has no live files")
    if not 2 <= len(trace) <= 64:
        # CPU fence: each version costs a planning pass + parquet
        # reads, and the version count is attacker-declared
        raise ValueError("time travel needs 2..64 versions (boundary)")
    probe = _probe_from_config(state)
    per = []
    # a file live across K versions is byte-identical at each, so
    # one read serves them all; the memo key carries the declared
    # numRecords so a (corrupt) re-add with drifted stats still
    # re-reads and hits the cross-check inside the scan
    memo: dict[tuple[str, int], int] = {}
    for _version, adds in trace:
        live = sorted(adds.items())
        total = 0
        matches = 0
        for path, (st, _pv, _dv) in live:
            if st is None:
                raise ValueError("time travel needs stats on every add")
            total += st[0]
            if st[1] <= probe <= st[2]:
                key = (path, st[0])
                if key not in memo:
                    memo[key] = _scan_parquet_matches(
                        files, path, probe, st[0]
                    )[1]
                matches += memo[key]
        per.append((len(live), total, matches))
        if not 0 <= total < 2**63:
            raise ValueError("delta tt total overflows int64 (boundary)")
    first, mid, last = per[0], per[1], per[-1]
    return {
        "checkpoint_version": cp_version,
        "current_version": current,
        "versions_readable": len(trace),
        "live_files_v1": first[0],
        "live_files_current": last[0],
        "total_rows_v1": first[1],
        "total_rows_v2": mid[1],
        "total_rows_current": last[1],
        "probe_matches_v1": first[2],
        "probe_matches_current": last[2],
    }


# ---------------------------------------------------------------------------
# v2 checkpoints (reader feature "v2Checkpoint"): UUID-named
# checkpoint + checkpointMetadata action + sidecar parquet files
# ---------------------------------------------------------------------------

def _apply_v2_checkpoint(
    files: dict[str, bytes],
    cp,
    cols: list[str],
    cp_version: int,
    state: _State,
    inline_actions: list,
) -> None:
    """PROTOCOL.md "V2 Checkpoints": the checkpoint parquet must
    carry exactly one ``checkpointMetadata`` action whose version
    matches the file name; file actions live EITHER inline OR in
    ``sidecar``-referenced parquet files under ``_sidecars/`` —
    never both."""
    import pyarrow.parquet as pq

    if "v2Checkpoint" not in state.reader_features:
        raise ValueError("v2 checkpoint without the protocol feature")
    if "checkpointMetadata" not in cols:
        raise ValueError("v2 checkpoint missing checkpointMetadata")
    metas = [
        b for b in cp.column("checkpointMetadata").to_pylist()
        if b is not None
    ]
    if len(metas) != 1 or not isinstance(metas[0], dict):
        raise ValueError("v2 checkpoint needs exactly one "
                         "checkpointMetadata action")
    if metas[0].get("version") != cp_version:
        raise ValueError("checkpointMetadata version disagrees "
                         "with the file name")
    sidecars = []
    if "sidecar" in cols:
        for sc in cp.column("sidecar").to_pylist():
            if sc is None:
                continue
            if not isinstance(sc, dict):
                raise ValueError("sidecar action malformed")
            spath = sc.get("path")
            if (
                not isinstance(spath, str) or not spath
                or "/" in spath or "\\" in spath or ".." in spath
            ):
                raise ValueError("sidecar path malformed")
            sidecars.append((spath, sc.get("sizeInBytes")))
    if len(sidecars) > 64:
        raise ValueError("sidecar count past cap (boundary)")
    if sidecars and inline_actions:
        raise ValueError(
            "v2 checkpoint mixes inline and sidecar file actions"
        )
    if not sidecars:
        for action in inline_actions:
            state.apply(action)
        return
    for spath, declared in sidecars:
        blob = files.get(f"{_LOG}/_sidecars/{spath}")
        if blob is None:
            raise ValueError(f"sidecar {spath!r} missing from log")
        if declared is not None and declared != len(blob):
            raise ValueError("sidecar sizeInBytes disagrees")
        try:
            table = read_parquet_blob(blob)
        except Exception as e:
            raise ValueError(f"sidecar unreadable: {e}") from None
        for kind in ("add", "remove"):
            if kind not in table.column_names:
                continue
            for body in table.column(kind).to_pylist():
                if body is not None:
                    state.apply({kind: body})
        state.sidecar_files += 1


def synth_delta_v2cp_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracle: ``n = 4 + seed%3`` slots (the
    base window arithmetic — slot i holds ``rows_i = 40+(seed+i)%60``
    values ``lo_i + (r%40)``); adds split across TWO sidecars; the
    v2 JSON commit replaces slot 0 with ``rows_0 + 5`` rows; probe
    ``lo_k + 17``, ``k = seed%n``."""
    n = 4 + seed % 3
    k = seed % n
    rows_k = _file_rows(seed, k) + (5 if k == 0 else 0)
    return {
        "n": n,
        "probe": _file_lo(seed, k) + 17,
        "rows_scanned": rows_k,
        "probe_matches": (rows_k - 18) // 40 + 1,
        "total_live_rows": sum(
            _file_rows(seed, i) for i in range(n)
        ) + 5,
    }


def synth_delta_v2cp(seed: int) -> bytes:
    """A v2-checkpoint table: UUID-named checkpoint parquet carrying
    protocol (v3 + v2Checkpoint) / metaData / checkpointMetadata /
    two sidecar pointers; the add actions live in the sidecar
    parquets; one post-checkpoint JSON commit replaces slot 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    plan = synth_delta_v2cp_plan(seed)
    n = plan["n"]
    files: dict[str, bytes] = {}

    def write_data(path: str, rows: int, lo: int) -> dict:
        return _write_data_file(files, path, rows, lo)

    adds = [
        write_data(
            f"part-{i:05d}.parquet", _file_rows(seed, i),
            _file_lo(seed, i),
        )
        for i in range(n)
    ]

    def sidecar(name: str, slice_) -> dict:
        buf = io.BytesIO()
        pq.write_table(
            pa.table(
                {"add": [
                    {"path": a["path"], "size": a["size"],
                     "stats": a["stats"]}
                    for a in slice_
                ]}
            ),
            buf,
        )
        files[f"{_LOG}/_sidecars/{name}"] = buf.getvalue()
        return {
            "path": name,
            "sizeInBytes": len(files[f"{_LOG}/_sidecars/{name}"]),
        }

    half = (n + 1) // 2
    sc_a = sidecar(f"sc-{seed:08d}-a.parquet", adds[:half])
    sc_b = sidecar(f"sc-{seed:08d}-b.parquet", adds[half:])

    meta = {
        "id": f"00000000-0000-4000-8000-{seed:012d}",
        "schemaString": json.dumps(
            {
                "type": "struct",
                "fields": [
                    {"name": "v", "type": "long", "nullable": False,
                     "metadata": {}}
                ],
            }
        ),
        "configuration": {"fixture.probe": str(plan["probe"])},
    }
    protocol = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint"],
        "writerFeatures": ["v2Checkpoint"],
    }
    cp = pa.table(
        {
            "metaData": [meta, None, None, None, None],
            "protocol": [None, protocol, None, None, None],
            "checkpointMetadata": [None, None, {"version": 1},
                                   None, None],
            "sidecar": [None, None, None, sc_a, sc_b],
        }
    )
    buf = io.BytesIO()
    pq.write_table(cp, buf)
    uuid = f"00000000-0000-4000-8000-{seed:012d}"
    files[f"{_LOG}/{1:020d}.checkpoint.{uuid}.parquet"] = buf.getvalue()
    files[f"{_LOG}/_last_checkpoint"] = json.dumps(
        {"version": 1, "size": 5}
    ).encode()
    repl = write_data(
        "part-r0000.parquet", _file_rows(seed, 0) + 5, _file_lo(seed, 0)
    )
    files[f"{_LOG}/{2:020d}.json"] = (
        json.dumps({"commitInfo": {"operation": "WRITE"}})
        + "\n"
        + json.dumps(
            {
                "remove": {
                    "path": "part-00000.parquet",
                    "deletionTimestamp": 1700000000000 + seed,
                    "dataChange": True,
                }
            }
        )
        + "\n"
        + json.dumps({"add": repl})
        + "\n"
    ).encode()
    return write_tar_bundle(files)


def scan_delta_v2cp(payload: bytes) -> dict:
    """Snapshot scan through a V2 CHECKPOINT: sidecar-held file
    actions, checkpointMetadata agreement, the v2Checkpoint protocol
    feature handshake, then the usual stats-pruned point lookup with
    one replayed commit on top."""
    files = read_tar_bundle(payload)
    state, cp_version, current, replayed, _fac = _replay_log(
        files, require_stats=True, allow_v2cp=True
    )
    if not state.adds:
        raise ValueError("current snapshot has no live files")
    if "v2Checkpoint" not in state.reader_features:
        raise ValueError("v2 fixture must declare the feature")
    live = sorted(state.adds.items())
    probe = _probe_from_config(state)
    n_survivors, rows_scanned, matches, total = _stats_point_lookup(
        files, live, probe
    )
    return {
        "checkpoint_version": cp_version,
        "current_version": current,
        "json_commits_replayed": replayed,
        "sidecar_files": state.sidecar_files,
        "live_files": len(live),
        "min_reader_version": state.min_reader,
        "files_pruned": len(live) - n_survivors,
        "files_scanned": n_survivors,
        "rows_scanned": rows_scanned,
        "total_live_rows": total,
        "probe_matches": matches,
    }


# ---------------------------------------------------------------------------
# feature composition: deletion vectors ON a column-mapped table
# ---------------------------------------------------------------------------

def synth_delta_dvcm_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracle: ``n = 3 + seed%2`` files, file
    i holding ``rows_i = 40 + (seed+i)%30`` contiguous values
    ``lo_i .. `` (``lo_i = i*500 + seed%50``) under a NAME-mapped
    physical column; file 0 carries an inline DV deleting positions
    ``r%6 == seed%6``; probe = ``lo_0 + seed%6 + 1`` (a KEPT
    position next to a deleted one)."""
    n = 3 + seed % 2
    rows = [40 + (seed + i) % 30 for i in range(n)]
    lo = [i * 500 + seed % 50 for i in range(n)]
    d0 = [r for r in range(rows[0]) if r % 6 == seed % 6]
    surviving = sum(
        lo[i] * rows[i] + rows[i] * (rows[i] - 1) // 2 for i in range(n)
    ) - sum(lo[0] + r for r in d0)
    return {
        "n": n,
        "rows": rows,
        "lo": lo,
        "d0": d0,
        "probe": lo[0] + seed % 6 + 1,
        "total_rows": sum(rows),
        "deleted_rows": len(d0),
        "live_rows": sum(rows) - len(d0),
        "surviving_v_sum": surviving,
    }


def synth_delta_dvcm(seed: int) -> bytes:
    """Reader v3 + readerFeatures [deletionVectors, columnMapping]:
    uuid-named physical columns, physically-keyed stats, and an
    inline DV on file 0 — the composed shape a modern Databricks
    writer emits."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    plan = synth_delta_dvcm_plan(seed)
    n = plan["n"]
    phys = f"col-{seed:08x}-beef-4abc-8def-a{seed % 10}b2c3d4e5f6"
    files: dict[str, bytes] = {}
    adds = []
    for i in range(n):
        rows, lo = plan["rows"][i], plan["lo"][i]
        buf = io.BytesIO()
        pq.write_table(
            pa.table({phys: [lo + r for r in range(rows)]}), buf
        )
        path = f"part-{i:05d}.parquet"
        files[path] = buf.getvalue()
        adds.append(
            {
                "path": path,
                "size": len(files[path]),
                "dataChange": True,
                "stats": json.dumps(
                    {
                        "numRecords": rows,
                        "minValues": {phys: lo},
                        "maxValues": {phys: lo + rows - 1},
                    }
                ),
            }
        )
    d0_data = dv_data_encode(plan["d0"])
    pad = (-len(d0_data)) % 4
    adds[0]["deletionVector"] = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(d0_data + b"\x00" * pad),
        "sizeInBytes": len(d0_data),
        "cardinality": len(plan["d0"]),
    }
    meta = {
        "id": f"00000000-0000-4000-8000-{seed:012d}",
        "schemaString": json.dumps(
            {
                "type": "struct",
                "fields": [
                    {
                        "name": "v",
                        "type": "long",
                        "nullable": False,
                        "metadata": {
                            "delta.columnMapping.id": 1,
                            "delta.columnMapping.physicalName": phys,
                        },
                    }
                ],
            }
        ),
        "configuration": {
            "delta.columnMapping.mode": "name",
            "fixture.probe": str(plan["probe"]),
        },
    }
    protocol = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors", "columnMapping"],
        "writerFeatures": ["deletionVectors", "columnMapping"],
    }
    lines = [
        json.dumps({"commitInfo": {"operation": "WRITE"}}),
        json.dumps({"protocol": protocol}),
        json.dumps({"metaData": meta}),
    ] + [json.dumps({"add": a}) for a in adds]
    files[f"{_LOG}/{0:020d}.json"] = ("\n".join(lines) + "\n").encode()
    return write_tar_bundle(files)


def _read_mapped_column(
    files: dict[str, bytes], path: str, st, phys: str
) -> list[int]:
    """Shared name-mode checked read (review pass 3 — the fence
    block had grown three copies): fetch, parquet-quarantine,
    logical-name-absent, physical-column-present, footer-vs-stats,
    and int-typed values."""
    import pyarrow.parquet as pq

    blob = files.get(path)
    if blob is None:
        raise ValueError(f"data file {path!r} missing from bundle")
    try:
        table = read_parquet_blob(blob)
    except Exception as e:
        raise ValueError(f"data file unreadable: {e}") from None
    if "v" in table.column_names:
        raise ValueError("mapped data file carries the logical name")
    if phys not in table.column_names:
        raise ValueError("physical column missing from data file")
    if table.num_rows != st[0]:
        raise ValueError(
            f"stats numRecords {st[0]} != parquet rows {table.num_rows}"
        )
    vals = table.column(phys).to_pylist()
    if not all(isinstance(v, int) for v in vals):
        raise ValueError("data value not an integer")
    return vals


def scan_delta_dvcm(payload: bytes) -> dict:
    """COMPOSED merge-on-read: resolve the logical column through
    the name mapping, then mask each file's deletion-vector
    positions — both features active in one scan, every cross-check
    from both paths retained."""
    import pyarrow.parquet as pq

    files = read_tar_bundle(payload)
    blob = files.get(f"{_LOG}/{0:020d}.json")
    if blob is None:
        raise ValueError("version-0 commit missing (boundary)")
    if len(blob) > 1 << 24:
        raise ValueError("commit JSON exceeds size cap")
    state = _State(require_stats=True, allow_dv=True, allow_cm=True)
    for line in blob.splitlines():
        if not line.strip():
            continue
        try:
            action = json.loads(line)
        except json.JSONDecodeError as e:
            raise ValueError(f"commit line not JSON: {e}") from None
        state.apply(action)
    if state.min_reader != _DV_READER_VERSION:
        raise ValueError("composed fixture must be reader v3")
    if state.mapping_mode != "name" or not state.adds:
        raise ValueError("composed fixture shape mismatch")
    _cid, phys = state.column_mapping["v"]
    probe = _probe_from_config(state)
    live = sorted(state.adds.items())
    total_rows = deleted_rows = surviving = 0
    files_with_dv = 0
    matches = 0
    for path, (st, _pv, dv) in live:
        vals = _read_mapped_column(files, path, st, phys)
        total_rows += len(vals)
        pset: set[int] = set()
        if dv is not None:
            files_with_dv += 1
            positions = _dv_positions(files, dv)
            if positions and positions[-1] >= len(vals):
                raise ValueError("deleted position past file rows")
            deleted_rows += len(positions)
            pset = set(positions)
        for r, v in enumerate(vals):
            if r in pset:
                continue
            surviving += v
            if v == probe:
                matches += 1
    for total in (total_rows, surviving):
        if not -(2**63) <= total < 2**63:
            raise ValueError("delta dvcm aggregate overflows int64")
    return {
        "mapping_mode": state.mapping_mode,
        "min_reader_version": state.min_reader,
        "live_files": len(live),
        "files_with_dv": files_with_dv,
        "total_rows": total_rows,
        "deleted_rows": deleted_rows,
        "live_rows": total_rows - deleted_rows,
        "surviving_v_sum": surviving,
        "probe_matches": matches,
    }


# ---------------------------------------------------------------------------
# change data feed (writer feature "changeDataFeed"): cdc actions +
# _change_data/ files, derived changes where no cdc was written
# ---------------------------------------------------------------------------

#: the four _change_type values PROTOCOL.md "Change Data Files" defines
_CDF_TYPES = ("insert", "delete", "update_preimage", "update_postimage")


def _fetch_parquet(files: dict[str, bytes], path: str, what: str):
    """Shared bundle-parquet fetch with the ValueError wrap (review
    r12 pass 1: the fetch/read/wrap block had grown three copies)."""
    import pyarrow.parquet as pq

    blob = files.get(path)
    if blob is None:
        raise ValueError(f"{what} {path!r} missing from bundle")
    try:
        return read_parquet_blob(blob)
    except Exception as e:
        raise ValueError(f"{what} unreadable: {e}") from None


def _read_v_values(
    files: dict[str, bytes], path: str, col: str = "v"
) -> list[int]:
    """One data file's value column (physical name when column
    mapping is active), integer-checked (the CDF scan needs full
    values for change sums, not just probe matches)."""
    table = _fetch_parquet(files, path, "data file")
    if col not in table.column_names:
        raise ValueError("data file missing the value column")
    vals = table.column(col).to_pylist()
    for v in vals:
        if not isinstance(v, int):
            raise ValueError("data value not an integer")
    return vals


def _read_cdc_file(
    files: dict[str, bytes], path: str, col: str = "v"
) -> list[tuple[int, str]]:
    """One change-data file: (value, _change_type) rows.  The spec
    (PROTOCOL.md "Add CDC File") puts change files under the table
    root — conventionally ``_change_data/`` — with the data schema
    (PHYSICAL column names when mapping is active) plus the
    ``_change_type`` column, which is reader metadata and unmapped."""
    table = _fetch_parquet(files, path, "cdc file")
    for want in (col, "_change_type"):
        if want not in table.column_names:
            raise ValueError(f"cdc file missing {want!r}")
    vals = table.column(col).to_pylist()
    types = table.column("_change_type").to_pylist()
    out = []
    for v, t in zip(vals, types):
        if not isinstance(v, int):
            raise ValueError("cdc value not an integer")
        if t not in _CDF_TYPES:
            raise ValueError(f"unknown _change_type {t!r}")
        out.append((v, t))
    return out


def synth_delta_cdf_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracle: version 0 adds ``n0 = 2 +
    seed%3`` files (slot i holds ``rows_i = 20 + (seed+i)%30``
    consecutive values ``lo_i + r``, ``lo_i = i*1000 + seed%100``);
    version 1 UPDATES the first ``u = 5 + seed%5`` rows of slot 0 by
    +7 via a cdc file (plus an add/remove pair the CDF reader must
    ignore); version 2 DELETES slot 1 with a bare dataChange remove
    (derived path); version 3 is a dataChange=false compaction
    (skipped)."""
    n0 = 2 + seed % 3
    u = 5 + seed % 5
    base = seed % 100
    rows = [20 + (seed + i) % 30 for i in range(n0)]
    los = [i * 1000 + base for i in range(n0)]
    pre_sum = u * los[0] + u * (u - 1) // 2
    return {
        "n0": n0,
        "u": u,
        "inserts": sum(rows),
        "insert_sum": sum(
            r * lo + r * (r - 1) // 2 for r, lo in zip(rows, los)
        ),
        "pre_sum": pre_sum,
        "post_sum": pre_sum + 7 * u,
        "deletes": rows[1],
        "delete_sum": rows[1] * los[1] + rows[1] * (rows[1] - 1) // 2,
    }


def _write_cdf_parquet(
    files: dict[str, bytes], path: str, values: list[int],
    change_types: list[str] | None = None, col: str = "v",
) -> int:
    """Fixture data/cdc parquet (consecutive values, no window mod —
    CDF sums need distinct values per row).  Returns the byte size."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols: dict = {col: values}
    if change_types is not None:
        cols["_change_type"] = change_types
    buf = io.BytesIO()
    pq.write_table(pa.table(cols), buf)
    files[path] = buf.getvalue()
    return len(files[path])


def synth_delta_cdf(seed: int) -> bytes:
    """One CDF-enabled Delta table as a tar bundle: four JSON
    commits (insert / cdc-update / derived-delete / no-op
    compaction), the ``_change_data/`` parquet, and every data file
    including the version-2 tombstone (not yet vacuumed — the
    derived-delete read path needs it)."""
    return _synth_cdf(seed, mapped=False)


def synth_delta_cdf_cm(seed: int) -> bytes:
    """The SAME four-commit change history on a COLUMN-MAPPED table
    (round 12 composition): reader v2, physical parquet column
    ``col-<uuid>`` everywhere — data files, the tombstone, AND the
    ``_change_data`` cdc file (``_change_type`` itself is reader
    metadata and stays unmapped per the protocol)."""
    return _synth_cdf(seed, mapped=True)


def _synth_cdf(seed: int, mapped: bool) -> bytes:
    plan = synth_delta_cdf_plan(seed)
    n0, u = plan["n0"], plan["u"]
    base = seed % 100
    files: dict[str, bytes] = {}
    col = f"col-{seed:08x}-cdfc-4abc-8def-a{seed % 10}b2c3d4e5f6" \
        if mapped else "v"
    field_meta = {
        "delta.columnMapping.id": 1,
        "delta.columnMapping.physicalName": col,
    } if mapped else {}
    config = {
        "delta.enableChangeDataFeed": "true",
        "fixture.cdf.start": "0",
        "fixture.cdf.end": "3",
    }
    if mapped:
        config["delta.columnMapping.mode"] = "name"
        config["delta.columnMapping.maxColumnId"] = "1"
    protocol = (
        {"minReaderVersion": 2, "minWriterVersion": 5}
        if mapped else {"minReaderVersion": 1, "minWriterVersion": 4}
    )

    def add_action(path: str, values: list[int], data_change: bool) -> str:
        size = _write_cdf_parquet(files, path, values, col=col)
        return json.dumps({
            "add": {
                "path": path,
                "size": size,
                "partitionValues": {},
                "dataChange": data_change,
            }
        })

    # version 0: protocol + metaData + the initial inserts
    v0 = [
        json.dumps({"commitInfo": {"operation": "WRITE"}}),
        json.dumps({"protocol": protocol}),
        json.dumps({
            "metaData": {
                "id": f"00000000-0000-4000-8000-{seed:012d}",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps({
                    "type": "struct",
                    "fields": [{"name": "v", "type": "long",
                                "nullable": False,
                                "metadata": field_meta}],
                }),
                "partitionColumns": [],
                "configuration": config,
            }
        }),
    ]
    slot_vals = []
    for i in range(n0):
        lo = i * 1000 + base
        rows = 20 + (seed + i) % 30
        vals = [lo + r for r in range(rows)]
        slot_vals.append(vals)
        v0.append(add_action(f"part-{i:05d}.parquet", vals, True))
    files[f"{_LOG}/{0:020d}.json"] = ("\n".join(v0) + "\n").encode()

    # version 1: UPDATE slot 0 (+7 on the first u rows) — complete
    # change data rides in the cdc file; the add/remove pair still
    # carries dataChange=true (per spec) and a CDF reader must NOT
    # derive from it when cdc actions are present (double-count trap)
    pre = slot_vals[0][:u]
    post = [v + 7 for v in pre]
    updated = post + slot_vals[0][u:]
    cdc_size = _write_cdf_parquet(
        files, "_change_data/cdc-00001.parquet", pre + post,
        ["update_preimage"] * u + ["update_postimage"] * u,
        col=col,
    )
    v1 = [
        json.dumps({"commitInfo": {"operation": "UPDATE"}}),
        json.dumps({
            "cdc": {
                "path": "_change_data/cdc-00001.parquet",
                "partitionValues": {},
                "size": cdc_size,
                "dataChange": False,
            }
        }),
        json.dumps({
            "remove": {
                "path": "part-00000.parquet",
                "deletionTimestamp": 1700000000000 + seed,
                "dataChange": True,
            }
        }),
        add_action("part-r0000.parquet", updated, True),
    ]
    files[f"{_LOG}/{1:020d}.json"] = ("\n".join(v1) + "\n").encode()

    # version 2: DELETE slot 1 wholesale — no cdc action; the reader
    # derives the deletes by reading the tombstoned file itself
    v2 = [
        json.dumps({"commitInfo": {"operation": "DELETE"}}),
        json.dumps({
            "remove": {
                "path": "part-00001.parquet",
                "deletionTimestamp": 1700000001000 + seed,
                "dataChange": True,
            }
        }),
    ]
    files[f"{_LOG}/{2:020d}.json"] = ("\n".join(v2) + "\n").encode()

    # version 3: compaction rewrite of the updated file — both
    # actions dataChange=false, so the commit contributes NO changes
    v3 = [
        json.dumps({"commitInfo": {"operation": "OPTIMIZE"}}),
        json.dumps({
            "remove": {
                "path": "part-r0000.parquet",
                "deletionTimestamp": 1700000002000 + seed,
                "dataChange": False,
            }
        }),
        add_action("part-c0000.parquet", updated, False),
    ]
    files[f"{_LOG}/{3:020d}.json"] = ("\n".join(v3) + "\n").encode()

    return write_tar_bundle(files)


def scan_delta_cdf(payload: bytes) -> dict:
    """Change-data-feed read over a commit range (PROTOCOL.md
    "Change Data Files" + the delta.io CDF docs): for each version
    in ``[start, end]``, serve the change rows — from the commit's
    ``cdc`` files when any exist (and ONLY from them: the paired
    add/remove rewrites would double-count), else derived from
    ``add``/``remove`` actions with ``dataChange=true`` (adds are
    inserts; a removed file's rows are deletes, read from the
    not-yet-vacuumed tombstone); commits whose file actions all
    carry ``dataChange=false`` (compaction/OPTIMIZE) contribute
    nothing.  CDF is a WRITER feature (minWriterVersion 4 /
    ``changeDataFeed``) — the reader-version fence stays at 1.
    Replaces the round-11 loud-reject at ``_State.apply``
    (VERDICT r11 item 1)."""
    return _scan_cdf_impl(payload, allow_cm=False)


def scan_delta_cdf_cm(payload: bytes) -> dict:
    """COMPOSED change data feed on a COLUMN-MAPPED table: the same
    per-commit change semantics with every value read — data files,
    tombstones, and the cdc change files themselves — resolved
    through the logical→physical name mapping; ``_change_type`` is
    reader metadata and stays unmapped (PROTOCOL.md)."""
    out = _scan_cdf_impl(payload, allow_cm=True)
    if out["mapping_mode"] != "name":
        raise ValueError("composed cdf fixture must be name-mapped")
    return out


def _scan_cdf_impl(payload: bytes, allow_cm: bool) -> dict:
    files = read_tar_bundle(payload)
    by_version = _commit_versions(files)
    if not by_version:
        raise ValueError("no JSON commits in log")
    versions = sorted(by_version)
    if versions[0] != 0:
        # a vacuumed/checkpointed prefix cannot serve change rows —
        # the change files for those versions are gone with the JSON
        raise ValueError("cdf needs the commit history from version 0")
    if len(versions) > 64:
        raise ValueError("commit count past cap (boundary)")
    state = _State(require_stats=False, allow_cm=allow_cm)
    # (kind, body) tuples, NOT the raw action dicts: re-deriving the
    # kind downstream via `"add" in action` membership would pick a
    # null-valued sibling key and TypeError past the quarantine
    # (review r12 pass 1 — reproduced with {"remove":{...},"add":null})
    commits: list[tuple[int, list[tuple[str, dict]]]] = []
    for want, v in enumerate(versions):
        if v != want:
            raise ValueError("commit versions not contiguous (boundary)")
        blob = files[by_version[v]]
        if len(blob) > 1 << 24:
            raise ValueError("commit JSON exceeds size cap")
        actions: list[tuple[str, dict]] = []
        for line in blob.splitlines():
            if not line.strip():
                continue
            try:
                action = json.loads(line)
            except json.JSONDecodeError as e:
                raise ValueError(f"commit line not JSON: {e}") from None
            if not isinstance(action, dict):
                raise ValueError("log action is not an object")
            keys = [k for k in action if action.get(k) is not None]
            if len(keys) != 1:
                raise ValueError("log action must carry exactly one field")
            kind = keys[0]
            if kind == "cdc":
                body = action["cdc"]
                if not isinstance(body, dict):
                    raise ValueError("cdc action is not an object")
                path = body.get("path")
                if not isinstance(path, str) or not path:
                    raise ValueError("cdc action without path")
                if body.get("dataChange") is not False:
                    # spec: cdc actions carry dataChange=false (the
                    # data change is IN the change file, not the table)
                    raise ValueError("cdc action must set dataChange=false")
                size = body.get("size")
                if size is not None and (
                    not isinstance(size, int) or isinstance(size, bool)
                    or size < 0
                ):
                    # a malformed declaration must refuse like every
                    # sibling size fence, not silently skip the check
                    raise ValueError("cdc size malformed")
                blob_c = files.get(path)
                if size is not None and blob_c is not None \
                        and size != len(blob_c):
                    raise ValueError("cdc size disagrees with the file")
                actions.append((kind, body))
            else:
                state.apply(action)
                if kind in ("add", "remove"):
                    actions.append((kind, action[kind]))
        commits.append((v, actions))
    if state.min_reader is None or state.meta_id is None:
        raise ValueError("log without protocol/metaData")
    if state.configuration.get("delta.enableChangeDataFeed") != "true":
        raise ValueError("change data feed not enabled (boundary)")
    if state.mapping_mode == "id":
        # id-mode resolution needs parquet field_id plumbing in the
        # change-file readers; name mode is the composition pinned
        raise ValueError("cdf over id-mode mapping unsupported (boundary)")
    col = "v" if state.mapping_mode is None \
        else state.column_mapping["v"][1]

    def knob(name: str) -> int:
        raw = state.configuration.get(name)
        if raw is None:
            raise ValueError(f"table configuration missing {name}")
        try:
            return int(raw)
        except (TypeError, ValueError):
            raise ValueError(f"non-integer {name}") from None

    start, end = knob("fixture.cdf.start"), knob("fixture.cdf.end")
    if not 0 <= start <= end <= versions[-1]:
        raise ValueError("cdf version range out of bounds (boundary)")

    counts = dict.fromkeys(_CDF_TYPES, 0)
    sums = dict.fromkeys(_CDF_TYPES, 0)
    cdc_commits = derived_commits = skipped = cdc_files = 0
    for v, actions in commits:
        if not start <= v <= end:
            continue
        cdcs = [body for kind, body in actions if kind == "cdc"]
        if cdcs:
            if len(cdcs) > 8:
                raise ValueError("cdc file count past cap (boundary)")
            cdc_commits += 1
            pre = post = 0
            for body in cdcs:
                for val, ct in _read_cdc_file(
                    files, body["path"], col=col
                ):
                    counts[ct] += 1
                    sums[ct] += val
                    if ct == "update_preimage":
                        pre += 1
                    elif ct == "update_postimage":
                        post += 1
                cdc_files += 1
            if pre != post:
                # update rewrites pair every preimage with a postimage
                raise ValueError("unbalanced update pre/post images")
        else:
            changed = False
            for kind, body in actions:
                dc = body.get("dataChange")
                if not isinstance(dc, bool):
                    raise ValueError(f"{kind} dataChange malformed")
                if not dc:
                    continue
                changed = True
                ct = "insert" if kind == "add" else "delete"
                for val in _read_v_values(files, body["path"], col=col):
                    counts[ct] += 1
                    sums[ct] += val
            if changed:
                derived_commits += 1
            else:
                skipped += 1
    total = sum(counts.values())
    for agg in list(sums.values()) + [total]:
        if not -(2**63) <= agg < 2**63:
            raise ValueError("cdf aggregate overflows int64 (boundary)")
    return {
        "mapping_mode": state.mapping_mode,
        "start_version": start,
        "end_version": end,
        "commits_read": end - start + 1,
        "cdc_commits": cdc_commits,
        "derived_commits": derived_commits,
        "skipped_commits": skipped,
        "cdc_files_read": cdc_files,
        "inserts": counts["insert"],
        "insert_sum": sums["insert"],
        "update_pre": counts["update_preimage"],
        "update_post": counts["update_postimage"],
        "pre_sum": sums["update_preimage"],
        "post_sum": sums["update_postimage"],
        "deletes": counts["delete"],
        "delete_sum": sums["delete"],
        "change_rows": total,
    }


# ---------------------------------------------------------------------------
# DESCRIBE HISTORY + VACUUM candidates (round 13): the two
# table-ops views Delta users run daily, served from the JSON log
# alone.  Delta's PROTOCOL.md defines commitInfo as free-form but
# DESCRIBE HISTORY's columns (version, timestamp, operation,
# operationMetrics) are the de-facto public contract; VACUUM
# eligibility is deletionTimestamp age vs the table's
# delta.deletedFileRetentionDuration.  The reference repo has no
# lakehouse layer — beyond-reference scope, same as the Iceberg
# inspection tables.
# ---------------------------------------------------------------------------

_HISTORY_OPS = (
    "CREATE TABLE AS SELECT", "WRITE", "DELETE", "OPTIMIZE",
    "MERGE", "UPDATE",
)


def synth_delta_history_plan(seed: int) -> dict:
    """Mirrored in the DuckDB oracles of the history/vacuum queries.
    ``r_j = 30 + (seed + 7*j) % 40``; ``t0 = 1.7e12 +
    (seed%997)*1000`` ms; retention = ``24*(1+seed%3)`` hours:

    - v0 CREATE TABLE AS SELECT at t0: adds f0(r0) + f1(r1);
    - v1 WRITE (Append) at t0+60s: adds f2(r2);
    - v2 DELETE at t0+120s: removes f0 (tombstone at t0+120s);
    - v3 OPTIMIZE at t0+180s (ODD seeds only): removes f1+f2 /
      adds c0(r1+r2), all dataChange=false;
    - vacuum probe: now = t0 + retention + 150s, so the v2
      tombstone is ELIGIBLE (120s <= 150s) and the v3 tombstones
      are NOT (180s > 150s) — both classes present on odd seeds."""
    rows = [30 + (seed + 7 * j) % 40 for j in range(3)]
    t0 = 1_700_000_000_000 + (seed % 997) * 1000
    retention_h = 24 * (1 + seed % 3)
    return {
        "rows": rows,
        "t0_ms": t0,
        "retention_hours": retention_h,
        "now_ms": t0 + retention_h * 3_600_000 + 150_000,
        "has_optimize": seed % 2 == 1,
    }


def synth_delta_history(seed: int) -> bytes:
    """A Delta log with 3-4 commits, commitInfo on every commit
    (operation + timestamp + operationMetrics with STRING values,
    as the protocol serializes them), tombstones with
    deletionTimestamp, and the vacuum probe declared in the table
    configuration.  No checkpoint — history replay is the point."""
    plan = synth_delta_history_plan(seed)
    r = plan["rows"]
    t0 = plan["t0_ms"]
    files: dict[str, bytes] = {}
    adds = [
        _write_data_file(files, f"part-{j:05d}.parquet", r[j], j * 100)
        for j in range(3)
    ]
    meta = {
        "id": f"00000000-0000-4000-8000-{seed:012d}",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps({
            "type": "struct",
            "fields": [{"name": "v", "type": "long",
                        "nullable": False, "metadata": {}}],
        }),
        "partitionColumns": [],
        "configuration": {
            "delta.deletedFileRetentionDuration":
                f"interval {plan['retention_hours']} hours",
            "fixture.vacuum.now": str(plan["now_ms"]),
        },
    }

    def ci(op: str, ts: int, metrics: dict) -> str:
        return json.dumps({"commitInfo": {
            "operation": op,
            "timestamp": ts,
            "operationMetrics": {k: str(v) for k, v in metrics.items()},
        }})

    commits = {
        0: [
            ci("CREATE TABLE AS SELECT", t0,
               {"numFiles": 2, "numOutputRows": r[0] + r[1]}),
            json.dumps({"protocol": {"minReaderVersion": 1,
                                     "minWriterVersion": 2}}),
            json.dumps({"metaData": meta}),
            json.dumps({"add": adds[0]}),
            json.dumps({"add": adds[1]}),
        ],
        1: [
            ci("WRITE", t0 + 60_000,
               {"numFiles": 1, "numOutputRows": r[2]}),
            json.dumps({"add": adds[2]}),
        ],
        2: [
            ci("DELETE", t0 + 120_000,
               {"numRemovedFiles": 1, "numDeletedRows": r[0]}),
            json.dumps({"remove": {
                "path": "part-00000.parquet",
                "deletionTimestamp": t0 + 120_000,
                "dataChange": True,
            }}),
        ],
    }
    if plan["has_optimize"]:
        compacted = _write_data_file(
            files, "part-c0000.parquet", r[1] + r[2], 100
        )
        compacted["dataChange"] = False
        commits[3] = [
            ci("OPTIMIZE", t0 + 180_000,
               {"numAddedFiles": 1, "numRemovedFiles": 2}),
            json.dumps({"remove": {
                "path": "part-00001.parquet",
                "deletionTimestamp": t0 + 180_000,
                "dataChange": False,
            }}),
            json.dumps({"remove": {
                "path": "part-00002.parquet",
                "deletionTimestamp": t0 + 180_000,
                "dataChange": False,
            }}),
            json.dumps({"add": compacted}),
        ]
    for v, lines in commits.items():
        files[f"{_LOG}/{v:020d}.json"] = (
            "\n".join(lines) + "\n"
        ).encode()
    return write_tar_bundle(files)


def _iter_history_commits(files: dict[str, bytes]):
    """Yield (version, [action dict, ...]) for contiguous versions
    from 0 — the checkpoint-less history walk (a gap means vacuumed
    history, which DESCRIBE HISTORY would silently misreport)."""
    import re as _re

    pat = _re.compile(rf"^{_LOG}/(\d{{20}})\.json$")
    versions = sorted(
        int(m.group(1)) for n in files if (m := pat.match(n))
    )
    if not versions:
        raise ValueError("delta log has no JSON commits")
    if len(versions) > 4096:
        raise ValueError("delta history too long (boundary)")
    if versions != list(range(len(versions))):
        raise ValueError("delta history has version gaps")
    for v in versions:
        blob = files[f"{_LOG}/{v:020d}.json"]
        actions = []
        for line in blob.splitlines():
            if not line.strip():
                continue
            try:
                act = json.loads(line)
            except json.JSONDecodeError as e:
                raise ValueError(f"commit line not JSON: {e}") from None
            if not isinstance(act, dict) or len(act) != 1:
                raise ValueError("commit action malformed")
            actions.append(act)
        yield v, actions


def delta_history_table(payload: bytes) -> list[dict]:
    """``DESCRIBE HISTORY``: one row per commit — version, commit
    timestamp, operation, and the operationMetrics counters, with
    the metrics CROSS-CHECKED against the commit's actual add/remove
    actions (a commitInfo that claims numFiles=2 over one add is the
    drift this fence exists for).  Exactly one commitInfo per
    commit, operations from the de-facto closed set, timestamps
    non-decreasing."""
    files = read_tar_bundle(payload)
    out = []
    prev_ts = -1
    for v, actions in _iter_history_commits(files):
        cis = [a["commitInfo"] for a in actions if "commitInfo" in a]
        if len(cis) != 1:
            raise ValueError("commit must carry exactly one commitInfo")
        ci = cis[0]
        if not isinstance(ci, dict):
            raise ValueError("commitInfo malformed")
        op = ci.get("operation")
        if op not in _HISTORY_OPS:
            raise ValueError(f"operation {op!r} unknown")
        ts = ci.get("timestamp")
        if not isinstance(ts, int) or isinstance(ts, bool) \
                or not 0 <= ts < 2**53:
            raise ValueError("commitInfo timestamp malformed")
        if ts < prev_ts:
            raise ValueError("commit timestamps decrease")
        prev_ts = ts
        metrics = ci.get("operationMetrics")
        if not isinstance(metrics, dict):
            raise ValueError("operationMetrics missing")
        decoded = {}
        for k, raw in metrics.items():
            if not isinstance(raw, str) or not raw.isdigit() \
                    or len(raw) > 18:
                raise ValueError(f"metric {k} not a digit string")
            decoded[k] = int(raw)
        n_adds = sum(1 for a in actions if "add" in a)
        n_removes = sum(1 for a in actions if "remove" in a)
        claimed_adds = decoded.get("numFiles",
                                   decoded.get("numAddedFiles", 0))
        if claimed_adds != n_adds:
            raise ValueError(
                "operationMetrics file count disagrees with adds"
            )
        if decoded.get("numRemovedFiles", 0) != n_removes:
            raise ValueError(
                "operationMetrics removed count disagrees with removes"
            )
        out.append({
            "version": v,
            "timestamp_ms": ts,
            "operation": op,
            "num_added_files": n_adds,
            "num_removed_files": n_removes,
            "num_output_rows": decoded.get(
                "numOutputRows", decoded.get("numDeletedRows")
            ),
        })
    return out


def delta_vacuum_candidates(payload: bytes) -> list[dict]:
    """``VACUUM DRY RUN``: every tombstoned file with its deletion
    timestamp and whether it is PAST the table's configured
    ``delta.deletedFileRetentionDuration`` at the fixture-declared
    probe instant — the listing a storage-reclamation job plans
    from.  Correctness fences: a tombstone whose path is still LIVE
    in the replayed state loud-rejects (vacuuming it would corrupt
    the table — the one mistake this view must never make), and the
    retention interval must parse exactly."""
    import re as _re

    files = read_tar_bundle(payload)
    live: dict[str, bool] = {}
    tombstones: dict[str, int] = {}
    config = None
    for _v, actions in _iter_history_commits(files):
        for a in actions:
            if "metaData" in a:
                md = a["metaData"]
                if not isinstance(md, dict):
                    raise ValueError("metaData malformed")
                config = md.get("configuration")
            elif "add" in a:
                path = a["add"].get("path") if isinstance(a["add"], dict) \
                    else None
                if not isinstance(path, str):
                    raise ValueError("add path malformed")
                live[path] = True
                tombstones.pop(path, None)  # re-added: not vacuumable
            elif "remove" in a:
                rm = a["remove"]
                if not isinstance(rm, dict):
                    raise ValueError("remove malformed")
                path = rm.get("path")
                dts = rm.get("deletionTimestamp")
                if not isinstance(path, str):
                    raise ValueError("remove path malformed")
                if not isinstance(dts, int) or isinstance(dts, bool) \
                        or not 0 <= dts < 2**53:
                    raise ValueError("deletionTimestamp malformed")
                live.pop(path, None)
                tombstones[path] = dts
    if not isinstance(config, dict):
        raise ValueError("table configuration missing")
    interval = config.get("delta.deletedFileRetentionDuration")
    if not isinstance(interval, str):
        # a JSON number here would TypeError out of re.fullmatch —
        # the quarantine-escape class the round-12 review pinned
        raise ValueError("retention duration malformed")
    m = _re.fullmatch(r"interval (\d{1,6}) hours", interval)
    if m is None:
        raise ValueError("retention duration malformed")
    retention_ms = int(m.group(1)) * 3_600_000
    now_raw = config.get("fixture.vacuum.now")
    if not isinstance(now_raw, str) or not now_raw.isdigit() \
            or len(now_raw) > 18:
        raise ValueError("vacuum probe instant malformed")
    now_ms = int(now_raw)
    horizon = now_ms - retention_ms
    out = []
    for path in sorted(tombstones):
        if path in live:
            raise ValueError(
                "tombstoned path is still live (vacuum would corrupt)"
            )
        if path not in files:
            raise ValueError("tombstoned file missing from bundle")
        dts = tombstones[path]
        out.append({
            "path": path,
            "deletion_timestamp_ms": dts,
            "eligible": dts <= horizon,
        })
    if not out:
        raise ValueError("history has no tombstones")
    return out


def delta_detail_table(payload: bytes) -> dict:
    """``DESCRIBE DETAIL``: the one-row table summary — live file
    count, live row count (from add-action stats), format/protocol
    versions, partition column count, and the parsed retention —
    computed by the SAME add/remove replay the scan uses, so a
    reader that forgets tombstones reports phantom files.  Row
    counts come from stats (never data parquet): DESCRIBE DETAIL is
    a metadata answer at any scale."""
    files = read_tar_bundle(payload)
    live: dict[str, int] = {}
    meta_d = None
    protocol = None
    for _v, actions in _iter_history_commits(files):
        for a in actions:
            if "metaData" in a:
                meta_d = a["metaData"]
            elif "protocol" in a:
                protocol = a["protocol"]
            elif "add" in a:
                add = a["add"]
                if not isinstance(add, dict):
                    raise ValueError("add malformed")
                path = add.get("path")
                if not isinstance(path, str):
                    raise ValueError("add path malformed")
                nr, _lo, _hi = _parse_stats(add.get("stats"))
                live[path] = nr
            elif "remove" in a:
                rm = a["remove"]
                if not isinstance(rm, dict) \
                        or not isinstance(rm.get("path"), str):
                    raise ValueError("remove malformed")
                live.pop(rm["path"], None)
    if not isinstance(meta_d, dict) or not isinstance(protocol, dict):
        raise ValueError("log missing metaData/protocol")
    fmt = meta_d.get("format")
    if not isinstance(fmt, dict) or fmt.get("provider") != "parquet":
        raise ValueError("table format unsupported")
    pcols = meta_d.get("partitionColumns")
    if not isinstance(pcols, list):
        raise ValueError("partitionColumns malformed")
    config = meta_d.get("configuration")
    if not isinstance(config, dict):
        raise ValueError("configuration malformed")
    mr = protocol.get("minReaderVersion")
    mw = protocol.get("minWriterVersion")
    for v in (mr, mw):
        if not isinstance(v, int) or isinstance(v, bool) \
                or not 1 <= v <= 7:
            raise ValueError("protocol version malformed")
    total = sum(live.values())
    if not (0 <= total < 2**63):
        raise ValueError("row total overflows int64 (boundary)")
    return {
        "num_files": len(live),
        "num_records": total,
        "min_reader_version": mr,
        "min_writer_version": mw,
        "n_partition_columns": len(pcols),
        "n_properties": len(config),
    }
