"""Pickle opcode triage — functions/pickle_scan.py (round 9):
opcode-grammar walk without unpickling, pinned against the stdlib
pickle producer across all six protocols; the security payoff is
global-reference detection with zero imports/calls."""

from __future__ import annotations

import pickle

import pytest

from datawarehouseproject_spark.functions.pickle_scan import (
    _Marker,
    scan_pickle,
    synth_pickle,
    synth_pickle_plan,
)


def test_value_stats_are_protocol_invariant():
    """The same object at protocols 0..5 produces six very different
    opcode streams — INT lines vs BININT1, GLOBAL line-args vs
    STACK_GLOBAL string pushes — but identical value stats."""
    obj = {"a": 7, "b": "hello", "c": [1, 2, 3], "d": None, "gm": _Marker}
    base = None
    for p in range(6):
        s = scan_pickle(pickle.dumps(obj, protocol=p))
        assert s["protocol"] == p
        key = {
            k: s[k]
            for k in (
                "n_ints", "int_sum", "n_strings", "str_chars",
                "n_lists", "n_nones", "n_globals", "global_names",
            )
        }
        base = base or key
        assert key == base, p
    assert base["n_ints"] == 4 and base["int_sum"] == 13
    assert base["n_globals"] == 1


def test_synth_matches_plan_formulas():
    for seed in range(40):
        plan = synth_pickle_plan(seed)
        s = scan_pickle(synth_pickle(seed))
        n = plan["n"]
        assert s["protocol"] == plan["protocol"], seed
        assert s["n_ints"] == (
            sum(1 for i in range(n) if i % 4 == 0)
            + sum(1 + i % 3 for i in range(n) if i % 4 == 2)
        ), seed
        assert s["n_globals"] == (1 if plan["has_global"] else 0), seed


def test_hostile_global_is_named_not_executed():
    """The canonical RCE shape — ``cos\\nsystem\\n...R.`` — must be
    REPORTED by name. Nothing is imported: a bogus module proves it
    (importing it would raise)."""
    evil = b"cos\nsystem\n(S'echo pwned'\ntR."
    s = scan_pickle(evil)
    assert s["n_globals"] == 1
    assert s["global_names"] == "os system"
    bogus = b"cno_such_module_xyz\nattack\n(tR."
    assert scan_pickle(bogus)["global_names"] == "no_such_module_xyz attack"


def test_stack_global_retraction_keeps_string_stats_clean():
    """Protocol 4 passes global names as SHORT_BINUNICODE pushes;
    the scanner must not count them as document strings."""
    s4 = scan_pickle(pickle.dumps(_Marker, protocol=4))
    s0 = scan_pickle(pickle.dumps(_Marker, protocol=0))
    assert s4["n_strings"] == s0["n_strings"] == 0
    assert s4["n_globals"] == s0["n_globals"] == 1


def test_real_world_shapes_round_trip():
    shapes = [
        42,
        -(2**40),          # LONG1 path
        2**200,            # big LONG1
        "unicode ☃",  # BINUNICODE escapes
        b"raw bytes",      # BINBYTES (protocol 3+)
        [1, [2, [3]]],
        {"nested": {"deep": [None, "x"]}},
        (1, 2, 3),
        {1, 2},            # EMPTY_SET/ADDITEMS or FROZENSET reduce
        3.14159,           # BINFLOAT / FLOAT line
        True, False,
        bytearray(b"ba"),  # BYTEARRAY8 (protocol 5)
    ]
    for obj in shapes:
        for p in range(6):
            if isinstance(obj, (bytes, bytearray)) and p < 3:
                continue  # bytes need protocol 3+; bytearray reduces
            s = scan_pickle(pickle.dumps(obj, protocol=p))
            assert s["n_opcodes"] >= 2, (obj, p)


def test_int_values_collected_exactly():
    s = scan_pickle(pickle.dumps([0, 1, 255, 256, 65535, 65536,
                                  -1, 2**31 - 1, -(2**31)], protocol=2))
    assert s["n_ints"] == 9
    assert s["int_sum"] == sum([0, 1, 255, 256, 65535, 65536,
                                -1, 2**31 - 1, -(2**31)])


def test_truncation_and_garbage_raise():
    good = pickle.dumps({"k": [1, 2]}, protocol=4)
    for cut in (0, 1, len(good) // 2, len(good) - 1):
        with pytest.raises(ValueError):
            scan_pickle(good[:cut])
    with pytest.raises(ValueError):
        scan_pickle(b"\xff\xfe\xfd")
    with pytest.raises(ValueError):
        scan_pickle(b"")


def test_memo_heavy_stream_scans():
    """Shared references produce BINGET/LONG_BINGET chains; value
    stats count the ENCODED values (one per memo PUT), matching the
    one-encoding-per-unique-object reality of the stream."""
    shared = ["dup"] * 100  # one string encoding + 99 memo gets
    s = scan_pickle(pickle.dumps(shared, protocol=2))
    assert s["n_strings"] == 1
    assert s["str_chars"] == 3


def test_opcode_count_cross_pinned_against_pickletools():
    """stdlib pickletools.genops is an INDEPENDENT walker of the same
    grammar — our n_opcodes must match its opcode stream exactly,
    for every synthesis seed and protocol."""
    import pickletools

    for seed in range(24):
        payload = synth_pickle(seed)
        want = sum(1 for _ in pickletools.genops(payload))
        assert scan_pickle(payload)["n_opcodes"] == want, seed


def test_stack_global_cannot_retract_consumed_strings():
    """ADVICE r9: an adversarial stream that pushes two strings,
    CONSUMES them (TUPLE2), then hits STACK_GLOBAL must refuse — not
    report the stale, already-consumed strings as module/qualname."""
    import pytest

    blob = (
        b"\x80\x04"                      # PROTO 4
        b"\x8c\x02os"                    # SHORT_BINUNICODE 'os'
        b"\x8c\x06system"                # SHORT_BINUNICODE 'system'
        b"\x86"                          # TUPLE2: consumes both
        b"\x93"                          # STACK_GLOBAL: nothing live
        b"."
    )
    with pytest.raises(ValueError, match="STACK_GLOBAL"):
        scan_pickle(blob)


def test_stack_global_still_reads_adjacent_pushes():
    blob = (
        b"\x80\x04"
        b"\x8c\x02os"
        b"\x8c\x06system"
        b"\x93"                          # canonical pickler shape
        b"0."                            # POP the global, STOP
    )
    got = scan_pickle(blob)
    assert got["n_globals"] == 1
    assert got["global_names"] == "os system"
