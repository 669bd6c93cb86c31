"""Pickle opcode triage WITHOUT unpickling.

ML corpora are full of pickle payloads (numpy checkpoints, dataset
shards, cache files), and unpickling untrusted bytes is arbitrary
code execution (``GLOBAL``/``STACK_GLOBAL`` + ``REDUCE`` resolve and
call any importable callable).  The triage a 100 TB ingest actually
needs is a SCAN: walk the public opcode grammar (the table in
CPython's ``pickletools``, and PEPs 307/3154/574 for protocols 2/4/5),
collect the embedded scalar values and — the security payoff — the
referenced ``module.qualname`` globals, and NEVER construct an
object or import anything.

The walker frames every argument kind the format defines (u1/u2/u4/u8
and i4 ints, length-prefixed bytes/unicode, newline-terminated text
args for protocol 0) and understands enough data flow to keep the
stats protocol-INVARIANT: the same Python object pickled at protocols
0..5 produces different opcode streams (``INT`` lines vs ``BININT1``;
``GLOBAL`` line-args vs ``STACK_GLOBAL`` consuming two string pushes)
but identical value counts, which is what makes a cross-protocol
DuckDB oracle possible (`pickle_opcode_scan` in
``plans/queries_ext.py``).

Pinned against the STDLIB pickle producer (an independent
implementation) across all six protocols in
``tests/test_pickle_scan.py``.  Protocol-0 ``STRING`` repr-unescape
is restricted to the escape-free subset (quarantine otherwise) —
Python 3 pickles ``str`` as unicode opcodes, so the text-mode
``S``-string appears only in foreign/legacy streams.
"""

from __future__ import annotations

import struct

_MAXLINE = 1 << 20


class _Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("truncated pickle argument")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def u1(self) -> int:
        return self.take(1)[0]

    def u2(self) -> int:
        return struct.unpack("<H", self.take(2))[0]

    def i4(self) -> int:
        return struct.unpack("<i", self.take(4))[0]

    def u4(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def u8(self) -> int:
        return struct.unpack("<Q", self.take(8))[0]

    def line(self) -> str:
        end = self.data.find(b"\n", self.pos)
        if end < 0 or end - self.pos > _MAXLINE:
            raise ValueError("unterminated pickle text argument")
        out = self.data[self.pos : end]
        self.pos = end + 1
        return out.decode("ascii")


def scan_pickle(payload: bytes) -> dict:
    """Walk one pickle stream to its STOP opcode, collecting:

    - ``protocol``: the ``PROTO`` byte, else 1 if any binary-framed
      opcode appeared, else 0;
    - ``n_ints`` / ``int_sum``: every embedded integer value
      (``INT``/``BININT*``/``LONG*``), protocol-invariant;
    - ``n_strings`` / ``str_chars``: every embedded text string
      EXCEPT the two consumed by ``STACK_GLOBAL`` (protocols 0-3
      pass global names as line args, 4+ as string pushes — the
      subtraction keeps the stat identical across protocols);
    - ``n_lists`` / ``n_nones``: structure markers (``EMPTY_LIST``
      + ``LIST`` cover binary and text modes);
    - ``n_globals`` / ``global_names``: the ``module qualname``
      references that make a pickle dangerous — detected WITHOUT
      importing or calling anything;
    - ``n_opcodes``, ``payload_bytes``.

    Raises ValueError on unknown opcodes, truncation, or a missing
    STOP — the quarantine contract of every reader in this repo.
    """
    r = _Reader(payload)
    n_opcodes = 0
    protocol = 0
    saw_binary = False
    n_ints = 0
    int_sum = 0
    # (value, counted) push history so STACK_GLOBAL can retract its
    # two args; memo-echoed strings re-enter as counted=False since
    # their one real encoding was already counted
    strings: list[tuple[str, bool]] = []
    n_strings = 0
    str_chars = 0
    n_lists = 0
    n_nones = 0
    globals_: list[str] = []
    stopped = False
    # STACK_GLOBAL args may arrive via the memo (BINGET of an earlier
    # module string) — track which memo slots hold strings.  A slot
    # is recorded when a PUT/MEMOIZE immediately follows a string
    # push (the only layout the pickler emits for strings).
    memo: dict[int, str] = {}
    memo_seq = 0
    last_string: str | None = None
    pushed_string: str | None = None

    def push_string(s: str, counted: bool = True) -> None:
        nonlocal n_strings, str_chars, pushed_string
        strings.append((s, counted))
        pushed_string = s
        if counted:
            n_strings += 1
            str_chars += len(s)

    def push_int(v: int) -> None:
        nonlocal n_ints, int_sum
        n_ints += 1
        int_sum += v

    while not stopped:
        if r.pos >= len(r.data):
            raise ValueError("pickle ended without STOP")
        op = r.data[r.pos]
        r.pos += 1
        n_opcodes += 1
        pushed_string = None
        c = chr(op)
        if op == 0x80:  # PROTO
            protocol = r.u1()
            if protocol > 5:
                raise ValueError(f"pickle protocol {protocol} unknown")
        elif op == 0x95:  # FRAME (protocol 4+): u8 length, advisory
            r.u8()
            saw_binary = True
        elif c == ".":
            stopped = True
        elif c in "(}])td201eusalbRQoN" or op in (
            0x85, 0x86, 0x87,  # TUPLE1-3
            0x88, 0x89,        # NEWTRUE/NEWFALSE
            0x8F, 0x90, 0x91,  # EMPTY_SET / ADDITEMS / FROZENSET
            0x81, 0x92,        # NEWOBJ / NEWOBJ_EX
            0x94,              # MEMOIZE
            0x97, 0x98,        # NEXT_BUFFER / READONLY_BUFFER
        ):
            # no-argument opcodes; classify a few
            if c == "N":
                n_nones += 1
            elif c == "]" or c == "l":
                n_lists += 1
            if c in "}])" or op >= 0x80:
                saw_binary = True
            if c in "td01eusalbRQo" or op in (
                0x85, 0x86, 0x87, 0x90, 0x91, 0x81, 0x92,
            ):
                # stack-CONSUMING opcodes: any string they swallowed
                # is no longer live, so drop the pushed-string history
                # — otherwise an adversarial (non-pickler-shaped)
                # stream could make STACK_GLOBAL retract an
                # already-consumed string and report it as a stale
                # module/qualname in the security-triage field
                strings.clear()
        elif op == 0x93:  # STACK_GLOBAL: consumes two pushed strings
            saw_binary = True
            if len(strings) < 2:
                raise ValueError("STACK_GLOBAL without two string args")
            qualname, q_counted = strings.pop()
            module, m_counted = strings.pop()
            if q_counted:
                n_strings -= 1
                str_chars -= len(qualname)
            if m_counted:
                n_strings -= 1
                str_chars -= len(module)
            globals_.append(f"{module} {qualname}")
        elif c == "c":  # GLOBAL: module\n qualname\n
            module, qualname = r.line(), r.line()
            globals_.append(f"{module} {qualname}")
        elif c == "i":  # INST: module\n name\n (legacy, same risk)
            module, qualname = r.line(), r.line()
            globals_.append(f"{module} {qualname}")
        elif c == "J":
            saw_binary = True
            push_int(r.i4())
        elif c == "K":
            saw_binary = True
            push_int(r.u1())
        elif c == "M":
            saw_binary = True
            push_int(r.u2())
        elif c == "I":  # INT line (protocol 0; also legacy bools 00/01)
            text = r.line()
            if text in ("00", "01"):
                pass  # legacy boolean, not an int value
            else:
                push_int(int(text))
        elif c == "L":  # LONG line, trailing 'L' optional
            push_int(int(r.line().rstrip("L")))
        elif op == 0x8A:  # LONG1
            saw_binary = True
            n = r.u1()
            push_int(int.from_bytes(r.take(n), "little", signed=True))
        elif op == 0x8B:  # LONG4
            saw_binary = True
            n = r.u4()
            push_int(int.from_bytes(r.take(n), "little", signed=True))
        elif op == 0x8C:  # SHORT_BINUNICODE
            saw_binary = True
            push_string(r.take(r.u1()).decode("utf-8"))
        elif c == "X":  # BINUNICODE
            saw_binary = True
            push_string(r.take(r.u4()).decode("utf-8"))
        elif op == 0x8D:  # BINUNICODE8
            saw_binary = True
            push_string(r.take(r.u8()).decode("utf-8"))
        elif c == "V":  # UNICODE line (protocol 0)
            push_string(r.line().encode("ascii").decode("raw_unicode_escape"))
        elif c == "S":  # STRING line (protocol 0, repr-quoted)
            text = r.line()
            if len(text) < 2 or text[0] not in "'\"" or text[-1] != text[0]:
                raise ValueError("malformed pickle STRING repr")
            body = text[1:-1]
            if "\\" in body:
                raise ValueError("escaped pickle STRING unsupported")
            push_string(body)
        elif c == "C":  # SHORT_BINBYTES
            saw_binary = True
            r.take(r.u1())
        elif c == "B":  # BINBYTES
            saw_binary = True
            r.take(r.u4())
        elif op == 0x8E:  # BINBYTES8
            saw_binary = True
            r.take(r.u8())
        elif op == 0x96:  # BYTEARRAY8
            saw_binary = True
            r.take(r.u8())
        elif c == "G":  # BINFLOAT: 8-byte BE double
            saw_binary = True
            r.take(8)
        elif c == "F":  # FLOAT line
            r.line()
        elif c == "q":  # BINPUT
            saw_binary = True
            idx = r.u1()
            if last_string is not None:
                memo[idx] = last_string
        elif c == "r":  # LONG_BINPUT
            saw_binary = True
            idx = r.u4()
            if last_string is not None:
                memo[idx] = last_string
        elif c == "h":  # BINGET
            saw_binary = True
            idx = r.u1()
            if idx in memo:
                push_string(memo[idx], counted=False)
        elif c == "j":  # LONG_BINGET
            saw_binary = True
            idx = r.u4()
            if idx in memo:
                push_string(memo[idx], counted=False)
        elif c == "p":  # PUT line
            idx = int(r.line())
            if last_string is not None:
                memo[idx] = last_string
        elif c == "g":  # GET line
            idx = int(r.line())
            if idx in memo:
                push_string(memo[idx], counted=False)
        elif c == "P":  # PERSID line
            r.line()
        elif op in (0x82, 0x83, 0x84):  # EXT1/2/4
            saw_binary = True
            r.take(1 if op == 0x82 else (2 if op == 0x83 else 4))
        else:
            raise ValueError(f"unknown pickle opcode {op:#04x} at {r.pos - 1}")
        # memo bookkeeping: MEMOIZE stores the top of stack under the
        # next sequential key; PUT variants and framing opcodes are
        # stack-transparent, everything else replaces the "top is a
        # string" knowledge with this opcode's own push (or nothing)
        if op == 0x94:  # MEMOIZE
            if last_string is not None:
                memo[memo_seq] = last_string
            memo_seq += 1
        elif op not in (0x80, 0x95) and c not in ("q", "r", "p"):
            last_string = pushed_string

    if protocol == 0 and saw_binary:
        protocol = 1
    return {
        "protocol": protocol,
        "n_opcodes": n_opcodes,
        "n_ints": n_ints,
        "int_sum": int_sum,
        "n_strings": n_strings,
        "str_chars": str_chars,
        "n_lists": n_lists,
        "n_nones": n_nones,
        "n_globals": len(globals_),
        "global_names": ";".join(globals_),
        "payload_bytes": len(payload),
    }


class _Marker:
    """Module-level class pickled BY REFERENCE in the synthesis: its
    pickle is a pure GLOBAL/STACK_GLOBAL record — the exact shape the
    scanner's security triage exists to surface."""


def synth_pickle_plan(seed: int) -> dict:
    """Plan mirrored in the DuckDB oracle: a dict of ``5 + seed%10``
    entries keyed ``k{i}``; value by ``i%4``: 0 -> the int
    ``(seed*13 + i*7) % 100000 - 20000``, 1 -> the string
    ``s{seed}x{i}``, 2 -> a list of ``1 + i%3`` ints
    ``seed%1000 + j*3``, 3 -> None.  Every 7th seed adds key
    ``gmark`` -> the :class:`_Marker` CLASS (a global reference).
    Protocol rotates ``seed % 6``."""
    n = 5 + seed % 10
    return {"n": n, "protocol": seed % 6, "has_global": seed % 7 == 0}


def synth_pickle(seed: int) -> bytes:
    import pickle

    plan = synth_pickle_plan(seed)
    obj: dict = {}
    for i in range(plan["n"]):
        kind = i % 4
        if kind == 0:
            obj[f"k{i}"] = (seed * 13 + i * 7) % 100000 - 20000
        elif kind == 1:
            obj[f"k{i}"] = f"s{seed}x{i}"
        elif kind == 2:
            obj[f"k{i}"] = [seed % 1000 + j * 3 for j in range(1 + i % 3)]
        else:
            obj[f"k{i}"] = None
    if plan["has_global"]:
        obj["gmark"] = _Marker
    return pickle.dumps(obj, protocol=plan["protocol"])
