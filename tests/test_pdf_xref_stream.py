"""PDF 1.5+ layouts: cross-reference streams, object streams, PNG
predictors, incremental /Prev chains, hybrid /XRefStm — the round-9
verdict's highest-hit-rate quarantine gap, now read for real.

Producers: the deterministic writers in ``functions/pdf_text.py``
(`synth_pdf_xref_stream`, `synth_pdf_incremental`) plus hand-built
minimal files for the edge layouts.  Where available, pyarrow is NOT
a PDF producer — the cross-check is the plan-formula oracle and the
classic-layout reader over the same text plan.
"""

from __future__ import annotations

import re
import zlib

import pytest

from datawarehouseproject_spark.functions.pdf_text import (
    _png_unpredict,
    _read_xref_chain,
    extract_pdf_text,
    synth_pdf,
    synth_pdf_incremental,
    synth_pdf_plan,
    synth_pdf_xref_stream,
)


def test_xref_stream_matches_classic_layout():
    """Same text plan through both container generations."""
    for seed in range(9):
        plan = synth_pdf_plan(seed)
        classic = extract_pdf_text(synth_pdf(seed))
        modern = extract_pdf_text(synth_pdf_xref_stream(seed))
        assert modern["text"] == classic["text"] == plan["text"]
        assert modern["n_pages"] == classic["n_pages"]
        # ObjStm + XRef stream are one extra object over classic's
        # indirect-length object
        assert modern["n_objects"] == classic["n_objects"] + 1


def test_incremental_update_page0_replaced():
    for seed in range(9):
        plan = synth_pdf_plan(seed)
        r = extract_pdf_text(synth_pdf_incremental(seed))
        pages = [f"rev2 {seed} page 0"] + plan["pages"][1:]
        assert r["text"] == "|".join(pages)
        assert r["n_objects"] == plan["n_pages"] * 2 + 4


def test_png_unpredict_filters():
    import numpy as np

    rng = np.random.default_rng(7)
    raw = rng.integers(0, 256, size=(6, 5), dtype=np.uint8)
    # encode with filter 2 (Up) by hand, decode through the reader
    enc = bytearray()
    prev = np.zeros(5, dtype=np.uint8)
    for row in raw:
        enc.append(2)
        enc += (row - prev).astype(np.uint8).tobytes()
        prev = row
    assert _png_unpredict(bytes(enc), 5, 1) == raw.tobytes()
    with pytest.raises(ValueError, match="whole filtered rows"):
        _png_unpredict(bytes(enc)[:-1], 5, 1)


def test_predictor_boundaries():
    pdf = synth_pdf_xref_stream(0)
    # TIFF predictor 2 is a documented boundary
    bad = pdf.replace(b"/Predictor 12", b"/Predictor 2")
    with pytest.raises(ValueError, match="predictor"):
        extract_pdf_text(bad)


def test_freed_entry_shadows_old_offset():
    """The incremental update frees the orphaned indirect-length
    object; the merged xref must treat it as missing even though the
    base table still holds its offset."""
    seed = 0
    blob = synth_pdf_incremental(seed)
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", blob[-256:]):
        pass
    xref, trailer = _read_xref_chain(blob, int(m.group(1)))
    n_pages = 1 + seed % 3
    len_obj = 4 + 2 * n_pages
    assert xref[len_obj] is None  # freed, not the base offset
    assert trailer["Root"] == ("ref", 1)


def test_prev_loop_and_long_chain_raise():
    blob = synth_pdf_incremental(1)
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", blob[-256:]):
        pass
    start = int(m.group(1))
    # make the update's /Prev point at the update itself: loop
    old = re.search(rb"/Prev (\d+)", blob).group(1)
    looped = blob.replace(
        b"/Prev " + old, b"/Prev " + str(start).encode(), 1
    )
    with pytest.raises(ValueError, match="loop"):
        _read_xref_chain(looped, start)


def test_hybrid_xrefstm_supplements_classic():
    """A classic table whose trailer points at an /XRefStm holding
    the entries the table omits (the hybrid-reference layout)."""
    content = b"BT (hybrid) Tj ET"
    out = bytearray(b"%PDF-1.5\n")
    offs = {}
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: f"<< /Length {len(content)} >>".encode()
        + b"\nstream\n" + content + b"\nendstream",
    }
    for n in sorted(objs):
        offs[n] = len(out)
        out += f"{n} 0 obj\n".encode() + objs[n] + b"\nendobj\n"
    # xref stream object 5 carries entries for objects 3 and 4
    rows = b"".join(
        bytes([1]) + offs[n].to_bytes(4, "big") + b"\x00\x00"
        for n in (3, 4)
    )
    comp = zlib.compress(rows)
    xs_off = len(out)
    out += (
        f"5 0 obj\n<< /Type /XRef /Size 6 /W [1 4 2] /Index [3 2] "
        f"/Root 1 0 R /Length {len(comp)} /Filter /FlateDecode >>"
        f"\nstream\n".encode()
        + comp
        + b"\nendstream\nendobj\n"
    )
    # classic section: only objects 0-2 and 5; trailer names /XRefStm
    xref_pos = len(out)
    out += b"xref\n0 3\n0000000000 65535 f \n"
    out += f"{offs[1]:010d} 00000 n \n{offs[2]:010d} 00000 n \n".encode()
    out += f"5 1\n{xs_off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size 6 /Root 1 0 R /XRefStm {xs_off} >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    r = extract_pdf_text(bytes(out))
    assert r["text"] == "hybrid"
    assert r["n_pages"] == 1


def test_objstm_directory_mismatch_raises():
    pdf = bytearray(synth_pdf_xref_stream(2))
    # corrupt the object stream's directory: flip a digit of the
    # first object number inside the compressed ObjStm payload —
    # easiest by regenerating: instead corrupt the xref row type-2
    # index via the stream body. Simpler: truncate the ObjStm /First.
    bad = bytes(pdf).replace(b"/Type /ObjStm /N 3", b"/Type /ObjStm /N 4")
    with pytest.raises(ValueError):
        extract_pdf_text(bad)


def test_xref_stream_w_and_index_validation():
    pdf = synth_pdf_xref_stream(1)  # seed 1 writes explicit /Index
    bad = pdf.replace(b"/W [1 4 2]", b"/W [1 4 9]")
    with pytest.raises(ValueError):
        extract_pdf_text(bad)
    bad2 = pdf.replace(b"/Index [0 ", b"/Index [1 ")
    with pytest.raises(ValueError):
        extract_pdf_text(bad2)


def test_objstm_indirect_n_cannot_recurse():
    """Review r10: /N (or /First) as an indirect ref pointing back
    into the same ObjStm must quarantine, not RecursionError."""
    pdf = bytearray(synth_pdf_xref_stream(0))
    # make /N indirect: '/N 3' -> '/N 3 0 R' shifts offsets, so build
    # the failure the cheap way: patch the dict text in place is not
    # length-preserving; instead synthesize a minimal file
    import zlib as _z

    out = bytearray(b"%PDF-1.5\n")
    offs = {}
    # ObjStm 3 whose /N is '4 0 R' and xref maps 4 INTO objstm 3
    inner = b"<< /Type /Catalog >>"
    header = b"1 0 "
    stm_plain = header + inner
    comp = _z.compress(stm_plain)
    offs[3] = len(out)
    out += (
        f"3 0 obj\n<< /Type /ObjStm /N 4 0 R /First {len(header)} "
        f"/Length {len(comp)} /Filter /FlateDecode >>\nstream\n".encode()
        + comp + b"\nendstream\nendobj\n"
    )
    rows = [
        (0, 0, 65535),
        (2, 3, 0),    # object 1 inside objstm 3
        (0, 0, 0),    # object 2 free
        (1, offs[3], 0),
        (2, 3, 1),    # object 4 inside objstm 3 (the /N ref target)
    ]
    xref_pos = len(out)
    raw = b"".join(
        bytes([t]) + b.to_bytes(4, "big") + c.to_bytes(2, "big")
        for t, b, c in rows
    ) + bytes([1]) + xref_pos.to_bytes(4, "big") + b"\x00\x00"
    comp = _z.compress(raw)
    out += (
        f"5 0 obj\n<< /Type /XRef /Size 6 /W [1 4 2] /Root 1 0 R "
        f"/Length {len(comp)} /Filter /FlateDecode >>\nstream\n".encode()
        + comp + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
    with pytest.raises(ValueError):
        extract_pdf_text(bytes(out))


def test_hybrid_xrefstm_wins_over_classic_free():
    """Acrobat-style hybrid: the classic table marks ObjStm-contained
    objects FREE (legacy fallback); the /XRefStm's type-2 entries
    must win within the tier."""
    import zlib as _z

    content = b"BT (hyb2) Tj ET"
    out = bytearray(b"%PDF-1.5\n")
    offs = {}
    # objects 1 (catalog) and 2 (pages) live in ObjStm 5
    inner = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
    }
    dir_parts, bodies, rel = [], [], 0
    for num in sorted(inner):
        dir_parts.append(f"{num} {rel}")
        bodies.append(inner[num])
        rel += len(inner[num]) + 1
    header = (" ".join(dir_parts) + " ").encode()
    stm_plain = header + b" ".join(bodies)
    comp = _z.compress(stm_plain)
    offs[5] = len(out)
    out += (
        f"5 0 obj\n<< /Type /ObjStm /N 2 /First {len(header)} "
        f"/Length {len(comp)} /Filter /FlateDecode >>\nstream\n".encode()
        + comp + b"\nendstream\nendobj\n"
    )
    for n, body in (
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        (4, f"<< /Length {len(content)} >>".encode()
            + b"\nstream\n" + content + b"\nendstream"),
    ):
        offs[n] = len(out)
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    # XRefStm object 6: type-2 entries for 1,2 + type-1 for 5
    rows = [
        (2, 5, 0),
        (2, 5, 1),
        (1, offs[5], 0),
    ]
    raw = b"".join(
        bytes([t]) + b.to_bytes(4, "big") + c.to_bytes(2, "big")
        for t, b, c in rows
    )
    comp = _z.compress(raw)
    xs_off = len(out)
    out += (
        f"6 0 obj\n<< /Type /XRef /Size 7 /W [1 4 2] "
        f"/Index [1 2 5 1] /Root 1 0 R /Length {len(comp)} "
        f"/Filter /FlateDecode >>\nstream\n".encode()
        + comp + b"\nendstream\nendobj\n"
    )
    # classic table marks 1 and 2 FREE, locates 3, 4, 6
    xref_pos = len(out)
    out += b"xref\n0 5\n"
    out += b"0000000000 65535 f \n"
    out += b"0000000000 00001 f \n"  # object 1: free in classic
    out += b"0000000000 00001 f \n"  # object 2: free in classic
    out += f"{offs[3]:010d} 00000 n \n{offs[4]:010d} 00000 n \n".encode()
    out += f"6 1\n{xs_off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size 7 /Root 1 0 R /XRefStm {xs_off} >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    r = extract_pdf_text(bytes(out))
    assert r["text"] == "hyb2"
