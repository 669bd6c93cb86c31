"""PDF reader (functions/pdf_text.py): object tokenizer, xref walk,
zlib-container inflate, and text-operator extraction."""

from __future__ import annotations

import zlib

import pytest

from datawarehouseproject_spark.functions.pdf_text import (
    _Lexer,
    extract_pdf_text,
    synth_pdf,
    synth_pdf_plan,
    zlib_inflate,
)


def test_roundtrip_plans():
    for seed in (0, 1, 2, 7, 23):
        plan = synth_pdf_plan(seed)
        out = extract_pdf_text(synth_pdf(seed))
        assert out["n_pages"] == plan["n_pages"]
        assert out["text"] == plan["text"]
        assert out["n_objects"] == 4 + 2 * plan["n_pages"]


def test_zlib_container_verifies_adler():
    raw = b"content stream bytes" * 10
    z = zlib.compress(raw, 6)
    assert zlib_inflate(z) == raw
    bad = bytearray(z)
    bad[-1] ^= 1
    with pytest.raises(ValueError, match="Adler-32"):
        zlib_inflate(bytes(bad))
    with pytest.raises(ValueError, match="header check"):
        zlib_inflate(b"\x78\x00" + z[2:])


def test_literal_string_escapes():
    lex = _Lexer(rb"(a\(b\)c\\d\101\n\500x)")
    tok = lex.next_token()
    assert tok[0] == "str"
    # \500 octal overflows a byte: kept mod 256 (0x40 = '@')
    assert tok[1] == b"a(b)c\\dA\n\x40x"
    lex = _Lexer(b"(nested (parens) balance)")
    assert lex.next_token()[1] == b"nested (parens) balance"
    with pytest.raises(ValueError, match="unterminated"):
        _Lexer(b"(never closed").next_token()


def test_hex_string_odd_digit():
    lex = _Lexer(b"<48 49 2")  # odd count: final digit implies 0
    with pytest.raises(ValueError, match="unterminated"):
        lex.next_token()
    lex = _Lexer(b"<48492>")
    assert lex.next_token()[1] == b"HI\x20"


def test_indirect_reference_lookahead():
    lex = _Lexer(b"<< /A 3 0 R /B 7 >>")
    d = lex.parse_value()
    assert d["A"] == ("ref", 3)
    assert d["B"] == 7


def test_boundaries_quarantine():
    good = synth_pdf(1)
    with pytest.raises(ValueError, match="PDF"):
        extract_pdf_text(b"not a pdf at all")
    # corrupt the startxref offset
    bad = good.replace(b"startxref", b"startxref\n999999\n%", 1)
    with pytest.raises(ValueError):
        extract_pdf_text(bad)
    # encrypted trailer
    enc = good.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    with pytest.raises(ValueError, match="encrypted"):
        extract_pdf_text(enc)
    # /Prev is FOLLOWED now (round 10); a bogus offset still raises
    prev = good.replace(b"/Root 1 0 R", b"/Root 1 0 R /Prev 42")
    with pytest.raises(ValueError, match="xref"):
        extract_pdf_text(prev)


def test_multi_content_array_and_direct_length():
    """A page whose /Contents is an ARRAY of two uncompressed
    streams — text must concatenate across them."""
    c1, c2 = b"BT (alpha) Tj ET", b"BT (beta) Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>",
        4: f"<< /Length {len(c1)} >>".encode() + b"\nstream\n" + c1 + b"\nendstream",
        5: f"<< /Length {len(c2)} >>".encode() + b"\nstream\n" + c2 + b"\nendstream",
    }
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for n in sorted(objs):
        offs[n] = len(out)
        out += f"{n} 0 obj\n".encode() + objs[n] + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for n in sorted(objs):
        out += f"{offs[n]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    got = extract_pdf_text(bytes(out))
    assert got["text"] == "alphabeta"
    assert got["n_pages"] == 1


def test_objstm_length_cycle_raises_valueerror_not_recursionerror():
    """ADVICE r10: xref maps object 1 INTO ObjStm 5 while 5's dict has
    /Length 1 0 R -> obj(1) -> _objstm_obj -> obj(5) -> obj(1) recursed
    unboundedly; RecursionError escaped the ValueError quarantine."""
    from datawarehouseproject_spark.functions.pdf_text import _Document

    data = (
        b"%\n5 0 obj\n<< /Type /ObjStm /N 1 /First 4 /Length 1 0 R >>\n"
        b"stream\nXXXX\nendstream\nendobj\n"
    )
    doc = _Document(data, {1: ("objstm", 5, 0), 5: 2})
    with pytest.raises(ValueError, match="cycle"):
        doc.obj(("ref", 1))


def test_direct_self_length_cycle_quarantined():
    """Degenerate single-object cycle: a stream whose /Length is an
    indirect ref to ITSELF."""
    from datawarehouseproject_spark.functions.pdf_text import _Document

    data = (
        b"%\n7 0 obj\n<< /Length 7 0 R >>\nstream\nAB\nendstream\nendobj\n"
    )
    doc = _Document(data, {7: 2})
    with pytest.raises(ValueError, match="cycle"):
        doc.obj(("ref", 7))
