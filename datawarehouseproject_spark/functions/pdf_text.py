"""PDF text extraction from raw bytes — the #1 document format a
training-data pipeline meets (papers, invoices, scans with text
layers), parsed here from first principles.

Reader path (all layouts are public, ISO 32000-1 / the PDF 1.4
reference):

- tail scan: ``startxref`` -> classic cross-reference TABLE
  (subsection headers + fixed 20-byte entries) -> trailer dict
  (``/Root``, ``/Size``);
- a real PDF object tokenizer: dictionaries, arrays, names, numbers,
  literal strings with nesting/escapes/octal, hex strings, indirect
  references, booleans/null;
- document walk: catalog -> page tree -> per-page ``/Contents``
  (single ref or array, ``/Length`` possibly indirect);
- content streams are **FlateDecode**, decompressed by THIS repo's
  hand-rolled DEFLATE inflater (:mod:`.inflate`) through the
  zlib-container wrapper below (header check + Adler-32 verify) —
  no zlib on the read side;
- text operators ``Tj``, ``'`` and ``TJ`` (string elements shown,
  kerning numbers skipped) with full literal-string unescaping.

The PRODUCER is the deterministic writer at the bottom — a
spec-complete classic-xref PDF assembled byte-by-byte (correct
offsets, free-entry 0, trailer, ``%%EOF``) — the same
self-synthesis pattern as the JPEG/PNG codecs, validated both ways
(every synthesized offset is re-derived by the reader, and the
recovered text is value-checked against the plan formulas by the
oracle).

Documented boundaries (ValueError -> quarantine): cross-reference
STREAMS and object streams (PDF 1.5+), encryption, incremental
updates (``/Prev``), and non-Flate filters. Error contract: only
ValueError escapes (fuzz-pinned).
"""

from __future__ import annotations

import re

from .inflate import inflate

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def zlib_inflate(data: bytes, max_output: int = 1 << 26) -> bytes:
    """RFC 1950 container around a raw DEFLATE body: 2-byte header
    (method 8, window, no preset dict, FCHECK multiple of 31) + the
    stream + Adler-32 of the plaintext — verified here."""
    if len(data) < 6:
        raise ValueError("zlib stream too short")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise ValueError(f"zlib method {cmf & 0x0F} is not deflate")
    if (cmf << 8 | flg) % 31 != 0:
        raise ValueError("zlib header check failed")
    if flg & 0x20:
        raise ValueError("zlib preset dictionary unsupported")
    out = inflate(data[2:-4], max_output=max_output)
    a, b = 1, 0
    for byte in out:
        a = (a + byte) % 65521
        b = (b + a) % 65521
    if ((b << 16) | a) != int.from_bytes(data[-4:], "big"):
        raise ValueError("zlib Adler-32 mismatch")
    return out


class _Lexer:
    """Tokenizer over the PDF object syntax."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        data, n = self.data, len(self.data)
        while self.pos < n:
            c = self.data[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to end of line
                while self.pos < n and data[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def next_token(self):
        """Returns one of: ('dict_open'/'dict_close'/'arr_open'/
        'arr_close',), ('name', str), ('num', int|float),
        ('str', bytes), ('kw', str), or None at end."""
        self._skip_ws()
        data, n = self.data, len(self.data)
        if self.pos >= n:
            return None
        c = data[self.pos]
        if data[self.pos : self.pos + 2] == b"<<":
            self.pos += 2
            return ("dict_open",)
        if data[self.pos : self.pos + 2] == b">>":
            self.pos += 2
            return ("dict_close",)
        if c == 0x5B:  # [
            self.pos += 1
            return ("arr_open",)
        if c == 0x5D:  # ]
            self.pos += 1
            return ("arr_close",)
        if c == 0x2F:  # /Name
            self.pos += 1
            start = self.pos
            while self.pos < n and data[self.pos] not in _WS and data[self.pos] not in _DELIM:
                self.pos += 1
            return ("name", data[start : self.pos].decode("latin-1"))
        if c == 0x28:  # (literal string)
            return ("str", self._literal_string())
        if c == 0x3C:  # <hex string>
            end = data.find(b">", self.pos + 1)
            if end < 0:
                raise ValueError("unterminated hex string")
            hexs = bytes(
                ch for ch in data[self.pos + 1 : end] if ch not in _WS
            )
            if len(hexs) % 2:
                hexs += b"0"  # spec: odd final digit implies 0
            try:
                out = bytes.fromhex(hexs.decode("ascii"))
            except (ValueError, UnicodeDecodeError):
                raise ValueError("bad hex string") from None
            self.pos = end + 1
            return ("str", out)
        if c in b"+-.0123456789":
            start = self.pos
            self.pos += 1
            while self.pos < n and data[self.pos] in b".0123456789":
                self.pos += 1
            txt = data[start : self.pos]
            try:
                return ("num", float(txt) if b"." in txt else int(txt))
            except ValueError:
                raise ValueError(f"bad number token {txt!r}") from None
        start = self.pos
        while self.pos < n and data[self.pos] not in _WS and data[self.pos] not in _DELIM:
            self.pos += 1
        if self.pos == start:
            raise ValueError(f"unexpected byte {c:#x} in object stream")
        return ("kw", data[start : self.pos].decode("latin-1"))

    def _literal_string(self) -> bytes:
        data, n = self.data, len(self.data)
        pos = self.pos + 1
        depth = 1
        out = bytearray()
        while pos < n:
            c = data[pos]
            if c == 0x5C:  # backslash
                if pos + 1 >= n:
                    raise ValueError("string escape at end of data")
                e = data[pos + 1]
                pos += 2
                if e in b"nrtbf()\\":
                    out.append(
                        {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}.get(e, e)
                    )
                elif e in b"01234567":  # up to 3 octal digits
                    oct_digits = bytes([e])
                    while (
                        len(oct_digits) < 3
                        and pos < n
                        and data[pos] in b"01234567"
                    ):
                        oct_digits += bytes([data[pos]])
                        pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    if e == 0x0D and pos < n and data[pos] == 0x0A:
                        pos += 1
                # unknown escape: spec says drop the backslash
                else:
                    out.append(e)
            elif c == 0x28:
                depth += 1
                out.append(c)
                pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos = pos + 1
                    return bytes(out)
                out.append(c)
                pos += 1
            else:
                out.append(c)
                pos += 1
        raise ValueError("unterminated literal string")

    def parse_value(self, tok=None):
        """One PDF value; 'N G R' indirect refs come back as
        ('ref', N)."""
        if tok is None:
            tok = self.next_token()
        if tok is None:
            raise ValueError("unexpected end of object data")
        kind = tok[0]
        if kind == "dict_open":
            d = {}
            while True:
                t = self.next_token()
                if t is None:
                    raise ValueError("unterminated dictionary")
                if t[0] == "dict_close":
                    return d
                if t[0] != "name":
                    raise ValueError(f"dictionary key is {t[0]}, not a name")
                d[t[1]] = self.parse_value()
            # not reached
        if kind == "arr_open":
            arr = []
            while True:
                t = self.next_token()
                if t is None:
                    raise ValueError("unterminated array")
                if t[0] == "arr_close":
                    return arr
                arr.append(self.parse_value(t))
        if kind == "num":
            # lookahead for "G R" (indirect reference)
            save = self.pos
            t2 = self.next_token()
            if t2 is not None and t2[0] == "num":
                t3 = self.next_token()
                if t3 is not None and t3[0] == "kw" and t3[1] == "R":
                    return ("ref", int(tok[1]))
            self.pos = save
            return tok[1]
        if kind in ("str", "name"):
            return tok[1]
        if kind == "kw":
            if tok[1] == "true":
                return True
            if tok[1] == "false":
                return False
            if tok[1] == "null":
                return None
            raise ValueError(f"unexpected keyword {tok[1]!r} in value")
        raise ValueError(f"unexpected token {kind} in value")


class _Document:
    def __init__(self, data: bytes, xref: dict[int, int]):
        self.data = data
        self.xref = xref
        self._cache: dict[int, object] = {}

    def obj(self, ref):
        """Resolve ('ref', n) (or pass a direct value through)."""
        if not (isinstance(ref, tuple) and len(ref) == 2 and ref[0] == "ref"):
            return ref
        n = ref[1]
        if n in self._cache:
            return self._cache[n]
        off = self.xref.get(n)
        if off is None or off <= 0 or off >= len(self.data):
            raise ValueError(f"object {n} missing from xref")
        lex = _Lexer(self.data, off)
        t1, t2, t3 = lex.next_token(), lex.next_token(), lex.next_token()
        if (
            t1 is None or t1[0] != "num" or int(t1[1]) != n
            or t2 is None or t2[0] != "num"
            or t3 is None or t3 != ("kw", "obj")
        ):
            raise ValueError(f"object {n}: header not 'N G obj' at {off}")
        value = lex.parse_value()
        nxt = lex.next_token()
        if nxt == ("kw", "stream"):
            if not isinstance(value, dict):
                raise ValueError(f"object {n}: stream without a dict")
            # EOL after 'stream' is CRLF or LF
            p = lex.pos
            if self.data[p : p + 2] == b"\r\n":
                p += 2
            elif self.data[p : p + 1] == b"\n":
                p += 1
            else:
                raise ValueError("stream keyword not followed by EOL")
            length = self.obj(value.get("Length"))
            if not isinstance(length, int) or length < 0 or p + length > len(self.data):
                raise ValueError(f"object {n}: bad stream /Length")
            value = _Stream(value, self.data[p : p + length])
        self._cache[n] = value
        return value


class _Stream:
    __slots__ = ("d", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.d = d
        self.raw = raw

    def decoded(self) -> bytes:
        filt = self.d.get("Filter")
        if filt is None:
            return self.raw
        if filt == "FlateDecode":
            if "DecodeParms" in self.d and self.d["DecodeParms"] is not None:
                raise ValueError("FlateDecode predictors out of scope")
            return zlib_inflate(self.raw)
        raise ValueError(f"stream filter {filt!r} out of scope")


def _parse_xref_table(data: bytes, start: int) -> tuple[dict[int, int], dict]:
    """Classic cross-reference table + trailer. Xref STREAMS (an
    object at startxref instead of the 'xref' keyword) are a
    documented boundary."""
    lex = _Lexer(data, start)
    t = lex.next_token()
    if t != ("kw", "xref"):
        raise ValueError(
            "no classic xref table at startxref (xref streams out of scope)"
        )
    xref: dict[int, int] = {}
    while True:
        save = lex.pos
        t = lex.next_token()
        if t == ("kw", "trailer"):
            break
        if t is None or t[0] != "num":
            raise ValueError("xref subsection header malformed")
        first = int(t[1])
        t2 = lex.next_token()
        if t2 is None or t2[0] != "num":
            raise ValueError("xref subsection count malformed")
        count = int(t2[1])
        if count < 0 or count > 1 << 20:
            raise ValueError("unreasonable xref subsection count")
        lex._skip_ws()
        pos = lex.pos
        for i in range(count):
            entry = data[pos : pos + 20]
            if len(entry) < 18:
                raise ValueError("truncated xref entry")
            try:
                off = int(entry[0:10])
            except ValueError:
                raise ValueError("non-numeric xref offset") from None
            kind = entry[17:18]
            if kind == b"n":
                xref[first + i] = off
            elif kind != b"f":
                raise ValueError(f"xref entry type {kind!r} unknown")
            pos += 20
        lex.pos = pos
        del save
    trailer = lex.parse_value()
    if not isinstance(trailer, dict):
        raise ValueError("trailer is not a dictionary")
    if "Prev" in trailer:
        raise ValueError("incremental updates (/Prev) out of scope")
    if "Encrypt" in trailer:
        raise ValueError("encrypted PDF out of scope")
    return xref, trailer


_TEXT_SHOW_OPS = ("Tj", "'", '"')


def _extract_text_ops(content: bytes) -> list[str]:
    """Walk a content stream; collect shown text from Tj / ' / " /
    TJ in operator order. Operands stack up until an operator names
    what to do with them — the PostScript-heritage model."""
    lex = _Lexer(content)
    stack: list = []
    out: list[str] = []
    while True:
        t = lex.next_token()
        if t is None:
            return out
        if t[0] == "kw":
            op = t[1]
            if op in _TEXT_SHOW_OPS:
                if stack and isinstance(stack[-1], bytes):
                    out.append(stack[-1].decode("latin-1"))
            elif op == "TJ":
                if stack and isinstance(stack[-1], list):
                    out.append(
                        "".join(
                            e.decode("latin-1")
                            for e in stack[-1]
                            if isinstance(e, bytes)
                        )
                    )
            stack.clear()
        elif t[0] == "str":
            stack.append(t[1])
        elif t[0] == "arr_open":
            arr = []
            while True:
                t2 = lex.next_token()
                if t2 is None:
                    raise ValueError("unterminated TJ array")
                if t2[0] == "arr_close":
                    break
                if t2[0] == "str":
                    arr.append(t2[1])
            stack.append(arr)
        elif t[0] == "num" or t[0] == "name":
            stack.append(t[1])
        elif t[0] == "dict_open":
            # inline dicts (e.g. BDC property lists): parse and drop
            d = {}
            while True:
                t2 = lex.next_token()
                if t2 is None:
                    raise ValueError("unterminated content dict")
                if t2[0] == "dict_close":
                    break
                if t2[0] == "name":
                    d[t2[1]] = lex.parse_value()
            stack.append(d)
        # arr_close outside an array would be malformed; ignore


def extract_pdf_text(payload: bytes) -> dict:
    """Full reader walk; returns the `pdf_text_extract` features.
    Page texts are joined with '|', text runs within a page
    concatenate in operator order."""
    if payload[:5] != b"%PDF-":
        raise ValueError("not a PDF (missing %PDF- header)")
    tail = payload[-256:]
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", tail):
        pass  # keep the LAST startxref
    if m is None:
        raise ValueError("startxref not found in file tail")
    xref_pos = int(m.group(1))
    if xref_pos <= 0 or xref_pos >= len(payload):
        raise ValueError("startxref offset out of bounds")
    xref, trailer = _parse_xref_table(payload, xref_pos)
    doc = _Document(payload, xref)
    root = doc.obj(trailer.get("Root"))
    if not isinstance(root, dict) or root.get("Type") != "Catalog":
        raise ValueError("trailer /Root is not the catalog")
    pages_node = doc.obj(root.get("Pages"))
    if not isinstance(pages_node, dict) or pages_node.get("Type") != "Pages":
        raise ValueError("catalog /Pages is not a page tree")
    kids = pages_node.get("Kids")
    if not isinstance(kids, list):
        raise ValueError("page tree without /Kids")
    page_texts: list[str] = []
    for kid in kids:
        page = doc.obj(kid)
        if not isinstance(page, dict) or page.get("Type") != "Page":
            raise ValueError("page-tree kid is not a /Page (nesting out of scope)")
        contents = page.get("Contents")
        streams = contents if isinstance(contents, list) else [contents]
        chunks: list[str] = []
        for sref in streams:
            st = doc.obj(sref)
            if not isinstance(st, _Stream):
                raise ValueError("/Contents entry is not a stream")
            chunks.extend(_extract_text_ops(st.decoded()))
        page_texts.append("".join(chunks))
    size = trailer.get("Size")
    if not isinstance(size, int):
        raise ValueError("trailer /Size missing")
    text = "|".join(page_texts)
    return {
        "n_pages": len(page_texts),
        "n_objects": size - 1,  # object 0 is the free-list head
        "text": text,
        "text_chars": len(text),
    }


# --- deterministic producer ------------------------------------------------


def synth_pdf_plan(seed: int) -> dict:
    """Text plan, mirrored in the DuckDB oracle: ``1 + seed%3``
    pages; page p shows, in order: ``Invoice {seed} page {p}``
    (Tj), ``line two {seed+p}`` ('), ``par``+``t{p}`` (TJ with a
    kerning number between), ``a(b)c\\dA`` (escapes + octal) and
    ``#{p}`` (hex string)."""
    n_pages = 1 + seed % 3
    pages = [
        f"Invoice {seed} page {p}"
        f"line two {seed + p}"
        f"part{p}"
        "a(b)c\\dA"
        f"#{p}"
        for p in range(n_pages)
    ]
    return {"n_pages": n_pages, "pages": pages, "text": "|".join(pages)}


def synth_pdf(seed: int) -> bytes:
    """Assemble a classic-xref PDF byte-by-byte: catalog, page tree,
    one page + one FlateDecode content stream per page (page 0's
    /Length is an INDIRECT reference, exercising that resolution
    path), a shared Type1 font, a correct xref table and trailer."""
    import zlib

    n_pages = 1 + seed % 3
    objects: dict[int, bytes] = {}
    # object numbering: 1 catalog, 2 pages, 3 font,
    # per page p: 4+2p page, 5+2p content; length obj for page 0 last
    font_ref = 3
    first_page_obj = 4
    len_obj = first_page_obj + 2 * n_pages
    kids = " ".join(f"{first_page_obj + 2 * p} 0 R" for p in range(n_pages))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objects[font_ref] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    streams: dict[int, bytes] = {}
    for p in range(n_pages):
        page_obj = first_page_obj + 2 * p
        content_obj = page_obj + 1
        hexs = f"#{p}".encode().hex().upper()
        content = (
            f"BT /F1 12 Tf 72 720 Td (Invoice {seed} page {p}) Tj "
            f"0 -14 Td (line two {seed + p}) ' "
            f"[(par) -250 (t{p})] TJ "
            "(a\\(b\\)c\\\\d\\101) Tj "
            f"<{hexs}> Tj ET"
        ).encode()
        comp = zlib.compress(content, 9)
        if p == 0:
            dict_bytes = (
                f"<< /Length {len_obj} 0 R /Filter /FlateDecode >>".encode()
            )
            objects[len_obj] = str(len(comp)).encode()
        else:
            dict_bytes = (
                f"<< /Length {len(comp)} /Filter /FlateDecode >>".encode()
            )
        streams[content_obj] = dict_bytes + b"\nstream\n" + comp + b"\nendstream"
        objects[page_obj] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_ref} 0 R >> >> "
            f"/Contents {content_obj} 0 R >>"
        ).encode()
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for n in sorted(set(objects) | set(streams)):
        offsets[n] = len(out)
        body = streams.get(n, objects.get(n))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    size = len(offsets) + 1
    xref_pos = len(out)
    out += f"xref\n0 {size}\n".encode()
    out += b"0000000000 65535 f \n"
    for n in range(1, size):
        out += f"{offsets[n]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {size} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)
