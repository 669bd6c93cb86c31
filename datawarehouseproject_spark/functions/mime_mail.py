"""MIME e-mail (RFC 5322 + RFC 2045-2047) parsing from raw bytes —
the mail-corpus ingestion format (Enron, mailing-list archives, MIME
crawl payloads are all this grammar).

The PRODUCER is the stdlib :mod:`email` package (``EmailMessage`` +
``policy.SMTP`` — an independent, battle-tested serializer); the
parser below shares no code with it: header unfolding, RFC 2047
encoded-word decode (B and Q forms), Content-Type parameter parsing,
multipart boundary splitting, and base64 / quoted-printable
content-transfer decoding are all hand-rolled here. Same
parser-vs-independent-producer pinning as the ZIP/tar/gzip scanners
(``zipscan.py``).

Scope (documented boundaries, same contract as the other triage
parsers): single-level multipart (``multipart/mixed`` with leaf
parts — no nested multiparts), utf-8 / us-ascii charsets, CRLF line
endings (what SMTP policy emits and what RFC 5322 requires on the
wire). Anything outside raises ``ValueError`` and quarantines via
the permissive path in ``operators/multimodal.py``.

Error contract: ONLY ``ValueError`` escapes (never struct.error /
IndexError / UnicodeDecodeError), fuzz-pinned by
``tests/test_fuzz_quarantine.py``.
"""

from __future__ import annotations

import re

_B64_ALPHABET = (
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
)
_B64_VAL = {c: i for i, c in enumerate(_B64_ALPHABET)}
_ENCODED_WORD = re.compile(
    r"=\?([^?]+)\?([bBqQ])\?([^?]*)\?="
)
# RFC 2047 §6.2: whitespace between two ADJACENT encoded words is
# not rendered (it exists only to satisfy line-length limits).
_ADJACENT_WORDS = re.compile(r"(\?=)[ \t]+(=\?)")


def b64decode_strict(s: bytes) -> bytes:
    """Hand-rolled base64: whitespace-tolerant (RFC 2045 wraps at 76
    cols), otherwise strict — bad alphabet, bad length, or padding in
    the wrong place raises ValueError."""
    data = bytes(c for c in s if c not in b" \t\r\n")
    if len(data) % 4 != 0:
        raise ValueError(f"base64 length {len(data)} not a multiple of 4")
    pad = 0
    if data.endswith(b"=="):
        pad = 2
    elif data.endswith(b"="):
        pad = 1
    body = data[: len(data) - pad]
    if b"=" in body:
        raise ValueError("base64 padding before end of data")
    out = bytearray()
    acc = bits = 0
    for c in body:
        v = _B64_VAL.get(c)
        if v is None:
            raise ValueError(f"base64 byte {c:#x} outside alphabet")
        acc = (acc << 6) | v
        bits += 6
        if bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
    # the dangling bits must be zero padding
    if acc & ((1 << bits) - 1):
        raise ValueError("base64 non-zero trailing bits")
    return bytes(out)


def qp_decode(s: bytes, header: bool = False) -> bytes:
    """Hand-rolled quoted-printable (RFC 2045 §6.7): =XX escapes and
    soft line breaks; in ``header`` mode (RFC 2047 Q-encoding)
    underscore decodes to space."""
    out = bytearray()
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == 0x3D:  # '='
            nxt = s[i + 1 : i + 3]
            if nxt[:2] == b"\r\n":
                i += 3  # soft break
                continue
            if nxt[:1] == b"\n":
                i += 2
                continue
            if len(nxt) < 2:
                raise ValueError("quoted-printable truncated escape")
            try:
                out.append(int(nxt, 16))
            except ValueError:
                raise ValueError(
                    f"quoted-printable bad hex {nxt!r}"
                ) from None
            i += 3
        elif header and c == 0x5F:  # '_' -> space in Q-encoded words
            out.append(0x20)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out)


def _decode_text(raw: bytes, charset: str) -> str:
    cs = charset.lower()
    if cs not in ("utf-8", "us-ascii", "ascii"):
        raise ValueError(f"unsupported charset {charset!r}")
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError as e:
        raise ValueError(f"undecodable {charset} text: {e}") from None


def decode_header_value(value: str) -> str:
    """RFC 2047: decode every encoded word in a header value,
    dropping the whitespace between adjacent encoded words."""
    value = _ADJACENT_WORDS.sub(r"\1\2", value)

    def one(m: re.Match) -> str:
        charset, form, payload = m.group(1), m.group(2), m.group(3)
        if form in ("b", "B"):
            raw = b64decode_strict(payload.encode("ascii"))
        else:
            raw = qp_decode(payload.encode("ascii"), header=True)
        return _decode_text(raw, charset)

    return _ENCODED_WORD.sub(one, value)


def _parse_headers(block: bytes) -> dict[str, str]:
    """Header block -> {lowercased-name: unfolded raw value}.
    Folding (RFC 5322 §2.2.3): a continuation line starts with WSP
    and extends the previous header; unfolding keeps one space."""
    headers: dict[str, str] = {}
    current: list[str] | None = None
    for line in block.split(b"\r\n"):
        if not line:
            continue
        if line[:1] in (b" ", b"\t"):
            if current is None:
                raise ValueError("continuation line before any header")
            current[1] += " " + line.strip().decode("ascii", "replace")
            continue
        if current is not None:
            headers[current[0]] = current[1]
        name, sep, val = line.partition(b":")
        if not sep:
            raise ValueError(f"header line without colon: {line[:40]!r}")
        try:
            current = [
                name.decode("ascii").strip().lower(),
                val.strip().decode("ascii"),
            ]
        except UnicodeDecodeError:
            # 8-bit header values (rare, non-conformant) kept lossily
            current = [
                name.decode("ascii", "replace").strip().lower(),
                val.strip().decode("ascii", "replace"),
            ]
    if current is not None:
        headers[current[0]] = current[1]
    return headers


def _parse_content_type(value: str) -> tuple[str, dict[str, str]]:
    """``type/subtype; a=b; c="d e"`` -> ("type/subtype", params)."""
    parts = value.split(";")
    ctype = parts[0].strip().lower()
    if "/" not in ctype:
        raise ValueError(f"malformed content type {ctype!r}")
    params: dict[str, str] = {}
    for p in parts[1:]:
        k, sep, v = p.partition("=")
        if not sep:
            continue
        v = v.strip()
        if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
            v = v[1:-1]
        params[k.strip().lower()] = v
    return ctype, params


def _transfer_decode(content: bytes, cte: str) -> bytes:
    cte = cte.lower()
    if cte in ("7bit", "8bit", "binary", ""):
        return content
    if cte == "base64":
        return b64decode_strict(content)
    if cte == "quoted-printable":
        return qp_decode(content)
    raise ValueError(f"unsupported content-transfer-encoding {cte!r}")


def _split_multipart(body: bytes, boundary: str) -> list[bytes]:
    """RFC 2046 §5.1.1 boundary split: delimiters are lines
    ``--boundary``; the CRLF preceding a delimiter belongs to the
    delimiter; the terminator is ``--boundary--``."""
    delim = b"--" + boundary.encode("ascii")
    # prepend CRLF so a boundary at offset 0 splits like any other
    segments = (b"\r\n" + body).split(b"\r\n" + delim)
    if len(segments) < 2:
        raise ValueError("multipart body without its boundary")
    closed = False
    parts: list[bytes] = []
    for seg in segments[1:]:
        if seg[:2] == b"--":
            closed = True
            break
        if seg[:2] != b"\r\n":
            raise ValueError("boundary line not CRLF-terminated")
        parts.append(seg[2:])
    if not closed:
        raise ValueError("multipart terminator (--boundary--) missing")
    return parts


def parse_mime_message(data: bytes) -> dict:
    """Parse one RFC 5322 message; returns the triage features the
    ``mime_message_parse`` query exposes (all formula-recomputable
    by the oracle from the synthesis plan)."""
    head, sep, body = data.partition(b"\r\n\r\n")
    if not sep:
        raise ValueError("no header/body separator (CRLF CRLF)")
    headers = _parse_headers(head)
    subject = decode_header_value(headers.get("subject", ""))
    from_raw = decode_header_value(headers.get("from", ""))
    m = re.search(r"@([A-Za-z0-9_.-]+)", from_raw)
    from_domain = m.group(1) if m else None
    ctype, params = _parse_content_type(
        headers.get("content-type", "text/plain; charset=us-ascii")
    )

    def angle(name: str) -> str | None:
        v = headers.get(name)
        return v.strip().strip("<>") if v else None

    message_id = angle("message-id")
    in_reply_to = angle("in-reply-to")

    def norm(s: str) -> str:
        return s.replace("\r\n", "\n")

    if not ctype.startswith("multipart/"):
        text = _transfer_decode(
            body, headers.get("content-transfer-encoding", "7bit")
        )
        decoded = norm(_decode_text(text, params.get("charset", "us-ascii")))
        return {
            "subject": subject,
            "from_domain": from_domain,
            "content_type": ctype,
            "n_parts": 1,
            "n_attachments": 0,
            "body_chars": len(decoded),
            "attach_bytes": 0,
            "qp_text": None,
            "message_id": message_id,
            "in_reply_to": in_reply_to,
        }

    boundary = params.get("boundary")
    if not boundary:
        raise ValueError("multipart content type without boundary param")
    raw_parts = _split_multipart(body, boundary)
    n_attachments = 0
    attach_bytes = 0
    body_chars = 0
    qp_text = None
    seen_body = False
    for raw in raw_parts:
        phead, psep, pbody = raw.partition(b"\r\n\r\n")
        if not psep:
            raise ValueError("part without header/body separator")
        ph = _parse_headers(phead)
        pct, pparams = _parse_content_type(
            ph.get("content-type", "text/plain; charset=us-ascii")
        )
        if pct.startswith("multipart/"):
            raise ValueError("nested multipart out of scope")
        cte = ph.get("content-transfer-encoding", "7bit")
        disp = ph.get("content-disposition", "").split(";")[0].strip().lower()
        payload = _transfer_decode(pbody, cte)
        if disp == "attachment":
            n_attachments += 1
            if pct.startswith("text/"):
                decoded = norm(
                    _decode_text(payload, pparams.get("charset", "us-ascii"))
                )
                if cte.lower() == "quoted-printable" and qp_text is None:
                    qp_text = decoded
            else:
                attach_bytes += len(payload)
        elif pct.startswith("text/") and not seen_body:
            seen_body = True
            body_chars = len(
                norm(_decode_text(payload, pparams.get("charset", "us-ascii")))
            )
    return {
        "subject": subject,
        "from_domain": from_domain,
        "content_type": ctype,
        "n_parts": len(raw_parts),
        "n_attachments": n_attachments,
        "body_chars": body_chars,
        "attach_bytes": attach_bytes,
        "qp_text": qp_text,
        "message_id": message_id,
        "in_reply_to": in_reply_to,
    }


def thread_parent(doc_id: int) -> int | None:
    """Deterministic reply tree, mirrored in the
    `email_thread_reconstruct` oracle: every 16-block of ids is one
    thread; id%16==0 is the root, ids 1-3 of the block reply to the
    root, the rest reply to node ``block + id%4`` (which is the root
    when id%4==0, else a depth-1 node) — max depth 2 by
    construction, so a bounded ancestor join resolves every root."""
    r = doc_id % 16
    block = doc_id - r
    if r == 0:
        return None
    if r < 4:
        return block
    return block + (doc_id % 4)


def synth_email(doc_id: int) -> bytes:
    """Deterministic message via the STDLIB producer. Plan (mirrored
    by the oracle): subject is Vietnamese (forcing an RFC 2047
    encoded word) when id%3==0; body is utf-8 (forcing 8bit CTE)
    when id%7==1, else ``id%5+1`` ascii words; ``id%3`` binary
    attachments of ``10+(id+j)%40`` bytes (base64 CTE); a
    quoted-printable text attachment when id%4==1 (its '=' chars
    force =3D escapes). The multipart boundary is pinned so payload
    bytes are run-to-run deterministic."""
    from email import policy
    from email.message import EmailMessage

    msg = EmailMessage(policy=policy.SMTP)
    msg["From"] = f"user{doc_id} <user{doc_id}@mail{doc_id % 5}.example.com>"
    msg["To"] = "corpus@example.org"
    msg["Subject"] = (
        f"Báo giá #{doc_id}" if doc_id % 3 == 0 else f"Order update {doc_id}"
    )
    msg["Date"] = "Mon, 01 Jan 2024 00:00:00 +0000"
    msg["Message-ID"] = f"<m{doc_id}@example.org>"
    parent = thread_parent(doc_id)
    if parent is not None:
        msg["In-Reply-To"] = f"<m{parent}@example.org>"
    if doc_id % 7 == 1:
        msg.set_content(f"Giá {doc_id} đồng")
    else:
        n = doc_id % 5 + 1
        msg.set_content(" ".join(f"line{i}" for i in range(n)))
    for j in range(doc_id % 3):
        nbytes = 10 + (doc_id + j) % 40
        msg.add_attachment(
            bytes((doc_id + j + k) % 256 for k in range(nbytes)),
            maintype="application",
            subtype="octet-stream",
            filename=f"f{j}.bin",
        )
    if doc_id % 4 == 1:
        msg.add_attachment(
            f"total={doc_id}=end",
            subtype="plain",
            cte="quoted-printable",
            filename="note.txt",
        )
    if msg.is_multipart():
        msg.set_boundary(f"==mimebound{doc_id}==")
    return msg.as_bytes()
