"""MIME parser (functions/mime_mail.py) vs the stdlib email
producer — hand-rolled base64/QP/RFC2047 pinned against both the
stdlib codecs and hand-worked vectors."""

from __future__ import annotations

import base64
import quopri

import pytest

from datawarehouseproject_spark.functions.mime_mail import (
    b64decode_strict,
    decode_header_value,
    parse_mime_message,
    qp_decode,
    synth_email,
)


def test_b64_matches_stdlib_on_all_lengths():
    for n in range(0, 70):
        raw = bytes((i * 7 + n) % 256 for i in range(n))
        enc = base64.b64encode(raw)
        assert b64decode_strict(enc) == raw
        # RFC 2045 line wrapping must be transparent
        wrapped = b"\r\n".join(enc[i : i + 16] for i in range(0, len(enc), 16))
        assert b64decode_strict(wrapped) == raw


@pytest.mark.parametrize(
    "bad",
    [b"abc", b"a=bc", b"ab=c", b"@@@@", b"QQ=Q", b"QR=="],
)
def test_b64_rejects_malformed(bad):
    # QR== has non-zero trailing bits (R=17 -> low 4 bits 0001)
    with pytest.raises(ValueError):
        b64decode_strict(bad)


def test_qp_matches_stdlib():
    for n in range(1, 40):
        raw = bytes((i * 11 + n) % 256 for i in range(n))
        enc = quopri.encodestring(raw)
        # stdlib encodes with LF; the wire format is CRLF
        assert qp_decode(enc.replace(b"\n", b"\r\n")) == raw.replace(
            b"\n", b"\r\n"
        ) or qp_decode(enc) == raw


def test_qp_soft_breaks_and_escapes():
    assert qp_decode(b"a=\r\nb") == b"ab"
    assert qp_decode(b"gi=C3=A1") == "giá".encode()
    with pytest.raises(ValueError):
        qp_decode(b"bad=Z9")
    with pytest.raises(ValueError):
        qp_decode(b"trunc=")


def test_encoded_word_b_and_q_and_adjacency():
    assert decode_header_value("=?utf-8?b?QsOhbyBnacOh?= #5") == "Báo giá #5"
    assert decode_header_value("=?utf-8?q?gi=C3=A1_t=E1=BB=91t?=") == "giá tốt"
    # adjacent encoded words: the separating space is NOT rendered
    two = "=?utf-8?b?QsOhbw==?= =?utf-8?b?IGdpw6E=?="
    assert decode_header_value(two) == "Báo giá"
    # but a space before plain text IS
    assert decode_header_value("=?utf-8?b?QsOhbw==?= x") == "Báo x"


def test_parse_single_and_multipart_roundtrip():
    out = parse_mime_message(synth_email(0))
    assert out["content_type"] == "text/plain"
    assert out["subject"] == "Báo giá #0"
    assert out["n_parts"] == 1 and out["n_attachments"] == 0
    out = parse_mime_message(synth_email(13))
    assert out["content_type"] == "multipart/mixed"
    assert out["n_attachments"] == 2  # 1 binary + 1 QP text
    assert out["qp_text"] == "total=13=end\n"
    assert out["attach_bytes"] == 10 + 13 % 40


def test_parse_folded_header():
    msg = (
        b"From: a@b.example\r\n"
        b"Subject: one\r\n two\r\n"
        b"Content-Type: text/plain; charset=us-ascii\r\n"
        b"\r\nhi\r\n"
    )
    out = parse_mime_message(msg)
    assert out["subject"] == "one two"
    assert out["body_chars"] == 3


def test_parse_rejects_unterminated_multipart():
    good = synth_email(13)
    cut = good[: good.rfind(b"--==mimebound13==--")]
    with pytest.raises(ValueError, match="terminator"):
        parse_mime_message(cut)


def test_parse_rejects_missing_separator():
    with pytest.raises(ValueError, match="separator"):
        parse_mime_message(b"From: a@b\r\nSubject: x")
