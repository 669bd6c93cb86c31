"""WARC crawl-archive scan — functions/warc.py (round 8): multi-
member gzip (stdlib producer for the compression layer) around
spec-conformant ISO 28500 records."""

from __future__ import annotations

import gzip
import io

import pytest

from datawarehouseproject_spark.functions.warc import (
    parse_warc_records,
    scan_warc,
    split_gzip_members,
    synth_warc,
    synth_warc_plan,
)


def test_fixture_aggregates_match_plan():
    for seed in range(12):
        got = scan_warc(synth_warc(seed))
        p = synth_warc_plan(seed)["n_pairs"]
        req = sum(40 + (seed + i * 3) % 60 for i in range(p))
        resp = sum(100 + (seed * 7 + i * 13) % 400 for i in range(p))
        assert got == {
            "n_records": 1 + 2 * p,
            "n_responses": p,
            "n_requests": p,
            "n_distinct_uris": p,
            "payload_bytes": 38 + req + resp,
            "response_bytes": resp,
        }, seed


def test_plain_warc_parses_through_same_grammar():
    plain = b"".join(split_gzip_members(synth_warc(3)))
    got = scan_warc(plain)
    assert got["n_records"] == 1 + 2 * synth_warc_plan(3)["n_pairs"]
    recs = parse_warc_records(plain)
    assert recs[0]["type"] == "warcinfo"
    assert recs[1]["type"] == "request" and recs[2]["type"] == "response"
    assert recs[1]["uri"] == recs[2]["uri"]
    assert recs[0]["date"] == "2024-01-01T00:00:00Z"


def test_gzip_member_boundaries_are_per_record():
    members = split_gzip_members(synth_warc(5))
    assert len(members) == 1 + 2 * synth_warc_plan(5)["n_pairs"]
    for m in members:
        assert len(parse_warc_records(m)) == 1


def test_multi_record_member_is_rejected():
    plain = b"".join(split_gzip_members(synth_warc(1)))
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(plain)  # ALL records in one member: not .warc.gz spec
    with pytest.raises(ValueError, match="one per member"):
        scan_warc(buf.getvalue())


def test_malformed_quarantine():
    with pytest.raises(ValueError, match="magic"):
        scan_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    plain = b"".join(split_gzip_members(synth_warc(2)))
    # payload shorter than Content-Length
    with pytest.raises(ValueError):
        parse_warc_records(plain[:-30])
    # missing required field
    with pytest.raises(ValueError, match="missing warc-date"):
        parse_warc_records(
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Record-ID: <x>\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
        )
    # bad version
    with pytest.raises(ValueError, match="version"):
        parse_warc_records(b"WARC/9.9\r\n\r\nxx\r\n\r\n")
    # corrupt a gzip member body: per-member CRC catches it
    payload = bytearray(synth_warc(2))
    payload[len(payload) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        scan_warc(bytes(payload))


def test_explode_records_one_row_per_record(spark):
    from datawarehouseproject_spark.functions.warc import (
        synth_warc_text,
        synth_warc_text_plan,
    )
    from datawarehouseproject_spark.operators.multimodal import (
        explode_warc_records,
    )

    rows = [(int(s), bytearray(synth_warc_text(s))) for s in range(3)]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    got = explode_warc_records(media).collect()
    by_media: dict[int, list] = {}
    for r in got:
        by_media.setdefault(r["media_id"], []).append(r)
    for s in range(3):
        plan = synth_warc_text_plan(s)
        recs = sorted(by_media[s], key=lambda r: r["rec_idx"])
        assert len(recs) == plan["n_responses"]
        for i, r in enumerate(recs):
            assert r["rec_type"] == "response"
            want_m = 20 + (s + i) % 30
            toks = r["text"].split(" ")
            assert len(toks) == want_m
            assert toks[0] == f"w{(s * 3 + i) % 10}"


def test_spark_permissive_quarantine(spark):
    from datawarehouseproject_spark.operators.multimodal import (
        extract_warc_scan,
    )

    rows = [
        (6, bytearray(synth_warc(6))),
        (9, bytearray(b"WARC/1.0\r\nbroken")),
    ]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {
        r["media_id"]: r
        for r in extract_warc_scan(media, permissive=True).collect()
    }
    p = synth_warc_plan(6)["n_pairs"]
    assert out[6]["decode_error"] is None
    assert out[6]["n_records"] == 1 + 2 * p
    assert out[9]["decode_error"] is not None


def test_warc_zst_container_matches_gz():
    """Same record plan, second container: the .warc.zst scan must
    agree with .warc.gz exactly (and exercise the skippable-frame
    skip in the zstd walk)."""
    from datawarehouseproject_spark.functions.warc import (
        scan_warc,
        synth_warc,
        synth_warc_zst,
    )

    for seed in range(8):
        assert scan_warc(synth_warc_zst(seed)) == scan_warc(
            synth_warc(seed)
        ), seed
