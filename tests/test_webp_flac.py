"""WebP (RIFF) + FLAC structure scanners — functions/webp.py,
functions/flac.py (round 8): header-layer triage for the two
remaining big web media formats, with producer-dependent fields
(payload_bytes) pinned here since the SQL oracle can't reach them."""

from __future__ import annotations

import struct

import pytest

from datawarehouseproject_spark.functions.flac import (
    scan_flac,
    synth_flac,
    synth_flac_params,
)
from datawarehouseproject_spark.functions.webp import (
    scan_webp,
    synth_webp,
    synth_webp_params,
)


def test_webp_scan_matches_plan_all_profiles():
    for seed in range(30):
        p = synth_webp_params(seed)
        payload = synth_webp(seed)
        got = scan_webp(payload)
        assert got["fmt"] == p["fmt"]
        assert (got["width"], got["height"]) == (p["width"], p["height"])
        assert got["has_alpha"] == p["alpha"]
        assert got["has_exif"] == p["exif"]
        assert got["payload_bytes"] == len(payload)
        # RIFF size field is consistent with the actual file
        (riff,) = struct.unpack_from("<I", payload, 4)
        assert 8 + riff == len(payload)


def test_webp_riff_padding_on_odd_chunks():
    """VP8X seeds with EXIF write an odd-sized metadata chunk; the
    walk must skip its pad byte or every later chunk misaligns."""
    seed = 5  # VP8X (5%3==2) with exif (5%2==1)
    p = synth_webp_params(seed)
    assert p["fmt"] == "VP8X" and p["exif"] == 1
    got = scan_webp(synth_webp(seed))
    assert got["n_chunks"] == 3  # VP8X + EXIF + VP8


def test_webp_malformed_quarantines():
    good = bytearray(synth_webp(0))
    with pytest.raises(ValueError, match="RIFF"):
        scan_webp(b"nope")
    wav = bytearray(good)
    wav[8:12] = b"WAVE"
    with pytest.raises(ValueError, match="not WebP"):
        scan_webp(bytes(wav))
    # clobber the VP8 keyframe start code
    i = good.find(b"\x9d\x01\x2a")
    bad = bytearray(good)
    bad[i] = 0x00
    with pytest.raises(ValueError, match="start code"):
        scan_webp(bytes(bad))
    with pytest.raises(ValueError, match="truncated|past end"):
        scan_webp(bytes(good[: len(good) - 5]))
    # interframe (non-key) first frame must be rejected
    vp8_tag_at = good.find(b"VP8 ") + 8
    inter = bytearray(good)
    inter[vp8_tag_at] |= 1
    with pytest.raises(ValueError, match="keyframe"):
        scan_webp(bytes(inter))


def test_flac_scan_matches_plan():
    for seed in range(30):
        p = synth_flac_params(seed)
        payload = synth_flac(seed)
        got = scan_flac(payload)
        for k in (
            "sample_rate",
            "channels",
            "bits_per_sample",
            "total_samples",
            "duration_ms",
            "title",
        ):
            assert got[k] == p[k], (seed, k)
        assert got["n_blocks"] == 2
        assert got["payload_bytes"] == len(payload)


def test_flac_malformed_quarantines():
    good = bytearray(synth_flac(3))
    with pytest.raises(ValueError, match="fLaC"):
        scan_flac(b"ID3\x04 nope")
    # STREAMINFO length must be exactly 34
    bad = bytearray(good)
    bad[5:8] = (33).to_bytes(3, "big")
    with pytest.raises(ValueError):
        scan_flac(bytes(bad))
    # zero sample rate is invalid
    zero = bytearray(good)
    packed = int.from_bytes(zero[8 + 10 : 8 + 18], "big")
    packed &= (1 << 44) - 1  # clear the 20 rate bits
    zero[8 + 10 : 8 + 18] = packed.to_bytes(8, "big")
    with pytest.raises(ValueError, match="sample rate"):
        scan_flac(bytes(zero))
    with pytest.raises(ValueError, match="truncated"):
        scan_flac(bytes(good[:20]))


def test_flac_title_optional_and_missing_streaminfo_rejected():
    # a stream with ONLY streaminfo (no vorbis block): title None
    from datawarehouseproject_spark.functions.flac import (
        BLOCK_STREAMINFO,
        _block,
    )

    base = synth_flac(1)
    # grab the raw streaminfo body from the synthesized stream
    body = base[8 : 8 + 34]
    only = b"fLaC" + _block(BLOCK_STREAMINFO, body, last=True)
    got = scan_flac(only)
    assert got["title"] is None and got["n_blocks"] == 1
    # no STREAMINFO at all -> reject
    from datawarehouseproject_spark.functions.flac import (
        BLOCK_VORBIS_COMMENT,
    )

    vc = struct.pack("<I", 1) + b"v" + struct.pack("<I", 0)
    with pytest.raises(ValueError, match="STREAMINFO"):
        scan_flac(b"fLaC" + _block(BLOCK_VORBIS_COMMENT, vc, last=True))


def test_spark_permissive_quarantine(spark):
    from datawarehouseproject_spark.operators.multimodal import (
        extract_flac_metadata,
        extract_webp_structure,
    )

    rows = [(1, bytearray(synth_webp(1))), (2, bytearray(b"RIFFxxxx"))]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {
        r["media_id"]: r
        for r in extract_webp_structure(media, permissive=True).collect()
    }
    assert out[1]["decode_error"] is None and out[1]["fmt"] == "VP8L"
    assert out[2]["decode_error"] is not None
    rows = [(1, bytearray(synth_flac(1))), (2, bytearray(b"fLaC\x00"))]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {
        r["media_id"]: r
        for r in extract_flac_metadata(media, permissive=True).collect()
    }
    assert out[1]["decode_error"] is None and out[1]["channels"] == 2
    assert out[2]["decode_error"] is not None
