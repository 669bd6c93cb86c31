"""Tests for the MP3 frame walk and H.264 NAL/SPS structure parse —
the ffprobe-style triage layer of the multimodal surface."""

from __future__ import annotations

import pytest

from datawarehouseproject_spark.functions.h264 import (
    _escape,
    _unescape,
    encode_sps,
    parse_sps,
    scan_h264,
    synth_h264,
    synth_h264_params,
)
from datawarehouseproject_spark.functions.mpeg_audio import (
    BITRATES_KBPS,
    SAMPLE_RATES,
    scan_mp3,
    synth_mp3,
    synth_mp3_params,
)
from datawarehouseproject_spark.operators.multimodal import (
    extract_stream_structure,
    synthesize_h264_media,
    synthesize_mp3_media,
)


def test_mp3_scan_matches_synthesis_formulas():
    for seed in range(40):
        rate_idx, bis, pads = synth_mp3_params(seed)
        st = scan_mp3(synth_mp3(seed))
        assert st["n_frames"] == len(bis)
        assert st["sample_rate"] == SAMPLE_RATES[rate_idx]
        assert st["sum_kbps"] == sum(BITRATES_KBPS[b] for b in bis)
        assert st["n_padded"] == sum(pads)
        assert st["total_samples"] == len(bis) * 1152


def test_mp3_scan_without_id3_tag():
    payload = synth_mp3(3)
    tag_len = 10 + 3 % 100
    st = scan_mp3(payload[tag_len:])
    assert st["n_frames"] == 6 + 3 % 7


def test_mp3_rejects_corruption():
    payload = bytearray(synth_mp3(5))
    with pytest.raises(ValueError, match="sync"):
        # flip a sync byte of the first frame header (after the tag)
        tag_len = 10 + 5 % 100
        bad = bytearray(payload)
        bad[tag_len] = 0x00
        scan_mp3(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        scan_mp3(bytes(payload[:-10]))
    with pytest.raises(ValueError):
        scan_mp3(b"ID3\x04\x00\x00\x00\x00\x00")


def test_sps_dimension_roundtrip_with_cropping():
    """Every even size round-trips through the exp-Golomb SPS encode
    + parse, including non-multiple-of-16 sizes that need cropping."""
    for w, h in [(48, 32), (50, 34), (62, 44), (1920, 1080), (16, 16),
                 (2, 2), (640, 480), (1280, 718)]:
        sps = encode_sps(w, h)
        got = parse_sps(sps)
        assert (got["width"], got["height"]) == (w, h), (w, h, got)


def test_h264_scan_matches_synthesis_formulas():
    for seed in range(40):
        w, h, ns = synth_h264_params(seed)
        st = scan_h264(synth_h264(seed))
        assert (st["width"], st["height"]) == (w, h)
        assert st["n_idr_slices"] == 1
        assert st["n_slices"] == ns + 1
        assert st["n_nal_units"] == ns + 3


def test_h264_emulation_prevention_roundtrip():
    import random

    rnd = random.Random(99)
    for _ in range(300):
        raw = bytes(
            rnd.choice([0, 0, 0, 1, 2, 3, 255])
            for _ in range(rnd.randint(0, 50))
        )
        esc = _escape(raw)
        assert _unescape(esc) == raw
        for i in range(len(esc) - 2):
            assert not (
                esc[i] == 0 and esc[i + 1] == 0 and esc[i + 2] in (0, 1, 2)
            )


def test_h264_rejects_garbage():
    with pytest.raises(ValueError, match="start code"):
        scan_h264(b"\x12\x34\x56\x78" * 10)
    # stream with slices but no SPS
    payload = synth_h264(2)
    # strip the first NAL (the SPS) — find second start code
    second = payload.find(b"\x00\x00\x00\x01", 4)
    with pytest.raises(ValueError, match="SPS"):
        scan_h264(payload[second:])


def test_spark_mp3_structure_end_to_end(spark):
    ids = spark.range(0, 30).selectExpr("id AS doc_id")
    rows = {
        r["media_id"]: r
        for r in extract_stream_structure(
            synthesize_mp3_media(ids), fmt="mp3"
        ).collect()
    }
    assert len(rows) == 30
    for seed, r in rows.items():
        rate_idx, bis, pads = synth_mp3_params(seed)
        assert r["n_frames"] == len(bis)
        assert r["sum_kbps"] == sum(BITRATES_KBPS[b] for b in bis)


def test_spark_h264_structure_permissive(spark):
    from datawarehouseproject_spark.functions.h264 import synth_h264

    rows = [
        (1, bytearray(synth_h264(1))),
        (2, bytearray(b"\xde\xad\xbe\xef")),
    ]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {
        r["media_id"]: r
        for r in extract_stream_structure(
            media, fmt="h264", permissive=True
        ).collect()
    }
    assert out[1]["decode_error"] is None
    w, h, _ = synth_h264_params(1)
    assert (out[1]["width"], out[1]["height"]) == (w, h)
    assert out[2]["decode_error"] is not None
    assert out[2]["width"] is None


def test_truncated_sps_raises_valueerror_not_indexerror():
    """Round-6 review finding: a truncated SPS used to escape the
    permissive quarantine as IndexError."""
    with pytest.raises(ValueError):
        scan_h264(b"\x00\x00\x00\x01\x67\x42")
    payload = synth_h264(4)
    with pytest.raises(ValueError):
        scan_h264(payload[:9])


def test_spark_permissive_quarantines_truncated_sps(spark):
    rows = [
        (1, bytearray(synth_h264(1))),
        (2, bytearray(b"\x00\x00\x00\x01\x67\x42")),
    ]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {
        r["media_id"]: r
        for r in extract_stream_structure(
            media, fmt="h264", permissive=True
        ).collect()
    }
    assert out[1]["decode_error"] is None
    assert out[2]["decode_error"] is not None


# ---------------------------------------------------------------------------
# H.264 I_PCM pixel decode (round 8 — VERDICT r7 item 3).
# ---------------------------------------------------------------------------


def test_h264_ipcm_planes_roundtrip_exact():
    """I_PCM is lossless raw samples: every synthesized plane value
    comes back bit-exact through the full NAL/SPS/PPS/slice/
    macroblock walk, with SPS cropping applied."""
    import numpy as np

    from datawarehouseproject_spark.functions.h264 import (
        decode_h264_ipcm,
        synth_h264_ipcm,
        synth_h264_ipcm_params,
        synth_h264_ipcm_planes,
    )

    for seed in range(30):
        w, h = synth_h264_ipcm_params(seed)
        y, cb, cr = synth_h264_ipcm_planes(seed, w, h)
        got = decode_h264_ipcm(synth_h264_ipcm(seed))
        assert (got["width"], got["height"]) == (w, h)
        assert got["n_mbs"] == -(-w // 16) * -(-h // 16)
        assert np.array_equal(got["y"], y), seed
        assert np.array_equal(got["cb"], cb), seed
        assert np.array_equal(got["cr"], cr), seed


def test_h264_ipcm_stream_is_valid_annex_b():
    """The structure scanner and the pixel decoder agree on the same
    stream — the I_PCM encoder emits spec-valid NAL framing."""
    from datawarehouseproject_spark.functions.h264 import (
        scan_h264,
        synth_h264_ipcm,
        synth_h264_ipcm_params,
    )

    for seed in (0, 3, 11):
        s = scan_h264(synth_h264_ipcm(seed))
        w, h = synth_h264_ipcm_params(seed)
        assert (s["width"], s["height"]) == (w, h)
        assert s["n_idr_slices"] == 1 and s["profile_idc"] == 66


def test_h264_ipcm_emulation_prevention_in_pcm_bytes():
    """PCM sample runs that form 0x000001/0x000000 sequences must be
    escaped in the RBSP and unescaped on decode — constant-zero
    planes are the worst case."""
    import numpy as np

    from datawarehouseproject_spark.functions.h264 import (
        decode_h264_ipcm,
        encode_h264_ipcm,
    )

    y = np.zeros((16, 16), dtype=np.uint8)
    y[0, 3] = 1  # a 00 00 01 sequence inside the samples
    cb = np.zeros((8, 8), dtype=np.uint8)
    cr = np.zeros((8, 8), dtype=np.uint8)
    got = decode_h264_ipcm(encode_h264_ipcm(y, cb, cr))
    assert np.array_equal(got["y"], y)
    assert not got["cb"].any() and not got["cr"].any()


def test_h264_ipcm_rejects_unsupported_profiles():
    import numpy as np
    import pytest as _pt

    from datawarehouseproject_spark.functions.h264 import (
        decode_h264_ipcm,
        encode_h264_ipcm,
        synth_h264,
        synth_h264_ipcm,
    )

    # non-I_PCM macroblocks (the old structure-only synth stream's
    # fake slice data): must raise the documented boundary, not
    # mis-decode
    with _pt.raises(ValueError):
        decode_h264_ipcm(synth_h264(3))
    # truncated PCM samples quarantine
    good = synth_h264_ipcm(2)
    with _pt.raises(ValueError):
        decode_h264_ipcm(good[: len(good) - 40])
    # odd dimensions rejected at encode
    with _pt.raises(ValueError, match="even"):
        encode_h264_ipcm(
            np.zeros((15, 16), dtype=np.uint8),
            np.zeros((8, 8), dtype=np.uint8),
            np.zeros((8, 8), dtype=np.uint8),
        )


def test_spark_h264_ipcm_features_permissive(spark):
    import numpy as np

    from datawarehouseproject_spark.functions.h264 import (
        synth_h264_ipcm,
        synth_h264_ipcm_params,
        synth_h264_ipcm_planes,
    )
    from datawarehouseproject_spark.operators.multimodal import (
        extract_h264_ipcm_features,
    )

    rows = [
        (4, bytearray(synth_h264_ipcm(4))),
        (9, bytearray(b"\x00\x00\x00\x01\x67\x42")),  # truncated SPS
    ]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {
        r["media_id"]: r
        for r in extract_h264_ipcm_features(media, permissive=True).collect()
    }
    w, h = synth_h264_ipcm_params(4)
    y, cb, cr = synth_h264_ipcm_planes(4, w, h)
    assert out[4]["decode_error"] is None
    assert (out[4]["width"], out[4]["height"]) == (w, h)
    assert out[4]["sum_y"] == int(y.sum(dtype="int64"))
    assert out[4]["sum_cb"] == int(cb.sum(dtype="int64"))
    assert out[4]["sum_cr"] == int(cr.sum(dtype="int64"))
    assert out[9]["decode_error"] is not None and out[9]["sum_y"] is None


def test_h264_ipcm_rejects_second_idr_frame():
    """Two concatenated access units: single-frame decode must raise
    (n_mbs summed across frames while planes were overwritten —
    review r8 pass 2)."""
    import pytest as _pt

    from datawarehouseproject_spark.functions.h264 import (
        decode_h264_ipcm,
        synth_h264_ipcm,
    )

    one = synth_h264_ipcm(2)
    # append the IDR NAL of the same stream again (SPS/PPS reused)
    idr_at = one.find(b"\x00\x00\x00\x01\x65")
    two = one + one[idr_at:]
    with _pt.raises(ValueError, match="multiple IDR"):
        decode_h264_ipcm(two)
