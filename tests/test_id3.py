"""ID3v2 tag codec tests — functions/mpeg_audio.py parse_id3 /
synth_mp3_id3: both version forks (v2.3 big-endian vs v2.4 syncsafe
frame sizes), composition with the audio frame walk, malformed-tag
quarantine."""

from __future__ import annotations

import pytest

from datawarehouseproject_spark.functions.mpeg_audio import (
    parse_id3,
    scan_mp3,
    synth_id3_fields,
    synth_mp3_id3,
    synth_mp3_params,
)


def test_round_trip_both_versions():
    saw = set()
    for seed in range(24):
        got = parse_id3(synth_mp3_id3(seed))
        want = synth_id3_fields(seed)
        saw.add(want["version"])
        for k, v in want.items():
            assert got[k] == v, (seed, k)
        assert got["n_frames"] == 5
    assert saw == {3, 4}  # both size codecs exercised


def test_audio_walk_composes_behind_real_tag():
    """scan_mp3 must still count the audio frames behind the real
    tag — the syncsafe skip arithmetic is shared."""
    for seed in (0, 3, 11):
        s = scan_mp3(synth_mp3_id3(seed))
        rate_idx, bitrate_idxs, _ = synth_mp3_params(seed)
        assert s["n_frames"] == len(bitrate_idxs)


def test_v23_and_v24_sizes_differ_on_wire():
    """A 200-byte frame body encodes 0x000000C8 in v2.3 but
    0x00 0x01 0x48 in syncsafe v2.4 — pin that the synthesizer
    really writes different bytes (guards against both paths
    silently using one codec)."""
    even = synth_mp3_id3(2)  # v2.3
    odd = synth_mp3_id3(3)  # v2.4
    assert even[3] == 3 and odd[3] == 4


def test_malformed_tags_raise():
    good = bytearray(synth_mp3_id3(4))
    with pytest.raises(ValueError, match="no ID3v2"):
        parse_id3(b"MP3junk")
    bad_ver = bytearray(good)
    bad_ver[3] = 9
    with pytest.raises(ValueError, match="unsupported ID3v2"):
        parse_id3(bytes(bad_ver))
    bad_size = bytearray(good)
    bad_size[6] = 0x80  # non-syncsafe header size
    with pytest.raises(ValueError, match="syncsafe"):
        parse_id3(bytes(bad_size))
    # truncation: header claims more than the payload holds
    with pytest.raises(ValueError, match="past end"):
        parse_id3(bytes(good[:14]))


def test_spark_permissive_quarantine(spark):
    from datawarehouseproject_spark.operators.multimodal import (
        extract_id3_tags,
    )

    rows = [
        (2, bytearray(synth_mp3_id3(2))),
        (55, bytearray(b"not audio")),
    ]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = {
        r["media_id"]: r
        for r in extract_id3_tags(media, permissive=True).collect()
    }
    assert out[55]["decode_error"] is not None
    assert out[2]["title"] == synth_id3_fields(2)["title"]


def test_frame_size_past_tag_end_raises():
    """A corrupt frame size that spills past the tag (into audio
    data) must raise, not decode sync bytes as tag text (review
    r7)."""
    payload = bytearray(synth_mp3_id3(2))  # v2.3: plain u32 sizes
    # first frame header starts at byte 10; size field at +4..+8
    payload[14:18] = (3000).to_bytes(4, "big")
    with pytest.raises(ValueError, match="past tag end"):
        parse_id3(bytes(payload))
