"""Tests for the MPEG-1 Layer I SAMPLE decoder — the round-7
upgrade of the MP3 family from structure-only triage to real
audio-content decode (allocation/scalefactor/sample unpacking + ISO
requantization to integer micro-unit amplitudes).

Pinning strategy mirrors ADPCM: a HAND-TRACED single-frame golden
(every bit placed manually, every amplitude computed by hand), an
independent pure-Python recomputation from the synthesis formulas,
and explicit malformed-stream error paths.
"""

from __future__ import annotations

import pytest

from datawarehouseproject_spark.functions.mpeg_audio import (
    LAYER1_BITRATES_KBPS,
    decode_mpeg1_layer1,
    layer1_frame_bytes,
    synth_layer1_params,
    synth_mpeg1_layer1,
)


class _Bits:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
            self.acc &= (1 << self.n) - 1

    def bytes(self, total: int) -> bytes:
        if self.n:
            self.put(0, 8 - self.n)
        assert len(self.buf) <= total
        return bytes(self.buf) + bytes(total - len(self.buf))


def _frame(alloc, sf, samples, bitrate_idx=8, rate_idx=0, pad=0) -> bytes:
    """Assemble one Layer I mono frame from explicit fields."""
    hdr = bytes(
        [
            0xFF,
            0b11111111,
            (bitrate_idx << 4) | (rate_idx << 2) | (pad << 1),
            0xC4,
        ]
    )
    b = _Bits()
    for sb in range(32):
        b.put(alloc.get(sb, 0), 4)
    for sb in range(32):
        if alloc.get(sb, 0):
            b.put(sf[sb], 6)
    for s in range(12):
        for sb in range(32):
            a = alloc.get(sb, 0)
            if a:
                b.put(samples[sb][s], a + 1)
    rate = (44100, 48000, 32000)[rate_idx]
    flen = layer1_frame_bytes(LAYER1_BITRATES_KBPS[bitrate_idx], rate, pad)
    return hdr + b.bytes(flen - 4)


def test_hand_traced_single_frame_golden():
    """One subband (sb 0), nb=2 (allocation code 1), scalefactor
    index 3 (multiplier 2^(1-1)=1): raw codes cycle 0,1,2.
    |2r+2-4| gives 2,0,2; amp = num*4e6 // (3 * 2^(3//3)) =
    num*4000000 // 6 -> 1333333, 0, 1333333. Four of each over 12
    samples: sum = 8*1333333 = 10666664, max 1333333."""
    payload = _frame(
        alloc={0: 1},
        sf={0: 3},
        samples={0: [0, 1, 2] * 4},
    )
    rows = decode_mpeg1_layer1(payload)
    assert rows == [
        {
            "frame": 0,
            "subband": 0,
            "nb": 2,
            "sf_idx": 3,
            "n_samples": 12,
            "sum_amp_micro": 10666664,
            "max_amp_micro": 1333333,
        }
    ]


def test_hand_traced_extremes_and_scalefactor():
    """nb=15 extremes: raw=0 -> |2-2^15| = 32766 over 32767 levels
    at sf_idx 0 (multiplier 2) -> (32766*4e6)//32767 = 3999877 (one
    quantization step below full scale); the mid code
    raw=(2^15-2)//2=16383 -> |2*16383+2-32768| = 0."""
    payload = _frame(
        alloc={5: 14},  # nb = 15
        sf={5: 0},
        samples={5: [0, 16383] * 6},
    )
    (row,) = decode_mpeg1_layer1(payload)
    assert row["nb"] == 15
    assert row["max_amp_micro"] == (32766 * 4_000_000) // 32767 == 3999877
    assert row["sum_amp_micro"] == 6 * 3999877


def test_synth_decode_matches_formula_recomputation():
    """Independent pure-Python recomputation of every amplitude from
    the synthesis formulas (the same arithmetic the DuckDB oracle
    runs) — full coverage across seeds of all nb widths 2..15 and
    both sample rates' frame lengths."""
    for seed in range(30):
        p = synth_layer1_params(seed)
        rows = decode_mpeg1_layer1(synth_mpeg1_layer1(seed))
        expect = []
        for f in range(p["n_frames"]):
            for sb in range(32):
                if (seed + sb) % 4 != 0:
                    continue
                nb = 2 + (seed * 3 + sb * 5 + f) % 14
                sfi = 3 * ((seed + sb + f) % 21)
                amps = [
                    (
                        abs(
                            2 * ((seed * 13 + sb * 7 + f * 11 + s * 3) % ((1 << nb) - 1))
                            + 2
                            - (1 << nb)
                        )
                        * 4_000_000
                    )
                    // (((1 << nb) - 1) * (1 << (sfi // 3)))
                    for s in range(12)
                ]
                expect.append(
                    {
                        "frame": f,
                        "subband": sb,
                        "nb": nb,
                        "sf_idx": sfi,
                        "n_samples": 12,
                        "sum_amp_micro": sum(amps),
                        "max_amp_micro": max(amps),
                    }
                )
        assert rows == expect, f"seed {seed}"


def test_malformed_streams_raise_valueerror():
    good = synth_mpeg1_layer1(4)
    with pytest.raises(ValueError, match="sync"):
        decode_mpeg1_layer1(b"\x00\x01" + good)
    with pytest.raises(ValueError, match="truncated"):
        decode_mpeg1_layer1(good[:-10])
    # a Layer III stream is not a Layer I stream
    from datawarehouseproject_spark.functions.mpeg_audio import synth_mp3

    with pytest.raises(ValueError):
        decode_mpeg1_layer1(synth_mp3(2))


def test_forbidden_allocation_code_15():
    payload = bytearray(_frame(alloc={0: 1}, sf={0: 3}, samples={0: [0] * 12}))
    payload[4] = 0xF0  # first alloc nibble -> 15
    with pytest.raises(ValueError, match="allocation code 15"):
        decode_mpeg1_layer1(bytes(payload))


def test_reserved_scalefactor_63():
    payload = _frame(alloc={0: 1}, sf={0: 63}, samples={0: [0] * 12})
    with pytest.raises(ValueError, match="scalefactor index 63"):
        decode_mpeg1_layer1(payload)


def test_stereo_mode_rejected():
    payload = bytearray(_frame(alloc={0: 1}, sf={0: 3}, samples={0: [0] * 12}))
    payload[3] = 0x00  # mode = stereo
    with pytest.raises(ValueError, match="mono"):
        decode_mpeg1_layer1(bytes(payload))


def test_spark_permissive_quarantines_bad_payload(spark):
    """One corrupt payload must not kill the batch: it lands as a
    single NULL-feature row with decode_error; good payloads decode
    fully."""
    from datawarehouseproject_spark.operators.multimodal import (
        extract_layer1_subband_features,
    )

    good = synth_mpeg1_layer1(3)
    rows = [(3, bytearray(good)), (99, bytearray(b"\x12\x34garbage"))]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = extract_layer1_subband_features(media, permissive=True).collect()
    bad = [r for r in out if r["media_id"] == 99]
    assert len(bad) == 1 and bad[0]["decode_error"] is not None
    assert bad[0]["sum_amp_micro"] is None
    good_rows = [r for r in out if r["media_id"] == 3]
    assert len(good_rows) == synth_layer1_params(3)["n_frames"] * 8
    assert all(r["decode_error"] is None for r in good_rows)


def test_crc_protected_frame_decodes_identically():
    """Protection bit 0 => a 16-bit CRC precedes the audio data; the
    decoder must skip it (review r7 — reading CRC bytes as
    allocation nibbles shifts the whole bitstream)."""
    plain = _frame(alloc={0: 1}, sf={0: 3}, samples={0: [0, 1, 2] * 4})
    # rebuild with protection bit 0 and 2 CRC bytes spliced in; same
    # slot-quantized length => drop 2 trailing pad bytes
    hdr = bytearray(plain[:4])
    hdr[1] &= 0xFE  # protection bit 0 = CRC present
    crc_frame = bytes(hdr) + b"\xAB\xCD" + plain[4:-2]
    assert len(crc_frame) == len(plain)
    assert decode_mpeg1_layer1(crc_frame) == decode_mpeg1_layer1(plain)
