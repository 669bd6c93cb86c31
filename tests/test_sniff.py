"""Magic-byte format sniffer — functions/sniff.py (round 8): every
synthesizer in the repo must be labeled correctly, and unknown bytes
must return 'unknown' without raising."""

from __future__ import annotations

from datawarehouseproject_spark.functions.sniff import sniff_media_format


def test_every_synthesizer_is_labeled_correctly():
    from datawarehouseproject_spark.functions.avi import synth_avi
    from datawarehouseproject_spark.functions.bmp import synth_bmp
    from datawarehouseproject_spark.functions.flac import synth_flac
    from datawarehouseproject_spark.functions.gif import (
        synth_gif,
        synth_gif_anim,
    )
    from datawarehouseproject_spark.functions.ico import synth_ico
    from datawarehouseproject_spark.functions.h264 import (
        synth_h264,
        synth_h264_ipcm,
    )
    from datawarehouseproject_spark.functions.jpeg import (
        synth_jpeg,
        synth_jpeg420,
        synth_jpeg_progressive,
    )
    from datawarehouseproject_spark.functions.mpeg_audio import (
        synth_mp3,
        synth_mpeg1_layer1,
    )
    from datawarehouseproject_spark.functions.orc_footer import synth_orc
    from datawarehouseproject_spark.functions.parquet_footer import (
        synth_parquet,
    )
    from datawarehouseproject_spark.functions.png import (
        synth_png,
        synth_png_palette,
    )
    from datawarehouseproject_spark.functions.arrow_ipc import (
        synth_arrow_ipc,
    )
    from datawarehouseproject_spark.functions.bzip2 import synth_bz2
    from datawarehouseproject_spark.functions.warc import synth_warc
    from datawarehouseproject_spark.functions.xz_scan import synth_xz
    from datawarehouseproject_spark.functions.sqlite_scan import (
        synth_sqlite,
    )
    from datawarehouseproject_spark.functions.tiff import synth_tiff
    from datawarehouseproject_spark.functions.wav import synth_wav
    from datawarehouseproject_spark.functions.webp import synth_webp
    from datawarehouseproject_spark.functions.zipscan import (
        synth_gzip,
        synth_tar,
        synth_zip,
    )

    cases = [
        (synth_jpeg, "jpeg"),
        (synth_jpeg420, "jpeg"),
        (synth_jpeg_progressive, "jpeg"),
        (synth_png, "png"),
        (synth_png_palette, "png"),
        (synth_gif, "gif"),
        (synth_gif_anim, "gif"),
        (synth_bmp, "bmp"),
        (synth_webp, "webp"),
        (synth_avi, "avi"),
        (synth_wav, "wav"),
        (synth_flac, "flac"),
        (synth_tiff, "tiff"),
        (synth_zip, "zip"),
        (synth_tar, "tar"),
        (synth_gzip, "gzip"),
        (synth_sqlite, "sqlite"),
        (synth_bz2, "bzip2"),
        (synth_xz, "xz"),
        (synth_arrow_ipc, "arrow"),
        (synth_warc, "gzip"),  # .warc.gz IS gzip at the byte layer
        (synth_mp3, "mpeg_audio"),
        (synth_mpeg1_layer1, "mpeg_audio"),
        (synth_h264, "h264"),
        (synth_h264_ipcm, "h264"),
        (synth_parquet, "parquet"),
        (synth_orc, "orc"),
        (synth_ico, "ico"),
    ]
    for synth, expect in cases:
        for seed in (0, 1, 5):
            got = sniff_media_format(synth(seed))
            assert got == expect, (synth.__name__, seed, got)


def test_unknown_never_raises():
    for payload in (b"", b"x", b"\x00" * 3, b"garbage bytes here",
                    b"RIFF\x00\x00\x00\x00XXXX", b"PAR1 but no tail"):
        assert sniff_media_format(payload) == "unknown"


def test_tar_detected_via_interior_magic():
    """tar has no leading magic — ustar sits at offset 257 of the
    first header block, and the sniffer checks exactly there (round
    9; previously answered unknown).  A short payload whose byte 257
    doesn't exist must stay unknown."""
    from datawarehouseproject_spark.functions.zipscan import synth_tar

    assert sniff_media_format(synth_tar(2)) == "tar"
    assert sniff_media_format(b"\x42" * 200) == "unknown"
    gnu = bytearray(300)
    gnu[0] = 0x61
    gnu[257:263] = b"ustar "
    assert sniff_media_format(bytes(gnu)) == "tar"
