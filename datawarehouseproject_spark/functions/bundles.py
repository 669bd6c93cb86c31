"""Shared tar-bundle extraction for the lakehouse fixtures.

The Iceberg/Delta "warehouses" ride in uncompressed tar bundles
(incidental plumbing, not a format under test). The member walk,
total-size cap, and TarError→ValueError wrap live HERE ONLY so the
fencing cannot drift between the three scans that consume it
(review r11: the block had been copy-pasted three times).
"""

from __future__ import annotations

import io
import tarfile

_MAX_BUNDLE = 1 << 28


def read_tar_bundle(payload: bytes) -> dict[str, bytes]:
    """name -> bytes for every regular file; ValueError-only.

    mode "r:" = uncompressed tar ONLY — transparent gzip/bz2/xz
    detection would add decompression error types (BadGzipFile,
    EOFError) that are not TarError and escape the quarantine.
    """
    try:
        with tarfile.open(fileobj=io.BytesIO(payload), mode="r:") as tf:
            files: dict[str, bytes] = {}
            total = 0
            for m in tf.getmembers():
                if not m.isfile() or m.size < 0:
                    raise ValueError("non-file tar member in table bundle")
                total += m.size
                if total > _MAX_BUNDLE:
                    raise ValueError("table bundle exceeds size cap")
                f = tf.extractfile(m)
                if f is None:
                    raise ValueError("unreadable tar member")
                files[m.name] = f.read()
    except tarfile.TarError as e:
        raise ValueError(f"table bundle is not a tar: {e}") from None
    return files


def write_tar_bundle(files: dict[str, bytes]) -> bytes:
    """Deterministic uncompressed tar: sorted names, zero mtime —
    the write-side twin of :func:`read_tar_bundle` (review r11
    pass 2: the writer loop had been copy-pasted three times too)."""
    out = io.BytesIO()
    with tarfile.open(fileobj=out, mode="w") as tf:
        for name in sorted(files):
            info = tarfile.TarInfo(name)
            info.size = len(files[name])
            info.mtime = 0
            tf.addfile(info, io.BytesIO(files[name]))
    return out.getvalue()
