"""ORC tail scan: postscript + footer via the protobuf wire reader.

The OTHER columnar format this engine reads/writes (the
`orc_roundtrip` query) — triaged the same way as parquet
(:mod:`.parquet_footer`): all planning metadata lives at the FILE
TAIL. ORC's twist is that its metadata is PROTOBUF, so this scan is
a direct reuse of :mod:`.protowire`'s wire walker on a real-world
producer's bytes. Format facts are public (Apache ORC spec,
``orc_proto.proto``):

- file tail: ...footer | postscript | u8 postscript length;
- PostScript (NEVER compressed): 1 footerLength u64, 2 compression
  enum (0 = NONE, 1 = ZLIB, 2 = SNAPPY, 3 = LZO, 4 = LZ4,
  5 = ZSTD), 5 metadataLength, 8000 magic ``"ORC"``;
- Footer: 3 stripes repeated StripeInformation, 4 types repeated
  Type (root struct + one per column), 6 numberOfRows u64;
- StripeInformation: 5 numberOfRows (per stripe — their sum must
  equal the file total, and the scan CHECKS it).

Compressed footers (everything except compression=0) are a
documented boundary for the BYTE-level scan — the engine's normal
ORC read path (``spark.read.orc``) handles them natively; this scan
exists to pin the tail-metadata layout against an independent
producer (pyarrow), mirroring the parquet-footer pattern.
"""

from __future__ import annotations

from .protowire import _walk

COMPRESSION_NAMES = {
    0: "none", 1: "zlib", 2: "snappy", 3: "lzo", 4: "lz4", 5: "zstd",
}


def scan_orc_footer(payload: bytes) -> dict:
    """Parse the ORC postscript + (uncompressed) footer. Returns
    ``n_rows``, ``n_stripes``, ``n_columns`` (types minus the root),
    ``compression``, ``stripe_rows_total`` consistency-checked
    against the file total, ``payload_bytes``. Raises ``ValueError``
    on malformed structure (permissive-quarantine contract)."""
    if len(payload) < 4 or payload[:3] != b"ORC":
        raise ValueError("not an ORC file (missing ORC magic)")
    ps_len = payload[-1]
    if ps_len == 0 or 1 + ps_len > len(payload):
        raise ValueError("bad ORC postscript length")
    ps = payload[len(payload) - 1 - ps_len : len(payload) - 1]
    footer_len = None
    compression = None
    magic_ok = False
    for field, wire, v in _walk(ps):
        if field == 1 and wire == 0:
            footer_len = v
        elif field == 2 and wire == 0:
            compression = v
        elif field == 8000 and wire == 2:
            magic_ok = v == b"ORC"
    if not magic_ok:
        raise ValueError("postscript missing ORC magic field")
    if footer_len is None or footer_len < 0:
        raise ValueError("postscript missing footerLength")
    if compression is None:
        compression = 0
    if compression != 0:
        raise ValueError(
            f"compressed ORC footer "
            f"({COMPRESSION_NAMES.get(compression, compression)}): "
            "byte-level scan covers uncompressed tails; the engine's "
            "spark.read.orc path handles the rest"
        )
    start = len(payload) - 1 - ps_len - footer_len
    if start < 4:
        raise ValueError("footer length past start of file")
    footer = payload[start : start + footer_len]
    n_rows = None
    n_types = 0
    stripe_rows = []
    for field, wire, v in _walk(footer):
        if field == 6 and wire == 0:
            n_rows = v
        elif field == 4 and wire == 2:
            n_types += 1
        elif field == 3 and wire == 2:
            srows = 0
            for sf, sw, sv in _walk(v):
                if sf == 5 and sw == 0:
                    srows = sv
            stripe_rows.append(srows)
    if n_rows is None or n_rows < 0:
        raise ValueError("footer missing numberOfRows")
    if stripe_rows and sum(stripe_rows) != n_rows:
        raise ValueError(
            f"stripe rows {sum(stripe_rows)} != file rows {n_rows} "
            "(inconsistent footer)"
        )
    return {
        "n_rows": n_rows,
        "n_stripes": len(stripe_rows),
        "n_columns": max(n_types - 1, 0),
        "compression": COMPRESSION_NAMES.get(compression, str(compression)),
        "payload_bytes": len(payload),
    }


def synth_orc_plan(seed: int) -> dict:
    """File plan, mirrored in the DuckDB oracle: 15 + seed*5 % 250
    rows, 1 + seed%4 columns; pyarrow merges small writes into one
    stripe."""
    return {
        "n_rows": 15 + (seed * 5) % 250,
        "n_columns": 1 + seed % 4,
        "n_stripes": 1,
    }


def synth_orc(seed: int) -> bytes:
    """A REAL ORC file written by pyarrow with an uncompressed tail
    — the independent producer pinning the protobuf-wire reuse."""
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    plan = synth_orc_plan(seed)
    cols = {
        f"c{j}": [
            (seed * 7 + i * 3 + j) % 1000 for i in range(plan["n_rows"])
        ]
        for j in range(plan["n_columns"])
    }
    buf = io.BytesIO()
    orc.write_table(pa.table(cols), buf, compression="uncompressed")
    return buf.getvalue()
