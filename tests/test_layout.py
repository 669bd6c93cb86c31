"""layout_for_scans: plan shape + the pruning payoff it exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouseproject_spark.sources.layout import layout_for_scans


def test_layout_plan_range_partitions_and_sorts(spark):
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    out = layout_for_scans(df, ["k"], n_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(k" in plan
    # within-partition sort only (Sort [...], false, 0) — no global
    # sort barrier
    assert "Sort [k" in plan and ", false, 0" in plan


def test_layout_clusters_minmax_ranges(spark, tmp_path):
    """After the layout write, per-file [min,max] ranges are disjoint —
    the property zone-map pruning needs. An unclustered write of the
    same data has every file spanning ~the whole domain."""
    import pyarrow.parquet as pq
    import glob

    df = spark.range(0, 40_000).select(
        (F.xxhash64("id") % 10_000).alias("k"), F.col("id").alias("v")
    )
    clustered = str(tmp_path / "clustered")
    scattered = str(tmp_path / "scattered")
    layout_for_scans(df, ["k"], n_partitions=4).write.parquet(clustered)
    df.repartition(4).write.parquet(scattered)

    def spans(path):
        out = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = min(
                md.row_group(i).column(0).statistics.min
                for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(0).statistics.max
                for i in range(md.num_row_groups)
            )
            out.append((lo, hi))
        return sorted(out)

    c = spans(clustered)
    assert len(c) == 4
    # clustered: consecutive file ranges don't overlap
    for (lo1, hi1), (lo2, hi2) in zip(c, c[1:]):
        assert hi1 <= lo2, c
    # scattered: every file covers most of the domain (no pruning power)
    s = spans(scattered)
    domain = s[-1][1] - s[0][0]
    assert all((hi - lo) > 0.8 * domain for lo, hi in s), s


def test_zorder_key_matches_reference_bits(spark):
    """Spark zorder_key equals a Python bit-interleave reference, and
    preserves the defining property: nearby (x, y) points share key
    prefixes (tile locality)."""
    from datawarehouseproject_spark.sources.layout import zorder_key

    def ref(x, y, bits=16):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    pts = [(0, 0), (1, 0), (0, 1), (255, 255), (1499, 366), (65535, 65535)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key("x", "y").alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == ref(x, y), (x, y)
    # locality: a 2x2 block shares all but the low 2 bits
    assert ref(2, 2) >> 2 == ref(3, 3) >> 2 == ref(2, 3) >> 2
