"""Semantic pins for the behavioral-analytics / entity-matching
queries (``plans/queries_analytics.py``).

Each test cross-checks the scalable plan against a naive recompute on
the real sf0.001 testdata — e.g. the banded-blocking fuzzy join must
return exactly the pairs the quadratic within-nation join returns, and
the bitmap distinct must equal countDistinct. The DuckDB oracle gate
covers value-parity; these pin the *algorithmic* equivalences the
oracles rely on.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datawarehouseproject_spark.plans import registry

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)


def _run(spark, name):
    return registry.queries()[name](spark, SF_DIR)


@needs_testdata
def test_entity_resolution_matches_naive_quadratic(spark):
    """Banded blocking must find EXACTLY the naive O(n^2) pair set."""
    from datawarehouseproject_spark.catalog import load_table

    got = {
        (r.custkey_a, r.custkey_b, r.name_dist)
        for r in _run(spark, "entity_resolution").collect()
    }
    c = load_table(spark, SF_DIR, "customer")
    a, b = c.alias("a"), c.alias("b")
    naive = (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .where(
            (F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal")) <= 1.0)
            & (F.levenshtein("a.c_name", "b.c_name") <= 2)
        )
        .select(
            F.col("a.c_custkey").alias("ka"),
            F.col("b.c_custkey").alias("kb"),
            F.levenshtein("a.c_name", "b.c_name").cast("int").alias("d"),
        )
    )
    want = {(r.ka, r.kb, r.d) for r in naive.collect()}
    assert got == want
    assert all(ka < kb and d <= 2 for ka, kb, d in got)


@needs_testdata
def test_bitmap_distinct_equals_count_distinct(spark):
    from datawarehouseproject_spark.catalog import load_table

    got = {
        r.event_type: r.n_users
        for r in _run(spark, "bitmap_distinct_users").collect()
    }
    want = {
        r.event_type: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


@needs_testdata
def test_event_transitions_probabilities(spark):
    rows = _run(spark, "event_transitions").collect()
    assert rows
    by_src = {}
    for r in rows:
        assert 0 <= r.p_bp <= 10000
        by_src.setdefault(r.event_type, []).append(r)
    for src, grp in by_src.items():
        total = sum(r.n for r in grp)
        for r in grp:
            assert r.p_bp == (10000 * r.n) // total
        # floor-division rows sum to <= 10000 and within |grp| of it
        s = sum(r.p_bp for r in grp)
        assert 10000 - len(grp) < s <= 10000


@needs_testdata
def test_activity_gaps_bounds(spark):
    rows = _run(spark, "activity_gaps").collect()
    assert rows, "threshold should produce rows on the synthetic data"
    for r in rows:
        assert r.gap_days >= 2
        assert (r.gap_end - r.gap_start).days == r.gap_days


@needs_testdata
def test_doc_length_histogram_buckets(spark):
    from datawarehouseproject_spark.catalog import load_table

    rows = _run(spark, "doc_length_histogram").collect()
    docs = load_table(spark, SF_DIR, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        # bucket is the bit length of every member's n_chars
        assert r.bit_bucket == int(r.min_chars).bit_length()
        assert r.bit_bucket == int(r.max_chars).bit_length()


@needs_testdata
def test_stratified_sample_caps_every_stratum(spark):
    rows = _run(spark, "stratified_sample").collect()
    per = {}
    for r in rows:
        assert r.rk <= 50
        per[(r.source, r.lang)] = per.get((r.source, r.lang), 0) + 1
    assert per
    from datawarehouseproject_spark.catalog import load_table

    sizes = {
        (r.source, r.lang): r.n
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for key, n_sampled in per.items():
        assert n_sampled == min(50, sizes[key])


@needs_testdata
def test_mad_outliers_all_beyond_threshold(spark):
    rows = _run(spark, "mad_outliers").collect()
    assert rows
    for r in rows:
        assert r.abs_dev > 3 * r.mad - 1e-3  # rounded columns


@needs_testdata
def test_orders_yoy_lag_alignment(spark):
    rows = {(r.yr, r.mo): r for r in _run(spark, "orders_yoy").collect()}
    assert rows
    n_checked = 0
    for (yr, mo), r in rows.items():
        prev = rows.get((yr - 1, mo))
        if r.yoy_delta_cents is not None:
            assert prev is not None
            assert r.yoy_delta_cents == r.revenue_cents - prev.revenue_cents
            n_checked += 1
    assert n_checked


@needs_testdata
def test_pareto_frontier_no_dominators(spark):
    """No frontier row may be dominated by ANY part (brute check)."""
    from datawarehouseproject_spark.catalog import load_table

    frontier = _run(spark, "pareto_frontier").collect()
    assert frontier
    allp = [
        (r.p_retailprice, r.p_size)
        for r in load_table(spark, SF_DIR, "part")
        .select("p_retailprice", "p_size")
        .collect()
    ]
    for f in frontier:
        for price, size in allp:
            dominated = (
                price <= f.price
                and size >= f.size
                and (price < f.price or size > f.size)
            )
            assert not dominated, (f, price, size)


@needs_testdata
def test_equi_depth_histogram_depths(spark):
    """Buckets are contiguous, cover all rows, and are near-equal."""
    rows = sorted(_run(spark, "equi_depth_histogram").collect(), key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(1, 9))
    total = sum(r.n for r in rows)
    for r in rows:
        assert abs(r.n - total / 8) / (total / 8) < 0.02
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo


@needs_testdata
def test_user_paths_covers_all_users(spark):
    from datawarehouseproject_spark.catalog import load_table

    rows = _run(spark, "user_paths").collect()
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        assert 1 <= len(r.path.split(">")) <= 3


@needs_testdata
def test_table_checksum_order_independent(spark):
    """Shuffled/odd-partitioned input must yield identical checksums."""
    from datawarehouseproject_spark.plans.registry import queries

    base = {
        r.l_returnflag: (r.n_rows, r.xor_hash, r.sum_key)
        for r in _run(spark, "table_checksum").collect()
    }
    assert base
    # recompute from a deliberately re-partitioned, re-ordered scan
    from datawarehouseproject_spark.catalog import load_table
    from pyspark.sql import functions as F2

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .repartition(7, "l_partkey")
        .sortWithinPartitions(F2.desc("l_extendedprice"))
    )
    row_repr = F2.concat_ws(
        "|",
        F2.col("l_orderkey").cast("string"),
        F2.col("l_linenumber").cast("string"),
        F2.round(F2.col("l_extendedprice") * 100).cast("bigint").cast("string"),
        F2.col("l_quantity").cast("bigint").cast("string"),
        F2.col("l_shipdate").cast("date").cast("string"),
    )
    row_hash = F2.conv(F2.substring(F2.md5(row_repr), 1, 15), 16, 10).cast("long")
    again = {
        r.l_returnflag: (r.n_rows, r.xor_hash, r.sum_key)
        for r in li.groupBy("l_returnflag")
        .agg(
            F2.count(F2.lit(1)).cast("bigint").alias("n_rows"),
            F2.bit_xor(row_hash).alias("xor_hash"),
            F2.sum("l_orderkey").cast("bigint").alias("sum_key"),
        )
        .collect()
    }
    assert base == again


@needs_testdata
def test_referential_audit_clean_schema(spark):
    """Generator data is referentially intact -> all checks zero; the
    query shape (4 named checks) is pinned regardless."""
    rows = {r.check_name: r.n_violations for r in _run(spark, "referential_audit").collect()}
    assert set(rows) == {
        "orders_without_customer",
        "lineitem_without_order",
        "customer_invalid_nation",
        "supplier_invalid_nation",
    }
    assert all(v == 0 for v in rows.values())


def test_referential_audit_detects_planted_orphans(spark, tmp_path):
    """Plant orphans in a copied mini-schema and expect exact counts."""
    import shutil

    src = "/root/testdata/sf0.001"
    if not os.path.isdir(src):
        pytest.skip("testdata absent")
    for t in ("orders", "customer", "lineitem", "nation", "supplier"):
        shutil.copy(f"{src}/{t}.parquet", tmp_path / f"{t}.parquet")
    # corrupt: 3 orders pointing at a customer that doesn't exist
    from datawarehouseproject_spark.catalog import load_table

    o = load_table(spark, str(tmp_path), "orders")
    broken = o.limit(3).withColumn("o_custkey", F.lit(10**12)).unionByName(
        o.subtract(o.limit(3))
    )
    broken.write.mode("overwrite").parquet(str(tmp_path / "orders_new"))
    import pathlib

    (tmp_path / "orders.parquet").unlink()
    # single-file parquet expected by load_table? directory works for spark reads
    shutil.move(str(tmp_path / "orders_new"), str(tmp_path / "orders.parquet"))
    rows = {
        r.check_name: r.n_violations
        for r in registry.queries()["referential_audit"](spark, str(tmp_path)).collect()
    }
    assert rows["orders_without_customer"] == 3


@needs_testdata
def test_time_weighted_avg_bounds(spark):
    from datawarehouseproject_spark.catalog import load_table

    rows = _run(spark, "time_weighted_avg").collect()
    assert rows
    bounds = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    )
    lim = {r.user_id: (r.lo, r.hi) for r in bounds}
    for r in rows:
        lo, hi = lim[r.user_id]
        assert lo - 1e-4 <= r.twap <= hi + 1e-4
        assert r.span_secs > 0


@needs_testdata
def test_trailing_hour_counts_brute(spark):
    """Brute-force the hour window for a sample of users."""
    from datawarehouseproject_spark.catalog import load_table

    got = {
        r.event_id: r.n_last_hour
        for r in _run(spark, "trailing_hour_counts").collect()
    }
    evs = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "user_id", F.unix_timestamp("ts").alias("s"))
        .collect()
    )
    by_user = {}
    for r in evs:
        by_user.setdefault(r.user_id, []).append((r.s, r.event_id))
    checked = 0
    for user, rows in list(by_user.items())[:25]:
        for s, eid in rows:
            want = sum(1 for s2, _ in rows if s - 3600 <= s2 <= s)
            assert got[eid] == want
            checked += 1
    assert checked


@needs_testdata
def test_interpolate_series_semantics(spark):
    """Observed rows reproduce the daily mean; gap rows are strictly
    bracketed by their neighbors; spines have no NULL fills."""
    rows = _run(spark, "interpolate_series").collect()
    assert rows and all(r.v_filled is not None for r in rows)
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for series in by_user.values():
        series.sort(key=lambda r: r.day)
        # spine endpoints are observed days
        assert series[0].observed and series[-1].observed
        for i, r in enumerate(series):
            if r.observed:
                continue
            # linear fill lies within [prev, next] observation values
            nxt = next(s for s in series[i + 1 :] if s.observed)
            prv = next(s for s in reversed(series[:i]) if s.observed)
            lo, hi = sorted((prv.v_filled, nxt.v_filled))
            assert lo - 1e-9 <= r.v_filled <= hi + 1e-9


@needs_testdata
def test_winsorized_mean_clamps_toward_center(spark):
    """p05 <= winsorized values <= p95; clamping pulls the mean
    between the raw mean and the median direction but never outside
    the bound interval."""
    for r in _run(spark, "winsorized_mean").collect():
        assert r.p05 <= r.p95
        assert r.p05 <= r.winsorized_mean <= r.p95
        assert r.n_orders > 0


@needs_testdata
def test_shot_boundaries_telescoping(spark):
    """Per clip: frame count matches the synth formula, the first
    frame's delta is 0, and deltas telescope to last-first."""
    rows = _run(spark, "shot_boundaries").collect()
    clips: dict[int, list] = {}
    for r in rows:
        clips.setdefault(r.media_id, []).append(r)
    for media_id, fr in clips.items():
        fr.sort(key=lambda r: r.frame_idx)
        assert len(fr) == 4 + media_id % 5
        assert fr[0].delta == 0 and fr[0].is_cut is False
        assert sum(f.delta for f in fr) == fr[-1].intensity - fr[0].intensity


@needs_testdata
def test_ab_assignment_deterministic_and_partitioning(spark):
    """The hash split is stable across runs and covers every user
    exactly once."""
    r1 = _run(spark, "ab_assignment_lift").collect()[0]
    r2 = _run(spark, "ab_assignment_lift").collect()[0]
    assert r1 == r2
    from datawarehouseproject_spark.catalog import load_table

    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert r1.control_users + r1.treatment_users == n_users
    assert r1.control_users > 0 and r1.treatment_users > 0


@needs_testdata
def test_embedding_dim_stats_shape(spark):
    """Every (label, dim) cell is present, stds are non-negative and
    codes stay in the int8 envelope."""
    rows = _run(spark, "embedding_dim_stats").collect()
    from datawarehouseproject_spark.catalog import load_table
    from pyspark.sql import functions as FF

    emb = load_table(spark, SF_DIR, "embeddings")
    n_labels = emb.select("label").distinct().count()
    dim = emb.select(FF.size("embedding").alias("d")).first().d
    assert len(rows) == n_labels * dim
    for r in rows:
        assert r.std_q >= 0
        assert -127 <= r.min_q <= r.max_q <= 127
        assert r.min_q <= r.mean_q <= r.max_q


@needs_testdata
def test_incremental_join_view_matches_direct(spark):
    """Delta-join maintenance must be lossless vs the direct join."""
    got = {
        (r.nationkey, r.yr): (r.n_orders, r.total)
        for r in _run(spark, "incremental_join_view").collect()
    }
    from datawarehouseproject_spark.catalog import load_table

    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    direct = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").cast("int").alias("nationkey"),
            F.year(F.to_date("o_orderdate")).cast("int").alias("yr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("t"),
        )
    )
    want = {(r.nationkey, r.yr): (r.n, r.t) for r in direct.collect()}
    assert got == want


@needs_testdata
def test_table_diff_counts_reconcile(spark):
    """added = |%89 keys|, removed = |%97 keys|, changed = |%101 keys
    surviving the delete|, and the four classes partition A∪B."""
    from datawarehouseproject_spark.catalog import load_table

    got = {r.diff_status: r.n_rows for r in _run(spark, "table_diff").collect()}
    o = load_table(spark, SF_DIR, "orders")
    n = o.count()
    n_del = o.filter(F.col("o_orderkey") % 97 == 0).count()
    n_ins = o.filter(F.col("o_orderkey") % 89 == 0).count()
    n_upd = o.filter(
        (F.col("o_orderkey") % 101 == 0) & (F.col("o_orderkey") % 97 != 0)
    ).count()
    assert got.get("removed", 0) == n_del
    assert got.get("added", 0) == n_ins
    assert got.get("changed", 0) == n_upd
    assert got.get("unchanged", 0) == n - n_del - n_upd


@needs_testdata
def test_dau_wau_mau_invariants(spark):
    """WAU >= DAU, MAU >= WAU every day; single-day identity on the
    first day; DAU equals exact count distinct per day."""
    from datawarehouseproject_spark.catalog import load_table

    rows = sorted(_run(spark, "dau_wau_mau").collect(), key=lambda r: r.day)
    assert rows
    assert rows[0].dau == rows[0].wau == rows[0].mau
    for r in rows:
        assert r.dau <= r.wau <= r.mau
    exact = {
        r.day: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.dau == exact[r.day]


@needs_testdata
def test_purchase_attribution_totals(spark):
    """Attribution cells partition the purchase set exactly."""
    from datawarehouseproject_spark.catalog import load_table

    rows = _run(spark, "purchase_attribution").collect()
    n_purch = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r.n_purchases for r in rows) == n_purch
    assert all(r.total_value > 0 for r in rows)


@needs_testdata
def test_key_skew_report_consistency(spark):
    from datawarehouseproject_spark.catalog import load_table

    r = _run(spark, "key_skew_report").collect()[0]
    li = load_table(spark, SF_DIR, "lineitem")
    assert r.n_rows == li.count()
    assert r.n_keys == li.select("l_orderkey").distinct().count()
    assert r.p50_key_rows <= r.p99_key_rows <= r.max_key_rows
    assert r.skew_vs_avg_bp >= 10000  # max >= avg always


@needs_testdata
def test_market_basket_bounds(spark):
    """Support/confidence/lift invariants: pair support cannot exceed
    either part's order count; confidence <= 10000 bp; symmetric
    support consistency with a naive recount of one pair."""
    rows = _run(spark, "market_basket").collect()
    assert rows
    from datawarehouseproject_spark.catalog import load_table

    items = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    counts = {
        r.l_partkey: r.n
        for r in items.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.part_a < r.part_b
        assert r.pair_orders >= 2
        assert r.pair_orders <= min(counts[r.part_a], counts[r.part_b])
        assert 0 < r.confidence_ab_bp <= 10000
    # spot-verify the most frequent pair by direct recount
    top = max(rows, key=lambda r: r.pair_orders)
    n_direct = (
        items.filter(F.col("l_partkey") == top.part_a)
        .select("l_orderkey")
        .join(
            items.filter(F.col("l_partkey") == top.part_b).select(
                "l_orderkey"
            ),
            "l_orderkey",
        )
        .count()
    )
    assert n_direct == top.pair_orders


@needs_testdata
def test_conversion_latency_monotone(spark):
    r = _run(spark, "conversion_latency").collect()[0]
    assert r.n_converted <= r.n_signup_users
    assert 0 <= r.p25_secs <= r.p50_secs <= r.p75_secs <= r.p90_secs
    assert r.conversion_bp == 10000 * r.n_converted // r.n_signup_users


@needs_testdata
def test_rfm_scores_in_range_and_cover_users(spark):
    from datawarehouseproject_spark.catalog import load_table

    rows = _run(spark, "rfm_segmentation").collect()
    n_buyers = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert len(rows) == n_buyers
    for r in rows:
        assert 1 <= r.r_score <= 4 and 1 <= r.f_score <= 4
        assert 1 <= r.m_score <= 4
        assert r.recency_days >= 0 and r.frequency > 0
    # quartile scoring must use all four bins on real data
    assert {r.f_score for r in rows} >= {1, 4}


@needs_testdata
def test_audience_overlap_exact(spark):
    """Bitmap AND overlaps must equal python set intersections."""
    from datawarehouseproject_spark.catalog import load_table

    rows = _run(spark, "audience_overlap_matrix").collect()
    ev = load_table(spark, SF_DIR, "events").select("event_type", "user_id")
    segs: dict[str, set] = {}
    for r in ev.collect():
        segs.setdefault(r.event_type, set()).add(r.user_id)
    assert rows
    for r in rows:
        assert r.type_a < r.type_b
        want = len(segs[r.type_a] & segs[r.type_b])
        assert (r.n_a, r.n_b, r.n_both) == (
            len(segs[r.type_a]),
            len(segs[r.type_b]),
            want,
        )
        assert r.jaccard_bp == 10000 * want // (r.n_a + r.n_b - want)


@needs_testdata
def test_daily_value_bands_monotone(spark):
    for r in _run(spark, "daily_value_bands").collect():
        assert r.p10_cents <= r.p50_cents <= r.p90_cents
        assert r.n_events > 0


@needs_testdata
def test_daily_metric_correlation_matches_numpy(spark):
    import numpy as np

    from datawarehouseproject_spark.catalog import load_table

    rows = _run(spark, "daily_metric_correlation").collect()
    ev = load_table(spark, SF_DIR, "events")
    daily = {}
    for r in (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ):
        daily.setdefault(r.event_type, {})[r.day] = r.n
    all_days = sorted({d for m in daily.values() for d in m})
    assert rows
    for r in rows:
        x = np.array([daily[r.type_a].get(d, 0) for d in all_days], float)
        y = np.array([daily[r.type_b].get(d, 0) for d in all_days], float)
        want = float(np.corrcoef(x, y)[0, 1])
        assert abs(r.pearson_r - want) < 1e-9
        assert -1.0 <= r.pearson_r <= 1.0


def test_holt_negative_trend_floor_semantics(spark):
    """A strictly declining series drives the trend state negative;
    the arithmetic-shift recurrence must floor (match Python's >>)
    exactly — the signed-state case the EWMA's nonneg DIV can't
    cover."""
    from pyspark.sql import functions as F

    rows = [(1, f"2026-01-{d:02d}", 10 - d) for d in range(1, 9)]
    ev = spark.createDataFrame(rows, "user_id: long, day: string, v: long")
    # replicate the registry query's fold inline on a prepared frame
    arr = ev.select(
        "user_id", F.to_date("day").alias("day"), "v"
    ).groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("day", "v"))).alias("a")
    )
    folded = arr.select(
        F.aggregate(
            "a",
            F.expr(
                "CAST(array() AS array<struct<day:date,v:bigint,l:bigint,b:bigint>>)"
            ),
            lambda acc, x: F.concat(
                acc,
                F.array(
                    F.struct(
                        x["day"].alias("day"),
                        x["v"].alias("v"),
                        F.when(F.size(acc) == 0, x["v"] * F.lit(1_000_000))
                        .otherwise(
                            F.shiftright(
                                x["v"] * F.lit(1_000_000)
                                + F.lit(3)
                                * (F.element_at(acc, -1)["l"] + F.element_at(acc, -1)["b"]),
                                2,
                            )
                        )
                        .alias("l"),
                        F.when(F.size(acc) == 0, F.lit(0).cast("long"))
                        .otherwise(
                            F.shiftright(
                                F.shiftright(
                                    x["v"] * F.lit(1_000_000)
                                    + F.lit(3)
                                    * (F.element_at(acc, -1)["l"] + F.element_at(acc, -1)["b"]),
                                    2,
                                )
                                - F.element_at(acc, -1)["l"]
                                + F.lit(3) * F.element_at(acc, -1)["b"],
                                2,
                            )
                        )
                        .alias("b"),
                    )
                ),
            ),
        ).alias("s")
    )
    out = folded.select(F.explode("s").alias("r")).select("r.v", "r.l", "r.b").collect()
    # independent Python replay with >> (floor) semantics
    l = b = None
    for row in out:
        v = row["v"]
        if l is None:
            el, eb = v * 1_000_000, 0
        else:
            el = (v * 1_000_000 + 3 * (l + b)) >> 2
            eb = (el - l + 3 * b) >> 2
        assert (row["l"], row["b"]) == (el, eb), (v, row, el, eb)
        l, b = el, eb
    assert out[-1]["b"] < 0  # trend really went negative
