"""HLL sketch: merge algebra, determinism, accuracy envelope."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouseproject_spark.operators.sketches import (
    hll_distinct,
    hll_estimate,
    hll_sketch,
)


def test_hll_merge_equals_whole(spark):
    """Sketching two halves and merging must equal sketching the
    union — the property that lets daily sketches roll up without
    rescanning history."""
    a = spark.range(0, 5000).select(F.col("id").alias("k"))
    b = spark.range(2500, 8000).select(F.col("id").alias("k"))
    whole = a.union(b)

    merged = (
        hll_sketch(a, "k")
        .union(hll_sketch(b, "k"))
        .groupBy("bucket")
        .agg(F.max("mrank").alias("mrank"))
    )
    est_merged = hll_estimate(merged).collect()[0]
    est_whole = hll_distinct(whole, "k").collect()[0]
    assert est_merged["hll_estimate"] == est_whole["hll_estimate"]
    assert est_merged["buckets_used"] == est_whole["buckets_used"]


def test_hll_deterministic_across_runs(spark):
    df = spark.range(0, 3000).select(F.col("id").alias("k"))
    e1 = hll_distinct(df, "k").collect()[0]["hll_estimate"]
    e2 = hll_distinct(df, "k").collect()[0]["hll_estimate"]
    assert e1 == e2


def test_hll_accuracy_envelope(spark):
    """Raw HLL with m=256 registers: relative error ~1.04/sqrt(256)
    ≈ 6.5%; allow 3 sigma. 10k distincts is inside the raw
    estimator's valid range (> 2.5m)."""
    df = spark.range(0, 10_000).select(F.col("id").alias("k"))
    est = hll_distinct(df, "k").collect()[0]["hll_estimate"]
    assert abs(est - 10_000) / 10_000 < 0.20, est


def test_hll_duplicates_ignored(spark):
    """Cardinality, not row count: 100x duplication must not move
    the estimate."""
    base = spark.range(0, 2000).select(F.col("id").alias("k"))
    dup = base.crossJoin(spark.range(0, 100)).select("k")
    e_base = hll_distinct(base, "k").collect()[0]["hll_estimate"]
    e_dup = hll_distinct(dup, "k").collect()[0]["hll_estimate"]
    assert e_base == e_dup


def test_hll_sketch_bounded_size(spark):
    """The sketch never exceeds 2^p rows no matter the input size."""
    df = spark.range(0, 50_000).select(F.col("id").alias("k"))
    assert hll_sketch(df, "k", p=8).count() <= 256


def test_cms_upper_bounds_and_merge(spark):
    from datawarehouseproject_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    rows = [("a",)] * 100 + [("b",)] * 10 + [("c",)] * 1
    df = spark.createDataFrame(rows, "v string")
    items = df.select("v").distinct()
    sk = cms_sketch(df, "v")
    est = {r["v"]: r["est_count"] for r in
           cms_estimate(sk, items, "v").collect()}
    # CM never underestimates, and with 3 values in a 4x64 sketch the
    # collision probability is tiny — expect exact
    assert est["a"] >= 100 and est["b"] >= 10 and est["c"] >= 1
    assert est == {"a": 100, "b": 10, "c": 1}

    # merging two halves == sketching the whole
    from pyspark.sql import functions as _F

    h1 = spark.createDataFrame(rows[:50], "v string")
    h2 = spark.createDataFrame(rows[50:], "v string")
    merged = (
        cms_sketch(h1, "v")
        .union(cms_sketch(h2, "v"))
        .groupBy("row_idx", "pos")
        .agg(_F.sum("cnt").alias("cnt"))
    )
    est_m = {r["v"]: r["est_count"] for r in
             cms_estimate(merged, items, "v").collect()}
    assert est_m == est


def test_cms_absent_value_zero(spark):
    from datawarehouseproject_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    df = spark.createDataFrame([("a",)] * 5, "v string")
    probe = spark.createDataFrame([("zzz",)], "v string")
    est = cms_estimate(cms_sketch(df, "v"), probe, "v").collect()
    # 4 independent hash rows over a 64-wide table with ONE occupied
    # cell per row: a probe colliding in ALL rows is ~(1/64)^4
    assert est[0]["est_count"] == 0


def test_hll_groupwise_matches_global_per_group(spark):
    """A group-wise sketch restricted to one group equals the global
    sketch of that group's rows — same registers, same estimate."""
    from datawarehouseproject_spark.operators.sketches import (
        hll_estimate_by,
        hll_sketch_by,
    )

    df = spark.range(0, 6000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("k")
    )
    by = {
        r["g"]: r["hll_estimate"]
        for r in hll_estimate_by(
            hll_sketch_by(df, ["g"], "k"), ["g"]
        ).collect()
    }
    solo = hll_distinct(df.filter(F.col("g") == "1"), "k").collect()[0][
        "hll_estimate"
    ]
    assert by["1"] == solo


def test_hll_groupwise_rollup_merge(spark):
    """Two days' group-wise sketches merged by register max equal the
    sketch of the union — the month-from-days rollup."""
    from datawarehouseproject_spark.operators.sketches import (
        hll_estimate_by,
        hll_sketch_by,
    )

    d1 = spark.range(0, 3000).select(
        F.lit("a").alias("g"), F.col("id").alias("k")
    )
    d2 = spark.range(1500, 4500).select(
        F.lit("a").alias("g"), F.col("id").alias("k")
    )
    merged = (
        hll_sketch_by(d1, ["g"], "k")
        .union(hll_sketch_by(d2, ["g"], "k"))
        .groupBy("g", "bucket")
        .agg(F.max("mrank").alias("mrank"))
    )
    whole = hll_sketch_by(d1.union(d2), ["g"], "k")
    a = hll_estimate_by(merged, ["g"]).collect()[0]["hll_estimate"]
    b = hll_estimate_by(whole, ["g"]).collect()[0]["hll_estimate"]
    assert a == b


def test_quantile_merge_equals_whole(spark):
    """bottom-k-by-hash is per-row and order-independent, so merging
    per-shard sketches must equal sketching the whole input."""
    from datawarehouseproject_spark.operators.sketches import (
        quantile_merge,
        quantile_sketch,
    )

    whole = spark.range(0, 5000).selectExpr(
        "id AS k", "cast((id * 37) % 1000 as double) AS v"
    )
    shard_a = whole.filter("k < 2000")
    shard_b = whole.filter("k >= 2000")
    sk_whole = quantile_sketch(whole, "v", "k", k=128)
    merged = quantile_merge(
        [quantile_sketch(shard_a, "v", "k", k=128),
         quantile_sketch(shard_b, "v", "k", k=128)],
        k=128,
    )
    assert sorted(map(tuple, sk_whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_quantile_estimate_exact_on_small_input(spark):
    """When k >= n the sample IS the data, so rank selection must
    return the exact percentile elements."""
    from datawarehouseproject_spark.operators.sketches import (
        quantile_estimate,
        quantile_sketch,
    )

    df = spark.range(0, 101).selectExpr("id AS k", "cast(id as double) AS v")
    sk = quantile_sketch(df, "v", "k", k=256)
    got = {r.p: r.est_val for r in quantile_estimate(sk, [0, 25, 50, 100]).collect()}
    assert got == {0: 0.0, 25: 25.0, 50: 50.0, 100: 100.0}


def test_quantile_accuracy_envelope(spark):
    """With k=256 of 20000 uniform values, every estimated percentile
    must land within ~10 rank points of truth (loose envelope; the
    point is the sample is unbiased, not tight)."""
    from datawarehouseproject_spark.operators.sketches import (
        quantile_estimate,
        quantile_sketch,
    )

    df = spark.range(0, 20000).selectExpr("id AS k", "cast(id as double) AS v")
    sk = quantile_sketch(df, "v", "k", k=256)
    for r in quantile_estimate(sk, [10, 50, 90]).collect():
        true_pct = r.est_val / 20000 * 100
        assert abs(true_pct - r.p) < 10, (r.p, r.est_val)


def test_cms_join_size_upper_bound_and_accuracy(spark):
    """The inner-product estimate upper-bounds the true join size and
    tightens with width (exact when width >> key collisions)."""
    from datawarehouseproject_spark.operators.sketches import (
        cms_join_size,
        cms_sketch,
    )

    a = spark.range(0, 500).selectExpr("id % 100 AS k")       # 5 rows/key
    b = spark.range(0, 300).selectExpr("id % 100 AS k")       # 3 rows/key
    true_size = 100 * 5 * 3
    ska = cms_sketch(a, "k", depth=4, width=4096)
    skb = cms_sketch(b, "k", depth=4, width=4096)
    est = cms_join_size(ska, skb, depth=4).collect()[0]["est_join_size"]
    assert est >= true_size            # CM never underestimates
    assert est <= true_size * 1.1      # 100 keys in 4096 slots: near-exact


def test_bloom_no_false_negatives_and_merge(spark):
    """Every member must probe as present (the Bloom guarantee), and
    merging per-shard filters (union+distinct) must equal building
    over the whole set."""
    from datawarehouseproject_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )
    from pyspark.sql import functions as F

    members = spark.range(0, 200).selectExpr("id * 7 AS k")
    bloom = bloom_build(members, "k", k=5, m_bits=1024)
    probed = bloom_probe(bloom, members.select("k"), "k", k=5, m_bits=1024)
    assert probed.filter(~F.col("in_bloom")).count() == 0

    half_a = members.filter("k < 700")
    half_b = members.filter("k >= 700")
    merged = (
        bloom_build(half_a, "k", k=5, m_bits=1024)
        .unionByName(bloom_build(half_b, "k", k=5, m_bits=1024))
        .distinct()
    )
    whole = {r["bit_idx"] for r in bloom.collect()}
    assert {r["bit_idx"] for r in merged.collect()} == whole


def test_bloom_rejects_most_non_members(spark):
    from datawarehouseproject_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )
    from pyspark.sql import functions as F

    members = spark.range(0, 50).selectExpr("id AS k")
    others = spark.range(1000, 3000).selectExpr("id AS k")
    bloom = bloom_build(members, "k", k=5, m_bits=2048)
    probed = bloom_probe(bloom, others.select("k"), "k", k=5, m_bits=2048)
    fp = probed.filter(F.col("in_bloom")).count()
    assert fp < 20  # expected FP rate ~(1-e^-0.12)^5 << 1%


def test_quantile_sketch_by_group_isolation(spark):
    """Per-group sketches must estimate from their OWN group's rows:
    two groups with disjoint value ranges get disjoint medians."""
    from datawarehouseproject_spark.operators.sketches import (
        quantile_estimate_by,
        quantile_sketch_by,
    )

    df = spark.range(0, 2000).selectExpr(
        "id AS k",
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS g",
        "cast(CASE WHEN id % 2 = 0 THEN id ELSE id + 100000 END as double) AS v",
    )
    sk = quantile_sketch_by(df, ["g"], "v", "k", k=64)
    est = {(r["g"], r["p"]): r["est_val"]
           for r in quantile_estimate_by(sk, ["g"], [50]).collect()}
    assert est[("a", 50)] < 2000 and est[("b", 50)] > 100000


def test_hll_set_ops_inclusion_exclusion(spark):
    """est_overlap must be exactly est_a + est_b - est_union, and the
    union estimate must equal the estimate of sketching A∪B directly
    (set algebra closed over the sketch format)."""
    from datawarehouseproject_spark.operators.sketches import hll_set_ops

    a = spark.range(0, 4000).select(F.col("id").alias("k"))
    b = spark.range(3000, 7000).select(F.col("id").alias("k"))
    row = hll_set_ops(a, b, "k", p=8).collect()[0]
    assert row["est_overlap"] == row["est_a"] + row["est_b"] - row["est_union"]
    direct = hll_distinct(a.union(b), "k", p=8).collect()[0]["hll_estimate"]
    assert row["est_union"] == direct
    # accuracy envelope: true overlap 1000, union 7000; raw-HLL p=8
    # relative error ~6.5%, inclusion-exclusion compounds it — allow 3x
    assert abs(row["est_union"] - 7000) / 7000 < 0.2
    assert abs(row["est_overlap"] - 1000) / 1000 < 0.6


def test_bloom_prefilter_no_false_negatives_and_join_invariant(spark):
    """Every true member survives the prefilter, the output is a
    subset of the input, and joining after the prefilter returns
    exactly the rows the plain join returns."""
    from datawarehouseproject_spark.operators.sketches import (
        bloom_build,
        bloom_prefilter,
    )

    members = spark.range(0, 300).select((F.col("id") * 7).alias("k"))
    items = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("payload")
    )
    bloom = bloom_build(members, "k", k=5, m_bits=4096)
    kept = bloom_prefilter(bloom, items, "k", k=5, m_bits=4096)
    assert kept.columns == items.columns

    kept_keys = {r.k for r in kept.collect()}
    member_keys = {r.k for r in members.collect()}
    item_keys = {r.k for r in items.collect()}
    # no false negatives: every member that exists in items survives
    assert (member_keys & item_keys) <= kept_keys
    # subset of input
    assert kept_keys <= item_keys

    plain = {
        (r.k, r.payload) for r in items.join(members, "k").collect()
    }
    prefiltered = {
        (r.k, r.payload) for r in kept.join(members, "k").collect()
    }
    assert plain == prefiltered


def test_bloom_param_mismatch_raises(spark):
    """Probing with different (k, m_bits, native) than the build must
    raise, not silently drop matching rows (false negatives)."""
    import pytest

    from datawarehouseproject_spark.operators.sketches import (
        bloom_build,
        bloom_prefilter,
        bloom_probe,
    )

    members = spark.range(0, 50).select(F.col("id").alias("k"))
    items = spark.range(0, 100).select(F.col("id").alias("k"))
    bloom = bloom_build(members, "k", k=5, m_bits=1024, native=True)
    with pytest.raises(ValueError, match="false"):
        bloom_prefilter(bloom, items, "k", k=5, m_bits=1024, native=False)
    with pytest.raises(ValueError, match="false"):
        bloom_prefilter(bloom, items, "k", k=7, m_bits=1024, native=True)
    with pytest.raises(ValueError, match="false"):
        bloom_probe(bloom, items, "k", k=5, m_bits=2048)
    # matching parameters still work
    assert (
        bloom_prefilter(bloom, items, "k", k=5, m_bits=1024, native=True)
        .count()
        >= 50
    )


def test_bloom_prefilter_large_no_false_negatives(spark):
    """numpy-bitmap prefilter: every true member survives and the
    post-join result is identical to the plain join."""
    from datawarehouseproject_spark.operators.sketches import (
        bloom_prefilter_large,
    )

    members = spark.range(0, 500).select((F.col("id") * 11).alias("mk"))
    items = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("payload")
    )
    kept = bloom_prefilter_large(
        members, items, "mk", "k", k=5, m_bits=1 << 14
    )
    assert kept.columns == items.columns
    kept_keys = {r.k for r in kept.collect()}
    member_keys = {r.mk for r in members.collect()}
    item_keys = {r.k for r in items.collect()}
    assert (member_keys & item_keys) <= kept_keys
    assert kept_keys <= item_keys
    plain = {
        (r.k, r.payload)
        for r in items.join(members, items.k == members.mk).collect()
    }
    pre = {
        (r.k, r.payload)
        for r in kept.join(members, kept.k == members.mk).collect()
    }
    assert plain == pre
    # and the filter actually filters (FP rate far below 1 at 10 bits/key)
    assert len(kept_keys) < 3000


def test_equi_depth_sketch_parity_sf01(spark):
    """The sketch-backed equi-depth histogram approximates the exact
    one at bench scale (sf0.1): same total row count, every bucket
    within 30% of the ideal depth N/8 (k=1024 bottom-k sample ⇒
    ~128 samples per bucket, 3σ ≈ 26%), and boundaries consistent
    (bucket lo/hi ranges non-overlapping in order)."""
    import os

    sf_dir = "/root/testdata/sf0.1"
    if not os.path.exists(os.path.join(sf_dir, "lineitem.parquet")):
        import pytest

        pytest.skip("sf0.1 testdata not present")
    from datawarehouseproject_spark.plans.registry import queries

    fns = queries()
    exact = {
        r["bucket"]: r
        for r in fns["equi_depth_histogram"](spark, sf_dir).collect()
    }
    sk = {
        r["bucket"]: r
        for r in fns["equi_depth_histogram_sketch"](spark, sf_dir).collect()
    }
    total_exact = sum(r["n"] for r in exact.values())
    total_sk = sum(r["n"] for r in sk.values())
    assert total_exact == total_sk  # assignment never drops rows
    ideal = total_exact / 8
    for b, r in sk.items():
        assert abs(r["n"] - ideal) / ideal < 0.30, (b, r["n"], ideal)
    # bucket value ranges are ordered and non-overlapping
    ordered = [sk[b] for b in sorted(sk)]
    for a, b in zip(ordered, ordered[1:]):
        assert a["hi"] <= b["lo"]
