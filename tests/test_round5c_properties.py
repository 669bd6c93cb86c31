"""Property-based invariants for the round-5c operators.

Hypothesis drives randomized inputs through the new operators and
asserts the structural guarantees their oracles rely on:

1. bloom prefilters (both variants) NEVER drop a true member —
   false negatives are the one failure mode a Bloom filter may not
   have, under any key set;
2. linear interpolation reproduces exact values on arithmetic series and stays inside the bracketing observations on any
   series;
3. the sliding-bitmap distinct equals a naive set-based recompute
   for any (day, user) activity pattern.

Examples are small (a Spark job per example); the point is the
invariant under adversarial inputs, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(
    members=st.sets(st.integers(min_value=-1000, max_value=1000), max_size=40),
    probes=st.sets(st.integers(min_value=-1000, max_value=1000), max_size=60),
)
def test_bloom_variants_never_drop_members(spark, members, probes):
    from datawarehouseproject_spark.operators.sketches import (
        bloom_build,
        bloom_prefilter,
        bloom_prefilter_large,
    )

    items = spark.createDataFrame(
        [(k,) for k in sorted(probes)] or [(999999,)], "k long"
    )
    mdf = spark.createDataFrame(
        [(k,) for k in sorted(members)] or [(888888,)], "mk long"
    )
    bloom = bloom_build(
        mdf.withColumnRenamed("mk", "k"), "k", k=4, m_bits=512, native=True
    )
    small = {
        r.k
        for r in bloom_prefilter(
            bloom, items, "k", k=4, m_bits=512, native=True
        ).collect()
    }
    large = {
        r.k
        for r in bloom_prefilter_large(
            mdf, items, "mk", "k", k=4, m_bits=512
        ).collect()
    }
    true_hits = (members or {888888}) & (probes or {999999})
    assert true_hits <= small
    assert true_hits <= large


@SLOW
@given(
    obs=st.dictionaries(
        keys=st.integers(min_value=0, max_value=20),
        values=st.integers(min_value=-50, max_value=50),
        min_size=2,
        max_size=8,
    )
)
def test_linear_interpolation_brackets_and_hits_lines(spark, obs):
    """Gap fills lie within the bracketing observations; when the two
    brackets are equal the fill equals them exactly."""
    import datetime

    from pyspark.sql import Window

    base = datetime.date(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(days=d), float(v))
        for d, v in sorted(obs.items())
    ]
    daily = spark.createDataFrame(rows, "day date, v double")
    spine = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    ).select(F.explode(F.sequence("lo", "hi")).alias("day"))
    joined = spine.join(daily, "day", "left")
    prev_w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    next_w = Window.orderBy("day").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    w = joined.select(
        "day",
        "v",
        F.last("v", ignorenulls=True).over(prev_w).alias("pv"),
        F.first("v", ignorenulls=True).over(next_w).alias("nv"),
        F.last(obs_day, ignorenulls=True).over(prev_w).alias("pd"),
        F.first(obs_day, ignorenulls=True).over(next_w).alias("nd"),
    )
    frac = F.datediff("day", "pd").cast("double") / F.datediff(
        "nd", "pd"
    ).cast("double")
    out = w.select(
        "day",
        "v",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
        .alias("vf"),
        "pv",
        "nv",
    ).collect()
    for r in out:
        assert r.vf is not None
        if r.v is None:
            lo, hi = sorted((r.pv, r.nv))
            assert lo - 1e-9 <= r.vf <= hi + 1e-9
            if r.pv == r.nv:
                assert r.vf == r.pv


@SLOW
@given(
    activity=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # day offset
            st.integers(min_value=0, max_value=200),  # user id
        ),
        min_size=1,
        max_size=60,
    )
)
def test_sliding_bitmap_equals_set_recompute(spark, activity):
    """Bitmap DAU/WAU equals a python set-based recompute for any
    activity pattern (including chunk-idle days)."""
    import datetime

    from pyspark.sql import Window

    base = datetime.date(2024, 3, 1)
    rows = [
        (base + datetime.timedelta(days=d), u) for d, u in sorted(activity)
    ]
    ev = spark.createDataFrame(rows, "day date, user_id long")
    bits = (
        ev.select(
            "day",
            F.expr("user_id div 63").alias("chunk"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))"
            ).alias("bit"),
        )
        .groupBy("day", "chunk")
        .agg(F.bit_or("bit").alias("b"))
    )
    spine = (
        bits.select("day")
        .distinct()
        .crossJoin(bits.select("chunk").distinct())
        .join(bits, ["day", "chunk"], "left")
        .select(
            "day",
            F.coalesce("b", F.lit(0)).alias("b"),
            F.datediff("day", F.lit("1970-01-01")).alias("ed"),
            "chunk",
        )
    )
    w7 = Window.partitionBy("chunk").orderBy("ed").rangeBetween(-2, 0)
    got = {
        (r.day, r.dau, r.wau)
        for r in spine.select(
            "day",
            "b",
            F.bit_or("b").over(w7).alias("wb"),
        )
        .groupBy("day")
        .agg(
            F.sum(F.bit_count("b")).alias("dau"),
            F.sum(F.bit_count("wb")).alias("wau"),
        )
        .collect()
    }
    days = sorted({d for d, _ in activity})
    want = set()
    for d in days:
        day = base + datetime.timedelta(days=d)
        dau = {u for dd, u in activity if dd == d}
        wau = {u for dd, u in activity if d - 2 <= dd <= d and dd in days}
        want.add((day, len(dau), len(wau)))
    assert got == want
