"""Scale evidence for the round-5b analytics operators.

Amplifies sf0.1 events/customer and measures, head-to-head:

1. bitmap exact-distinct (63-bit chunks, bit_or map-side combine)
   vs the engine's COUNT(DISTINCT) rewrite, at 10M and 100M rows —
   the claim under test is the shuffle-volume reduction on dense ids.
2. entity-resolution banded blocking vs the naive quadratic
   within-nation theta join at 150k entities, then blocked-only at
   1.5M (where the quadratic version is no longer runnable in
   reasonable time) — the claim is equi-join scaling.

Usage: python tools/stress_analytics.py [amp_events] [amp_cust] [sf_dir]
Defaults: 100 (10M events), 10/100 customers, /root/testdata/sf0.1.
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def run(name, df, n_in):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "op": name,
                "input_rows": n_in,
                "sec": round(dt, 2),
                "rows_per_sec": int(n_in / dt) if dt > 0 else None,
            }
        ),
        flush=True,
    )
    return dt


def main() -> None:
    amp_e = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    amp_c = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from datawarehouseproject_spark.session import get_spark
    from datawarehouseproject_spark.catalog import load_table

    spark = get_spark("stress-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # ---- bitmap distinct vs COUNT(DISTINCT), dense expanded ids ----
    ev0 = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    n0 = ev0.count()
    n_users0 = 1 + ev0.agg(F.max("user_id")).collect()[0][0]
    copies = spark.range(amp_e).withColumnRenamed("id", "copy")
    ev = (
        ev0.crossJoin(copies)
        .select(
            "event_type",
            (F.col("user_id") + F.col("copy") * n_users0).alias("user_id"),
        )
        .repartition(64)
        .cache()
    )
    n_ev = ev.count()

    def bitmap_distinct(df):
        chunks = (
            df.select(
                "event_type",
                F.expr("user_id DIV 63").alias("chunk"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))"
                ).alias("bit"),
            )
            .groupBy("event_type", "chunk")
            .agg(F.bit_or("bit").alias("bits"))
        )
        return chunks.groupBy("event_type").agg(
            F.sum(F.bit_count("bits")).cast("bigint").alias("n_users")
        )

    run(f"bitmap_distinct_{n_ev}", bitmap_distinct(ev), n_ev)
    run(
        f"count_distinct_{n_ev}",
        ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")),
        n_ev,
    )
    a = {r.event_type: r.n_users for r in bitmap_distinct(ev).collect()}
    b = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert a == b, "bitmap distinct diverged from COUNT(DISTINCT)"
    ev.unpersist()

    # ---- entity resolution: banded blocking vs naive quadratic ----
    def amplified_customers(amp):
        c0 = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_nationkey", "c_acctbal"
        )
        nc0 = 1 + c0.agg(F.max("c_custkey")).collect()[0][0]
        cp = spark.range(amp).withColumnRenamed("id", "copy")
        return (
            c0.crossJoin(cp)
            .select(
                (F.col("c_custkey") + F.col("copy") * nc0).alias("c_custkey"),
                # keep name-collision structure: copies share names so
                # the fuzzy-match density stays realistic
                "c_name",
                "c_nationkey",
                (
                    F.col("c_acctbal") + (F.col("copy") % 97) * F.lit(103.0)
                ).alias("c_acctbal"),
            )
            .repartition(64)
            .cache()
        )

    def blocked_pairs(c):
        build = c.withColumn("bucket", F.floor("c_acctbal").cast("bigint"))
        probe = build.withColumn(
            "probe",
            F.explode(F.array(F.col("bucket"), F.col("bucket") + F.lit(1))),
        )
        a_, b_ = probe.alias("a"), build.alias("b")
        return (
            a_.join(
                b_,
                (F.col("a.probe") == F.col("b.bucket"))
                & (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
                & (F.col("a.c_custkey") != F.col("b.c_custkey")),
            )
            .where(
                (F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal")) <= 1.0)
                & (F.levenshtein("a.c_name", "b.c_name") <= 2)
            )
            .select(
                F.least("a.c_custkey", "b.c_custkey").alias("ka"),
                F.greatest("a.c_custkey", "b.c_custkey").alias("kb"),
            )
            .distinct()
        )

    def naive_pairs(c):
        a_, b_ = c.alias("a"), c.alias("b")
        return (
            a_.join(
                b_,
                (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
                & (F.col("a.c_custkey") < F.col("b.c_custkey")),
            )
            .where(
                (F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal")) <= 1.0)
                & (F.levenshtein("a.c_name", "b.c_name") <= 2)
            )
            .select(
                F.col("a.c_custkey").alias("ka"), F.col("b.c_custkey").alias("kb")
            )
        )

    small = amplified_customers(amp_c)
    n_small = small.count()
    run(f"er_blocked_{n_small}", blocked_pairs(small), n_small)
    run(f"er_naive_quadratic_{n_small}", naive_pairs(small), n_small)
    assert (
        blocked_pairs(small).count() == naive_pairs(small).count()
    ), "blocking changed the pair set"
    small.unpersist()

    big = amplified_customers(amp_c * 10)
    n_big = big.count()
    run(f"er_blocked_{n_big}", blocked_pairs(big), n_big)
    big.unpersist()


if __name__ == "__main__":
    main()
