"""Scale evidence for the sliding-bitmap DAU/WAU/MAU operator.

Amplifies sf0.1 events with REKEYED user copies (dense id space) and
measures the bitmap form — per-day chunk bitmaps, RANGE-frame OR,
popcount sums (`dau_wau_mau`) — against the naive trailing-distinct
formulation: a day-spine range join re-counting DISTINCT users per
(day, window). Both computed per day for DAU/WAU/MAU; equality of
results is asserted in-run.

The claim under test: the naive form shuffles every (day, user) pair
once per window membership (x7 for WAU, x28 for MAU), while the
bitmap form's sliding state is |users|/63 longs per day — the gap
should WIDEN with volume.

Usage: python tools/stress_dau.py [amp] [sf_dir]
Defaults: amp=10 (1M events), sf0.1. Prints one JSON line each.
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
    rows = {tuple(r) for r in df.collect()}
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
    return rows


def main() -> None:
    amp = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import Window

    from datawarehouseproject_spark.catalog import load_table
    from datawarehouseproject_spark.session import get_spark

    spark = get_spark("stress-dau")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    ev0 = load_table(spark, sf_dir, "events").select("ts", "user_id")
    n_users0 = 1 + ev0.agg(F.max("user_id")).collect()[0][0]
    copies = spark.range(amp).withColumnRenamed("id", "copy")
    ev = (
        ev0.repartition(64)
        .crossJoin(copies)
        .select(
            F.to_date("ts").alias("day"),
            (F.col("user_id") + F.col("copy") * n_users0).alias("user_id"),
        )
        .cache()
    )
    n_ev = ev.count()
    print(json.dumps({"amplification": amp, "events": n_ev}), flush=True)

    # ---- bitmap form (the dau_wau_mau plan over the amplified frame)
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
    days = bits.select("day").distinct()
    chunks = bits.select("chunk").distinct()
    spine = (
        days.crossJoin(chunks)
        .join(bits, ["day", "chunk"], "left")
        .select(
            "day",
            "chunk",
            F.coalesce("b", F.lit(0)).alias("b"),
            F.datediff("day", F.lit("1970-01-01")).alias("ed"),
        )
    )
    w7 = Window.partitionBy("chunk").orderBy("ed").rangeBetween(-6, 0)
    w28 = Window.partitionBy("chunk").orderBy("ed").rangeBetween(-27, 0)
    bitmap = (
        spine.select(
            "day",
            "b",
            F.bit_or("b").over(w7).alias("wb"),
            F.bit_or("b").over(w28).alias("mb"),
        )
        .groupBy("day")
        .agg(
            F.sum(F.bit_count("b")).alias("dau"),
            F.sum(F.bit_count("wb")).alias("wau"),
            F.sum(F.bit_count("mb")).alias("mau"),
        )
    )
    r_bitmap = run("bitmap_dau_wau_mau", bitmap, n_ev)

    # ---- naive form: day-spine range join + COUNT(DISTINCT) per window
    daily_users = ev.distinct()
    dau = daily_users.groupBy("day").agg(
        F.count(F.lit(1)).alias("dau")
    )

    def trailing(n_days, name):
        d = days.alias("d")
        u = daily_users.alias("u")
        return (
            d.join(
                u,
                (F.col("u.day") <= F.col("d.day"))
                & (
                    F.col("u.day")
                    >= F.date_sub(F.col("d.day"), n_days - 1)
                ),
            )
            .groupBy(F.col("d.day").alias("day"))
            .agg(F.count_distinct("user_id").alias(name))
        )

    naive = (
        dau.join(trailing(7, "wau"), "day")
        .join(trailing(28, "mau"), "day")
        .select("day", "dau", "wau", "mau")
    )
    r_naive = run("naive_trailing_distinct", naive, n_ev)

    print(
        json.dumps({"results_identical": r_bitmap == r_naive}), flush=True
    )
    assert r_bitmap == r_naive
    spark.stop()


if __name__ == "__main__":
    main()
