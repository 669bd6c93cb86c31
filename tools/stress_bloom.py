"""Scale evidence for the Bloom join prefilter.

Amplifies sf0.1 orders/lineitem with REKEYED copies so the build
side (urgent orders) grows past the broadcast threshold and the
plain join degrades to a sort-merge of the full probe table. The
claim under test: prefiltering the probe with a literal-bitmap Bloom
filter (native xxhash64 positions, O(1) bit tests in codegen) cuts
the probe-side shuffle to ~the matching fraction, while producing
the IDENTICAL join result (no false negatives; false positives die
in the join) — asserted in-run.

Usage: python tools/stress_bloom.py [amp] [sf_dir]
Defaults: amp=100 (60M probe rows, 3M build keys), /root/testdata/sf0.1.
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
    out = df.collect()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "op": name,
                "probe_rows": n_in,
                "sec": round(dt, 2),
                "rows_per_sec": int(n_in / dt) if dt > 0 else None,
            }
        ),
        flush=True,
    )
    return out


def main() -> None:
    amp = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from datawarehouseproject_spark.catalog import load_table
    from datawarehouseproject_spark.operators.sketches import (
        bloom_prefilter_large,
    )
    from datawarehouseproject_spark.session import get_spark

    spark = get_spark("stress-bloom")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    orders0 = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li0 = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    key_span = 1 + orders0.agg(F.max("o_orderkey")).collect()[0][0]
    copies = spark.range(amp).withColumnRenamed("id", "copy")

    # repartition BEFORE the crossJoin: sf0.1 parquet is one file, so
    # the amplification would otherwise generate 60M rows in ONE task
    orders = (
        orders0.repartition(32).crossJoin(copies)
        .select(
            (F.col("o_orderkey") + F.col("copy") * key_span).alias(
                "o_orderkey"
            ),
            "o_orderpriority",
        )
        .cache()
    )
    li = (
        li0.repartition(64).crossJoin(copies)
        .select(
            (F.col("l_orderkey") + F.col("copy") * key_span).alias(
                "l_orderkey"
            ),
            "l_extendedprice",
        )
        .cache()
    )
    n_orders, n_li = orders.count(), li.count()
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    n_build = urgent.count()
    print(
        json.dumps(
            {"amplification": amp, "probe_rows": n_li, "build_keys": n_build}
        ),
        flush=True,
    )

    def agg(joined):
        return joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s"),
        )

    plain = agg(li.join(urgent, li.l_orderkey == urgent.o_orderkey))
    r_plain = run("plain_join", plain, n_li)

    # size the filter ~10 bits/key for ~1% FP at k=5; the numpy-bitmap
    # large path (driver traffic = bitmap words, probe = Arrow UDF)
    m_bits = 1 << max(10, (n_build * 10).bit_length())
    t0 = time.time()
    pre = bloom_prefilter_large(
        urgent, li, "o_orderkey", "l_orderkey", k=5, m_bits=m_bits
    )
    print(json.dumps({"op": "bloom_build", "sec": round(time.time() - t0, 2),
                      "m_bits": m_bits}), flush=True)
    bloomed = agg(pre.join(urgent, pre.l_orderkey == urgent.o_orderkey))
    r_bloom = run("bloom_prefiltered_join", bloomed, n_li)

    kept = pre.count()
    print(
        json.dumps(
            {
                "probe_rows_kept": kept,
                "kept_fraction": round(kept / n_li, 4),
                "results_identical": r_plain == r_bloom,
            }
        ),
        flush=True,
    )
    assert r_plain == r_bloom, "bloom prefilter changed the join result"
    spark.stop()


if __name__ == "__main__":
    main()
