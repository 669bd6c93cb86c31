"""PQ codebook training at amplified vector counts.

Verifies the Lloyd's-on-Spark scale claim: per-round cost is one
broadcast-codebook join + one map-side-combinable update, so wall
time should grow ~linearly with vector count while inter-round state
(the codebook) stays at dim x k rows regardless of input size.

Amplifies the sf embeddings (500 vectors) by replicating with a
per-copy deterministic integer perturbation (distinct vectors, same
distribution), then times pq_train at increasing sizes.

Usage: python tools/stress_pq.py [amplifications...] [--sf-dir DIR]
Prints one JSON line per size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    amps = [int(a) for a in args] or [40, 120, 400]
    sf_dir = "/root/testdata/sf0.1"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--sf-dir":
            sf_dir = sys.argv[2 + i]

    from datawarehouseproject_spark.catalog import load_table
    from datawarehouseproject_spark.operators.similarity import pq_train
    from datawarehouseproject_spark.session import get_spark

    spark = get_spark("stress-pq")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    base = load_table(spark, sf_dir, "embeddings")
    n0 = base.count()
    for amp in amps:
        copies = spark.range(amp).withColumnRenamed("id", "copy")
        emb = (
            base.crossJoin(F.broadcast(copies))
            .select(
                (F.col("vec_id") * amp + F.col("copy")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x
                    + ((F.col("copy") * 7 + i) % 13 - 6).cast("float")
                    / 1000.0,
                ).alias("embedding"),
            )
            .localCheckpoint()
        )
        n = n0 * amp
        t0 = time.time()
        out = pq_train(emb, dim=64, m=4, k=8, rounds=3)
        rows = out.count()
        secs = time.time() - t0
        total_sq = out.agg(F.sum("total_sqdist_mega")).first()[0]
        print(
            json.dumps(
                {
                    "n_vectors": n,
                    "codebook_rows": rows,
                    "sec": round(secs, 2),
                    "vectors_per_s": int(n / secs),
                    "total_sqdist_mega": int(total_sq),
                }
            )
        )
        assert rows == 4 * 8 * 16


if __name__ == "__main__":
    main()
