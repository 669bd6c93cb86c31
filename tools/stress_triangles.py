"""Scale evidence for degree-ordered triangle enumeration.

Generates a deterministic hub-skewed graph (every node attaches 3
edges; with probability 1/4 the target is one of 10 hub nodes, else
uniform over smaller ids — hash-seeded, fully reproducible) and
measures :func:`triangle_enumeration` (degree-ORIENTED wedge join)
against the naive id-ordered enumeration on the same edges.

The claim under test: id-ordering forms C(deg,2) wedges at every
hub (hubs have small ids, so every edge points OUT of them), while
degree-orientation caps every out-degree at ~sqrt(m) — identical
triangles, quadratically less intermediate data as hubs grow.
Identity of results is asserted in-run.

Usage: python tools/stress_triangles.py [n_nodes ...]
Defaults: 100000 1000000. Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def hub_graph(spark, n):
    """3 edges per node i>=10: hash-chosen target, hub (id<10) with
    probability 1/4, else uniform over ids < i. Deterministic."""
    base = spark.range(10, n).select(F.col("id").alias("i"))
    edges = (
        base.select(
            "i", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("r")
        )
        .select(
            "i",
            F.when(
                F.abs(F.xxhash64("i", "r", F.lit("sel"))) % 4 == 0,
                F.abs(F.xxhash64("i", "r", F.lit("hub"))) % 10,
            )
            .otherwise(F.abs(F.xxhash64("i", "r", F.lit("uni"))) % F.col("i"))
            .alias("j"),
        )
        .filter(F.col("i") != F.col("j"))
        .select(
            F.least("i", "j").alias("u"), F.greatest("i", "j").alias("v")
        )
        .distinct()
    )
    return edges


def naive_id_ordered(edges):
    """Classic enumeration oriented by id: wedges at the id-smallest
    node. On hub-at-small-id graphs every hub contributes C(deg,2)
    wedges."""
    e = edges  # already (u < v)
    e1 = e.select(F.col("u").alias("s"), F.col("v").alias("y"))
    e2 = e.select(F.col("u").alias("s"), F.col("v").alias("z"))
    wedges = e1.join(e2, "s").filter(F.col("y") < F.col("z"))
    return wedges.join(
        e.select(F.col("u").alias("y"), F.col("v").alias("z")), ["y", "z"]
    ).select("s", "y", "z")


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]

    from datawarehouseproject_spark.operators.graph import (
        triangle_enumeration,
    )
    from datawarehouseproject_spark.session import get_spark

    spark = get_spark("stress-triangles")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm up

    for n in sizes:
        edges = hub_graph(spark, n).cache()
        m = edges.count()
        hub_deg = (
            edges.filter(F.col("u") < 10)
            .groupBy("u")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )

        t0 = time.time()
        fast = triangle_enumeration(edges).count()
        t_fast = time.time() - t0

        t0 = time.time()
        naive = naive_id_ordered(edges).count()
        t_naive = time.time() - t0

        print(
            json.dumps(
                {
                    "n_nodes": n,
                    "n_edges": m,
                    "max_hub_degree": hub_deg,
                    "triangles": fast,
                    "results_identical": fast == naive,
                    "degree_oriented_sec": round(t_fast, 2),
                    "id_ordered_sec": round(t_naive, 2),
                    "speedup": round(t_naive / t_fast, 2) if t_fast else None,
                }
            ),
            flush=True,
        )
        edges.unpersist()


if __name__ == "__main__":
    main()
