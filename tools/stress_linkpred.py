"""Scale evidence for the capped common-neighbor wedge join.

Generates the same deterministic hub-skewed graph as
``stress_triangles.py`` (10 hub nodes absorb ~1/4 of all edges) and
measures :func:`common_neighbor_candidates` with and without
``max_center_degree``. The claim under test (VERDICT r5 item 3):
exact open-wedge counting must form C(deg, 2) wedge instances at
EVERY center — at a hub that is the d² blowup triangle orientation
avoids, and no orientation can avoid it for OPEN wedges because a
wedge whose center has only in-edges is visible nowhere else. The
cap drops ultra-popular centers before wedge formation, bounding the
join at O(m · cap) rows, and is applied identically in the DuckDB
oracle so capped results stay value-exact cross-engine.

Also reports the wedge-instance counts themselves (the intermediate
volume, not just wall time), and VERIFIES the capped operator output
equals an independent reconstruction (wedges formed over the full
symmetrized list, then filtered to sub-cap centers at the wedge
level rather than the input level) — asserted via exceptAll both
ways before timings are printed.

Usage: python tools/stress_linkpred.py [n_nodes ...]
Defaults: 200000. Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000]

    from datawarehouseproject_spark.operators.graph import (
        common_neighbor_candidates,
    )
    from datawarehouseproject_spark.session import get_spark
    from tools.stress_triangles import hub_graph

    spark = get_spark("stress-linkpred")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm up

    cap = 256
    for n in sizes:
        edges = hub_graph(spark, n).cache()
        m = edges.count()
        sym = edges.select(F.col("u").alias("s")).unionAll(
            edges.select(F.col("v").alias("s"))
        )
        deg = sym.groupBy("s").agg(F.count("*").alias("d"))
        hub_deg = deg.agg(F.max("d")).first()[0]
        wedges_all = deg.agg(
            F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint")
        ).first()[0]
        wedges_capped = (
            deg.filter(F.col("d") <= cap)
            .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint"))
            .first()[0]
        )

        t0 = time.time()
        capped_df = common_neighbor_candidates(
            edges, min_common=2, max_center_degree=cap
        ).localCheckpoint()
        capped = capped_df.count()
        t_capped = time.time() - t0

        # independent reconstruction: form wedges over ALL centers
        # first, join degrees onto the FORMED wedges, and drop
        # over-cap centers at the wedge level — pays the full d² cost
        # on purpose so the check shares no cap placement with the
        # operator's input-level filter
        sym2 = edges.select(F.col("u").alias("s"), F.col("v").alias("n")).unionAll(
            edges.select(F.col("v").alias("s"), F.col("u").alias("n"))
        )
        deg2 = sym2.groupBy("s").agg(F.count("*").alias("d"))
        w1 = sym2.select("s", F.col("n").alias("y"))
        w2 = sym2.select("s", F.col("n").alias("z"))
        expect = (
            w1.join(w2, "s")
            .join(deg2, "s")
            .filter(F.col("d") <= cap)
            .filter(F.col("y") < F.col("z"))
            .groupBy("y", "z")
            .agg(F.count("*").alias("common_neighbors"))
            .filter(F.col("common_neighbors") >= 2)
            .join(
                edges.select(F.col("u").alias("y"), F.col("v").alias("z")),
                ["y", "z"],
                "left_anti",
            )
            .select(
                F.col("y").alias("node_a"),
                F.col("z").alias("node_b"),
                "common_neighbors",
            )
        )
        assert capped_df.exceptAll(expect).isEmpty(), "capped ⊄ expected"
        assert expect.exceptAll(capped_df).isEmpty(), "expected ⊄ capped"

        t0 = time.time()
        uncapped = common_neighbor_candidates(edges, min_common=2).count()
        t_uncapped = time.time() - t0

        print(
            json.dumps(
                {
                    "n_nodes": n,
                    "n_edges": m,
                    "max_degree": hub_deg,
                    "cap": cap,
                    "wedge_instances_uncapped": wedges_all,
                    "wedge_instances_capped": wedges_capped,
                    "intermediate_reduction": round(
                        wedges_all / max(wedges_capped, 1), 1
                    ),
                    "pairs_capped": capped,
                    "cap_verified": True,
                    "pairs_uncapped": uncapped,
                    "capped_sec": round(t_capped, 2),
                    "uncapped_sec": round(t_uncapped, 2),
                    "speedup": round(t_uncapped / t_capped, 2)
                    if t_capped
                    else None,
                }
            ),
            flush=True,
        )
        edges.unpersist()


if __name__ == "__main__":
    main()
