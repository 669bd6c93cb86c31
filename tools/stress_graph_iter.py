"""Scale evidence for the iterative graph family (k-truss, integer
PageRank) on the deterministic hub-skewed graph from
``stress_triangles.py``.

k-truss inherits the degree-oriented triangle join per peel round,
so hubs cannot blow up the wedge join; PageRank is two shuffles per
iteration (join + sum-by-destination) regardless of skew, with
BIGINT arithmetic so the result is partitioning-independent.

Usage: python tools/stress_graph_iter.py [n_nodes ...]
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
        k_truss,
        label_propagation,
        pagerank_integer,
    )
    from datawarehouseproject_spark.session import get_spark
    from tools.stress_triangles import hub_graph

    spark = get_spark("stress-graph-iter")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm up

    for n in sizes:
        edges = hub_graph(spark, n).cache()
        m = edges.count()

        t0 = time.time()
        truss = k_truss(edges, k=3)
        truss_edges = truss.count()
        t_truss = time.time() - t0

        t0 = time.time()
        lpa = label_propagation(edges, iterations=4)
        n_comm = lpa.select("community").distinct().count()
        t_lpa = time.time() - t0

        t0 = time.time()
        pr = pagerank_integer(edges, iterations=5)
        total_rank = pr.agg(F.sum("rank_micros")).first()[0]
        n_nodes_ranked = pr.count()
        t_pr = time.time() - t0

        print(
            json.dumps(
                {
                    "n_nodes": n,
                    "n_edges": m,
                    "k3_truss_edges": truss_edges,
                    "k_truss_sec": round(t_truss, 2),
                    "lpa_communities": n_comm,
                    "lpa_4iter_sec": round(t_lpa, 2),
                    "pagerank_nodes": n_nodes_ranked,
                    "pagerank_total_rank_micros": total_rank,
                    "pagerank_5iter_sec": round(t_pr, 2),
                }
            ),
            flush=True,
        )
        edges.unpersist()


if __name__ == "__main__":
    main()
