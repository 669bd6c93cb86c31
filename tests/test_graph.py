"""Connected components: chains, separate clusters, convergence."""

from __future__ import annotations

from datawarehouseproject_spark.operators.graph import connected_components


def test_components_chain_and_clusters(spark):
    # chain 1-2-3-4 (diameter 3), pair {10,11}, triangle {20,21,22}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"],
    )
    got = {r["node"]: r["component"]
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_components_long_chain_converges(spark):
    # 15-node chain: needs multiple propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], ["id_a", "id_b"]
    )
    got = connected_components(edges, max_iter=20).collect()
    assert all(r["component"] == 0 for r in got)
    assert len(got) == 16


def test_components_nonconvergence_raises(spark):
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], ["id_a", "id_b"]
    )
    # diameter 15 chain can't finish in 2 rounds: strict mode raises
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)
    # lenient mode returns the partial labeling with a warning
    with pytest.warns(UserWarning, match="did not converge"):
        partial = connected_components(edges, max_iter=2, strict=False)
    assert partial.count() == 16


def test_canonical_map_keeps_best_member(spark):
    """Cluster {1,2,3} keeps the longest member (2); tie on length in
    {10,11} keeps the lower id; singleton 99 maps to itself."""
    from datawarehouseproject_spark.operators.graph import (
        canonical_map,
        connected_components,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, 50), (2, 80), (3, 20), (10, 40), (11, 40), (99, 7)],
        "doc_id long, n_chars long",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comps = connected_components(edges)
    out = {r["doc_id"]: r["canonical_id"]
           for r in canonical_map(docs, comps).collect()}
    assert out == {1: 2, 2: 2, 3: 2, 10: 10, 11: 10, 99: 99}


def test_bounded_bfs_min_hops_and_early_exit(spark):
    """Diamond + tail: two paths of different length to the same node
    must record the MIN hop; nodes beyond max_hops are absent; the
    frontier empties before max_hops (early exit, no error)."""
    from datawarehouseproject_spark.operators.graph import bounded_bfs

    #  0 -> 1 -> 2 -> 3 -> 4   and a shortcut 0 -> 2
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 2)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {r["node"]: r["hops"]
           for r in bounded_bfs(edges, seeds, max_hops=2).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}  # 2 via shortcut, 4 cut off
    # max_hops beyond the graph: early exit returns everything
    got_all = {r["node"]: r["hops"]
               for r in bounded_bfs(edges, seeds, max_hops=10).collect()}
    assert got_all == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_bounded_bfs_multi_seed_disconnected(spark):
    from datawarehouseproject_spark.operators.graph import bounded_bfs

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,), (10,)], ["node"])
    got = {r["node"]: r["hops"]
           for r in bounded_bfs(edges, seeds, max_hops=3).collect()}
    # 20-island unreachable; both seeds at hop 0
    assert got == {1: 0, 10: 0, 2: 1, 11: 1, 3: 2}


def test_triangle_enumeration_exact_and_once(spark):
    """K4 has exactly 4 triangles; a hub star adds none; each triangle
    appears exactly once as a sorted triple regardless of input edge
    order."""
    from itertools import combinations

    from datawarehouseproject_spark.operators.graph import (
        triangle_enumeration,
    )

    k4 = list(combinations([1, 2, 3, 4], 2))
    star = [(100, i) for i in range(5, 40)]     # hub, no triangles
    extra = [(5, 6), (100, 5), (100, 6)]        # one triangle via hub
    # scramble orientation: half the edges reversed, one duplicate
    edges = [(b, a) if (a + b) % 2 else (a, b)
             for a, b in k4 + star + extra] + [(2, 1)]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = sorted(
        (r["node_a"], r["node_b"], r["node_c"])
        for r in triangle_enumeration(df).collect()
    )
    expected = sorted(
        [t for t in combinations([1, 2, 3, 4], 3)] + [(5, 6, 100)]
    )
    assert got == expected


def test_triangle_enumeration_no_triangles(spark):
    from datawarehouseproject_spark.operators.graph import (
        triangle_enumeration,
    )

    chain = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["u", "v"])
    assert triangle_enumeration(chain).count() == 0


def test_common_neighbor_candidates_excludes_adjacent(spark):
    """Square 1-2-3-4-1: diagonals (1,3) and (2,4) each share two
    neighbors and are non-adjacent -> predicted; adjacent pairs are
    excluded even when they also share neighbors (add diagonal 1-3
    as an edge and it must disappear from predictions)."""
    from datawarehouseproject_spark.operators.graph import (
        common_neighbor_candidates,
    )

    square = [(1, 2), (2, 3), (3, 4), (4, 1)]
    df = spark.createDataFrame(square, ["u", "v"])
    got = {
        (r["node_a"], r["node_b"]): r["common_neighbors"]
        for r in common_neighbor_candidates(df, min_common=2).collect()
    }
    assert got == {(1, 3): 2, (2, 4): 2}

    with_diag = spark.createDataFrame(square + [(3, 1)], ["u", "v"])
    got2 = {
        (r["node_a"], r["node_b"]): r["common_neighbors"]
        for r in common_neighbor_candidates(with_diag, min_common=2).collect()
    }
    assert got2 == {(2, 4): 2}


def test_k_truss_peels_bridge_and_pendant(spark):
    """K4 ∪ pendant edge ∪ a bridge to a separate triangle: the
    3-truss keeps K4 and the triangle (every edge in ≥1 triangle
    within the survivor set), drops the pendant and the bridge; K4
    edges report support 2, triangle edges support 1."""
    from datawarehouseproject_spark.operators.graph import k_truss

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tri = [(10, 11), (10, 12), (11, 12)]
    extra = [(4, 5), (4, 10)]  # pendant + bridge
    df = spark.createDataFrame(k4 + tri + extra, ["u", "v"])
    out = {
        (r.node_a, r.node_b): r.support for r in k_truss(df, k=3).collect()
    }
    assert set(out) == set(k4) | set(tri)
    assert all(out[e] == 2 for e in k4)
    assert all(out[e] == 1 for e in tri)


def test_k_truss_cascading_peel(spark):
    """Two triangles sharing an edge, plus a tail triangle hanging by
    one shared VERTEX: 4-truss requires support ≥2, so the outer
    triangles peel first and their removal cascades until nothing
    with support ≥2 remains (this graph has no 4-truss)."""
    from datawarehouseproject_spark.operators.graph import k_truss

    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (4, 6), (5, 6)]
    df = spark.createDataFrame(edges, ["u", "v"])
    assert k_truss(df, k=4).count() == 0
    # but the diamond 1-2-3-4 IS a 3-truss member set
    out3 = {(r.node_a, r.node_b) for r in k_truss(df, k=3).collect()}
    assert {(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)} <= out3


def test_k_truss_k4_is_4_truss(spark):
    from datawarehouseproject_spark.operators.graph import k_truss

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    df = spark.createDataFrame(k4, ["u", "v"])
    out = {(r.node_a, r.node_b): r.support for r in k_truss(df, k=4).collect()}
    assert set(out) == set(k4)
    assert all(s == 2 for s in out.values())


def test_pagerank_integer_symmetry_and_order(spark):
    """On a path graph a-b-c, the center must outrank the endpoints
    and symmetric endpoints must tie EXACTLY (integer determinism);
    on a 4-cycle all nodes tie exactly."""
    from datawarehouseproject_spark.operators.graph import pagerank_integer

    path = spark.createDataFrame([(1, 2), (2, 3)], ["u", "v"])
    r = {x.node: x.rank_micros for x in pagerank_integer(path).collect()}
    assert r[1] == r[3]
    assert r[2] > r[1]

    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 1)], ["u", "v"])
    rc = {x.node: x.rank_micros for x in pagerank_integer(cyc).collect()}
    assert len(set(rc.values())) == 1
    # degree-2 everywhere, rank conserved: each node keeps ~one unit
    assert abs(rc[1] - 1_000_000) < 10


def test_pagerank_integer_star_hub(spark):
    """Star graph: the hub strictly outranks the leaves, leaves tie
    exactly, and total rank mass is conserved up to integer-division
    truncation (sum ≤ n·one, deficit < n·iterations)."""
    from datawarehouseproject_spark.operators.graph import pagerank_integer

    star = spark.createDataFrame([(0, i) for i in range(1, 7)], ["u", "v"])
    r = {x.node: x.rank_micros for x in pagerank_integer(star).collect()}
    leaves = [r[i] for i in range(1, 7)]
    assert len(set(leaves)) == 1
    assert r[0] > leaves[0]
    assert sum(r.values()) <= 7 * 1_000_000


def test_label_propagation_two_cliques_and_bridge(spark):
    """Two 4-cliques joined by one bridge edge: LPA assigns each
    clique a single community (the clique's min id) and keeps the
    two communities distinct — the bridge is outvoted by clique
    neighbors."""
    from datawarehouseproject_spark.operators.graph import label_propagation

    c1 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    c2 = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    df = spark.createDataFrame(c1 + c2 + [(4, 10)], ["u", "v"])
    out = {r.node: r.community for r in label_propagation(df).collect()}
    assert len({out[n] for n in (1, 2, 3)}) == 1
    assert len({out[n] for n in (11, 12, 13)}) == 1
    assert out[1] != out[11]


def test_label_propagation_deterministic(spark):
    """Synchronous update + min-label tie-break: two runs produce the
    identical assignment (no RNG anywhere)."""
    from datawarehouseproject_spark.operators.graph import label_propagation

    edges = [(i, (i * 7 + 3) % 20) for i in range(20) if i != (i * 7 + 3) % 20]
    df = spark.createDataFrame(edges, ["u", "v"])
    a = sorted((r.node, r.community) for r in label_propagation(df).collect())
    b = sorted((r.node, r.community) for r in label_propagation(df).collect())
    assert a == b


def test_k_core_peels_cascading_tail(spark):
    """Triangle + a chain hanging off it: the chain peels one link
    per round (degree-1 endpoints cascade), leaving exactly the
    triangle as the 2-core; the 3-core of the same graph is empty
    (triangle nodes have degree 2)."""
    from datawarehouseproject_spark.operators.graph import k_core

    tri = [(1, 2), (1, 3), (2, 3)]
    chain = [(3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(tri + chain, ["u", "v"])
    core2 = {(r.node_a, r.node_b) for r in k_core(df, k=2).collect()}
    assert core2 == set(tri)
    assert k_core(df, k=3).count() == 0


def test_k_core_k4_survives_3_core(spark):
    from datawarehouseproject_spark.operators.graph import k_core

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    pendant = [(4, 9)]
    df = spark.createDataFrame(k4 + pendant, ["u", "v"])
    assert {(r.node_a, r.node_b) for r in k_core(df, k=3).collect()} == set(k4)
