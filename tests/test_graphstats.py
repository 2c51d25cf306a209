"""Triangle counting (oriented enumeration) + BFS seed distance: exact
semantics on hand-built graphs, including the cases the orientation and
frontier-only optimizations could plausibly break."""

from __future__ import annotations

from distributed_webcrawler_spark.operators.graphstats import bfs_distances, triangle_counts


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["id"]: (r["degree"], r["triangles"], r["clustering"])
            for r in triangle_counts(df).collect()}


def test_triangles_k4(spark):
    # K4: every vertex has degree 3 and sits in C(3,2)=3 triangles; cc=1
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _tri(spark, edges)
    assert got == {v: (3, 3, 1.0) for v in range(4)}


def test_triangles_shared_edge_and_duplicates(spark):
    # two triangles sharing edge (0,1); edges given duplicated and in
    # both directions — the canonicalizer must collapse them first
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 3), (3, 1), (0, 1)]
    got = _tri(spark, edges)
    assert got[0] == (3, 2, round(2 * 2 / (3 * 2), 6))
    assert got[1] == (3, 2, round(2 * 2 / (3 * 2), 6))
    assert got[2] == (2, 1, 1.0)
    assert got[3] == (2, 1, 1.0)


def test_triangles_triangle_free_star(spark):
    # star graph: hub degree 5, zero triangles, clustering exactly 0
    edges = [(0, i) for i in range(1, 6)]
    got = _tri(spark, edges)
    assert got[0] == (5, 0, 0.0)
    for leaf in range(1, 6):
        assert got[leaf] == (1, 0, 0.0)  # degree<2 -> cc defined as 0


def test_bfs_chain_with_shortcut(spark):
    # 0->1->2->3->4 plus shortcut 0->3: node 3 must get dist 1 (min), and
    # node 4 dist 2 THROUGH the shortcut — i.e. expansion must continue
    # from a node even when a longer path would rediscover it later
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {r["id"]: r["dist"] for r in bfs_distances(edges, seeds, 10).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2}


def test_bfs_horizon_truncates(spark):
    # chain 0..5; horizon 3 -> nodes 4,5 absent (not "dist 3")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {r["id"]: r["dist"] for r in bfs_distances(edges, seeds, 3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_multi_seed_min_wins(spark):
    # seeds at both ends of a chain: middle nodes take the nearer seed
    edges_list = [(i, i + 1) for i in range(6)] + [(i + 1, i) for i in range(6)]
    edges = spark.createDataFrame(edges_list, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (6,)], "id long")
    got = {r["id"]: r["dist"] for r in bfs_distances(edges, seeds, 10).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2, 5: 1, 6: 0}


def test_kcore_star_plus_clique(spark):
    from distributed_webcrawler_spark.operators.graphstats import k_core

    # K5 clique (nodes 0-4, degree 4 each) + star leaves hanging off node
    # 0 (each leaf degree 1). 3-core: leaves peel in round 1; the clique
    # survives with its internal degrees intact
    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    star = [(0, 100 + i) for i in range(6)]
    edges = spark.createDataFrame(clique + star, "src long, dst long")
    got = {r["id"]: r["core_degree"] for r in k_core(edges, k=3).collect()}
    assert got == {v: 4 for v in range(5)}


def test_kcore_cascade_fully_peels(spark):
    from distributed_webcrawler_spark.operators.graphstats import k_core

    # a path graph has max degree 2: the 3-core is empty, and the peel
    # must CASCADE (ends first, then their neighbors become ends, ...)
    path = [(i, i + 1) for i in range(10)]
    edges = spark.createDataFrame(path, "src long, dst long")
    assert k_core(edges, k=1).count() == 11  # every node survives the 1-core
    # endpoints have degree 1 -> peel; their neighbors become endpoints ->
    # the whole path unravels: the 2-core of any tree is empty
    assert k_core(edges, k=2).count() == 0
