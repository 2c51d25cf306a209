"""Connected components: correctness vs a brute-force union-find, pointer
doubling (long chains converge inside a small max_iter), determinism, and
plan shape (keyed joins, never a CartesianProduct)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from distributed_webcrawler_spark.operators.components import (
    connected_components,
    dedup_component_groups,
)


def _uf_components(edges):
    """Brute-force oracle: union-find, component = min member id."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {}
    for n in list(parent):
        roots.setdefault(find(n), []).append(n)
    out = {}
    for members in roots.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df, **kw).collect()
    return {r["id"]: r["component"] for r in got}


def test_two_cliques_and_isolated_pair(spark):
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21)]
    assert _run(spark, edges) == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_chain_converges_by_pointer_doubling(spark):
    # a 64-hop path needs 63 rounds under plain propagation; pointer
    # doubling must finish well inside max_iter=10 (~log2(64) + slack)
    edges = [(i, i + 1) for i in range(64)]
    got = _run(spark, edges, max_iter=10)
    assert got == {i: 0 for i in range(65)}


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(200))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, edges) == _uf_components(edges)


def test_group_summary(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = {r["component"]: r["n_members"]
            for r in dedup_component_groups(df).collect()}
    assert rows == {1: 3, 10: 2}


def test_plan_has_no_cartesian(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = connected_components(edges, max_iter=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_deterministic_across_partitionings(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(100), rng.randrange(100)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df8 = spark.createDataFrame(edges, "src long, dst long").repartition(8)
    r1 = {(r["id"], r["component"]) for r in connected_components(df1).collect()}
    r8 = {(r["id"], r["component"]) for r in connected_components(df8).collect()}
    assert r1 == r8


def test_label_propagation_two_cliques_bridge(spark):
    """Two 4-cliques joined by one bridge edge: LPA must give each clique
    its own community (min member id), while connected_components would
    merge them — the thing LPA exists to distinguish."""
    from distributed_webcrawler_spark.operators.components import label_propagation

    def clique(prefix, n):
        ids = [f"{prefix}{i}" for i in range(n)]
        return [(a, b) for a in ids for b in ids if a < b]

    edges = clique("a", 4) + clique("b", 4) + [("a0", "b0")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["id"]: r["community"] for r in label_propagation(df, n_iter=3).collect()}
    a_labels = {got[f"a{i}"] for i in range(4)}
    b_labels = {got[f"b{i}"] for i in range(1, 4)}
    assert a_labels == {"a0"}
    assert b_labels == {"b0"}


def test_label_propagation_deterministic_across_partitionings(spark):
    import random

    from distributed_webcrawler_spark.operators.components import label_propagation

    rng = random.Random(13)
    nodes = [f"n{i}" for i in range(24)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    d1 = spark.createDataFrame(edges, "src string, dst string").repartition(1)
    d8 = spark.createDataFrame(edges, "src string, dst string").repartition(8)
    r1 = {(r["id"], r["community"]) for r in label_propagation(d1).collect()}
    r8 = {(r["id"], r["community"]) for r in label_propagation(d8).collect()}
    assert r1 == r8
