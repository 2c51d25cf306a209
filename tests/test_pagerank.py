"""PageRank: parity with a numpy power-iteration oracle (same formula,
same per-iteration rounding), conservation of total rank, dangling-node
handling, and determinism across partitionings."""

from __future__ import annotations

import random

import numpy as np

from distributed_webcrawler_spark.operators.pagerank import pagerank


def _np_pagerank(edges, n_iter=5, damping=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    dedup = set(edges)
    for a, _ in dedup:
        out[a] = out.get(a, 0) + 1
    r = np.full(n, 1.0 / n)
    teleport = (1.0 - damping) / n
    for _ in range(n_iter):
        dangling = sum(r[idx[v]] for v in nodes if v not in out)
        contrib = np.zeros(n)
        for a, b in dedup:
            contrib[idx[b]] += r[idx[a]] / out[a]
        r = np.round(teleport + damping * (contrib + dangling / n), 12)
    return {v: r[idx[v]] for v in nodes}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["id"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_matches_numpy_oracle_on_random_graph(spark):
    rng = random.Random(3)
    nodes = [f"n{i}" for i in range(40)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    got = _run(spark, edges)
    want = _np_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v


def test_rank_sums_to_one_and_hub_wins(spark):
    # star: everyone links to hub; hub links back to one spoke
    edges = [(f"s{i}", "hub") for i in range(10)] + [("hub", "s0")]
    got = _run(spark, edges)
    assert abs(sum(got.values()) - 1.0) < 1e-6
    assert got["hub"] == max(got.values())
    assert got["s0"] > got["s1"]  # hub's sole out-link boosts s0


def test_dangling_mass_redistributed(spark):
    # b has no out-edges: its rank must recycle, total stays 1
    got = _run(spark, [("a", "b")])
    assert abs(sum(got.values()) - 1.0) < 1e-6
    assert got["b"] > got["a"]


def test_deterministic_across_partitionings(spark):
    rng = random.Random(9)
    nodes = [f"n{i}" for i in range(30)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    df1 = spark.createDataFrame(edges, "src string, dst string").repartition(1)
    df8 = spark.createDataFrame(edges, "src string, dst string").repartition(8)
    r1 = {(r["id"], r["rank"]) for r in pagerank(df1).collect()}
    r8 = {(r["id"], r["rank"]) for r in pagerank(df8).collect()}
    assert r1 == r8
