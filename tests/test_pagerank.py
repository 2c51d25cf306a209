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

# ---------------------------------------------------------------- HITS


def _np_hits(edges, n_iter=4):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    dedup = sorted(set(edges))
    n = len(nodes)
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(n_iter):
        a = np.zeros(n)
        for s, d in dedup:
            a[idx[d]] += h[idx[s]]
        a = np.round(a / a.sum(), 12)
        h = np.zeros(n)
        for s, d in dedup:
            h[idx[s]] += a[idx[d]]
        h = np.round(h / h.sum(), 12)
    return ({v: a[idx[v]] for v in nodes}, {v: h[idx[v]] for v in nodes})


def _run_hits(spark, edges, **kw):
    from distributed_webcrawler_spark.operators.pagerank import hits
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = hits(df, **kw).collect()
    return ({r["id"]: r["a"] for r in rows}, {r["id"]: r["h"] for r in rows})


def test_hits_matches_numpy_oracle(spark):
    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(30)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    ga, gh = _run_hits(spark, edges, n_iter=4)
    wa, wh = _np_hits(edges, n_iter=4)
    assert set(ga) == set(wa)
    for v in wa:
        assert abs(ga[v] - wa[v]) < 1e-9, ("a", v)
        assert abs(gh[v] - wh[v]) < 1e-9, ("h", v)


def test_hits_hub_vs_authority_separation(spark):
    # directory page links to every article; articles link nowhere.
    # directory = pure hub (authority 0), articles = pure authorities.
    edges = [("dir", f"art{i}") for i in range(5)]
    ga, gh = _run_hits(spark, edges)
    assert ga["dir"] == 0.0
    assert gh["dir"] == max(gh.values())
    for i in range(5):
        assert gh[f"art{i}"] == 0.0
        assert ga[f"art{i}"] > 0.0
    # L1 normalized each half-step
    assert abs(sum(ga.values()) - 1.0) < 1e-6
    assert abs(sum(gh.values()) - 1.0) < 1e-6

# ---------------------------------------------------------------- TrustRank


def _np_trustrank(edges, seeds, n_iter=4, damping=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    dedup = sorted(set(edges))
    out = {}
    for a, _ in dedup:
        out[a] = out.get(a, 0) + 1
    n = len(nodes)
    sset = [v for v in nodes if v in seeds]
    t = np.zeros(n)
    for v in sset:
        t[idx[v]] = 1.0 / len(sset)
    r = t.copy()
    for _ in range(n_iter):
        dang = sum(r[idx[v]] for v in nodes if v not in out)
        contrib = np.zeros(n)
        for a, b in dedup:
            contrib[idx[b]] += r[idx[a]] / out[a]
        r = np.round((1.0 - damping) * t + damping * (contrib + dang * t), 12)
    return {v: r[idx[v]] for v in nodes}


def test_trustrank_matches_numpy_and_starves_nonseed_islands(spark):
    from distributed_webcrawler_spark.operators.pagerank import trustrank
    rng = random.Random(11)
    nodes = [f"n{i}" for i in range(30)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(100)]
    edges = [(a, b) for a, b in edges if a != b]
    # an island with no in-links from the seeded component
    edges += [("iso1", "iso2"), ("iso2", "iso1")]
    seeds = {"n0", "n1", "n2"}
    df = spark.createDataFrame(edges, "src string, dst string")
    sdf = spark.createDataFrame([(s,) for s in sorted(seeds)], "id string")
    got = {r["id"]: r["trust"] for r in trustrank(df, sdf, n_iter=4).collect()}
    want = _np_trustrank(edges, seeds, n_iter=4)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v
    # no trust reaches the unseeded island; seeds hold positive trust
    assert got["iso1"] == 0.0 and got["iso2"] == 0.0
    assert all(got[s] > 0 for s in seeds)
