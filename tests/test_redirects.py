"""resolve_redirects: exact hop counts, loop detection, max_hops cap."""

from __future__ import annotations

from distributed_webcrawler_spark.operators.redirects import resolve_redirects


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_chains_resolve_with_exact_hops(spark):
    # a->b->c->d (3 hops), e->d (1 hop), plus an isolated 1-hop f->g
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("e", "d"), ("f", "g")])
    got = {r.src: (r.final_url, r.hops, r.looped)
           for r in resolve_redirects(e, max_hops=8).collect()}
    assert got == {
        "a": ("d", 3, False), "b": ("d", 2, False), "c": ("d", 1, False),
        "e": ("d", 1, False), "f": ("g", 1, False),
    }


def test_cycle_flags_looped_including_feeders(spark):
    # x->y->x cycle; w feeds into it and must also be looped
    e = _edges(spark, [("x", "y"), ("y", "x"), ("w", "x"), ("ok", "t")])
    got = {r.src: (r.final_url, r.hops, r.looped)
           for r in resolve_redirects(e, max_hops=8).collect()}
    assert got["x"] == (None, None, True)
    assert got["y"] == (None, None, True)
    assert got["w"] == (None, None, True)
    assert got["ok"] == ("t", 1, False)


def test_max_hops_cap_marks_long_chains_looped(spark):
    # chain of length 6; cap 4 -> heads deeper than 4 hops are "looped"
    pairs = [(f"n{i}", f"n{i + 1}") for i in range(6)]  # n0->...->n6
    got = {r.src: (r.final_url, r.hops, r.looped)
           for r in resolve_redirects(_edges(spark, pairs), max_hops=4).collect()}
    assert got["n5"] == ("n6", 1, False)
    assert got["n2"] == ("n6", 4, False)
    assert got["n1"] == (None, None, True)   # 5 hops > cap
    assert got["n0"] == (None, None, True)   # 6 hops > cap
