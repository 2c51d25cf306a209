"""KMV distinct sketch + deterministic weighted sampling: exactness below
k, estimation accuracy above k, cross-partition dedup of the merge, and
exact parity of the sample with a pure-Python reference."""

from __future__ import annotations

import hashlib

from distributed_webcrawler_spark.operators.sketch import kmv_distinct, weighted_sample


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_exact_below_k(spark):
    df = spark.createDataFrame([(f"v{i % 37}",) for i in range(500)], "x string")
    row = kmv_distinct(df, "x", k=256).first()
    assert row["k_used"] == 37
    assert row["est_distinct"] == 37.0


def test_estimate_above_k(spark):
    n = 5000
    df = spark.createDataFrame([(f"item-{i}",) for i in range(n)], "x string")
    est = kmv_distinct(df, "x", k=256).first()["est_distinct"]
    # stderr ~ 1/sqrt(k-2) ~ 6%; allow 4 sigma
    assert abs(est - n) / n < 0.25, est


def test_cross_partition_duplicates_do_not_eat_slots(spark):
    # the same values in every partition: the merge must dedup before the
    # global k-slot selection, so the sketch stays EXACT below k
    vals = [(f"v{i}",) for i in range(40)]
    df = spark.createDataFrame(vals * 8, "x string").repartition(8)
    row = kmv_distinct(df, "x", k=64).first()
    assert row["k_used"] == 40
    assert row["est_distinct"] == 40.0


def test_weighted_sample_matches_python_reference(spark):
    rows = [(i, 10 + (i * 7) % 90) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    got = [(r["id"], r["weight"]) for r in
           weighted_sample(df, "w", k=20, id_col="doc_id").collect()]
    want = sorted(
        ((i, float(w)) for i, w in rows),
        key=lambda t: (-round((_h64(str(t[0])) / float(1 << 60)) ** (1.0 / t[1]), 12), t[0]),
    )[:20]
    assert got == want


def test_hll_estimate_accuracy(spark):
    from distributed_webcrawler_spark.operators.sketch import hll_estimate, hll_registers

    n = 20000
    df = spark.createDataFrame([(f"url-{i}",) for i in range(n)], "x string")
    est = hll_estimate(hll_registers(df, "x", p=8), p=8).first()["hll_estimate"]
    # stderr ~ 1.04/sqrt(256) ~ 6.5%; allow 4 sigma
    assert abs(est - n) / n < 0.26, est


def test_hll_nondefault_p_accuracy_and_exact_w(spark):
    from pyspark.sql import functions as F

    from distributed_webcrawler_spark.operators.sketch import hll_estimate, hll_registers
    from distributed_webcrawler_spark.functions.hashes import h64

    # p != 8 must widen/narrow the rank field with p, not silently keep
    # the 52-bit constants (round-2 ADVICE): at p=12 the stderr halves
    # twice vs p=8 and every rho must fit 1..61-p
    n = 20000
    df = spark.createDataFrame([(f"url-{i}",) for i in range(n)], "x string")
    for p, tol in ((4, 1.1), (12, 0.07)):  # 4·1.04/sqrt(2^p)
        reg = hll_registers(df, "x", p=p)
        lo, hi = reg.agg(F.min("max_rho"), F.max("max_rho")).first()
        assert 1 <= lo and hi <= 61 - p, (p, lo, hi)
        est = hll_estimate(reg, p=p).first()["hll_estimate"]
        assert abs(est - n) / n < tol, (p, est)
    # w is the EXACT integer h >> p — float division truncation differs
    # from it for h > 2^53, which is what the oracle's `//` computes
    probe = (df.select(h64("x").alias("h"))
             .where(F.col("h") > F.lit(1 << 53)).limit(50)
             .select("h", F.shiftright("h", 8).alias("w_exact"),
                     (F.col("h") / 256).cast("bigint").alias("w_float")))
    rows = probe.collect()
    assert rows, "fixture produced no >2^53 hashes"
    for r in rows:
        assert r.w_exact == r.h // 256


def test_hll_insensitive_to_duplicates_and_partitioning(spark):
    from distributed_webcrawler_spark.operators.sketch import hll_estimate, hll_registers

    vals = [(f"v{i}",) for i in range(5000)]
    a = spark.createDataFrame(vals, "x string")
    b = spark.createDataFrame(vals * 4, "x string").repartition(16)
    ea = hll_estimate(hll_registers(a, "x"), 8).first()["hll_estimate"]
    eb = hll_estimate(hll_registers(b, "x"), 8).first()["hll_estimate"]
    assert ea == eb  # max-register state is multiset- and layout-invariant


def test_hll_small_range_correction(spark):
    from distributed_webcrawler_spark.operators.sketch import hll_estimate, hll_registers

    # far below m distinct values: linear counting kicks in and the
    # estimate lands within a few percent even where raw HLL is biased
    n = 30
    df = spark.createDataFrame([(f"s{i}",) for i in range(n)], "x string")
    est = hll_estimate(hll_registers(df, "x"), 8).first()["hll_estimate"]
    assert abs(est - n) / n < 0.2, est


def test_hll_registers_merge_across_batches(spark):
    from pyspark.sql import functions as F

    from distributed_webcrawler_spark.operators.sketch import hll_estimate, hll_registers

    # the union-then-max of two register tables equals the registers of
    # the unioned input — the property that lets the engine fold a
    # per-round sketch into the checkpointed one without rescanning
    d1 = spark.createDataFrame([(f"a{i}",) for i in range(3000)], "x string")
    d2 = spark.createDataFrame([(f"b{i}",) for i in range(3000)], "x string")
    merged = (hll_registers(d1, "x").unionByName(hll_registers(d2, "x"))
              .groupBy("register").agg(F.max("max_rho").cast("int").alias("max_rho")))
    whole = hll_registers(d1.unionByName(d2), "x")
    em = hll_estimate(merged).first()["hll_estimate"]
    ew = hll_estimate(whole).first()["hll_estimate"]
    assert em == ew


def test_binned_quantiles_error_bound(spark):
    from distributed_webcrawler_spark.operators.sketch import binned_quantiles

    vals = [(float(7 + (i * 37) % 1000),) for i in range(5000)]
    df = spark.createDataFrame(vals, "x double")
    got = {r["label"]: r["est_value"]
           for r in binned_quantiles(df, "x", 10.0, [("p50", 0.5), ("p95", 0.95)]).collect()}
    xs = sorted(v for (v,) in vals)
    for label, q in (("p50", 0.5), ("p95", 0.95)):
        exact = xs[min(int(q * len(xs)), len(xs) - 1)]
        assert abs(got[label] - exact) <= 10.0, (label, got[label], exact)


def test_binned_quantiles_exact_when_bin_holds_one_value(spark):
    from distributed_webcrawler_spark.operators.sketch import binned_quantiles

    # all mass in single-value bins: interpolation crosses inside the
    # bin that holds the target, so p50 of {0..9 each x100, width 1}
    # lands inside bin 4 (cum crosses 500 at bin 4's upper half)
    vals = [(float(i),) for i in range(10) for _ in range(100)]
    df = spark.createDataFrame(vals, "x double")
    got = binned_quantiles(df, "x", 1.0, [("p50", 0.5)]).first()
    assert 4.0 <= got["est_value"] <= 5.0


def test_weighted_sample_prefers_heavy_items(spark):
    # one item with overwhelming weight is (near-)certain to be selected:
    # key = u^(1/w) -> 1 as w -> inf
    rows = [(i, 1) for i in range(100)] + [(999, 1_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    ids = {r["id"] for r in weighted_sample(df, "w", k=5, id_col="doc_id").collect()}
    assert 999 in ids


def test_cms_never_undercounts_and_finds_hot_keys(spark):
    from distributed_webcrawler_spark.operators.sketch import cms_heavy_hitters

    # one hot key (x400), a warm key (x50), 200 singleton keys
    rows = [("hot",)] * 400 + [("warm",)] * 50 + [(f"cold-{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    out = cms_heavy_hitters(df, "k", d=3, w=128, k=5).collect()
    by_key = {r.key: r for r in out}
    # CMS guarantee: est >= exact for every reported key
    assert all(r.overcount >= 0 for r in out)
    # the hot key tops the list with its exact count recovered exactly
    # (min-over-d strips collisions unless a key collides in ALL d rows)
    assert out[0].key == "hot" and out[0].exact_count == 400
    assert "warm" in by_key and by_key["warm"].exact_count == 50
    # ordering is deterministic: est DESC, key ASC
    ests = [(r.est_count, r.key) for r in out]
    assert ests == sorted(ests, key=lambda t: (-t[0], t[1]))


def test_cms_tiny_width_overcounts_but_never_under(spark):
    from distributed_webcrawler_spark.operators.sketch import cms_heavy_hitters

    rows = [(f"k{i % 60}",) for i in range(600)]
    df = spark.createDataFrame(rows, "k string")
    out = cms_heavy_hitters(df, "k", d=2, w=8, k=60).collect()
    assert len(out) == 60
    assert all(r.exact_count == 10 for r in out)
    assert all(r.est_count >= 10 for r in out)          # never undercounts
    assert any(r.overcount > 0 for r in out)            # w=8 must collide


def test_binned_quantiles_by_matches_per_group_reference(spark):
    from distributed_webcrawler_spark.operators.sketch import binned_quantiles, binned_quantiles_by

    rows = [("a", float(5 + (i * 13) % 200)) for i in range(900)] + \
           [("b", float(300 + (i * 7) % 50)) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {(r["g"], r["label"]): r["est_value"]
           for r in binned_quantiles_by(df, "x", "g", 5.0,
                                        [("p50", 0.5), ("p95", 0.95)]).collect()}
    # each group must equal the ungrouped operator run on that slice
    for g in ("a", "b"):
        sub = df.where(df.g == g)
        want = {r["label"]: r["est_value"]
                for r in binned_quantiles(sub, "x", 5.0,
                                          [("p50", 0.5), ("p95", 0.95)]).collect()}
        for lbl, v in want.items():
            assert got[(g, lbl)] == v, (g, lbl, got[(g, lbl)], v)
