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


def test_weighted_sample_prefers_heavy_items(spark):
    # one item with overwhelming weight is (near-)certain to be selected:
    # key = u^(1/w) -> 1 as w -> inf
    rows = [(i, 1) for i in range(100)] + [(999, 1_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    ids = {r["id"] for r in weighted_sample(df, "w", k=5, id_col="doc_id").collect()}
    assert 999 in ids
