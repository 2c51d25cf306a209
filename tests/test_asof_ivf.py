"""As-of join + IVF ANN semantics on crafted inputs (cross-engine value
parity is covered by tools/check_oracle.py and the driver gate)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from distributed_webcrawler_spark.operators import similarity as S
from distributed_webcrawler_spark.operators.asof import asof_join


def _ts(h):
    return dt.datetime(2026, 1, 1, h)


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(9)), (3, 10, _ts(1)), (4, 20, _ts(6))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts(4), 100.0), (10, _ts(7), 200.0), (30, _ts(1), 999.0)],
        "user_id long, ts timestamp, pval double")
    out = {r.event_id: r.v for r in asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        value_col="pval", out_col="v").collect()}
    assert out[1] == 100.0     # latest right at-or-before 05:00 is 04:00
    assert out[2] == 200.0     # 07:00 row wins at 09:00
    assert out[3] is None      # nothing precedes 01:00
    assert out[4] is None      # user 20 has no right rows at all


def test_asof_equal_ts_is_inclusive(spark):
    left = spark.createDataFrame([(1, 7, _ts(3))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(7, _ts(3), 42.0)], "user_id long, ts timestamp, pval double")
    [row] = asof_join(left, right, on=["user_id"], left_ts="ts", right_ts="ts",
                      value_col="pval", out_col="v").collect()
    assert row.v == 42.0       # right at exactly left_ts is visible


def test_asof_preserves_left_rowcount(spark):
    left = spark.range(50).select(
        F.col("id").alias("event_id"), (F.col("id") % 5).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"))
    right = spark.range(10).select(
        (F.col("id") % 5).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 300).alias("ts"),
        (F.col("id") * 1.0).alias("pval"))
    out = asof_join(left, right, on=["user_id"], left_ts="ts", right_ts="ts",
                    value_col="pval", out_col="v")
    assert out.count() == 50


VECS = [
    # two tight clusters along axes + a centroid for each (ids 0 and 29 are
    # % 29 == 0 -> centroids; 0 and 50 are % 50 == 0 -> queries)
    (0,  [1.0, 0.0, 0.0, 0.0]),
    (1,  [0.9, 0.1, 0.0, 0.0]),
    (2,  [0.95, 0.05, 0.0, 0.0]),
    (29, [0.0, 1.0, 0.0, 0.0]),
    (30, [0.0, 0.9, 0.1, 0.0]),
    (50, [0.1, 0.9, 0.0, 0.0]),
]


def test_ivf_assign_and_topk(spark):
    emb = spark.createDataFrame(VECS, "vec_id long, embedding array<float>")
    cents = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
             for r in emb.where(F.col("vec_id") % 29 == 0).collect()]
    assert sorted(c for c, _ in cents) == [0, 29]
    assigned = S.ivf_assign_literal(emb, cents)
    cells = {r.id: r.cell for r in assigned.collect()}
    assert cells[1] == 0 and cells[2] == 0           # x-axis cluster -> cell 0
    assert cells[30] == 29 and cells[50] == 29       # y-axis cluster -> cell 29
    assert cells[0] == 0 and cells[29] == 29         # centroids claim themselves

    out = S.ivf_topk(assigned, k=2, query_filter=F.col("id") % 50 == 0)
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    # query 0 searches only cell 0: neighbors from {1, 2}, never the y-cluster
    assert set(by_q[0]) <= {1, 2}
    # query 50 searches only cell 29
    assert set(by_q[50]) <= {29, 30}


def test_ivf_assign_broadcast_matches_literal(spark):
    """The scale path (broadcast numpy matrix + matmul argmax) must assign
    every vector to the same cell as the plan-literal oracle form."""
    emb = spark.createDataFrame(VECS, "vec_id long, embedding array<float>")
    cents = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
             for r in emb.where(F.col("vec_id") % 29 == 0).collect()]
    lit = {r.id: r.cell for r in S.ivf_assign_literal(emb, cents).collect()}
    bc = {r.id: r.cell for r in S.ivf_assign_broadcast(emb, cents).collect()}
    assert lit == bc
    # and no literal struct per centroid in the plan: the physical plan of
    # the broadcast form should not grow with the centroid count
    plan = S.ivf_assign_broadcast(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "named_struct" not in plan


def test_ivf_nprobe_expands_search(spark):
    """nprobe=2 searches the query's two nearest cells: candidates are a
    superset of nprobe=1 and results still rank by exact cosine."""
    emb = spark.createDataFrame(VECS, "vec_id long, embedding array<float>")
    cents = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
             for r in emb.where(F.col("vec_id") % 29 == 0).collect()]
    corpus = S.ivf_assign_broadcast(emb, cents)
    p1 = S.ivf_assign_broadcast(emb.where(F.col("vec_id") % 50 == 0), cents, nprobe=1)
    probes = S.ivf_assign_broadcast(emb.where(F.col("vec_id") % 50 == 0), cents, nprobe=2)
    cells2 = {r.id: list(r.cells) for r in probes.collect()}
    assert all(len(v) == 2 for v in cells2.values())
    # first probed cell == the nprobe=1 assignment
    cells1 = {r.id: r.cell for r in p1.collect()}
    assert {k: v[0] for k, v in cells2.items()} == cells1
    out = S.ivf_topk_nprobe(corpus, probes, k=3)
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    # with both cells probed, query 0 can now see the y-cluster too
    assert set(by_q[0]) > set()
    n1 = S.ivf_topk(corpus, k=3, query_filter=F.col("id") % 50 == 0)
    n1_by_q = {}
    for r in n1.collect():
        n1_by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    for q, neigh in n1_by_q.items():
        assert neigh <= set(by_q[q]) | neigh  # nprobe=2 never loses in-cell hits
