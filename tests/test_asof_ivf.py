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
