"""Bucketed co-located join: the cluster technique for the frontier <->
seen-set / progress joins that repeat every round on the same key. Writing
both sides bucketed + sorted on the join key lets Spark plan a SortMergeJoin
with NO Exchange on either side — the shuffle is paid once at write time and
amortized over every subsequent round. On the 10^10 tier this is the
recommended layout for the progress/done table (see plans/engine.py
pending()); parquet snapshot appends can't carry bucket metadata, so this is
exercised against saveAsTable (the Iceberg bucket-partition-transform
equivalent on a real cluster).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse(spark):
    d = tempfile.mkdtemp(prefix="dws-bucket-wh-")
    yield d
    for t in ("b_frontier", "b_done"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(d, ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, warehouse):
    fr = spark.range(0, 10_000).select(
        F.col("id").alias("url_hash"),
        (F.col("id") % 97).alias("host_bucket"))
    done = spark.range(0, 5_000).select(
        (F.col("id") * 2).alias("url_hash"), F.lit("done").alias("status"))

    (fr.write.mode("overwrite").bucketBy(8, "url_hash").sortBy("url_hash")
       .option("path", f"{warehouse}/b_frontier").saveAsTable("b_frontier"))
    (done.write.mode("overwrite").bucketBy(8, "url_hash").sortBy("url_hash")
       .option("path", f"{warehouse}/b_done").saveAsTable("b_done"))

    a = spark.table("b_frontier")
    b = spark.table("b_done")
    # force the sort-merge path (at the 10^10 tier neither side broadcasts;
    # on this toy input Spark would otherwise pick a BroadcastHashJoin and
    # ignore the buckets entirely)
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "url_hash", "left_anti")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    # count above: evens 0..9998 are matched by done's 0,2,..,9998, so the
    # 5,000 odd url_hashes remain pending
