"""SparkSession factory tuned for this engine.

Local mode is the sandbox stand-in for a multi-executor cluster: design
decisions (shuffle partitions, AQE, Arrow, broadcast thresholds) are the
ones we would ship to a 1000-executor cluster; only the master URL and the
memory sizing are local-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cpus: int | str | None = None,
    app_name: str = "distributed_webcrawler_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    - AQE on: runtime coalescing + skew-join splitting complements our
      explicit hot-host salting (SURVEY.md §4.2).
    - Arrow on: every Python-side UDF in this engine is a pandas UDF /
      mapInPandas over Arrow batches; no row-at-a-time Python anywhere.
    - shuffle partitions default to 2x cores locally; on a real cluster this
      would be sized to ~128MB post-shuffle partitions at the target SF.
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = f"local[{cpus}]"
    n_threads = os.cpu_count() or 32 if str(cpus) == "*" else int(cpus)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * n_threads)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("DWS_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
