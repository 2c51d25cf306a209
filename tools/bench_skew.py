"""Salted-vs-unsalted rank window under pathological host skew (round-2
verdict #8): ONE host holds 50% of a sf0.1-scale frontier (the Gini~1 case
q_frontier_gini detects). The plain per-host rank window runs that host's
partition single-threaded; topk_per_group_salted spreads it over n_salts
tasks. This measures both on IDENTICAL input in one JVM (interleaved
best-of-N to defeat the noisy sandbox host) and prints a JSON line; the
output table lands in BENCH.md ("Skewed-host salted window").

Usage: python tools/bench_skew.py [n_rows] [attempts]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from distributed_webcrawler_spark import get_spark  # noqa: E402
from distributed_webcrawler_spark.operators.topk import (  # noqa: E402
    tie_break_cols,
    topk_per_group,
    topk_per_group_budget,
    topk_per_group_budget_salted,
    topk_per_group_salted,
)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 3_600_000
    attempts = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus, shuffle_partitions=cpus,
                      app_name="dws-bench-skew")
    # 50% of rows on one host; the rest Zipf-ish over 4k hosts
    df = (spark.range(0, n_rows, 1, cpus).select(
        F.when(F.col("id") % 2 == 0, "hot.example.com").otherwise(
            F.concat(F.lit("host-"), F.pmod(F.xxhash64("id"), 4000).cast("string"))
        ).alias("host"),
        F.concat(F.lit("https://h/p/"), F.col("id").cast("string")).alias("url"),
        (F.pmod(F.col("id") * 2654435761, 1_000_000) / 1e6).alias("priority"),
        F.timestamp_seconds(F.col("id") % 300).alias("discovered_at"))
        .cache())
    df.count()  # materialize once; both variants read the same cached input
    order, k = tie_break_cols(), 64

    def run(fn, label):
        best = float("inf")
        for _ in range(attempts):
            t0 = time.monotonic()
            n = fn().select("host", "url", "rk").count()
            best = min(best, time.monotonic() - t0)
        return best, n

    budgets = spark.createDataFrame(
        [("hot.example.com", k), ("host-7", 3), ("host-11", 1)],
        "host string, budget int")
    variants = {
        "plain": lambda: topk_per_group(df, ["host"], order, k),
        "salted": lambda: topk_per_group_salted(df, ["host"], order, k,
                                                n_salts=cpus),
        "budget": lambda: topk_per_group_budget(df, ["host"], order, budgets,
                                                "host", k, max_budget=k),
        "budget_salted": lambda: topk_per_group_budget_salted(
            df, ["host"], order, budgets, "host", k, n_salts=cpus),
    }
    results, counts = {}, {}
    for _ in range(attempts):  # interleave at the variant level too
        for name, fn in variants.items():
            w, n = run(fn, name)
            results[name] = min(results.get(name, float("inf")), w)
            counts[name] = n
    assert counts["plain"] == counts["salted"], counts
    assert counts["budget"] == counts["budget_salted"], counts
    print(json.dumps({
        "bench": "skewed_host_salted_window", "rows": n_rows,
        "hot_share": 0.5, "k": k, "cpus": cpus,
        "walls_s": {n: round(w, 3) for n, w in results.items()},
        "literal_speedup_plain_vs_salted":
            round(results["salted"] / results["plain"], 3),
        "budget_speedup_grouplimit_vs_salted":
            round(results["budget_salted"] / results["budget"], 3),
        "out_rows": int(counts["plain"]),
    }))


if __name__ == "__main__":
    main()
