"""BM25: parity with a pure-Python reference, ranking sanity, and the
scale plan shape (top-k as TakeOrderedAndProject, no global sort)."""

from __future__ import annotations

import math
import re

from distributed_webcrawler_spark.operators.relevance import bm25_search


def _py_bm25(rows, terms, k1=1.2, b=0.75):
    toks = {i: re.findall("[a-z0-9]+", t.lower()) for i, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for t in sorted(set(terms)):
        df = sum(1 for v in toks.values() if t in v)
        if df == 0:
            continue
        idf = round(math.log(1.0 + (n - df + 0.5) / (df + 0.5)), 9)
        for i, v in toks.items():
            tf = v.count(t)
            if tf:
                c = round(idf * ((k1 + 1.0) * tf)
                          / (tf + k1 * ((1.0 - b) + b * len(v) / avgdl)), 9)
                scores[i] = scores.get(i, 0.0) + c
    return {i: round(s, 6) for i, s in scores.items()}


def test_matches_python_reference(spark):
    rows = [
        (1, "spark joins tables fast spark spark"),
        (2, "window functions rank rows in spark"),
        (3, "nothing relevant here at all"),
        (4, "join join join window spark"),
        (5, "a much longer document about spark that mentions spark once "
            "per many other words " + "filler " * 40),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["score"]
           for r in bm25_search(df, ["spark", "join", "window"]).collect()}
    want = _py_bm25(rows, ["spark", "join", "window"])
    assert got == want
    # doc 3 has no query terms -> absent; short spark-heavy docs outrank
    # the long diluted one (length normalization works)
    assert 3 not in got
    assert got[1] > got[5]


def test_top_n_and_tiebreak(spark):
    rows = [(i, "spark") for i in range(10)]  # identical docs -> tie on score
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_search(df, ["spark"], top_n=3).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2]  # ties break to min id


def test_plan_is_take_ordered_not_global_sort(spark):
    df = spark.createDataFrame([(1, "spark")], "doc_id long, text string")
    out = bm25_search(df, ["spark"], top_n=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
