"""Driver-contract smoke: entry() runs on sf0.001; every queries() entry has
a callable; every oracle key exists in queries()."""

from __future__ import annotations

import __spark_entry__ as E


def test_contract_shape():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)
    # every query now carries an oracle (multimodal_decode gained a
    # precomputed-expected-values oracle in round 2)
    assert set(qs) == set(oracles)


def test_entry_runs(spark):
    df = E.entry(spark)
    assert df.count() > 0
    cols = set(df.columns)
    assert {"url", "host", "sched_rank", "priority"} <= cols


def test_sample_queries_run(spark):
    qs = E.queries()
    for name in ["pricing_summary", "dedup_exact", "text_lang_id"]:
        assert qs[name](spark, "/root/testdata/sf0.001").count() > 0


def test_budget_apportion_sums_exactly(spark):
    import __spark_entry__ as E
    rows = E.q_budget_apportion(spark, E.SF001).collect()
    total = sum(r["quota"] for r in rows)
    assert total == E._APPORTION_BUDGET
    assert all(r["quota"] >= 0 for r in rows)
