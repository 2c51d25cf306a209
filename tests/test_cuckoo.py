"""Cuckoo filter: no false negatives, fpp bound, deletion, serde."""

from __future__ import annotations

import numpy as np

from distributed_webcrawler_spark.operators.cuckoo import CuckooFilter


def test_no_false_negatives_and_fpp():
    cf = CuckooFilter.for_capacity(50_000)
    rng = np.random.default_rng(11)
    ins = rng.integers(-(2**62), 2**62, 50_000, dtype=np.int64)
    ok = cf.add_many(ins)
    assert ok == 50_000                      # all inserted at 0.84 load
    assert cf.might_contain_many(ins).all()  # no false negatives
    probe = rng.integers(-(2**62), 2**62, 100_000, dtype=np.int64)
    fresh = probe[~np.isin(probe, ins)]
    # 16-bit fingerprints, 2 buckets of 4 slots: fpp ~ 8/2^16 ~ 0.00012
    assert cf.might_contain_many(fresh).mean() < 0.002


def test_deletion():
    cf = CuckooFilter.for_capacity(1_000)
    h = np.arange(1_000, dtype=np.int64)
    cf.add_many(h)
    for k in range(0, 1_000, 7):
        assert cf.delete(int(k))
    remaining = np.array([k for k in range(1_000) if k % 7 != 0], dtype=np.int64)
    assert cf.might_contain_many(remaining).all()   # survivors still present
    deleted = np.arange(0, 1_000, 7, dtype=np.int64)
    assert cf.might_contain_many(deleted).mean() < 0.05  # mostly gone


def test_serde_roundtrip():
    cf = CuckooFilter.for_capacity(500)
    cf.add_many(np.arange(500, dtype=np.int64))
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert np.array_equal(cf.table, cf2.table)
    assert cf2.might_contain_many(np.arange(500, dtype=np.int64)).all()
