"""Bloom filter: zero false negatives (correctness-critical, SURVEY §7b),
fpp within bound, distributed treeReduce build, serde round-trip."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from distributed_webcrawler_spark.operators.bloom import (
    BloomFilter,
    bloom_prefilter_udf,
    build_bloom,
)


def test_no_false_negatives_and_fpp():
    bf = BloomFilter.for_capacity(50_000, 0.01)
    rng = np.random.default_rng(7)
    inserted = rng.integers(-(2**62), 2**62, 50_000, dtype=np.int64)
    bf.add_many(inserted)
    assert bf.might_contain_many(inserted).all()          # NEVER a false negative
    probe = rng.integers(-(2**62), 2**62, 100_000, dtype=np.int64)
    fresh = probe[~np.isin(probe, inserted)]
    assert bf.might_contain_many(fresh).mean() < 0.02      # fpp ~0.01


def test_sequential_ids_still_uniform():
    bf = BloomFilter.for_capacity(10_000, 0.01)
    bf.add_many(np.arange(10_000, dtype=np.int64))
    probe = np.arange(10**7, 10**7 + 50_000, dtype=np.int64)
    assert bf.might_contain_many(probe).mean() < 0.02


def test_serde_roundtrip():
    bf = BloomFilter.for_capacity(1000, 0.01)
    bf.add_many(np.arange(1000, dtype=np.int64))
    bf2 = BloomFilter.from_bytes(bf.to_bytes())
    assert bf2.n_bits == bf.n_bits and bf2.n_hashes == bf.n_hashes
    assert np.array_equal(bf2.bits, bf.bits)


def test_distributed_build_and_prefilter(spark):
    df = spark.range(0, 20_000, 1, 8).select(F.xxhash64("id").alias("h"))
    bf = build_bloom(df, "h", expected_insertions=20_000, fpp=0.01)
    # every inserted hash is found via the pandas-UDF prefilter
    tagged = df.withColumn("maybe", bloom_prefilter_udf(bf)(F.col("h")))
    assert tagged.where(~F.col("maybe")).count() == 0
    # union merge across two disjoint builds == build over the union
    df2 = spark.range(20_000, 40_000, 1, 8).select(F.xxhash64("id").alias("h"))
    bf2 = build_bloom(df2, "h", expected_insertions=20_000, fpp=0.01)
    merged = bf.union(bf2)
    both = df.unionByName(df2).withColumn("maybe", bloom_prefilter_udf(merged)(F.col("h")))
    assert both.where(~F.col("maybe")).count() == 0
