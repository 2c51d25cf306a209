"""Multimodal operators: Arrow-batched decode stats + resize plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_webcrawler_spark.operators import multimodal as M
from distributed_webcrawler_spark.sources.datagen import gen_payloads


def test_decode_stats(spark):
    payloads = gen_payloads(spark, 24)
    stats = M.decode_stats(payloads).collect()
    assert len(stats) == 24 and all(r.ok for r in stats)
    src = {r.image_id: (r.w, r.h, r.fmt, r.phash) for r in
           payloads.select("image_id", "w", "h", "fmt", "phash").collect()}
    for r in stats:
        w, h, fmt, phash = src[r.image_id]
        assert (r.w, r.h, r.fmt) == (w, h, fmt)
        if fmt == "png":
            assert r.phash == phash          # lossless decode -> identical phash


def test_decode_stats_flags_corrupt_bytes(spark):
    payloads = gen_payloads(spark, 4).withColumn(
        "bytes",
        F.when(F.col("image_id") == "img-00000000", F.lit(b"corrupt"))
        .otherwise(F.col("bytes")))
    stats = {r.image_id: r for r in M.decode_stats(payloads).collect()}
    assert not stats["img-00000000"].ok
    assert stats["img-00000000"].err
    assert stats["img-00000001"].ok


def test_resize(spark):
    payloads = gen_payloads(spark, 6)
    out = M.resize(payloads, 16, 12)
    rows = out.collect()
    assert len(rows) == 6
    stats = M.decode_stats(out).collect()
    assert all(r.ok and r.w == 16 and r.h == 12 for r in stats)


def test_frame_sample_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.frame_sample_stub()
