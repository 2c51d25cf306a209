"""Multimodal operators: Arrow-batched decode stats + resize plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_webcrawler_spark.operators import multimodal as M
from distributed_webcrawler_spark.sources import codec
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


def test_video_codec_roundtrip():
    import numpy as np

    frames = codec.synth_video("vid-a", 20, 14, 5)
    data = codec.encode_video(frames, "png", fps=10)
    dec, fmt, fps = codec.decode_video(data)
    assert fmt == "png" and fps == 10 and len(dec) == 5
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)          # png frames round-trip bit-exact
    assert not np.array_equal(dec[0], dec[1])  # frames genuinely differ
    with pytest.raises(codec.CodecError):
        codec.decode_video(data[:-3])        # truncated last frame
    with pytest.raises(codec.CodecError):
        codec.decode_video(b"nope")


def test_frame_sample(spark):
    import pandas as pd

    vids = [("vid-%d" % i, codec.encode_video(
        codec.synth_video("vid-%d" % i, 18, 12, 4 + i), "jpeg", fps=8))
        for i in range(3)]
    payloads = spark.createDataFrame(
        pd.DataFrame(vids, columns=["video_id", "bytes"])).repartition(2)

    rows = M.frame_sample(payloads, every_n=2).collect()
    # video i has 4+i frames -> ceil((4+i)/2) sampled
    assert sorted((r.video_id, r.frame_idx) for r in rows) == [
        ("vid-0", 0), ("vid-0", 2), ("vid-1", 0), ("vid-1", 2), ("vid-1", 4),
        ("vid-2", 0), ("vid-2", 2), ("vid-2", 4)]
    by_key = {(r.video_id, r.frame_idx): r for r in rows}
    exp = codec.synth_video("vid-1", 18, 12, 5)[2]
    q, _ = codec.decode_image(codec.encode_image(exp, "jpeg"))
    r = by_key[("vid-1", 2)]
    assert (r.ok, r.fmt, r.w, r.h, r.n_frames) == (True, "jpeg", 18, 12, 5)
    assert r.t_ms == 250 and r.phash == codec.phash64(q)

    capped = M.frame_sample(payloads, every_n=1, max_frames=2).collect()
    assert len(capped) == 6 and all(r.frame_idx in (0, 1) for r in capped)


def test_frame_sample_flags_corrupt_bytes(spark):
    import pandas as pd

    good = codec.encode_video(codec.synth_video("vid-ok", 16, 16, 3), "png")
    payloads = spark.createDataFrame(pd.DataFrame(
        [("vid-ok", good), ("vid-bad", b"DWSVjunk")],
        columns=["video_id", "bytes"]))
    rows = {(r.video_id, r.ok) for r in M.frame_sample(payloads).collect()}
    assert ("vid-bad", False) in rows and ("vid-ok", True) in rows


def test_phash_near_dup_pairs(spark):
    """Banded Hamming search over decoded phash == brute-force pairs, and a
    perturbed copy is found at its true distance (pixels never shuffle)."""
    import itertools

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    imgs = {}
    for i in range(12):
        imgs[f"im-{i}"] = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    # near-dup: nudge one corner block of im-0 (flips 1 phash bit here)
    px2 = imgs["im-0"].copy()
    px2[:6, :8] ^= 32
    imgs["im-0-dup"] = px2

    payloads = spark.createDataFrame(pd.DataFrame(
        [(iid, codec.encode_image(px, "png")) for iid, px in imgs.items()],
        columns=["image_id", "bytes"])).repartition(3)
    got = sorted((r.id_a, r.id_b, r.hamming)
                 for r in M.phash_near_dup_pairs(payloads, max_hamming=3).collect())

    sig = {iid: codec.phash64(px) for iid, px in imgs.items()}
    mask = (1 << 64) - 1
    exp = sorted(
        (a, b, bin((sig[a] ^ sig[b]) & mask).count("1"))
        for a, b in itertools.combinations(sorted(sig), 2)
        if bin((sig[a] ^ sig[b]) & mask).count("1") <= 3)
    assert got == exp
    assert any(a == "im-0" and b == "im-0-dup" for a, b, _ in got)


# ---------------------------------------------------------------------------
# audio (DWSA)
# ---------------------------------------------------------------------------

def test_audio_codec_roundtrip_and_lossy_snr():
    import numpy as np

    x = codec.synth_pcm("clip-1", 16000, 16000)
    # wav is lossless
    y, sr, fmt = codec.decode_audio(codec.encode_audio(x, 16000, "wav"))
    assert fmt == "wav" and sr == 16000 and np.array_equal(x, y)
    # aac stand-in quantizes: real reconstruction error, bounded (top 10
    # bits kept -> max error 2^6 per sample)
    z, _, zfmt = codec.decode_audio(codec.encode_audio(x, 16000, "aac"))
    assert zfmt == "aac" and not np.array_equal(x, z)
    assert int(np.abs(x.astype(np.int32) - z.astype(np.int32)).max()) < (1 << 6)


def test_audio_junk_rejected():
    import pytest as _pytest

    for junk in (b"", b"DWSA", b"nope" * 10):
        with _pytest.raises(codec.CodecError):
            codec.decode_audio(junk)


def test_audio_stats_matches_reference(spark):
    import numpy as np
    import pandas as pd

    specs = [("a-0", 8000, 8000, "wav"), ("a-1", 12000, 16000, "aac"),
             ("a-2", 4000, 8000, "wav")]
    pdf = pd.DataFrame(
        [(aid, codec.encode_audio(codec.synth_pcm(aid, n, sr), sr, fmt))
         for aid, n, sr, fmt in specs], columns=["audio_id", "bytes"])
    got = {r["audio_id"]: r for r in
           M.audio_stats(spark.createDataFrame(pdf)).collect()}
    for aid, n, sr, fmt in specs:
        x, dsr, dfmt = codec.decode_audio(
            codec.encode_audio(codec.synth_pcm(aid, n, sr), sr, fmt))
        r = got[aid]
        assert r["ok"] and r["fmt"] == dfmt and r["sr"] == dsr
        assert r["n_samples"] == n and r["duration_ms"] == n * 1000 // sr
        xf = x.astype(np.float64)
        assert r["rms"] == round(float(np.sqrt(np.mean(xf * xf))), 4)
        assert r["afp"] == codec.afp64(x)


def test_audio_stats_flags_corrupt_bytes(spark):
    import pandas as pd

    pdf = pd.DataFrame([("good", codec.encode_audio(
        codec.synth_pcm("good", 8000, 8000), 8000, "wav")),
        ("bad", b"garbage-bytes")], columns=["audio_id", "bytes"])
    rows = {r["audio_id"]: r for r in
            M.audio_stats(spark.createDataFrame(pdf)).collect()}
    assert rows["good"]["ok"] and rows["good"]["err"] is None
    assert not rows["bad"]["ok"] and rows["bad"]["err"] is not None
    assert rows["bad"]["afp"] is None


def test_audio_near_dup_pairs(spark):
    import pandas as pd

    # same signal encoded lossless and lossy -> near-identical fingerprints;
    # unrelated clips must not pair at Hamming <= 3
    x = codec.synth_pcm("dup-src", 16000, 16000)
    pdf = pd.DataFrame([
        ("d-wav", codec.encode_audio(x, 16000, "wav")),
        ("d-aac", codec.encode_audio(x, 16000, "aac")),
        ("other-1", codec.encode_audio(codec.synth_pcm("other-1", 16000, 16000), 16000, "wav")),
        ("other-2", codec.encode_audio(codec.synth_pcm("other-2", 12000, 8000), 8000, "wav")),
    ], columns=["audio_id", "bytes"])
    pairs = {(r["id_a"], r["id_b"])
             for r in M.audio_near_dup_pairs(spark.createDataFrame(pdf)).collect()}
    assert ("d-aac", "d-wav") in pairs
    assert all({a, b} == {"d-aac", "d-wav"} for a, b in pairs)


def test_header_meta_agrees_with_full_decode(spark):
    """The JVM-side header parse and the Arrow-batched full decode must
    report identical (fmt, w, h) for every valid container; corrupt bytes
    classify as ok=false rows instead of failing the task."""
    pl = gen_payloads(spark, 24).select("image_id", "bytes")
    corrupt = spark.createDataFrame(
        [("bad-magic", bytearray(b"JUNKJUNKJUNK")),
         ("bad-fmt", bytearray(b"DWS1\x07\x10\x00\x10\x00xx")),
         ("trunc", bytearray(b"DWS1\x01"))],
        "image_id string, bytes binary")
    hdr = {r["image_id"]: r for r in M.header_meta(pl.union(corrupt)).collect()}
    full = {r["image_id"]: r for r in M.decode_stats(pl).collect()}
    assert len(hdr) == 27
    for iid, f in full.items():
        h = hdr[iid]
        assert (h["ok"], h["fmt"], h["w"], h["h"]) == (f["ok"], f["fmt"], f["w"], f["h"])
        assert h["payload_bytes"] == h["container_bytes"] - 9
        assert h["pixel_bytes"] == f["w"] * f["h"] * 3
    for iid in ("bad-magic", "bad-fmt", "trunc"):
        h = hdr[iid]
        assert not h["ok"] and h["fmt"] is None and h["w"] is None
        assert h["payload_bytes"] is None and h["compression_ratio"] is None


def test_header_meta_plan_is_jvm_only(spark):
    """No Python evaluation and no shuffle: the metadata fast path must be
    one codegen'd Project over the scan."""
    pl = spark.createDataFrame(
        gen_payloads(spark, 8).select("image_id", "bytes").toPandas())
    plan = M.header_meta(pl)._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "Exchange"):
        assert bad not in plan, plan


def test_channel_histogram_matches_numpy_and_skips_corrupt(spark):
    """channel_histogram == a numpy reference pass; corrupt payloads are
    skipped, not counted; totals = 3 * sum(w*h) of decodable images."""
    import numpy as np
    import pandas as pd

    from distributed_webcrawler_spark.operators.multimodal import channel_histogram
    from distributed_webcrawler_spark.sources import codec

    specs = [(f"ch{i}", 10 + i, 8 + i, ["png", "jpeg", "webp"][i % 3])
             for i in range(5)]
    rows = [(iid, codec.encode_image(codec.synth_pixels(iid, w, h), fmt))
            for iid, w, h, fmt in specs]
    rows.append(("bad", b"\x01\x02junk"))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["image_id", "bytes"])).repartition(3)

    got = {(r["channel"], r["bucket"]): r["n_pixels"]
           for r in channel_histogram(df).collect()}
    acc = np.zeros((3, 16), dtype=np.int64)
    npx = 0
    for iid, w, h, fmt in specs:
        px, _ = codec.decode_image(codec.encode_image(codec.synth_pixels(iid, w, h), fmt))
        npx += px.shape[0] * px.shape[1]
        for c in range(3):
            acc[c] += np.bincount((px[:, :, c] >> 4).ravel(), minlength=16)
    for c in range(3):
        for b in range(16):
            assert got.get((c, b), 0) == acc[c][b], (c, b)
    assert sum(got.values()) == 3 * npx


def test_decode_fidelity_psnr_and_corrupt_rows(spark):
    """decode_fidelity (round-4): per-row PSNR vs executor-side
    regenerated reference pixels — lossless payloads hit the 99.0
    sentinel, real-JPEG payloads land in the q95 photo band (>=40dB),
    junk becomes ok=false rows instead of failing the task."""
    import pandas as pd

    from distributed_webcrawler_spark.sources import jpeg as J

    rows = []
    for i in range(6):
        iid = f"fid-{i:03d}"
        px = codec.synth_pixels_photo(iid, 30, 24)
        data = (codec.encode_png(px) if i % 2
                else J.encode_jpeg(px, quality=95, subsampling="4:4:4"))
        rows.append((iid, data))
    rows.append(("fid-junk", b"not an image"))
    payloads = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes"]))
    got = {r.image_id: r for r in M.decode_fidelity(payloads).collect()}
    assert len(got) == 7
    assert not got["fid-junk"].ok and got["fid-junk"].err
    for i in range(6):
        r = got[f"fid-{i:03d}"]
        assert r.ok
        if i % 2:   # png lossless -> finite sentinel
            assert r.psnr_db == 99.0 and r.fmt == "png"
        else:       # real jpeg q95 photo corpus
            assert r.fmt == "jpeg" and 40.0 <= r.psnr_db < 99.0


def test_jpeg_sweep_join_is_broadcast(spark):
    """The sweep's byte-size join must be a BroadcastHashJoin (corpus
    dimension broadcast into the fidelity stats), never a shuffle."""
    import __spark_entry__ as E

    plan = E.q_jpeg_quality_sweep(spark, "/unused")._jdf.queryExecution() \
            .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
