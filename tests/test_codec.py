"""Deterministic codec: lossless round-trip, lossy PSNR >= 40 dB, junk
rejection, phash stability, determinism across calls."""

from __future__ import annotations

import numpy as np
import pytest

from distributed_webcrawler_spark.sources import codec


def test_png_lossless_roundtrip():
    px = codec.synth_pixels("img-x", 40, 30)
    out, fmt = codec.decode_image(codec.encode_image(px, "png"))
    assert fmt == "png" and np.array_equal(px, out)


@pytest.mark.parametrize("fmt,min_psnr", [("jpeg", 40.0), ("webp", 45.0)])
def test_lossy_psnr(fmt, min_psnr):
    px = codec.synth_pixels(f"img-{fmt}", 64, 48)
    out, f = codec.decode_image(codec.encode_image(px, fmt))
    assert f == fmt
    assert codec.psnr(px, out) >= min_psnr


def test_junk_rejected():
    for junk in (b"", b"bogus", b"DWS1" + b"\x00" * 3, b"DWS1\x09\x01\x00\x01\x00xxxx"):
        with pytest.raises(codec.CodecError):
            codec.decode_image(junk)


def test_determinism():
    a = codec.synth_pixels("img-7", 32, 32)
    b = codec.synth_pixels("img-7", 32, 32)
    assert np.array_equal(a, b)
    assert codec.encode_image(a, "jpeg") == codec.encode_image(b, "jpeg")
    assert codec.phash64(a) == codec.phash64(b)
    assert codec.synth_pixels("img-8", 32, 32).tobytes() != a.tobytes()


def test_phash_near_duplicate_stability():
    px = codec.synth_pixels("img-9", 48, 48)
    lossy, _ = codec.decode_image(codec.encode_image(px, "jpeg"))
    h1, h2 = codec.phash64(px), codec.phash64(lossy)
    assert bin(h1 ^ h2).count("1") <= 6  # hamming distance small under quantization
