"""VP8L (lossless WebP) codec tests — RFC 9649 conformance.

The encoder emits a minimal profile (subtract-green + literal Huffman),
so decoder features real-world files use — LZ77, color cache, color
indexing with pixel bundling, predictor / color transforms,
meta-Huffman — are exercised here with HAND-CRAFTED bitstreams built
from the codec's own writer primitives, each with hand-derived expected
pixels. PIL cross-validation is skip-gated (Pillow absent in this
sandbox)."""

import math
import struct

import numpy as np
import pytest

from distributed_webcrawler_spark.sources import codec as C
from distributed_webcrawler_spark.sources import webp as W


def _vp8l_container(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def test_plane_code_lut_is_spec_shaped():
    """The 120-entry short-distance map must be a permutation of the
    plane codes with non-decreasing Euclidean distance — the properties
    the spec's nearest-pixel construction guarantees."""
    vals = [v for v in W._PLANE_TO_CODE_LUT if v != 255]
    assert sorted(vals) == list(range(120))
    assert len(W._PLANE_TO_CODE_LUT) - len(vals) == 8  # y=0, x<=0 slots
    ds = [math.hypot(*W._CODE_TO_PLANE[c]) for c in range(120)]
    assert all(ds[i + 1] >= ds[i] - 1e-9 for i in range(119))
    assert W._CODE_TO_PLANE[0] == (0, 1) and W._CODE_TO_PLANE[1] == (1, 0)


def test_round_trip_lossless_across_shapes():
    rng = np.random.default_rng(3)
    shapes = [(1, 1), (2, 3), (7, 7), (16, 16), (31, 64), (64, 96), (97, 61)]
    for h, w in shapes:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        enc = W.encode_webp_lossless(px)
        assert enc[:4] == b"RIFF" and enc[8:12] == b"WEBP"
        assert np.array_equal(W.decode_webp(enc), px), (h, w)
    # constant image -> 1-symbol simple codes; gradient -> 2-symbol codes
    const = np.full((20, 30, 3), 77, dtype=np.uint8)
    assert np.array_equal(W.decode_webp(W.encode_webp_lossless(const)), const)
    two = np.zeros((8, 8, 3), dtype=np.uint8)
    two[..., 0] = (np.arange(8, dtype=np.uint8)[None, :] % 2) * 9
    assert np.array_equal(W.decode_webp(W.encode_webp_lossless(two)), two)


def test_photo_corpus_compresses_and_decode_image_sniffs():
    px = C.synth_pixels_photo("wp-1", 64, 64)
    enc = W.encode_webp_lossless(px)
    assert len(enc) < px.nbytes  # Huffman+subtract-green buys real bytes
    dec, fmt = C.decode_image(enc)
    assert fmt == "webp" and np.array_equal(dec, px)


def test_error_contract_webp_is_codec_error():
    assert issubclass(W.WebpError, C.CodecError)
    cases = [
        b"RIFF" + b"\x00" * 16,                               # bad magic tail
        _vp8l_container(b""),                                  # empty VP8L
        _vp8l_container(b"\x00\x00\x00\x00\x00"),              # bad signature
        _vp8l_container(b"\x2f\xff\xff\xff\xff\xff\xff\xff"),  # junk stream
    ]
    for bad in cases:
        with pytest.raises(C.CodecError):
            W.decode_webp(bad)
    # truncations of a valid stream must raise, never return garbage
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    enc = W.encode_webp_lossless(px)
    for cut in (13, 21, len(enc) // 2):
        with pytest.raises(C.CodecError):
            W.decode_webp(enc[:cut])
    # lossy chunk: explicit "needs Pillow" refusal
    body = b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(W.WebpError, match="lossy"):
        W.decode_webp(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_crafted_stream_lz77_and_color_cache():
    """Hand-built bitstream: literal + color-cache hit + LZ77 copy with
    plane-code 1 ((0,1): distance = row above) — the backward-reference
    machinery our encoder never emits."""
    w, h = 4, 2
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)          # no transforms
    bw.write(1, 1)          # color cache present
    bw.write(2, 4)          # cache_bits = 2
    bw.write(0, 1)          # no meta huffman
    # green: normal code over {100 literal, 256 len-code-0, 280 cache-0}
    glens = [0] * (256 + 24 + 4)
    glens[100], glens[256], glens[280] = 2, 2, 1
    W._write_normal_code(bw, glens)
    W._write_simple_code(bw, [50])    # red
    W._write_simple_code(bw, [60])    # blue
    W._write_simple_code(bw, [255])   # alpha
    W._write_simple_code(bw, [0])     # distance: sym 0 -> plane code 1
    gcodes = W._canonical_codes(glens)

    def emit(sym):
        c, ln = gcodes[sym]
        bw.write_code(c, ln)

    argb = (255 << 24) | (50 << 16) | (100 << 8) | 60
    cache_idx = ((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> 30
    assert cache_idx < 4
    # row 0: literal, cache hit, literal, literal
    emit(100)
    emit(280 + cache_idx)
    emit(100)
    emit(100)
    # row 1: LZ77 copy, length code 0 -> length 1, dist = w (row above),
    # emitted 4x
    for _ in range(4):
        emit(256)           # length prefix code 0 -> length 1
        # distance symbol: single-symbol simple code, 0 bits
    out = W.decode_webp(_vp8l_container(bw.bytes()))
    expect = np.empty((2, 4, 3), dtype=np.uint8)
    expect[..., 0], expect[..., 1], expect[..., 2] = 50, 100, 60
    assert np.array_equal(out, expect)


def test_crafted_stream_color_indexing_with_bundling():
    """4-color palette -> 2-bit indices bundled 4-per-byte in the green
    channel of a packed image 1/4 the width; palette entries are
    per-channel delta-coded."""
    w, h = 8, 1
    palette = [0xFF102030, 0xFF405060, 0xFF708090, 0xFFA0B0C0]
    deltas = []
    prev = 0
    for p in palette:
        d = 0
        for shift in (24, 16, 8, 0):
            d |= ((p >> shift) - (prev >> shift)) & 0xFF << 0 if False else \
                 ((((p >> shift) & 0xFF) - ((prev >> shift) & 0xFF)) & 0xFF) << shift
        deltas.append(d)
        prev = p
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)          # transform present
    bw.write(3, 2)          # color indexing
    bw.write(3, 8)          # 4 colors - 1
    # palette sub-image (4x1): no cache, 5 codes, literal deltas
    bw.write(0, 1)          # no color cache (sub-image)
    for chan in range(4):   # green, red, blue, alpha channels of deltas
        shift = (8, 16, 0, 24)[chan]
        syms = sorted({(d >> shift) & 0xFF for d in deltas})
        W._write_simple_code(bw, syms if len(syms) <= 2 else syms)  # <=2 here
        assert len(syms) <= 2
    W._write_simple_code(bw, [0])  # distance
    # emit palette pixels: green,red,blue per delta (alpha 0-bit if single)
    # rebuild code maps exactly as the decoder will
    def chan_codes(shift):
        syms = sorted({(d >> shift) & 0xFF for d in deltas})
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    gmap, rmap, bmap, amap = (chan_codes(s) for s in (8, 16, 0, 24))
    for d in deltas:
        for m, shift in ((gmap, 8), (rmap, 16), (bmap, 0), (amap, 24)):
            c, ln = m[(d >> shift) & 0xFF]
            bw.write_code(c, ln)
    bw.write(0, 1)          # no more transforms
    # spatial (packed 2x1): indices row = [0,1,2,3, 3,2,1,0]
    packed = [0b11100100, 0b00011011]
    bw.write(0, 1)          # no color cache
    bw.write(0, 1)          # no meta huffman (level 0)
    W._write_simple_code(bw, sorted(set(packed)))   # green: 2 symbols
    W._write_simple_code(bw, [0])   # red
    W._write_simple_code(bw, [0])   # blue
    W._write_simple_code(bw, [255])  # alpha
    W._write_simple_code(bw, [0])   # distance
    lo, hi = sorted(set(packed))
    for g in packed:
        bw.write_code(0 if g == lo else 1, 1)
    out = W.decode_webp(_vp8l_container(bw.bytes()))
    idx = [0, 1, 2, 3, 3, 2, 1, 0]
    expect = np.array([[[(palette[i] >> 16) & 0xFF,
                         (palette[i] >> 8) & 0xFF,
                         palette[i] & 0xFF] for i in idx]], dtype=np.uint8)
    assert np.array_equal(out, expect)


def test_crafted_stream_predictor_and_color_transform():
    """Predictor transform (one tile, mode 7 = Average2(L, T)) and, in a
    second stream, a color transform tile with green_to_red = 16 — both
    with hand-derived expected pixels."""
    # ---- predictor
    w = h = 2
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)          # predictor transform
    bw.write(0, 3)          # size_bits = 2 -> 4x4 blocks -> 1 tile
    # sub-image 1x1: mode 7 in green channel
    bw.write(0, 1)          # no cache
    W._write_simple_code(bw, [7])    # green = mode 7
    W._write_simple_code(bw, [0])    # red
    W._write_simple_code(bw, [0])    # blue
    W._write_simple_code(bw, [255])  # alpha
    W._write_simple_code(bw, [0])    # distance
    # single-symbol codes everywhere: the tile pixel costs 0 bits
    bw.write(0, 1)          # no more transforms
    # spatial residuals: px0=(a=255,r=1,g=2,b=3); others zero residual
    bw.write(0, 1)          # no cache
    bw.write(0, 1)          # no meta huffman (level 0)
    W._write_simple_code(bw, [0, 2])    # green: {0,2}
    W._write_simple_code(bw, [0, 1])    # red
    W._write_simple_code(bw, [0, 3])    # blue
    W._write_simple_code(bw, [0, 255])  # alpha
    W._write_simple_code(bw, [0])       # distance
    # px0: g=2,r=1,b=3,a=255 ; px1..3: all zero
    for g_, r_, b_, a_ in [(1, 1, 1, 1), (0, 0, 0, 0), (0, 0, 0, 0), (0, 0, 0, 0)]:
        bw.write_code(g_, 1)
        bw.write_code(r_, 1)
        bw.write_code(b_, 1)
        bw.write_code(a_, 1)
    out = W.decode_webp(_vp8l_container(bw.bytes()))
    # (0,0): pred 0xFF000000 -> FF,1,2,3 ; (0,1): pred L -> same
    # (1,0): pred T -> same ; (1,1): mode7 avg2(L,T) -> same
    expect = np.tile(np.array([1, 2, 3], dtype=np.uint8), (2, 2, 1))
    assert np.array_equal(out, expect)

    # ---- color transform
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)          # color transform
    bw.write(0, 3)          # size_bits = 2 -> 1 tile
    bw.write(0, 1)          # no cache (sub)
    # cte pixel: g2r=16 in BLUE channel, g2b=0 (green), r2b=0 (red)
    W._write_simple_code(bw, [0])    # green (g2b=0)
    W._write_simple_code(bw, [0])    # red (r2b=0)
    W._write_simple_code(bw, [16])   # blue (g2r=16)
    W._write_simple_code(bw, [255])  # alpha
    W._write_simple_code(bw, [0])    # distance
    bw.write(0, 1)          # no more transforms
    bw.write(0, 1)          # no cache
    bw.write(0, 1)          # no meta huffman (level 0)
    W._write_simple_code(bw, [64])   # green = 64 everywhere
    W._write_simple_code(bw, [10])   # stored red = 10
    W._write_simple_code(bw, [20])   # stored blue = 20
    W._write_simple_code(bw, [255])  # alpha
    W._write_simple_code(bw, [0])    # distance
    # all codes single-symbol: 0 data bits for 4 pixels
    out = W.decode_webp(_vp8l_container(bw.bytes()))
    # delta = (int8(16) * int8(64)) >> 5 = 32 -> red = 10+32 = 42
    expect = np.tile(np.array([42, 64, 20], dtype=np.uint8), (2, 2, 1))
    assert np.array_equal(out, expect)


def test_crafted_stream_meta_huffman_two_groups():
    """8x1 image, meta block size 4 -> a 2x1 entropy image selecting
    different Huffman groups for the two halves."""
    w, h = 8, 1
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)          # no transforms
    bw.write(0, 1)          # no cache
    bw.write(1, 1)          # meta huffman present
    bw.write(0, 3)          # meta_bits = 2 -> blocks of 4
    # entropy image 2x1: group ids in (red<<8 | green) -> greens 0,1
    bw.write(0, 1)          # no cache (sub)
    W._write_simple_code(bw, [0, 1])  # green: ids 0 and 1
    W._write_simple_code(bw, [0])     # red
    W._write_simple_code(bw, [0])     # blue
    W._write_simple_code(bw, [255])   # alpha
    W._write_simple_code(bw, [0])     # distance
    bw.write_code(0, 1)     # tile 0 -> group 0
    bw.write_code(1, 1)     # tile 1 -> group 1
    # group 0: color (10,11,12); group 1: color (20,21,22) — all
    # single-symbol codes, so pixels cost 0 bits and group selection is
    # the ONLY thing steering the output
    for g_, r_, b_ in ((11, 10, 12), (21, 20, 22)):
        W._write_simple_code(bw, [g_])
        W._write_simple_code(bw, [r_])
        W._write_simple_code(bw, [b_])
        W._write_simple_code(bw, [255])
        W._write_simple_code(bw, [0])
    out = W.decode_webp(_vp8l_container(bw.bytes()))
    expect = np.array([[[10, 11, 12]] * 4 + [[20, 21, 22]] * 4], dtype=np.uint8)
    assert np.array_equal(out, expect)


@pytest.mark.skipif(not C.pil_available(), reason="Pillow not installed")
def test_pil_cross_validation():
    """Interop both directions: Pillow decodes our VP8L bytes bit-exact,
    and we decode Pillow's lossless WebP bit-exact."""
    import io

    from PIL import Image

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    pil_dec = np.asarray(Image.open(io.BytesIO(W.encode_webp_lossless(px)))
                         .convert("RGB"))
    assert np.array_equal(pil_dec, px)
    buf = io.BytesIO()
    Image.fromarray(px, "RGB").save(buf, format="WEBP", lossless=True, quality=100)
    assert np.array_equal(W.decode_webp(buf.getvalue()), px)


def test_crafted_stream_predictor_tr_mode_right_edge():
    """Predictor mode 3 (top-right) on a 3-wide image: at the rightmost
    column TR wraps to the FIRST pixel of the CURRENT row (RFC 9649
    §4.2.2 — in flat layout prev_row[w] IS cur_row[0]). Hand-derived
    expected pixels pin the wrap (an earlier draft read the unwritten
    current pixel, i.e. zero)."""
    w, h = 3, 2
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)          # predictor transform
    bw.write(0, 3)          # size_bits = 2 -> 1 tile
    bw.write(0, 1)          # no cache (sub)
    W._write_simple_code(bw, [3])    # green = mode 3 (TR)
    W._write_simple_code(bw, [0])
    W._write_simple_code(bw, [0])
    W._write_simple_code(bw, [255])
    W._write_simple_code(bw, [0])
    bw.write(0, 1)          # no more transforms
    bw.write(0, 1)          # no cache
    bw.write(0, 1)          # no meta huffman
    # greens via a normal code over {0..4} (5 symbols); r/b/a constant
    glens = [0] * (256 + 24)
    for sym in (0, 1, 2, 3, 4):
        glens[sym] = 3
    glens[5] = 2            # Kraft: 5/8 + 1/4 = 7/8 -> add one more
    glens[6] = 3            # 5/8 + 1/4 + 1/8 = 1.0
    W._write_normal_code(bw, glens)
    W._write_simple_code(bw, [0])    # red residual 0
    W._write_simple_code(bw, [0])    # blue residual 0
    W._write_simple_code(bw, [255])  # alpha
    W._write_simple_code(bw, [0])    # distance
    gcodes = W._canonical_codes(glens)
    # residual greens: row0 [2, 1, 1] (row 0 uses L); row1 [0, 0, 3]
    for gsym in (2, 1, 1, 0, 0, 3):
        c, ln = gcodes[gsym]
        bw.write_code(c, ln)
    out = W.decode_webp(_vp8l_container(bw.bytes()))
    g = out[..., 1].astype(int)
    # row0: (0,0) pred black g=0 -> 2; (0,1) L -> 3; (0,2) L -> 4
    assert list(g[0]) == [2, 3, 4]
    # row1: (1,0) col0 uses T -> 2+0=2; (1,1) mode3 TR=g[0][2]=4 -> 4;
    # (1,2) RIGHT EDGE: TR wraps to cur row first pixel g[1][0]=2 -> 2+3=5
    assert list(g[1]) == [2, 4, 5]
