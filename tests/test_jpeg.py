"""Pure-stdlib baseline JPEG codec (sources/jpeg.py — round-3 verdict #2):
spec-derived unit vectors (zig-zag, magnitude coding, canonical Huffman
codes, DCT basis orthonormality), full round-trips at every subsampling
with the PSNR >= 40 dB lossy invariant on photo-spectrum corpora, marker
robustness (restart intervals, 16-bit DQT, grayscale, progressive
rejection), and Pillow cross-validation that skips cleanly where PIL is
absent (the reference fetches and parses real content,
BasicCrawler.java:77-86)."""

from __future__ import annotations

import numpy as np
import pytest

from distributed_webcrawler_spark.sources import codec as C
from distributed_webcrawler_spark.sources import jpeg as J


def photo(i: int, w: int = 48, h: int = 40) -> np.ndarray:
    return C.synth_pixels_photo(f"jpeg-fixture-{i:03d}", w, h)


def test_zigzag_is_a_permutation_and_matches_spec_corners():
    assert sorted(J.ZIGZAG.tolist()) == list(range(64))
    # T.81 Figure 5 corners: scan starts 0,1,8,16,9,2 and ends ...,55,62,63
    assert J.ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert J.ZIGZAG[-4:].tolist() == [47, 55, 62, 63]
    assert np.array_equal(J.ZIGZAG[J.UNZIGZAG], np.arange(64))


def test_dct_basis_orthonormal_and_idct_inverts():
    assert np.allclose(J._T @ J._T.T, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(1)
    b = rng.uniform(-128, 127, size=(8, 8))
    coef = J._T @ b @ J._T.T
    assert np.allclose(J._T.T @ coef @ J._T, b, atol=1e-9)
    # DC coefficient = mean * 8 (T.81 Annex A scaling: S00 = sum/8)
    assert np.isclose(coef[0, 0], b.sum() / 8.0)


def test_magnitude_coding_extend_round_trip():
    # T.81 F.1.2.1 (category/extra bits) must invert via F.2.2.1 EXTEND
    for v in list(range(-300, 301)) + [-32767, 32767]:
        s, extra = J._magnitude(v)
        got = J._extend(extra, s) if s else 0
        assert got == v, (v, s, extra)
        assert s == (0 if v == 0 else abs(v).bit_length())


def test_canonical_huffman_codes_match_spec_table():
    # T.81 Annex C on the K.3.3.1 DC luminance table: 12 symbols, first
    # code of each populated length is doubled-previous (canonical)
    codes = J._canonical_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    assert len(codes) == 12
    assert codes[0] == (0b00, 2)          # category 0 -> 2-bit code 00
    assert codes[1] == (0b010, 3)
    assert codes[5] == (0b110, 3)
    assert codes[6] == (0b1110, 4)
    assert codes[11] == (0b111111110, 9)
    # prefix-free over the whole AC luma table (162 symbols)
    ac = J._canonical_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    assert len(ac) == 162
    bits = sorted(format(c, f"0{n}b") for c, n in ac.values())
    for a, b in zip(bits, bits[1:]):
        assert not b.startswith(a)


def test_quality_scaling_is_the_public_ijg_rule():
    q50 = J._scaled_quant(J.QUANT_LUMA, 50)
    assert np.array_equal(q50, J.QUANT_LUMA)  # scale 100 = identity
    q100 = J._scaled_quant(J.QUANT_LUMA, 100)
    assert q100.max() <= 2 and q100.min() >= 1
    q10 = J._scaled_quant(J.QUANT_LUMA, 10)
    assert q10.max() == 255  # clipped coarse tables


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
@pytest.mark.parametrize("dims", [(12, 12), (16, 24), (17, 31), (40, 48), (57, 33)])
def test_round_trip_psnr_over_40db_photo_spectrum(sub, dims):
    """BASELINE.json per-row invariant: decoded-pixel PSNR >= 40 dB for
    lossy formats, on corpora with a real photo's spectral shape."""
    h, w = dims
    px = C.synth_pixels_photo(f"rt-{sub}-{w}x{h}", w, h)
    dec = J.decode_jpeg(J.encode_jpeg(px, quality=95, subsampling=sub))
    assert dec.shape == px.shape and dec.dtype == np.uint8
    assert C.psnr(px, dec) >= 40.0, (sub, dims)


def test_near_lossless_at_quality_100():
    px = photo(1)
    dec = J.decode_jpeg(J.encode_jpeg(px, quality=100, subsampling="4:4:4"))
    assert C.psnr(px, dec) >= 50.0


def test_noise_degrades_gracefully_not_catastrophically():
    """iid noise is the transform-codec worst case: it must still decode
    to the right shape with bounded error (~30 dB), never crash."""
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(noise, quality=90, subsampling="4:4:4"))
    assert 25.0 <= C.psnr(noise, dec) <= 40.0


def test_flat_image_is_tiny_and_exact():
    px = np.full((24, 24, 3), 77, dtype=np.uint8)
    enc = J.encode_jpeg(px, quality=90)
    dec = J.decode_jpeg(enc)
    assert np.abs(dec.astype(int) - 77).max() <= 1
    assert len(enc) < 900  # DC-only blocks: all-EOB entropy data


def test_decoder_handles_entropy_path_exactly():
    """The entropy layer (Huffman + byte stuffing + DC prediction) must be
    LOSSLESS: decode(encode) equals the bare quantize->dequantize math
    pipeline bit-for-bit."""
    px = photo(2, 24, 16)
    q = 90
    ycc = J._rgb_to_ycbcr(px)
    qy = J._scaled_quant(J.QUANT_LUMA, q)
    qc = J._scaled_quant(J.QUANT_CHROMA, q)
    y = J._pad_to(ycc[..., 0], 8, 8)
    cb = J._pad_to(ycc[..., 1], 8, 8)
    cr = J._pad_to(ycc[..., 2], 8, 8)
    ph, pw = y.shape
    rec = J._ycbcr_to_rgb(
        J._dequant_idct(J._fdct_quant(y, qy), qy, ph, pw)[:16, :24],
        J._dequant_idct(J._fdct_quant(cb, qc), qc, ph, pw)[:16, :24],
        J._dequant_idct(J._fdct_quant(cr, qc), qc, ph, pw)[:16, :24])
    dec = J.decode_jpeg(J.encode_jpeg(px, quality=q, subsampling="4:4:4"))
    assert np.array_equal(dec, rec)


def test_progressive_and_junk_rejected():
    px = photo(3, 16, 16)
    enc = bytearray(J.encode_jpeg(px))
    # flip SOF0 (FFC0) to SOF2 (FFC2): decoder must refuse, naming Pillow
    i = bytes(enc).find(b"\xFF\xC0")
    enc[i + 1] = 0xC2
    with pytest.raises(J.JpegError, match="progressive"):
        J.decode_jpeg(bytes(enc))
    with pytest.raises(J.JpegError):
        J.decode_jpeg(b"\xFF\xD8\xFF\xD9")
    with pytest.raises(J.JpegError):
        J.decode_jpeg(b"not a jpeg at all")


def test_truncated_entropy_raises_not_garbage():
    enc = J.encode_jpeg(photo(4, 32, 32), quality=90)
    with pytest.raises(J.JpegError):
        J.decode_jpeg(enc[: len(enc) // 2])


def test_decode_image_magic_sniff_routes_jpeg():
    """codec.decode_image dispatches \\xff\\xd8 to the stdlib decoder, so
    real JPEG, real PNG, and DWS1 payloads mix in ONE corpus through the
    same Arrow decode stage."""
    px = photo(5, 20, 20)
    arr, fmt = C.decode_image(J.encode_jpeg(px, quality=95, subsampling="4:4:4"))
    assert fmt == "jpeg" and arr.shape == px.shape
    assert C.psnr(px, arr) >= 40.0
    arr2, fmt2 = C.decode_image(C.encode_png(px))
    assert fmt2 == "png" and np.array_equal(arr2, px)
    arr3, fmt3 = C.decode_image(C.encode_image(px, "jpeg"))
    assert fmt3 == "jpeg"  # DWS1 stand-in still decodes


def test_encode_image_real_jpeg_no_longer_needs_pillow():
    px = photo(6, 28, 20)
    data = C.encode_image_real(px, "jpeg")
    assert data[:3] == b"\xFF\xD8\xFF"
    arr, fmt = C.decode_image(data)
    assert fmt == "jpeg" and C.psnr(px, arr) >= 40.0


def test_grayscale_single_component_decodes():
    """1-component JPEGs (common for thumbnails) decode to replicated RGB."""
    px = photo(7, 24, 24)
    enc = bytearray(J.encode_jpeg(px, quality=95, subsampling="4:4:4"))
    # hand-build a grayscale stream: re-encode luma only via the encoder's
    # own pieces (SOF with 1 component, scan of Y blocks alone)
    ycc = J._rgb_to_ycbcr(px)
    y = J._pad_to(ycc[..., 0], 8, 8)
    qy = J._scaled_quant(J.QUANT_LUMA, 95)
    zz = J._fdct_quant(y, qy)
    dc = J._canonical_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac = J._canonical_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    bw = J._BitWriter()
    J._encode_blocks(bw, zz, dc, ac, 0)
    bw.pad_to_byte()
    import struct

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")
    out += seg(0xFFDB, b"\x00" + bytes(qy[J.ZIGZAG].astype(np.uint8)))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, 24, 24, 1) + bytes([1, 0x11, 0]))
    out += seg(0xFFC4, bytes([0x00]) + bytes(J.DC_LUMA_BITS) + bytes(J.DC_LUMA_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(J.AC_LUMA_BITS) + bytes(J.AC_LUMA_VALS))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.buf + b"\xFF\xD9"
    dec = J.decode_jpeg(bytes(out))
    assert dec.shape == (24, 24, 3)
    assert np.array_equal(dec[..., 0], dec[..., 1])
    gray_ref = np.clip(ycc[..., 0].round(), 0, 255)
    assert np.abs(dec[..., 0].astype(float) - gray_ref).mean() < 3.0
    assert len(enc) > 0  # (the color stream built above stays valid too)


def test_restart_markers_decode_and_reset_predictors():
    """DRI/RSTn: split the entropy data into restart intervals — decoders
    must reset DC predictors at each RST (T.81 F.2.1.3.1)."""
    px = photo(8, 32, 16)
    enc = J.encode_jpeg(px, quality=95, subsampling="4:4:4")
    base = J.decode_jpeg(enc)
    # rebuild the same stream with DRI=1: re-encode per-MCU intervals
    ycc = J._rgb_to_ycbcr(px)
    qy = J._scaled_quant(J.QUANT_LUMA, 95)
    qc = J._scaled_quant(J.QUANT_CHROMA, 95)
    planes = [J._pad_to(ycc[..., i], 8, 8) for i in range(3)]
    zzs = [J._fdct_quant(planes[0], qy), J._fdct_quant(planes[1], qc),
           J._fdct_quant(planes[2], qc)]
    tabs = [(J._canonical_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS),
             J._canonical_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS)),
            (J._canonical_codes(J.DC_CHROMA_BITS, J.DC_CHROMA_VALS),
             J._canonical_codes(J.AC_CHROMA_BITS, J.AC_CHROMA_VALS))]
    n_bx, n_by = 32 // 8, 16 // 8
    entropy = bytearray()
    for m in range(n_by * n_bx):
        my, mx = divmod(m, n_bx)
        bi = my * n_bx + mx
        bw = J._BitWriter()
        # DC predictors reset at every interval: pred starts at 0
        J._encode_blocks(bw, zzs[0][bi:bi + 1], *tabs[0], 0)
        J._encode_blocks(bw, zzs[1][bi:bi + 1], *tabs[1], 0)
        J._encode_blocks(bw, zzs[2][bi:bi + 1], *tabs[1], 0)
        bw.pad_to_byte()
        entropy += bw.buf
        if m != n_by * n_bx - 1:
            entropy += bytes([0xFF, 0xD0 + (m % 8)])
    import struct

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")
    out += seg(0xFFDB, b"\x00" + bytes(qy[J.ZIGZAG].astype(np.uint8)))
    out += seg(0xFFDB, b"\x01" + bytes(qc[J.ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, 16, 32, 3)
    sof += bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, bytes([0x00]) + bytes(J.DC_LUMA_BITS) + bytes(J.DC_LUMA_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(J.AC_LUMA_BITS) + bytes(J.AC_LUMA_VALS))
    out += seg(0xFFC4, bytes([0x01]) + bytes(J.DC_CHROMA_BITS) + bytes(J.DC_CHROMA_VALS))
    out += seg(0xFFC4, bytes([0x11]) + bytes(J.AC_CHROMA_BITS) + bytes(J.AC_CHROMA_VALS))
    out += seg(0xFFDD, struct.pack(">H", 1))
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += entropy + b"\xFF\xD9"
    dec = J.decode_jpeg(bytes(out))
    assert np.array_equal(dec, base)


def test_pil_cross_validation():
    """Where Pillow exists: PIL must decode OUR bitstream and we must
    decode PIL's, both at PSNR >= 35 dB vs the source (different decoders
    legitimately differ in upsampling/rounding)."""
    if not C.pil_available():
        pytest.skip("Pillow not installed in this container (recorded "
                    "blocker; runs on any host with PIL)")
    import io

    from PIL import Image

    px = photo(9, 40, 32)
    pil_dec = np.asarray(
        Image.open(io.BytesIO(J.encode_jpeg(px, quality=95))).convert("RGB"))
    assert C.psnr(px, pil_dec) >= 35.0
    buf = io.BytesIO()
    Image.fromarray(px, "RGB").save(buf, format="JPEG", quality=95)
    ours = J.decode_jpeg(buf.getvalue())
    assert C.psnr(px, ours) >= 35.0
