"""Unit tests: REAL baseline JPEG codec (operators/jpeg.py) — encode
and decode are independent walks through the same spec (standard
Annex K tables, 4:4:4), so round-trip PSNR bounds plus exact header
dims pin both sides. JPEG is lossy: no SQL oracle can recompute
pixels, so the bounds here are the contract."""

from __future__ import annotations

import numpy as np
import pytest

from skopje_spark.operators.jpeg import (
    decode_jpeg_header,
    encode_jpeg,
    is_jpeg,
    jpeg_pixels,
    make_jpeg,
    psnr,
)
from skopje_spark.operators.multimodal import bmp_pattern


def _smooth(w=32, h=24):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [(xx * 4) % 256, (yy * 6) % 256, ((xx + yy) * 3) % 256], -1
    ).astype("uint8")


def test_jpeg_roundtrip_rgb_psnr():
    src = _smooth()
    b = encode_jpeg(src)
    assert is_jpeg(b)
    assert decode_jpeg_header(b) == (32, 24, 3)
    dec = jpeg_pixels(b)
    assert dec.shape == (24, 32, 3)
    assert psnr(src, dec) > 35


def test_jpeg_roundtrip_gray_and_odd_dims():
    xx, yy = np.meshgrid(np.arange(32), np.arange(24))
    g = ((xx * 5 + yy * 7) % 256).astype("uint8")
    bg = encode_jpeg(g)
    assert decode_jpeg_header(bg) == (32, 24, 1)
    assert psnr(g[:, :, None], jpeg_pixels(bg)) > 28
    # dimensions not multiples of 8: edge-replicated blocks, exact dims
    pat = bmp_pattern(13, 11, seed=2)[:, :, ::-1]
    bo = encode_jpeg(pat)
    assert decode_jpeg_header(bo) == (13, 11, 3)
    dec = jpeg_pixels(bo)
    assert dec.shape == (11, 13, 3)
    assert psnr(pat, dec) > 30


def test_jpeg_constant_image_near_exact():
    c = np.full((16, 16, 3), 77, "uint8")
    dec = jpeg_pixels(encode_jpeg(c))
    # one DC coefficient per block; quantization may shift it by ±1
    assert psnr(c, dec) > 40
    assert np.all(np.abs(dec.astype(int) - 77) <= 1)


def test_jpeg_sniff_and_refusals():
    from skopje_spark.operators.multimodal import make_bmp

    assert not is_jpeg(make_bmp(8, 8))
    assert not is_jpeg(b"")
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg_header(b"\x00\x01")
    # frames genuinely outside the supported set refuse BY NAME
    b = bytearray(make_jpeg(16, 16))
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC3
    with pytest.raises(ValueError, match="lossless"):
        decode_jpeg_header(bytes(b))
    b[i + 1] = 0xC9
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg_header(bytes(b))
    # progressive SOF2 is now ACCEPTED at header level
    b[i + 1] = 0xC2
    assert decode_jpeg_header(bytes(b)) == (16, 16, 3)
    # 12-bit precision refuses loudly at decode
    b[i + 1] = 0xC0
    b[i + 4] = 12
    with pytest.raises(ValueError, match="12-bit"):
        jpeg_pixels(bytes(b))


def test_jpeg_subsampled_roundtrips():
    """4:2:0 and 4:2:2 encode→decode at useful fidelity on smooth
    content, at exact dims, for even and odd sizes — the dominant
    real-world crawl-JPEG layouts."""
    for w, h in [(32, 24), (37, 29), (16, 16), (13, 11)]:
        src = _smooth(w, h)
        for sub in ("4:2:0", "4:2:2"):
            b = encode_jpeg(src, subsampling=sub)
            assert decode_jpeg_header(b) == (w, h, 3)
            dec = jpeg_pixels(b)
            assert dec.shape == (h, w, 3)
            assert psnr(src, dec) > 25, (w, h, sub, psnr(src, dec))


def test_jpeg_progressive_decodes_identical_to_sequential():
    """Progressive (SOF2, spectral selection + successive
    approximation) carries the SAME quantized coefficients as the
    sequential encoding — the decoded pixels must be BIT-IDENTICAL,
    across subsampling layouts, odd dims, and grayscale."""
    for w, h in [(32, 24), (37, 29), (50, 21)]:
        src = bmp_pattern(w, h, seed=4)[:, :, ::-1]
        for sub in ("4:4:4", "4:2:2", "4:2:0"):
            seq = jpeg_pixels(encode_jpeg(src, subsampling=sub))
            pro = jpeg_pixels(
                encode_jpeg(src, subsampling=sub, progressive=True)
            )
            assert np.array_equal(seq, pro), (w, h, sub)
    g = bmp_pattern(33, 17, seed=1)[:, :, 0]
    assert np.array_equal(
        jpeg_pixels(encode_jpeg(g, progressive=True)),
        jpeg_pixels(encode_jpeg(g)),
    )


def test_jpeg_restart_intervals_decode_identical():
    """DRI/RSTn streams (byte-aligned predictor resets) decode
    bit-identically to the marker-free encoding."""
    src = bmp_pattern(40, 26, seed=5)[:, :, ::-1]
    for sub in ("4:4:4", "4:2:0"):
        base = jpeg_pixels(encode_jpeg(src, subsampling=sub))
        for ri in (1, 2, 5):
            b = encode_jpeg(src, subsampling=sub, restart_interval=ri)
            assert b"\xff\xdd" in b  # DRI present
            assert np.array_equal(jpeg_pixels(b), base), (sub, ri)
    with pytest.raises(ValueError, match="progressive"):
        encode_jpeg(src, progressive=True, restart_interval=2)


def test_jpeg_bytes_are_standard_jfif():
    """Marker-level sanity: SOI, JFIF APP0, two DQTs, SOF0, four DHTs,
    SOS, EOI — the exact segment set a stock decoder expects."""
    b = make_jpeg(24, 16, seed=3)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    assert b[2:4] == b"\xff\xe0" and b[6:11] == b"JFIF\x00"
    assert b.count(b"\xff\xdb") >= 2  # DQT luma + chroma
    assert b.count(b"\xff\xc4") >= 4  # 4 Huffman tables
    assert b"\xff\xc0" in b and b"\xff\xda" in b


def test_jpeg_decode_media_integration(spark):
    """decode_media sniffs JPEG: real header dims for JPEG payloads in
    a mixed batch."""
    import pandas as pd

    from skopje_spark.operators.multimodal import decode_media_bmp, make_png

    out = decode_media_bmp(
        pd.Series([make_jpeg(20, 12), make_png(9, 7), b"zz"])
    )
    assert (out["width"].iloc[0], out["height"].iloc[0]) == (20, 12)
    assert (out["width"].iloc[1], out["height"].iloc[1]) == (9, 7)


def test_jpeg_perceptual_hash_near_dup_across_recompression():
    """The canonical pHash/dHash use: the SAME image as lossless BMP
    and lossy JPEG hashes within a small Hamming distance, while a
    structurally different image stays far — the cross-format
    recompression near-dup signal the Hamming-band sweep clusters on.
    Structured gradients, not the modular noise pattern (noise is
    perceptually self-similar and would not separate)."""
    import numpy as np

    from skopje_spark.operators.multimodal import (
        dhash_hex,
        encode_bmp,
        phash_hex,
    )

    def ham(a: str, b: str) -> int:
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    xx, yy = np.meshgrid(np.arange(32), np.arange(24))
    # smooth 2D quadratic "blobs": spectral energy spread across many
    # low frequencies in BOTH axes. A 1D linear ramp is degenerate for
    # pHash — all but its first DCT row is ±ε, so the median threshold
    # flips near-zero bits on requantization noise and the distance is
    # a coin toss, not a perceptual signal.
    blob_a = (((xx - 10) ** 2 + (yy - 8) ** 2) // 2) % 256
    blob_b = (((xx - 25) ** 2 + 2 * (yy - 18) ** 2) // 3) % 256
    horiz = np.stack([blob_a] * 3, -1).astype("uint8")
    vert = np.stack([blob_b] * 3, -1).astype("uint8")
    bmp = encode_bmp(horiz)
    jpg = encode_jpeg(horiz[:, :, ::-1])  # same image, lossy container
    other = encode_bmp(vert)
    # dHash (gradient sign) is exactly preserved through recompression
    assert ham(dhash_hex(bmp), dhash_hex(jpg)) <= 8
    assert ham(dhash_hex(bmp), dhash_hex(other)) > 16
    # pHash thresholds near-zero AC terms that JPEG noise can flip —
    # the contract is SEPARATION: the recompressed twin is strictly
    # closer than a different image, with margin
    near = ham(phash_hex(bmp), phash_hex(jpg))
    far = ham(phash_hex(bmp), phash_hex(other))
    assert near + 8 <= far, (near, far)


def test_resize_media_jpeg_path(spark):
    """resize_media sniffs JPEG: decode → nearest-neighbor remap →
    re-encode, still a valid JPEG at the target dims."""
    import pandas as pd

    from skopje_spark.operators.jpeg import decode_jpeg_header
    from skopje_spark.operators.multimodal import resize_media

    def attach(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [make_jpeg(24, 16, seed=int(i)) for i in ids],
            })

    d = spark.range(5).selectExpr("id AS doc_id").mapInPandas(
        attach, schema="doc_id long, payload binary"
    )
    rows = resize_media(d, width=10, height=6).collect()
    for r in rows:
        assert decode_jpeg_header(bytes(r["payload"]))[:2] == (10, 6)


def test_jpeg_progressive_refine_zrl_history_patterns(monkeypatch):
    """Entropy-layer regression: a HISTORY coefficient (|v|>1 at the
    refinement scan) positioned beyond the 16th zero of a >15-zero run
    must not desynchronize the AC-refinement bitstream — pending ZRLs
    drain at EVERY nonzero coefficient, history included, before its
    correction bit buffers (the spec G.7 flow). Coefficients are
    injected directly under the encoder (monkeypatched _plane_coefs)
    so the exact adversarial zigzag patterns are pinned, not left to
    the DCT's mercy."""
    import numpy as np

    import skopje_spark.operators.jpeg as J

    patterns = [
        {0: 5, 20: 2, 25: 1},            # history after 19 zeros, then NS
        {0: -3, 5: 2, 25: 1},            # history inside the first 16
        {0: 1, 20: -2, 25: -1},          # negative twins of the above
        {0: 0, 40: 3, 63: 1},            # deep history, NS at band end
        {0: 2, 18: 2, 19: 2, 40: 1},     # two history coefs mid-run
        {0: 7, 20: 2},                   # history only → EOB-run carry
        {0: 7, 35: 1},                   # NS only after a long run
        {0: 0, 1: 1, 63: 2},             # NS first, trailing history
    ]
    for pat in patterns:
        crafted = np.zeros((1, 1, 64), dtype=np.int64)
        for k, v in pat.items():
            crafted[0, 0, k] = v
        monkeypatch.setattr(
            J, "_plane_coefs", lambda p, q, c=crafted: c.copy()
        )
        g = np.zeros((8, 8), dtype=np.uint8)
        seq = J.jpeg_pixels(J.encode_jpeg(g))
        pro = J.jpeg_pixels(J.encode_jpeg(g, progressive=True))
        assert np.array_equal(seq, pro), pat


def test_jpeg_no_scan_data_refuses():
    """A stream with a valid SOF but zero entropy data must refuse —
    all-zero coefficient planes would fabricate a flat image."""
    b = make_jpeg(16, 16)
    i = b.find(b"\xff\xda")
    truncated = b[:i] + b"\xff\xd9"
    with pytest.raises(ValueError, match="no scan data"):
        jpeg_pixels(truncated)
