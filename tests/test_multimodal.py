

def test_bmp_real_decode_mixed_corpus(spark):
    """One decode pass over a mixed corpus: BMP payloads yield REAL
    header dimensions, opaque payloads fall back to stub arithmetic."""
    from skopje_spark.operators.multimodal import decode_media, make_bmp

    rows = [
        (1, make_bmp(20, 11, seed=3)),
        (2, b"not an image at all, just bytes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    # real=False pins the sniffing BMP kernel: with PIL installed the
    # auto kernel would be decode_media_real, which cannot open the
    # deliberately-opaque second payload
    got = {r["doc_id"]: r for r in decode_media(df, real=False).collect()}
    assert (got[1]["width"], got[1]["height"]) == (20, 11)  # real decode
    assert got[1]["byte_len"] == 54 + 11 * ((3 * 20 + 3) // 4 * 4)
    assert got[2]["width"] == ((rows[1][1][0] % 64) + 1) * 16  # stub path


def test_bmp_real_resize_preserves_pattern(spark):
    """resize_media on BMP payloads is a real nearest-neighbor
    resample: output is a valid BMP at target size whose (0,0) pixel
    equals the source's (0,0) pixel."""
    from skopje_spark.operators.multimodal import (
        bmp_pixels,
        decode_bmp_header,
        make_bmp,
        resize_media,
    )

    src = make_bmp(24, 16, seed=7)
    df = spark.createDataFrame([(1, src)], "doc_id long, payload binary")
    out = resize_media(df, width=10, height=6).collect()[0]
    b = bytes(out["payload"])
    assert decode_bmp_header(b)[:2] == (10, 6)
    assert (bmp_pixels(b)[0, 0] == bmp_pixels(src)[0, 0]).all()


def test_bmp_roundtrip_property():
    """Encode→decode is the identity on pixels for arbitrary sizes
    (including widths whose rows need 1-3 padding bytes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from skopje_spark.operators.multimodal import (
        bmp_pattern,
        bmp_pixels,
        decode_bmp_header,
        make_bmp,
        resize_bmp,
    )

    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=40),
        seed=st.integers(min_value=0, max_value=255),
    )
    @settings(max_examples=40, deadline=None)
    def check(w, h, seed):
        b = make_bmp(w, h, seed)
        assert decode_bmp_header(b)[:2] == (w, h)
        assert (bmp_pixels(b) == bmp_pattern(w, h, seed)).all()
        r = resize_bmp(b, max(1, w // 2), max(1, h // 2))
        assert decode_bmp_header(r)[:2] == (max(1, w // 2), max(1, h // 2))

    check()


def test_bmp_top_down_variant_not_mirrored():
    """Negative biHeight (top-down storage, the Windows-encoder
    variant) must decode in correct row order, not vertically
    mirrored."""
    import struct

    import numpy as np

    from skopje_spark.operators.multimodal import bmp_pattern, bmp_pixels, encode_bmp

    px = bmp_pattern(6, 4, seed=9)
    b = bytearray(encode_bmp(px))
    # flip to top-down: negate biHeight and store rows top-first
    struct.pack_into("<i", b, 22, -4)
    rows = np.zeros((4, (3 * 6 + 3) // 4 * 4), dtype="uint8")
    rows[:, : 18] = px.reshape(4, 18)
    b[54:] = rows.tobytes()
    assert (bmp_pixels(bytes(b)) == px).all()


def test_bmp_sniff_tolerates_real_world_bfsize():
    """Encoders commonly write 0 (or a padded value) into bfSize; the
    sniff must still route such payloads to the real kernel (advice
    r5): magic + coherent header + pixel data fitting the buffer is
    the contract, not bfSize equality."""
    import struct

    from skopje_spark.operators.multimodal import bmp_pattern, bmp_pixels, encode_bmp, is_bmp

    px = bmp_pattern(10, 7, seed=4)
    b = bytearray(encode_bmp(px))
    struct.pack_into("<I", b, 2, 0)  # bfSize = 0, like many real encoders
    assert is_bmp(bytes(b))
    assert (bmp_pixels(bytes(b)) == px).all()
    struct.pack_into("<I", b, 2, len(b) + 512)  # padded declared size
    assert is_bmp(bytes(b))


def test_bmp_sniff_rejects_incoherent_headers():
    """The relaxed sniff still rejects payloads the kernel cannot
    decode: bad magic, truncated pixel data, compressed 24bpp,
    absurd dimensions, out-of-range pixel offset."""
    import struct

    from skopje_spark.operators.multimodal import bmp_pattern, encode_bmp, is_bmp

    good = bytearray(encode_bmp(bmp_pattern(8, 5, seed=1)))
    assert is_bmp(bytes(good))

    assert not is_bmp(b"")
    assert not is_bmp(b"PK" + bytes(good[2:]))          # wrong magic
    assert not is_bmp(bytes(good[:-10]))                # truncated pixels

    compressed = bytearray(good)
    struct.pack_into("<I", compressed, 30, 1)           # BI_RLE8
    assert not is_bmp(bytes(compressed))

    huge = bytearray(good)
    struct.pack_into("<i", huge, 18, 1 << 24)           # absurd width
    assert not is_bmp(bytes(huge))

    bad_off = bytearray(good)
    struct.pack_into("<I", bad_off, 10, len(good) + 1)  # offset past end
    assert not is_bmp(bytes(bad_off))


def _ham(a: str, b: str) -> int:
    return bin(int(a, 16) ^ int(b, 16)).count("1")


def test_phash_identical_resize_and_separation():
    """Perceptual hashes (multimodal.dhash_hex/phash_hex): identical
    images hash identically; an exact 2x nearest-neighbor upscale is
    hash-INVARIANT (the floor-index sample maps compose: sampling the
    upscale hits the same source pixels); distinct noise images are
    far apart; a single perturbed pixel moves the hash by at most a
    couple of bits (still a near-dup at distance <= 3)."""
    from skopje_spark.operators.multimodal import (
        bmp_noise_pattern,
        dhash_hex,
        encode_bmp,
        make_noise_bmp,
        phash_hex,
        resize_bmp,
    )

    b1 = make_noise_bmp(12, 10, seed=3)
    assert dhash_hex(b1) == dhash_hex(make_noise_bmp(12, 10, seed=3))
    assert phash_hex(b1) == phash_hex(make_noise_bmp(12, 10, seed=3))

    big = resize_bmp(b1, 24, 20)
    assert _ham(dhash_hex(b1), dhash_hex(big)) == 0
    assert _ham(phash_hex(b1), phash_hex(big)) == 0

    for other_seed in (7, 17, 29):
        b2 = make_noise_bmp(12, 10, seed=other_seed)
        assert _ham(dhash_hex(b1), dhash_hex(b2)) > 8
        assert _ham(phash_hex(b1), phash_hex(b2)) > 8

    px = bmp_noise_pattern(12, 10, 3).copy()
    px[5, 6, :] = (px[5, 6, :].astype(int) + 120) % 256
    d = _ham(dhash_hex(b1), dhash_hex(encode_bmp(px)))
    assert 1 <= d <= 3


def test_image_neardup_pairs_banding_exact(spark):
    """Hamming-band LSH (multimodal.image_neardup_pairs) finds EVERY
    pair at distance <= 3 (pigeonhole-exact with 4 bands) and never
    emits a pair above the cap; the brute-force pair set over the
    collected hashes is the ground truth."""
    from itertools import combinations

    from skopje_spark.operators.multimodal import (
        attach_noise_bmp_payload,
        image_neardup_pairs,
        image_phash,
    )

    from pyspark.sql import functions as F

    d = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    hashes = image_phash(
        attach_noise_bmp_payload(d, "doc_id"), id_col="doc_id",
        payload_col="payload",
    )
    rows = {r["doc_id"]: r["phash"] for r in hashes.collect()}
    want = {
        (a, b)
        for a, b in combinations(sorted(rows), 2)
        if _ham(rows[a], rows[b]) <= 3
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in image_neardup_pairs(
            hashes, id_col="doc_id", max_dist=3, bands=4
        ).collect()
    }
    assert got == want and want  # non-vacuous: mod-32 classes collide

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bands"):
        image_neardup_pairs(hashes, id_col="doc_id", max_dist=4, bands=4)


def test_audio_fingerprint_robustness_and_pairing(spark):
    """Energy-gradient audio fingerprint (operators/audio.py):
    deterministic; amplitude-invariant (half-volume and mildly noisy
    copies land within the Hamming-band sweep's max_dist); clips with
    different waveforms separate by many bits; the shared band sweep
    finds exactly the identical-clip pairs."""
    import numpy as np
    import pytest

    from skopje_spark.operators.audio import (
        audio_fingerprint,
        audio_fingerprint_hex,
        encode_wav,
        make_wav,
        wav_samples,
    )
    from skopje_spark.operators.multimodal import image_neardup_pairs

    a = make_wav(300, seed=5)
    assert audio_fingerprint_hex(a) == audio_fingerprint_hex(make_wav(300, seed=5))

    def ham(x, y):
        return bin(int(x, 16) ^ int(y, 16)).count("1")

    half = encode_wav(
        np.round(wav_samples(a).astype("float64") * 0.5).astype("int16")
    )
    assert ham(audio_fingerprint_hex(a), audio_fingerprint_hex(half)) <= 3
    rng = np.random.RandomState(0)
    noisy = encode_wav(
        np.clip(
            np.round(wav_samples(a).astype("float64") * 0.9
                     + rng.normal(0, 30, 300)),
            -32768, 32767,
        ).astype("int16")
    )
    assert ham(audio_fingerprint_hex(a), audio_fingerprint_hex(noisy)) <= 3
    other = make_wav(300, seed=9)
    assert ham(audio_fingerprint_hex(a), audio_fingerprint_hex(other)) >= 8

    rows = [
        (1, a), (2, make_wav(300, seed=5)),  # identical pair
        (3, other), (4, make_wav(280, seed=2)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fps = audio_fingerprint(df, id_col="doc_id", payload_col="payload")
    pairs = image_neardup_pairs(
        fps, id_col="doc_id", hash_col="afp", max_dist=3, bands=4
    ).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(1, 2, 0)]

    with pytest.raises(ValueError, match="too short"):
        audio_fingerprint_hex(make_wav(50, seed=1))


# ---------------------------------------------------------------- PNG

def test_png_roundtrip_all_layouts():
    """encode→decode is pixel-exact for gray / gray+alpha / RGB / RGBA
    — a REAL zlib DEFLATE round-trip, no codec libraries."""
    import numpy as np

    from skopje_spark.operators.multimodal import (
        bmp_pattern,
        decode_png_header,
        encode_png,
        is_png,
        png_pixels,
    )

    rgb = bmp_pattern(13, 7, seed=5)[:, :, ::-1]
    for px in (
        rgb,
        (rgb.sum(axis=2) // 3).astype("uint8"),                 # gray
        np.dstack([(rgb.sum(axis=2) // 3).astype("uint8"),
                   np.full(rgb.shape[:2], 9, "uint8")]),        # gray+A
        np.dstack([rgb, np.full(rgb.shape[:2], 200, "uint8")]), # RGBA
    ):
        b = encode_png(px)
        assert is_png(b)
        w, h, depth, c = decode_png_header(b)
        assert (w, h, depth) == (13, 7, 8)
        got = png_pixels(b)
        want = px if px.ndim == 3 else px[:, :, None]
        assert np.array_equal(got, want)


def test_png_all_five_filters_reconstruct():
    """A PNG whose scanlines cycle through filters 0-4 (None/Sub/Up/
    Average/Paeth) decodes pixel-exactly — the filter spec implemented
    for real, not just our own filter-0 files."""
    import struct
    import zlib

    import numpy as np

    from skopje_spark.operators.multimodal import bmp_pattern, png_pixels

    px = bmp_pattern(11, 10, seed=3)[:, :, ::-1]
    h, w, c = px.shape
    flat = px.astype(np.int64).reshape(h, w * c)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int64)
    for r in range(h):
        ft = r % 5
        raw.append(ft)
        row = flat[r]
        left = np.concatenate([np.zeros(c, np.int64), row[:-c]])
        upleft = np.concatenate([np.zeros(c, np.int64), prev[:-c]])
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = (row - left) & 0xFF
        elif ft == 2:
            enc = (row - prev) & 0xFF
        elif ft == 3:
            enc = (row - (left + prev) // 2) & 0xFF
        else:
            p = left + prev - upleft
            pa, pb, pc = (
                np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc), left,
                np.where(pb <= pc, prev, upleft),
            )
            enc = (row - pred) & 0xFF
        raw.extend(enc.astype("uint8").tobytes())
        prev = row

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    b = (b"\x89PNG\r\n\x1a\n"
         + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
         + chunk(b"IDAT", zlib.compress(bytes(raw)))
         + chunk(b"IEND", b""))
    assert np.array_equal(png_pixels(b), px)


def test_png_resize_and_format_invariant_hashes():
    import numpy as np

    from skopje_spark.operators.multimodal import (
        decode_png_header,
        dhash_hex,
        make_bmp,
        make_png,
        media_pixels,
        phash_hex,
        resize_png,
    )

    png = make_png(16, 12, seed=3)
    small = resize_png(png, 5, 3)
    assert decode_png_header(small)[:2] == (5, 3)
    bmp = make_bmp(16, 12, seed=3)
    # same pattern, two containers: identical pixels and hashes
    assert np.array_equal(media_pixels(bmp), media_pixels(png))
    assert dhash_hex(bmp) == dhash_hex(png)
    assert phash_hex(bmp) == phash_hex(png)


def test_png_sniff_rejects_non_png():
    from skopje_spark.operators.multimodal import is_png, make_bmp

    assert not is_png(b"")
    assert not is_png(b"\x89PNG\r\n\x1a\n" + b"garbage")
    assert not is_png(make_bmp(8, 8))


def test_decode_media_sniffs_mixed_batch(spark):
    """BMP, PNG, and opaque payloads in ONE batch: real headers for
    both codecs, stub arithmetic for the rest."""
    import pandas as pd

    from skopje_spark.operators.multimodal import (
        decode_media_bmp,
        make_bmp,
        make_png,
    )

    payloads = pd.Series([make_bmp(10, 6), make_png(12, 9), b"opaque!!"])
    out = decode_media_bmp(payloads)
    assert (out["width"].iloc[0], out["height"].iloc[0]) == (10, 6)
    assert (out["width"].iloc[1], out["height"].iloc[1]) == (12, 9)
    assert out["n_frames"].iloc[2] == (8 % 8) + 1  # stub arithmetic


def test_resize_media_png_path(spark):
    from skopje_spark.operators.multimodal import (
        attach_png_payload,
        decode_media,
        resize_media,
    )

    d = spark.range(6).selectExpr("id AS doc_id")
    m = attach_png_payload(d, "doc_id")
    r = resize_media(m, width=5, height=4)
    dec = decode_media(r).select("doc_id", "width", "height").collect()
    assert all(row["width"] == 5 and row["height"] == 4 for row in dec)


# ---------------------------------------------------------------- GIF

def test_gif_roundtrip_and_header():
    import numpy as np

    from skopje_spark.operators.multimodal import (
        decode_gif_header,
        gif_frames,
        gif_pattern,
        is_gif,
        make_gif,
    )

    b = make_gif(19, 11, 4, seed=7)
    assert is_gif(b)
    assert decode_gif_header(b) == (19, 11, 4)
    frames = gif_frames(b)
    assert len(frames) == 4
    for f, fr in enumerate(frames):
        want = gif_pattern(19, 11, 7, f)
        assert fr.shape == (11, 19, 3)
        # grayscale palette: every channel equals the index raster
        for ch in range(3):
            assert np.array_equal(fr[:, :, ch], want)
    # wide frames: multiple LZW clear cycles exercised
    b2 = make_gif(64, 32, 2, seed=1)
    assert np.array_equal(
        gif_frames(b2)[1][:, :, 0], gif_pattern(64, 32, 1, 1)
    )


def test_gif_decode_media_counts_real_frames(spark):
    import pandas as pd

    from skopje_spark.operators.multimodal import (
        decode_media_bmp,
        make_gif,
    )

    out = decode_media_bmp(pd.Series([make_gif(10, 6, 3), b"xx"]))
    assert (out["width"].iloc[0], out["height"].iloc[0],
            out["n_frames"].iloc[0]) == (10, 6, 3)


def test_gif_sample_frames_real_tier(spark):
    """Animated GIF → every 2nd REAL frame as a standalone PNG whose
    pixels equal the closed-form pattern; non-GIF rows keep the stub."""
    import numpy as np

    from skopje_spark.operators.multimodal import (
        attach_gif_payload,
        gif_pattern,
        png_pixels,
        sample_frames,
    )

    d = spark.range(8).selectExpr("id AS doc_id")
    rows = sample_frames(
        attach_gif_payload(d, "doc_id"), every_n=2
    ).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(8):
        n = 1 + i % 4
        got = sorted(r["frame_no"] for r in by_doc[i])
        assert got == list(range(0, n, 2))
        for r in by_doc[i]:
            px = png_pixels(bytes(r["frame_bytes"]))
            want = gif_pattern(8 + i % 16, 8 + i % 8, i % 32, r["frame_no"])
            assert np.array_equal(px[:, :, 0], want)
