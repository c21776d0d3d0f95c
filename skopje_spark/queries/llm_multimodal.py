"""Multimodal-column queries (§2C D5): binary payloads + typed
metadata + the Arrow-batched (stubbed) decode kernel.

The payload is the utf-8 encoding of the document text (no codecs in
this container — see operators.multimodal); all byte-level arithmetic
is therefore oracle-reproducible in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.operators.multimodal import attach_payload, decode_media
from skopje_spark.queries import register
from skopje_spark.tables import load_table


@register(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           sha256(text)                               AS payload_sha,
           'application/octet-stream'                 AS media_type
    FROM documents
    """,
    tags=("multimodal", "binary"),
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata struct: byte length, content sha256,
    media type — the schema every multimodal table in the engine
    carries (payload itself excluded from the result for hashing)."""
    d = load_table(spark, sf_dir, "documents")
    m = attach_payload(d, "text")
    return m.select(
        "doc_id",
        F.col("media_meta.byte_len").alias("byte_len"),
        F.col("media_meta.sha256").alias("payload_sha"),
        F.col("media_meta.media_type").alias("media_type"),
    )


@register(
    "q_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT)            AS byte_len,
           CAST((ascii(substr(text, 1, 1)) % 64 + 1) * 16 AS INT) AS width,
           CAST(((octet_length(encode(text)) % 64) + 1) * 16 AS INT) AS height,
           CAST((octet_length(encode(text)) % 8) + 1 AS INT)     AS n_frames
    FROM documents
    """,
    tags=("multimodal", "pandas-udf", "decode"),
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed media decode through the real ``mapInPandas`` plumbing:
    Arrow batches of (doc_id, payload) → deterministic fake
    (width, height, n_frames). The oracle reproduces the stub's byte
    arithmetic, proving the batch pipeline end-to-end."""
    d = load_table(spark, sf_dir, "documents")
    return decode_media(attach_payload(d, "text"), id_col="doc_id")


@register(
    "q_multimodal_frames",
    oracle="""
    WITH base AS (
      SELECT doc_id, octet_length(encode(text)) AS blen FROM documents
    ),
    dims AS (
      SELECT doc_id, blen, (blen % 8) + 1 AS n_frames,
             GREATEST(blen // ((blen % 8) + 1), 1) AS step
      FROM base
    )
    SELECT d.doc_id, CAST(f.fno AS INT) AS frame_no,
           CAST(LEAST(d.step, GREATEST(d.blen - f.fno * d.step, 0)) AS BIGINT)
             AS frame_len
    FROM dims d, UNNEST(range(0, d.n_frames, 2)) AS f(fno)
    ORDER BY doc_id, frame_no
    """,
    tags=("multimodal", "frames", "mapInPandas"),
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the one-to-many mapInPandas expansion:
    every 2nd stub-decoded frame per document, verified by frame
    count + per-frame byte length (the oracle reproduces the stub's
    slicing arithmetic)."""
    from skopje_spark.operators.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_payload(d, "text"), every_n=2)
    return frames.select(
        "doc_id",
        "frame_no",
        F.octet_length("frame_bytes").cast("bigint").alias("frame_len"),
    ).orderBy("doc_id", "frame_no")


@register(
    "q_multimodal_bmp_decode",
    oracle="""
    SELECT doc_id,
           CAST(8 + doc_id % 16 AS INT) AS width,
           CAST(8 + doc_id % 8 AS INT)  AS height,
           CAST(54 + (8 + doc_id % 8) *
                (CAST(FLOOR((3 * (8 + doc_id % 16) + 3) / 4) AS BIGINT) * 4)
                AS BIGINT) AS byte_len
    FROM documents
    """,
    tags=("multimodal", "bmp", "real-codec", "decode"),
)
def q_multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, no codec libraries: per-doc BMP payloads
    (dimensions derived from doc_id) are encoded executor-side, then
    decode_media parses the actual BMP headers back. The oracle
    recomputes width/height/byte-length from the closed-form BMP
    layout arithmetic (54-byte header + 4-byte-padded 24bpp rows) —
    so any disagreement between encoder and decoder, or any header
    mis-write, hash-mismatches. This is a true end-to-end binary
    codec check, not a stub."""
    from skopje_spark.operators.multimodal import attach_bmp_payload, decode_media

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    m = attach_bmp_payload(d, "doc_id")
    return decode_media(m).select("doc_id", "width", "height", "byte_len")


@register(
    "q_multimodal_wav_decode",
    oracle="""
    WITH params AS (
      SELECT doc_id,
             200 + doc_id % 128 AS n,
             doc_id % 32 AS seed,
             8000 + (doc_id % 4) * 4000 AS rate
      FROM documents
    ),
    samp AS (
      SELECT doc_id, n, rate,
             list_transform(range(0, n),
               i -> (i * i * 7 + i * 13 * seed + seed * seed * 3) % 65536
                    - 32768) AS s
      FROM params
    )
    SELECT doc_id,
           n AS n_samples,
           rate AS sample_rate,
           44 + 2 * n AS byte_len,
           (CASE WHEN (sqrt(CAST(list_sum(list_transform(s, x -> x * x)) AS DOUBLE) / n)) < 0
                 THEN -(FLOOR((-(sqrt(CAST(list_sum(list_transform(s, x -> x * x)) AS DOUBLE) / n))) * 1000000.0 + 0.5) / 1000000.0)
                 ELSE FLOOR((sqrt(CAST(list_sum(list_transform(s, x -> x * x)) AS DOUBLE) / n)) * 1000000.0 + 0.5) / 1000000.0 END) AS rms,
           CAST(list_sum(list_transform(range(2, n + 1),
               i -> CASE WHEN (s[i - 1] < 0) != (s[i] < 0)
                    THEN 1 ELSE 0 END)) AS BIGINT) AS zcc
    FROM samp
    """,
    tags=("multimodal", "wav", "audio", "real-codec", "decode"),
)
def q_multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, no codec libraries (operators/audio.py —
    the WAV/PCM16 twin of q_multimodal_bmp_decode): per-doc WAV
    payloads (waveform length/seed/rate derived from doc_id) are
    encoded executor-side with a real RIFF/WAVE encoder, then
    decode_audio parses the actual headers back and computes RMS
    energy and zero-crossing counts from the DECODED samples. The
    oracle recomputes every feature from the closed-form waveform
    arithmetic — an encoder bug, header mis-write, or sample
    misdecode hash-mismatches. Sum-of-squares is exact int64 on both
    sides; RMS rounds once at 6 dp."""
    from skopje_spark.operators.audio import attach_wav_payload, decode_audio
    from skopje_spark.queries.rounding import dround

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    w = attach_wav_payload(d, "doc_id")
    out = decode_audio(w, id_col="doc_id")
    return out.select(
        "doc_id",
        "n_samples",
        "sample_rate",
        "byte_len",
        dround(F.col("rms"), 6).alias("rms"),
        "zcc",
    )


def _dhash_oracle_sql() -> str:
    """Closed-form DuckDB dHash of the per-doc noise BMP: regenerate
    the 9×8 resized integer grayscale from the pattern arithmetic
    (operators/multimodal.bmp_noise_pattern) and pack the 64
    difference bits into 16 hex chars — bit-for-bit the engine's
    :func:`~skopje_spark.operators.multimodal.dhash_hex`."""

    def gray(xe: str, ye: str) -> str:
        b = f"(({xe})*({xe})*7 + ({ye})*({ye})*13 + ({xe})*({ye})*5 + 31*s) % 256"
        g = f"(({xe})*({xe})*3 + ({ye})*({ye})*11 + ({xe})*({ye})*7 + 17*s + ({xe})) % 256"
        r = f"(({xe})*({xe})*5 + ({ye})*({ye})*3 + ({xe})*({ye})*11 + 23*s + ({ye})) % 256"
        return f"((({b}) + ({g}) + ({r})) // 3)"

    row_hex = []
    for i in range(8):
        sy = f"(({i}*h)//8)"
        terms = []
        for j in range(8):
            sx0 = f"(({j}*w)//9)"
            sx1 = f"(({j + 1}*w)//9)"
            terms.append(
                f"(CASE WHEN {gray(sx1, sy)} > {gray(sx0, sy)} "
                f"THEN {1 << j} ELSE 0 END)"
            )
        row_hex.append(
            "lpad(lower(hex(" + " + ".join(terms) + ")), 2, '0')"
        )
    hash_expr = " || ".join(row_hex)
    return f"""
    WITH p AS (
      SELECT doc_id,
             8 + doc_id % 16 AS w,
             8 + doc_id % 8  AS h,
             doc_id % 32     AS s
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, {hash_expr} AS phash FROM p
    )
    SELECT doc_id, phash,
           CAST(COUNT(*) OVER (PARTITION BY phash) - 1 AS BIGINT) AS n_same
    FROM hashed
    ORDER BY doc_id
    """


@register(
    "q_image_phash_neardup",
    oracle=_dhash_oracle_sql(),
    tags=("multimodal", "phash", "dedup", "image", "llm-pipeline"),
)
def q_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup end-to-end
    (operators/multimodal.image_phash + image_neardup_pairs): every
    document gets a REAL noise-pattern BMP (dims/seed derived from
    doc_id — ids congruent mod 32 carry IDENTICAL images), the 64-bit
    dHash is computed from DECODED pixels, and identical-image
    partners are found through the Hamming-band LSH pair sweep
    (4×16-bit bands, exact for distance ≤ 3 by pigeonhole). The
    oracle recomputes the full dHash closed-form in DuckDB —
    grayscale, nearest-neighbor sampling, difference bits, hex
    packing — and the partner counts by hash-value window, so a
    single wrong bit anywhere in decode → hash → band join →
    distance verify fails the hash compare.

    Scale: hashing is a narrow Arrow-batched map; pairing is one
    shuffle on (band_id, band_sig); distance verification is codegen
    XOR/bit_count. Nothing is all-pairs."""
    from skopje_spark.operators.multimodal import (
        attach_noise_bmp_payload,
        image_neardup_pairs,
        image_phash,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    hashes = image_phash(
        attach_noise_bmp_payload(d, "doc_id"), id_col="doc_id",
        payload_col="payload", method="dhash",
    ).localCheckpoint(eager=True)  # feeds pairing AND the output join
    pairs = image_neardup_pairs(
        hashes, id_col="doc_id", hash_col="phash", max_dist=3, bands=4
    )
    same = pairs.filter(F.col("hamming") == 0)
    partners = (
        same.select(F.col("id_a").alias("doc_id"))
        .unionAll(same.select(F.col("id_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        hashes.join(partners, "doc_id", "left")
        .select(
            "doc_id",
            "phash",
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_same"),
        )
        .orderBy("doc_id")
    )


def _afp_oracle_sql() -> str:
    """Closed-form DuckDB audio fingerprint of the per-doc WAV: the
    waveform is pcm_pattern's integer arithmetic on (i, seed), so the
    65 frame energies (exact int64 sums of squares), the 64
    energy-gradient bits, and the LSB-first byte packing are all
    recomputable without the file — bit-for-bit
    :func:`skopje_spark.operators.audio.audio_fingerprint_hex`."""
    samp = "((i*i*7 + i*13*s + s*s*3) % 65536 - 32768)"
    return f"""
    WITH p AS (
      SELECT doc_id,
             200 + doc_id % 128 AS n,
             doc_id % 32        AS s,
             (200 + doc_id % 128) // 65 AS L
      FROM documents
    ),
    e AS (
      SELECT p.doc_id, r1.f,
             SUM(CAST({samp} AS BIGINT) * CAST({samp} AS BIGINT)) AS en
      FROM p,
           (SELECT range AS f FROM range(65)) r1,
           (SELECT range AS j FROM range(5)) r2,
           LATERAL (SELECT r1.f * p.L + r2.j AS i) calc
      WHERE r2.j < p.L
      GROUP BY p.doc_id, r1.f
    ),
    bits AS (
      SELECT a.doc_id, a.f,
             CASE WHEN a.en > b.en THEN 1 ELSE 0 END AS bit
      FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.f = a.f + 1
      WHERE a.f < 64
    ),
    bytes AS (
      SELECT doc_id, f // 8 AS k,
             SUM(bit * (1 << (f % 8))) AS byte
      FROM bits GROUP BY doc_id, f // 8
    ),
    hashed AS (
      SELECT doc_id,
             string_agg(lpad(lower(hex(byte)), 2, '0'), '' ORDER BY k) AS afp
      FROM bytes GROUP BY doc_id
    )
    SELECT doc_id, afp,
           CAST(COUNT(*) OVER (PARTITION BY afp) - 1 AS BIGINT) AS n_same
    FROM hashed
    ORDER BY doc_id
    """


@register(
    "q_audio_fingerprint_neardup",
    oracle=_afp_oracle_sql(),
    tags=("multimodal", "audio", "fingerprint", "dedup", "llm-pipeline"),
)
def q_audio_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio dedup end-to-end (operators/audio.audio_fingerprint +
    the shared Hamming-band pair sweep): every document gets a REAL
    WAV (length/seed/rate derived from doc_id — ids congruent mod 128
    carry IDENTICAL clips), the 64-bit energy-gradient fingerprint is
    computed from DECODED PCM samples, and identical-clip partners
    are found through the same band-LSH machinery the image tier uses
    (4×16-bit bands, exact for distance ≤ 3). The oracle recomputes
    the full fingerprint closed-form in DuckDB — frame energies as
    exact integer sums of squares over the pattern arithmetic,
    gradient bits, hex packing — so a single wrong bit anywhere in
    container decode → framing → energy → packing → band join fails
    the hash compare. This closes the multimodal dedup matrix: text
    (MinHash/SimHash), embeddings (SemDeDup), images (dHash), audio
    (energy fingerprint).

    Scale: fingerprinting is a narrow Arrow-batched map; pairing is
    one shuffle on (band_id, band_sig); nothing is all-pairs."""
    from skopje_spark.operators.audio import (
        attach_wav_payload,
        audio_fingerprint,
    )
    from skopje_spark.operators.multimodal import image_neardup_pairs

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    hashes = audio_fingerprint(
        attach_wav_payload(d, "doc_id"), id_col="doc_id",
        payload_col="payload",
    ).localCheckpoint(eager=True)
    pairs = image_neardup_pairs(
        hashes, id_col="doc_id", hash_col="afp", max_dist=3, bands=4
    )
    same = pairs.filter(F.col("hamming") == 0)
    partners = (
        same.select(F.col("id_a").alias("doc_id"))
        .unionAll(same.select(F.col("id_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        hashes.join(partners, "doc_id", "left")
        .select(
            "doc_id",
            "afp",
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_same"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_multimodal_png_decode",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             8 + doc_id % 16 AS w,
             8 + doc_id % 8  AS h,
             doc_id % 32     AS s
      FROM documents
    )
    SELECT d.doc_id,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(SUM(
             (  (x.x + y.y + 3*d.s) % 256
              + (3*x.x + 5*y.y + 2*d.s) % 256
              + (7*x.x + 13*y.y + d.s) % 256) // 3
           ) AS BIGINT) AS gray_sum
    FROM dims d,
         UNNEST(range(0, d.w)) AS x(x),
         UNNEST(range(0, d.h)) AS y(y)
    GROUP BY d.doc_id, d.w, d.h
    ORDER BY d.doc_id
    """,
    tags=("multimodal", "png", "real-codec", "decode"),
)
def q_multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode, zero codec libraries
    (operators/multimodal.py PNG section — stdlib zlib DEFLATE + full
    scanline-filter reconstruction): per-doc PNGs of the closed-form
    test pattern are encoded executor-side (really compressed), then
    decoded back PIXEL BY PIXEL; the emitted gray_sum = Σ (b+g+r)//3
    over every pixel, which the oracle recomputes from the pattern
    arithmetic alone. A single flipped bit anywhere in the DEFLATE
    round-trip, the filter reconstruction, or the channel order
    hash-mismatches — this is the compressed-format twin of
    q_multimodal_bmp_decode, and it upgrades the format tier the
    PIL gate used to own (PNG no longer needs PIL).

    Scale: Arrow-batched mapInPandas, payloads never leave executors;
    per-task memory is bounded by maxPartitionBytes like any binary
    column pipeline."""
    from skopje_spark.operators.multimodal import (
        attach_png_payload,
        decode_media_pixels,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    m = attach_png_payload(d, "doc_id")
    return decode_media_pixels(m).orderBy("doc_id")


@register(
    "q_multimodal_gif_frames",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             8 + doc_id % 16 AS w,
             8 + doc_id % 8  AS h,
             1 + doc_id % 4  AS n,
             doc_id % 32     AS s
      FROM documents
    )
    SELECT d.doc_id,
           CAST(f.fno AS INT) AS frame_no,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(SUM((x.x + 2*y.y + 3*d.s + 17*f.fno) % 256) AS BIGINT)
             AS gray_sum
    FROM dims d,
         UNNEST(range(0, d.n, 2)) AS f(fno),
         UNNEST(range(0, d.w)) AS x(x),
         UNNEST(range(0, d.h)) AS y(y)
    GROUP BY d.doc_id, f.fno, d.w, d.h
    ORDER BY d.doc_id, frame_no
    """,
    tags=("multimodal", "gif", "video", "real-codec", "frames"),
)
def q_multimodal_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multi-frame extraction, zero codec libraries
    (operators/multimodal.py GIF section — variable-width LZW decode +
    frame compositing, frames re-encoded as PNG): per-doc animated
    GIFs (1+id%4 frames of the closed-form pattern) are built
    executor-side, sample_frames LZW-decodes every 2nd frame and emits
    it as a standalone PNG, and each sampled frame is then decoded
    AGAIN through the PNG path to a per-frame integer gray checksum —
    two real codecs composed end-to-end, verified against pure
    pattern arithmetic in the oracle. This is the video
    frame-sampling shape (one row in, k rows out) with the decode
    step real instead of stubbed.

    Scale: one-to-many mapInPandas, Arrow batches, payloads never on
    the driver — identical plumbing at ffmpeg scale."""
    import numpy as np
    import pandas as pd

    from skopje_spark.operators.multimodal import (
        attach_gif_payload,
        png_pixels,
        sample_frames,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    frames = sample_frames(attach_gif_payload(d, "doc_id"), every_n=2)

    def decode(batches):
        for pdf in batches:
            ws, hs, sums = [], [], []
            for raw in pdf["frame_bytes"]:
                px = png_pixels(bytes(raw)).astype(np.int64)
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                sums.append(int(px[:, :, 0].sum()))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "frame_no": pdf["frame_no"].astype("int32"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "gray_sum": pd.Series(sums, dtype="int64"),
            })

    return frames.mapInPandas(
        decode,
        schema="doc_id long, frame_no int, width int, height int, "
               "gray_sum long",
    ).orderBy("doc_id", "frame_no")


@register(
    "q_multimodal_jpeg_decode",
    oracle="""
    SELECT doc_id,
           CAST(8 + doc_id % 16 AS INT) AS width,
           CAST(8 + doc_id % 8 AS INT)  AS height,
           TRUE AS psnr_ok
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "jpeg", "real-codec", "decode"),
)
def q_multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG under the driver gate (operators/jpeg.py —
    standard Annex K tables, Huffman entropy coding, DCT, all pure
    numpy): per-doc JPEGs of the closed-form pattern are encoded
    executor-side and decoded back through the independent decoder
    path. JPEG is lossy, so the oracle pins the EXACT header dims
    closed-form while ``psnr_ok`` pins per-image reconstruction
    quality in-band (> 25 dB against the original pattern — a wrong
    quant table, zigzag order, Huffman table, or color transform
    craters PSNR to single digits, so the bound is a sharp detector
    even without bit-exactness).

    Scale: Arrow-batched mapInPandas; the full encode+decode runs
    executor-side like any media kernel."""
    import numpy as np
    import pandas as pd

    from skopje_spark.operators.jpeg import (
        encode_jpeg,
        jpeg_pixels,
        psnr,
    )
    from skopje_spark.operators.multimodal import bmp_pattern

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches):
        for pdf in batches:
            ids, ws, hs, oks = [], [], [], []
            for i in pdf["doc_id"].astype("int64"):
                i = int(i)
                w, h, s = 8 + i % 16, 8 + i % 8, i % 32
                src = bmp_pattern(w, h, s)[:, :, ::-1]
                dec = jpeg_pixels(encode_jpeg(src))
                ids.append(i)
                hs.append(dec.shape[0])
                ws.append(dec.shape[1])
                oks.append(bool(psnr(src, dec) > 25.0))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "psnr_ok": pd.Series(oks, dtype="bool"),
            })

    return d.mapInPandas(
        run, schema="doc_id long, width int, height int, psnr_ok boolean"
    ).orderBy("doc_id")


@register(
    "q_multimodal_jpeg_subsampled",
    oracle="""
    SELECT doc_id,
           CAST(16 + doc_id % 17 AS INT) AS width,
           CAST(16 + doc_id % 13 AS INT) AS height,
           TRUE AS psnr_ok,
           TRUE AS progressive_identical
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "jpeg", "real-codec", "decode", "subsampled",
          "progressive"),
)
def q_multimodal_jpeg_subsampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dominant real-world JPEG shapes under the driver gate:
    4:2:0 chroma-subsampled MCU layout AND progressive (SOF2,
    spectral selection + successive approximation) decode
    (operators/jpeg.py, pure numpy). Per doc, a smooth closed-form
    gradient is encoded 4:2:0 sequential and 4:2:0 progressive and
    both decoded back through the independent decoder path:

    - ``width``/``height``: exact header/array dims (odd sizes
      included — partial MCUs on both axes);
    - ``psnr_ok``: > 25 dB reconstruction against the source (a wrong
      MCU block order, chroma upsample, or subsampled geometry
      craters this);
    - ``progressive_identical``: the progressive stream decodes
      BIT-IDENTICALLY to the sequential one — both carry the same
      quantized coefficients, so any drift in the scan-accumulation
      (EOB runs, refinement bits) flips it false.

    Scale: Arrow-batched mapInPandas; encode+decode run executor-side
    like any media kernel."""
    import numpy as np
    import pandas as pd

    from skopje_spark.operators.jpeg import (
        encode_jpeg,
        jpeg_pixels,
        psnr,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches):
        for pdf in batches:
            ids, ws, hs, oks, idents = [], [], [], [], []
            for i in pdf["doc_id"].astype("int64"):
                i = int(i)
                w, h = 16 + i % 17, 16 + i % 13
                xx, yy = np.meshgrid(np.arange(w), np.arange(h))
                # smooth NON-WRAPPING ramps (w≤32, h≤28 keeps every
                # channel <256): modular wraps are 255→0 cliffs that
                # chroma subsampling legitimately cannot reproduce
                src = np.stack(
                    [xx * 3 + i % 64, yy * 4 + (2 * i) % 64,
                     xx * 2 + yy * 2 + (3 * i) % 64], -1
                ).astype("uint8")
                seq = jpeg_pixels(encode_jpeg(src, subsampling="4:2:0"))
                pro = jpeg_pixels(
                    encode_jpeg(
                        src, subsampling="4:2:0", progressive=True
                    )
                )
                ids.append(i)
                hs.append(seq.shape[0])
                ws.append(seq.shape[1])
                oks.append(bool(psnr(src, seq) > 25.0))
                idents.append(bool(np.array_equal(seq, pro)))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "psnr_ok": pd.Series(oks, dtype="bool"),
                "progressive_identical": pd.Series(idents, dtype="bool"),
            })

    return d.mapInPandas(
        run,
        schema="doc_id long, width int, height int, psnr_ok boolean, "
               "progressive_identical boolean",
    ).orderBy("doc_id")


@register(
    "q_multimodal_audio_meta",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 'wav' WHEN 1 THEN 'flac' ELSE 'mp3'
           END AS format,
           CAST(1 AS INT) AS channels,
           CAST(CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 8000 + (doc_id % 4) * 4000
               WHEN 1 THEN 16000
               ELSE 44100
           END AS INT) AS sample_rate,
           CAST(CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 200 + doc_id % 128
               WHEN 1 THEN 300 + doc_id % 200
               ELSE (5 + doc_id % 20) * 1152
           END AS BIGINT) AS n_samples
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "audio", "real-codec", "mp3", "flac"),
)
def q_multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-audio metadata under the driver gate: a mixed
    WAV / FLAC / MP3 corpus built executor-side (real RIFF encoder,
    the REAL FLAC subset codec — fixed-prediction subframes, Rice
    residuals, CRC-8/16 — and spec-valid CBR MPEG-1 Layer III frame
    streams), then sniffed and parsed back by
    :func:`~skopje_spark.operators.audio.decode_audio_meta`: each
    format's real header tier recovers channels / sample rate / exact
    sample totals (for MP3, a full frame-header walk, not a one-frame
    extrapolation). The oracle recomputes every field closed-form
    from the doc_id arithmetic.

    Scale: payloads are born and parsed inside Arrow batches; the
    driver never sees a byte of audio."""
    import pandas as pd

    from skopje_spark.operators.audio import (
        decode_audio_meta,
        make_flac,
        make_mp3,
        make_wav,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                if i % 3 == 0:
                    payloads.append(make_wav(
                        200 + i % 128, seed=i % 32,
                        sample_rate=8000 + (i % 4) * 4000,
                    ))
                elif i % 3 == 1:
                    payloads.append(make_flac(
                        300 + i % 200, seed=i % 16, sample_rate=16000,
                        block_size=256,
                    ))
                else:
                    payloads.append(make_mp3(
                        5 + i % 20, bitrate_kbps=128, sample_rate=44100,
                    ))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    corpus = d.mapInPandas(build, schema="doc_id long, payload binary")
    meta = decode_audio_meta(corpus)
    return meta.select(
        "doc_id", "format", "channels", "sample_rate", "n_samples"
    ).orderBy("doc_id")
