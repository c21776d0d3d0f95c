"""Real audio codec tier for multimodal columns: WAV/PCM16, a FLAC
subset codec, and MP3 header parsing — no codec libraries.

Companion to the BMP kernel in ``operators/multimodal.py`` and built
on the same honesty contract: the container has no audio libraries,
so instead of faking decode, this module implements the actual
formats — the RIFF/WAVE container (header encode/parse, 16-bit PCM
sample decode, nearest-neighbor resampling), a REAL lossless FLAC
codec subset (STREAMINFO + constant/verbatim/fixed-prediction
subframes with Rice residuals and CRC-8/16 — bit-exact round trips;
LPC refuses loudly), and the MPEG audio (MP3) frame-header tier
(version/layer/bitrate/rate tables, ID3v2 skip, frame-walk duration —
full filterbank decode is honestly absent rather than stubbed).

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
    "is_mp3",
    "decode_mp3_header",
    "make_mp3",
    "is_flac",
    "decode_flac_header",
    "encode_flac",
    "flac_samples",
    "make_flac",
    "decode_audio_meta",
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


# ---------------------------------------------------------------------------
# compressed-audio tier: MP3 header parse + a REAL FLAC subset codec
# ---------------------------------------------------------------------------
# MP3 (MPEG audio) full decode needs a polyphase filterbank — out of
# scope — but the FRAME HEADER layer (ISO/IEC 11172-3) is pure struct
# arithmetic: version/layer/bitrate/sample-rate/channel-mode tables,
# frame-length formulae, ID3v2 skipping, and frame walking for
# duration. FLAC gets an actual codec: a spec-conformant encoder
# (STREAMINFO + frames with constant/verbatim/FIXED-prediction
# subframes, Rice residual coding, CRC-8/CRC-16) and the matching
# decoder — lossless, so round-trips are bit-exact like the PNG/GIF
# family. LPC subframes refuse loudly by name.

# bitrate tables in kbps, index 1..14 (0 = free, 15 = bad)
_MP3_BR = {
    # (version_group, layer): V1 = MPEG1; V2 = MPEG2 & 2.5
    ("V1", 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
                384, 416, 448],
    ("V1", 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
                320, 384],
    ("V1", 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                256, 320],
    ("V2", 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
                224, 256],
    ("V2", 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                160],
    ("V2", 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                160],
}
_MP3_SR = {
    3: [44100, 48000, 32000],   # MPEG1
    2: [22050, 24000, 16000],   # MPEG2
    0: [11025, 12000, 8000],    # MPEG2.5
}


def _mp3_frame_at(b: bytes, pos: int):
    """Parse one MPEG audio frame header at ``pos``: returns
    (bitrate_kbps, sample_rate, channels, samples_per_frame,
    frame_len) or None if the 4 bytes are not a valid header."""
    if pos + 4 > len(b):
        return None
    h = int.from_bytes(b[pos:pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        return None  # no sync
    ver_id = (h >> 19) & 3
    layer_id = (h >> 17) & 3
    if ver_id == 1 or layer_id == 0:
        return None  # reserved
    layer = 4 - layer_id  # 3→L1, 2→L2, 1→L3
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / bad
    vgroup = "V1" if ver_id == 3 else "V2"
    kbps = _MP3_BR[(vgroup, layer)][br_idx - 1]
    rate = _MP3_SR[ver_id][sr_idx]
    pad = (h >> 9) & 1
    mode = (h >> 6) & 3
    channels = 1 if mode == 3 else 2
    if layer == 1:
        spf = 384
        flen = (12 * kbps * 1000 // rate + pad) * 4
    else:
        spf = 1152 if (layer == 2 or ver_id == 3) else 576
        flen = spf // 8 * kbps * 1000 // rate + pad
    return kbps, rate, channels, spf, flen


def _id3v2_len(b: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none) — syncsafe
    28-bit size per the ID3v2 spec."""
    if len(b) < 10 or b[:3] != b"ID3":
        return 0
    sz = (
        (b[6] & 0x7F) << 21 | (b[7] & 0x7F) << 14
        | (b[8] & 0x7F) << 7 | (b[9] & 0x7F)
    )
    return 10 + sz


def is_mp3(b: bytes) -> bool:
    """Sniff: optional ID3v2 tag, then a valid MPEG audio frame header
    whose declared length lands on ANOTHER valid header (or end of
    payload) — the two-frame check real sniffers use against false
    0xFFE syncs in arbitrary bytes."""
    off = _id3v2_len(b)
    f = _mp3_frame_at(b, off)
    if f is None:
        return False
    nxt = off + f[4]
    return nxt >= len(b) or _mp3_frame_at(b, nxt) is not None


def decode_mp3_header(b: bytes):
    """(channels, sample_rate, bitrate_kbps, n_frames, total_samples,
    duration_ms) from a real MPEG frame walk — every frame header
    parsed, CBR or VBR alike (duration is the SUM of per-frame
    samples/rate, not a single-frame extrapolation)."""
    if not is_mp3(b):
        raise ValueError("not an MP3 payload")
    pos = _id3v2_len(b)
    first = _mp3_frame_at(b, pos)
    n_frames = 0
    total_samples = 0
    while pos + 4 <= len(b):
        f = _mp3_frame_at(b, pos)
        if f is None:
            break  # trailing tag/junk
        n_frames += 1
        total_samples += f[3]
        pos += f[4]
    kbps, rate, channels = first[0], first[1], first[2]
    duration_ms = int(round(total_samples * 1000.0 / rate))
    return channels, rate, kbps, n_frames, total_samples, duration_ms


def make_mp3(n_frames: int, bitrate_kbps: int = 128,
             sample_rate: int = 44100, channels: int = 1) -> bytes:
    """A spec-valid CBR MPEG-1 Layer III stream with silent (zeroed)
    frame bodies: every header field is real — any MP3 header parser
    computes the same bitrate/rate/duration — while the audio payload
    is deliberately empty (this module decodes headers, not
    filterbanks)."""
    try:
        sr_idx = _MP3_SR[3].index(sample_rate)
    except ValueError:
        raise ValueError(f"MPEG-1 sample rate required, got {sample_rate}")
    br_idx = _MP3_BR[("V1", 3)].index(bitrate_kbps) + 1
    mode = 3 if channels == 1 else 0
    h = (
        0x7FF << 21 | 3 << 19 | 1 << 17 | 1 << 16  # sync, MPEG1, L3, no CRC
        | br_idx << 12 | sr_idx << 10 | 0 << 9     # no padding
        | mode << 6
    )
    flen = 1152 // 8 * bitrate_kbps * 1000 // sample_rate
    frame = h.to_bytes(4, "big") + b"\x00" * (flen - 4)
    return frame * n_frames


# ---- FLAC ------------------------------------------------------------


class _FBitWriter:
    """MSB-first bit packer (no byte stuffing — FLAC is not JPEG)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, bits: int):
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc & 0xFF)
                self.acc = 0
                self.n = 0

    def unary(self, q: int):
        """FLAC unary: q zero bits then a one bit."""
        for _ in range(q):
            self.put(0, 1)
        self.put(1, 1)

    def align(self):
        while self.n:
            self.put(0, 1)


class _FBitReader:
    def __init__(self, b: bytes, pos: int = 0):
        self.d = b
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            self.acc = self.d[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sbits(self, k: int) -> int:
        v = self.bits(k)
        return v - (1 << k) if v >= (1 << (k - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bit() == 0:
            q += 1
        return q

    def align(self):
        self.n = 0


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — the FLAC frame
    header CRC."""
    c = 0
    for byte in data:
        c ^= byte
        for _ in range(8):
            c = ((c << 1) ^ 0x07 if c & 0x80 else c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — the FLAC
    whole-frame CRC."""
    c = 0
    for byte in data:
        c ^= byte << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005 if c & 0x8000 else c << 1) & 0xFFFF
    return c


def _utf8_code(n: int) -> bytes:
    """FLAC's UTF-8-style coding of frame numbers (plain UTF-8
    extended beyond U+10FFFF)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 * (nbytes - 1) + (7 - nbytes):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF | (n >> (6 * (nbytes - 1)))
    out.append(lead)
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _utf8_read(br: _FBitReader) -> int:
    b0 = br.bits(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    while (b0 << nbytes) & 0x80:
        nbytes += 1
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        v = (v << 6) | (br.bits(8) & 0x3F)
    return v


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def is_flac(b: bytes) -> bool:
    return len(b) > 42 and b[:4] == b"fLaC"


def decode_flac_header(b: bytes):
    """(channels, sample_rate, bits_per_sample, total_samples) from
    the mandatory STREAMINFO metadata block — a real binary parse of
    the 34-byte bit layout."""
    if not is_flac(b):
        raise ValueError("not a FLAC payload")
    br = _FBitReader(b, 4)
    # walk metadata blocks to STREAMINFO (must be first per spec, but
    # parse defensively)
    while True:
        last = br.bits(1)
        btype = br.bits(7)
        blen = br.bits(24)
        if btype == 0:
            break
        br.pos += blen
        if last:
            raise ValueError("FLAC stream has no STREAMINFO block")
    br.bits(16)  # min blocksize
    br.bits(16)  # max blocksize
    br.bits(24)  # min frame size
    br.bits(24)  # max frame size
    rate = br.bits(20)
    channels = br.bits(3) + 1
    bps = br.bits(5) + 1
    total = br.bits(36)
    # STREAMINFO sanity: junk that merely starts with the magic must
    # refuse here, not crash downstream arithmetic (rate 0 → /0)
    if rate < 1 or rate > 655350 or bps < 4 or bps > 32:
        raise ValueError(
            f"not a FLAC payload: insane STREAMINFO "
            f"(rate={rate}, bps={bps})"
        )
    return channels, rate, bps, total


def _flac_data_offset(b: bytes) -> int:
    br = _FBitReader(b, 4)
    while True:
        last = br.bits(1)
        br.bits(7)
        blen = br.bits(24)
        br.pos += blen
        if last:
            return br.pos


def encode_flac(samples, sample_rate: int = 8000, *,
                block_size: int = 1024, method: str = "fixed") -> bytes:
    """Encode a mono int16 array as a REAL FLAC stream: STREAMINFO +
    frames of constant / verbatim / FIXED order-2 predicted subframes
    with Rice-coded residuals (partition order 0), CRC-8 header and
    CRC-16 frame checks — the spec subset every FLAC decoder reads.
    ``method='verbatim'`` forces uncompressed subframes."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int16).astype(np.int64)
    n = len(s)
    out = bytearray(b"fLaC")
    si = _FBitWriter()
    si.put(block_size, 16)
    si.put(block_size, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(sample_rate, 20)
    si.put(0, 3)       # channels - 1
    si.put(15, 5)      # bps - 1 = 15 → 16-bit
    si.put(n, 36)
    body = bytes(si.out) + b"\x00" * 16  # md5 0 = unknown (spec-legal)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body  # last block
    for fi, lo in enumerate(range(0, n, block_size)):
        blk = s[lo:lo + block_size]
        bs = len(blk)
        fw = _FBitWriter()
        fw.put(0b11111111111110, 14)  # sync
        fw.put(0, 1)                  # reserved
        fw.put(0, 1)                  # fixed blocksize strategy
        fw.put(0b0111, 4)             # blocksize: 16-bit at end
        fw.put(0b0000, 4)             # sample rate: from STREAMINFO
        fw.put(0b0000, 4)             # channels: mono
        fw.put(0b100, 3)              # sample size: 16-bit
        fw.put(0, 1)                  # reserved
        for byte in _utf8_code(fi):
            fw.put(byte, 8)
        fw.put(bs - 1, 16)
        fw.align()
        hdr = bytes(fw.out)
        fw.put(_crc8(hdr), 8)
        # subframe
        if np.all(blk == blk[0]):
            fw.put(0b00000000, 8)  # constant
            fw.put(int(blk[0]) & 0xFFFF, 16)
        elif method == "verbatim" or bs < 3:
            fw.put(0b00000010, 8)  # verbatim
            for v in blk:
                fw.put(int(v) & 0xFFFF, 16)
        else:
            order = 2
            fw.put((0b001000 | order) << 1, 8)  # fixed, no wasted bits
            for v in blk[:order]:
                fw.put(int(v) & 0xFFFF, 16)
            res = blk[order:] - 2 * blk[order - 1:-1] + blk[:-order]
            u = (res << 1) ^ (res >> 63)  # zigzag
            mean = int(u.mean()) if len(u) else 0
            k = min(14, max(0, mean.bit_length() - 1))
            fw.put(0b00, 2)   # residual method: 4-bit Rice
            fw.put(0, 4)      # partition order 0
            fw.put(k, 4)
            for uv in u:
                uv = int(uv)
                fw.unary(uv >> k)
                if k:
                    fw.put(uv & ((1 << k) - 1), k)
        fw.align()
        frame = bytes(fw.out)
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)


def flac_samples(b: bytes):
    """Decode a mono 16-bit FLAC stream back to an int16 array —
    constant / verbatim / FIXED subframes (orders 0-4) with Rice
    partitions of any order, CRC-verified frames. LPC subframes and
    multi-channel assignments refuse loudly by name."""
    import numpy as np

    channels, rate, bps, total = decode_flac_header(b)
    if channels != 1 or bps != 16:
        raise ValueError(
            f"only mono 16-bit FLAC supported, got {channels}ch/{bps}bit"
        )
    pos = _flac_data_offset(b)
    out = []
    got = 0
    while got < total and pos < len(b) - 2:
        try:
            got, pos = _flac_frame(b, pos, out, got)
        except IndexError:
            # corrupt entropy data walks the reader off the payload
            # before the CRC can catch it — same verdict, loudly
            raise ValueError("truncated or corrupt FLAC frame (CRC)")
    res = np.concatenate(out)[:total] if out else np.zeros(0, np.int64)
    return res.astype(np.int16)


def _flac_frame(b: bytes, pos: int, out: list, got: int):
    """Decode one FLAC frame at ``pos`` into ``out``; returns the
    advanced (samples_decoded, next_pos)."""
    import numpy as np

    frame_start = pos
    br = _FBitReader(b, pos)
    if br.bits(14) != 0b11111111111110:
        raise ValueError("FLAC frame sync lost")
    br.bits(1)
    br.bits(1)
    bs_code = br.bits(4)
    sr_code = br.bits(4)
    ch_code = br.bits(4)
    ss_code = br.bits(3)
    br.bits(1)
    if ch_code != 0:
        raise ValueError(
            "only the mono channel assignment is supported"
        )
    _utf8_read(br)
    if bs_code == 0b0001:
        bs = 192
    elif 0b0010 <= bs_code <= 0b0101:
        bs = 576 << (bs_code - 2)
    elif bs_code == 0b0110:
        bs = br.bits(8) + 1
    elif bs_code == 0b0111:
        bs = br.bits(16) + 1
    elif bs_code >= 0b1000:
        bs = 256 << (bs_code - 8)
    else:
        raise ValueError("reserved FLAC blocksize code")
    if sr_code == 0b1100:
        br.bits(8)
    elif sr_code in (0b1101, 0b1110):
        br.bits(16)
    br.align()
    if _crc8(b[frame_start:br.pos]) != br.bits(8):
        raise ValueError("FLAC frame header CRC mismatch")
    # one mono subframe
    br.bit()  # zero pad
    stype = br.bits(6)
    wasted = 0
    if br.bit():
        wasted = br.unary() + 1
    eff = 16 - wasted
    if stype == 0b000000:
        v = br.sbits(eff)
        blk = np.full(bs, v, dtype=np.int64)
    elif stype == 0b000001:
        blk = np.array([br.sbits(eff) for _ in range(bs)],
                       dtype=np.int64)
    elif 0b001000 <= stype <= 0b001100:
        order = stype & 0x07
        warm = [br.sbits(eff) for _ in range(order)]
        method = br.bits(2)
        if method > 1:
            raise ValueError("reserved FLAC residual method")
        pbits = 4 + method
        porder = br.bits(4)
        res = []
        nparts = 1 << porder
        for p in range(nparts):
            cnt = (bs >> porder) - (order if p == 0 else 0)
            k = br.bits(pbits)
            if k == (1 << pbits) - 1:  # escape: raw
                raw = br.bits(5)
                for _ in range(cnt):
                    res.append(br.sbits(raw) if raw else 0)
            else:
                for _ in range(cnt):
                    q = br.unary()
                    u = (q << k) | (br.bits(k) if k else 0)
                    res.append((u >> 1) ^ -(u & 1))  # un-zigzag
        xs = list(warm)
        coefs = _FIXED_COEFS[order]
        for r in res:
            v = r + sum(
                c * xs[-i - 1] for i, c in enumerate(coefs)
            )
            xs.append(v)
        blk = np.array(xs, dtype=np.int64)
    elif stype >= 0b100000:
        raise ValueError("FLAC LPC subframes unsupported")
    else:
        raise ValueError(f"reserved FLAC subframe type {stype:#08b}")
    if wasted:
        blk = blk << wasted
    br.align()
    if _crc16(b[frame_start:br.pos]) != br.bits(16):
        raise ValueError("FLAC frame CRC-16 mismatch")
    out.append(blk)
    return got + bs, br.pos


def make_flac(n_samples: int, seed: int = 0,
              sample_rate: int = 8000, **kw) -> bytes:
    """A real FLAC stream of the deterministic PCM pattern."""
    return encode_flac(
        pcm_pattern(n_samples, seed), sample_rate, **kw
    )


def decode_audio_meta(df: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Format-sniffing audio metadata over a mixed binary column —
    WAV, FLAC, and MP3 payloads each parsed by their real header
    tier: (format, channels, sample_rate, n_samples, duration_ms).
    For MP3, n_samples is the frame-walk sample total; unknown
    payloads row out as format='unknown' with nulls (never a task
    failure — corpus scans meet junk)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                b = bytes(r["payload"])
                i = int(r[id_col])
                # any parse failure (truncated header, magic-prefixed
                # junk, zero rates) rows out as unknown — a corpus
                # scan must never die on one malformed payload
                try:
                    if is_wav(b):
                        ch, rate, _, ns, _ = decode_wav_header(b)
                        rows.append((i, "wav", ch, rate, ns,
                                     int(round(ns * 1000.0 / rate))))
                    elif is_flac(b):
                        ch, rate, _, ns = decode_flac_header(b)
                        rows.append((i, "flac", ch, rate, ns,
                                     int(round(ns * 1000.0 / rate))))
                    elif is_mp3(b):
                        ch, rate, _, _, ns, dur = decode_mp3_header(b)
                        rows.append((i, "mp3", ch, rate, ns, dur))
                    else:
                        rows.append((i, "unknown", None, None, None,
                                     None))
                except Exception:
                    rows.append((i, "unknown", None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "format", "channels", "sample_rate",
                         "n_samples", "duration_ms"],
            )

    return df.select(F.col(id_col), "payload").mapInPandas(
        run,
        schema=(
            f"{id_col} long, format string, channels int, "
            "sample_rate int, n_samples long, duration_ms long"
        ),
    )
