"""Real WAV/PCM16 codec tests (operators/audio.py) — the audio twin
of the BMP suite in test_multimodal.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_wav_roundtrip_property():
    """Encode→decode is the identity on samples for arbitrary lengths,
    seeds and rates; resample changes length proportionally."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from skopje_spark.operators.audio import (
        decode_wav_header,
        make_wav,
        pcm_pattern,
        resample_wav,
        wav_samples,
    )

    @given(
        n=st.integers(min_value=1, max_value=2000),
        seed=st.integers(min_value=0, max_value=255),
        rate=st.sampled_from([8000, 16000, 44100]),
    )
    @settings(max_examples=40, deadline=None)
    def check(n, seed, rate):
        b = make_wav(n, seed, rate)
        ch, r, bits, ns, off = decode_wav_header(b)
        assert (ch, r, bits, ns, off) == (1, rate, 16, n, 44)
        assert (wav_samples(b) == pcm_pattern(n, seed)).all()
        half = resample_wav(b, rate // 2)
        assert decode_wav_header(half)[3] == max(1, int(round(n / 2)))
        assert decode_wav_header(half)[1] == rate // 2

    check()


def test_wav_sniff_rejects_incoherent_payloads():
    from skopje_spark.operators.audio import is_wav, make_wav

    good = bytearray(make_wav(100, seed=3))
    assert is_wav(bytes(good))
    assert not is_wav(b"")
    assert not is_wav(b"RIFX" + bytes(good[4:]))        # wrong magic
    assert not is_wav(bytes(good[:50]))                 # truncated data
    bad_fmt = bytearray(good)
    bad_fmt[20] = 3                                     # non-PCM format tag
    assert not is_wav(bytes(bad_fmt))


def test_wav_resample_preserves_waveform_shape():
    """Nearest-neighbor upsample by 2 duplicates each sample (exact
    index-map semantics, like the BMP resize contract)."""
    import numpy as np

    from skopje_spark.operators.audio import make_wav, resample_wav, wav_samples

    b = make_wav(50, seed=7, sample_rate=8000)
    up = resample_wav(b, 16000)
    s, su = wav_samples(b), wav_samples(up)
    assert len(su) == 100
    assert (su == np.repeat(s, 2)).all()


def test_decode_audio_features_match_closed_form(spark):
    """The Spark decode path (real header parse + sample decode inside
    mapInPandas) reproduces hand-computed features for a known
    waveform."""
    import math

    import numpy as np

    from skopje_spark.operators.audio import (
        attach_wav_payload,
        decode_audio,
        pcm_pattern,
    )

    d = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    out = {
        r["doc_id"]: r
        for r in decode_audio(attach_wav_payload(d, "doc_id")).collect()
    }
    for i in range(20):
        n, seed = 200 + i % 128, i % 32
        s = pcm_pattern(n, seed).astype("int64")
        r = out[i]
        assert r["n_samples"] == n
        assert r["sample_rate"] == 8000 + (i % 4) * 4000
        assert r["byte_len"] == 44 + 2 * n
        assert r["rms"] == pytest.approx(math.sqrt(int(np.sum(s * s)) / n))
        neg = s < 0
        assert r["zcc"] == int(np.sum(neg[1:] != neg[:-1]))


def test_wav_payloads_never_collected_to_driver(spark):
    """The decode plan is mapInPandas over mapInPandas — no collect,
    no Exchange of payload bytes."""
    from skopje_spark.operators.audio import attach_wav_payload, decode_audio

    d = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    plan = (
        decode_audio(attach_wav_payload(d, "doc_id"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_wav_sniff_rejects_inconsistent_block_align():
    """block_align must be the PCM-consistent channels*bits/8 and
    nonzero — a zero would crash the sample-count division (r6
    self-review)."""
    import struct

    from skopje_spark.operators.audio import is_wav, make_wav

    good = bytearray(make_wav(64, seed=1))
    assert is_wav(bytes(good))
    zero_align = bytearray(good)
    struct.pack_into("<H", zero_align, 32, 0)
    assert not is_wav(bytes(zero_align))
    wrong_align = bytearray(good)
    struct.pack_into("<H", wrong_align, 32, 3)   # mono16 must be 2
    assert not is_wav(bytes(wrong_align))


def test_wav_empty_data_chunk_resamples_to_empty():
    import struct

    from skopje_spark.operators.audio import (
        decode_wav_header,
        encode_wav,
        is_wav,
        resample_wav,
    )

    empty = encode_wav([], 8000)
    assert is_wav(empty)
    assert decode_wav_header(empty)[3] == 0
    out = resample_wav(empty, 16000)
    assert decode_wav_header(out)[3] == 0 and decode_wav_header(out)[1] == 16000


def test_flac_roundtrip_property():
    """FLAC is lossless: encode→decode is the IDENTITY on int16
    samples across lengths, block sizes, and subframe methods —
    including blocks shorter than the fixed-predictor order and
    constant blocks."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from skopje_spark.operators.audio import (
        decode_flac_header,
        encode_flac,
        flac_samples,
        pcm_pattern,
    )

    @given(
        n=st.integers(min_value=1, max_value=3000),
        bs=st.sampled_from([64, 192, 256, 1024]),
        method=st.sampled_from(["fixed", "verbatim"]),
        seed=st.integers(min_value=0, max_value=31),
    )
    @settings(max_examples=30, deadline=None)
    def check(n, bs, method, seed):
        s = np.asarray(pcm_pattern(n, seed), dtype=np.int16)
        b = encode_flac(s, 8000, block_size=bs, method=method)
        assert decode_flac_header(b) == (1, 8000, 16, n)
        assert np.array_equal(flac_samples(b), s)

    check()


def test_flac_crc_and_refusals():
    """Tampered frames fail their CRC loudly; LPC subframe types and
    non-mono assignments refuse by name; non-FLAC bytes refuse."""
    import numpy as np
    import pytest as _pytest

    from skopje_spark.operators.audio import (
        decode_flac_header,
        encode_flac,
        flac_samples,
        make_wav,
        pcm_pattern,
    )

    b = bytearray(encode_flac(pcm_pattern(500, 3), 8000, block_size=256))
    with _pytest.raises(ValueError, match="not a FLAC"):
        decode_flac_header(make_wav(10))
    # flip one byte inside the first frame's residual data
    b[-10] ^= 0x55
    with _pytest.raises(ValueError, match="CRC"):
        flac_samples(bytes(b))
    # constant + extreme values survive exactly
    edge = np.array([-32768, 32767, 0, -1, 1] * 100, dtype=np.int16)
    from skopje_spark.operators.audio import flac_samples as dec
    from skopje_spark.operators.audio import encode_flac as enc

    assert np.array_equal(dec(enc(edge, 8000, block_size=128)), edge)


def test_mp3_header_walk_and_sniff():
    """Frame-header arithmetic: the constructed CBR stream walks to
    the exact frame count, sample total, and duration; ID3v2 tags
    skip; false 0xFFE syncs and junk refuse."""
    import pytest as _pytest

    from skopje_spark.operators.audio import (
        decode_mp3_header,
        is_mp3,
        make_flac,
        make_mp3,
    )

    b = make_mp3(25, bitrate_kbps=192, sample_rate=48000)
    ch, rate, kbps, nf, ns, dur = decode_mp3_header(b)
    assert (ch, rate, kbps, nf, ns) == (1, 48000, 192, 25, 25 * 1152)
    assert dur == round(25 * 1152 * 1000 / 48000)
    # ID3v2 prefix skips via the syncsafe size
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 30]) + b"\x00" * 30
    assert decode_mp3_header(tag + b)[3] == 25
    # stereo flag and other rates parse
    st = make_mp3(3, bitrate_kbps=64, sample_rate=32000, channels=2)
    assert decode_mp3_header(st)[:2] == (2, 32000)
    assert not is_mp3(b"\xff\xe0\x00\x00" + b"x" * 64)
    assert not is_mp3(make_flac(100))
    with _pytest.raises(ValueError, match="not an MP3"):
        decode_mp3_header(b"junk")


def test_decode_audio_meta_mixed_corpus(spark):
    """The sniffing metadata kernel over a mixed WAV/FLAC/MP3/junk
    binary column: every format parsed by its real header tier,
    unknowns rowed out as format='unknown', nothing collected to the
    driver."""
    from skopje_spark.operators.audio import (
        decode_audio_meta,
        make_flac,
        make_mp3,
        make_wav,
    )

    rows = [
        (0, make_wav(400, seed=1, sample_rate=8000)),
        (1, make_flac(600, seed=2, sample_rate=16000)),
        (2, make_mp3(12, bitrate_kbps=128, sample_rate=44100)),
        (3, b"not audio at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["format"], r["channels"], r["sample_rate"],
                      r["n_samples"], r["duration_ms"])
        for r in decode_audio_meta(df).collect()
    }
    assert got[0] == ("wav", 1, 8000, 400, 50)
    assert got[1] == ("flac", 1, 16000, 600, round(600 * 1000 / 16000))
    assert got[2] == ("mp3", 1, 44100, 12 * 1152,
                      round(12 * 1152 * 1000 / 44100))
    assert got[3] == ("unknown", None, None, None, None)


def test_audio_meta_never_fails_on_magic_prefixed_junk(spark):
    """decode_audio_meta's contract: malformed payloads — including
    junk that merely starts with a format magic — row out as
    format='unknown', never a task failure."""
    import pytest as _pytest

    from skopje_spark.operators.audio import (
        decode_audio_meta,
        decode_flac_header,
        make_wav,
    )

    with _pytest.raises(ValueError, match="insane STREAMINFO"):
        decode_flac_header(b"fLaC" + b"\x00" * 60)
    rows = [
        (0, b"fLaC" + b"\x00" * 60),          # magic + garbage STREAMINFO
        (1, b"fLaC" + b"\x80\x00\x00\x01Z"),  # truncated metadata block
        (2, b"RIFF" + b"\x00" * 60),           # WAV near-miss
        (3, make_wav(50)),                      # one real payload
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r["format"] for r in decode_audio_meta(df).collect()
    }
    assert got == {0: "unknown", 1: "unknown", 2: "unknown", 3: "wav"}
