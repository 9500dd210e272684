"""Native WAV/PCM codec + audio operators: encode→decode round-trips,
malformed-payload normalization to AudioDecodeError (never a raw
struct/numpy error), multi-channel/rate coverage, and the distributed
audio_meta / audio_frame_rms kernels on a mixed (good + corrupt)
corpus. Mirrors tests/test_imagecodec.py, the image analog."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import soak_examples

from pandasql_spark.functions.audiocodec import (
    AudioDecodeError,
    decode_wav,
    encode_wav,
    wav_meta,
)


# ---------------------------------------------------------------------------
# codec round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("channels", [1, 2, 3, 6])
@pytest.mark.parametrize("rate", [8000, 16000, 44100])
def test_roundtrip_exact(channels, rate):
    rng = np.random.default_rng(channels * rate)
    samples = rng.integers(-(2**15), 2**15, size=(101, channels), dtype=np.int16)
    b = encode_wav(samples, rate)
    got_rate, got = decode_wav(b)
    assert got_rate == rate
    np.testing.assert_array_equal(got, samples)
    assert wav_meta(b) == (rate, channels, 16, 101)


def test_mono_1d_input_roundtrips_as_column():
    samples = np.arange(-5, 5, dtype=np.int16)
    rate, got = decode_wav(encode_wav(samples, 8000))
    assert got.shape == (10, 1)
    np.testing.assert_array_equal(got[:, 0], samples)


def test_extra_chunks_between_fmt_and_data_are_skipped():
    """Real-world WAVs carry LIST/INFO/fact chunks; the chunk walk must
    skip them (including odd-size word-alignment padding)."""
    samples = np.array([[1, -1], [2, -2]], dtype=np.int16)
    b = encode_wav(samples, 4000)
    # splice an odd-sized junk chunk between fmt and data
    data_at = b.index(b"data")
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded to even
    spliced = b[:data_at] + junk + b[data_at:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, got = decode_wav(spliced)
    assert rate == 4000
    np.testing.assert_array_equal(got, samples)
    assert wav_meta(spliced) == (4000, 2, 16, 2)


def test_extreme_amplitudes_survive():
    samples = np.array([[-(2**15)], [2**15 - 1], [0]], dtype=np.int16)
    _, got = decode_wav(encode_wav(samples, 1000))
    np.testing.assert_array_equal(got, samples)


# ---------------------------------------------------------------------------
# malformed payloads normalize to AudioDecodeError
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"\x00" * 32,
        b"RIFF",  # truncated header
        b"RIFF\x08\x00\x00\x00WAVE",  # container only, no chunks
        b"OggS" + b"\x00" * 40,  # wrong container
    ],
)
def test_garbage_raises_decode_error(payload):
    with pytest.raises(AudioDecodeError):
        decode_wav(payload)
    with pytest.raises(AudioDecodeError):
        wav_meta(payload)


def test_truncated_chunk_raises_decode_error_not_struct_error():
    b = encode_wav(np.ones((50, 2), dtype=np.int16), 8000)
    for cut in (13, 20, len(b) // 2, len(b) - 1):
        with pytest.raises(AudioDecodeError):
            decode_wav(b[:cut])


def test_non_pcm_format_tag_rejected():
    b = bytearray(encode_wav(np.ones(4, dtype=np.int16), 8000))
    fmt_at = bytes(b).index(b"fmt ") + 8
    b[fmt_at : fmt_at + 2] = struct.pack("<H", 3)  # IEEE float tag
    with pytest.raises(AudioDecodeError, match="format tag"):
        decode_wav(bytes(b))


def test_data_before_fmt_rejected_by_meta():
    payload = b"data" + struct.pack("<I", 4) + b"\x00" * 4
    b = b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WAVE" + payload
    with pytest.raises(AudioDecodeError):
        wav_meta(b)


def test_ragged_data_chunk_rejected():
    b = bytearray(encode_wav(np.ones((3, 2), dtype=np.int16), 8000))
    # shrink the data chunk size by one byte -> not a whole frame count
    data_at = bytes(b).index(b"data")
    (size,) = struct.unpack_from("<I", b, data_at + 4)
    struct.pack_into("<I", b, data_at + 4, size - 1)
    struct.pack_into("<I", b, 4, len(b) - 8 - 1)
    with pytest.raises(AudioDecodeError):
        decode_wav(bytes(b[:-1]))


def test_encode_validates_inputs():
    with pytest.raises(ValueError):
        encode_wav(np.zeros((0, 1), dtype=np.int16), 8000)
    with pytest.raises(ValueError):
        encode_wav(np.ones(4, dtype=np.int16), 0)
    with pytest.raises(ValueError):
        encode_wav(np.ones((2, 2, 2), dtype=np.int16), 8000)


# ---------------------------------------------------------------------------
# property: every encodable signal round-trips bit-exactly
# ---------------------------------------------------------------------------


@settings(
    max_examples=soak_examples(50),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    n=st.integers(min_value=1, max_value=400),
    ch=st.integers(min_value=1, max_value=4),
    rate=st.integers(min_value=1, max_value=192_000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_property_roundtrip(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2**15), 2**15, size=(n, ch), dtype=np.int16)
    b = encode_wav(samples, rate)
    got_rate, got = decode_wav(b)
    assert got_rate == rate
    np.testing.assert_array_equal(got, samples)
    assert wav_meta(b) == (rate, ch, 16, n)
    assert len(b) == 44 + n * ch * 2  # canonical layout is fixed-size


@settings(
    max_examples=soak_examples(50),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(junk=st.binary(max_size=200))
def test_property_arbitrary_bytes_never_raise_foreign_errors(junk):
    """Decode either succeeds or raises AudioDecodeError — never a raw
    struct.error / ValueError from numpy — so one corrupt payload can't
    kill a distributed kernel."""
    for fn in (decode_wav, wav_meta):
        try:
            fn(junk)
        except AudioDecodeError:
            pass


# ---------------------------------------------------------------------------
# distributed kernels: audio_meta / audio_frame_rms on a mixed corpus
# ---------------------------------------------------------------------------


def _mixed_corpus(spark, n_good=6, n_bad=2):
    rows = []
    for i in range(n_good):
        ns, ch, rate = 40 + 7 * i, 1 + i % 3, 1000 * (1 + i % 4)
        ramp = np.arange(ns, dtype=np.int16)
        rows.append((i, bytearray(encode_wav(np.repeat(ramp[:, None], ch, 1), rate))))
    for j in range(n_bad):
        rows.append((n_good + j, bytearray(b"\xde\xad" * (8 + j))))
    return spark.createDataFrame(rows, "media_id long, payload binary").repartition(3)


def test_audio_meta_mixed_corpus(spark):
    from pandasql_spark.operators.multimodal import audio_meta

    got = (
        audio_meta(_mixed_corpus(spark))
        .toPandas()
        .sort_values("media_id", ignore_index=True)
    )
    assert len(got) == 8
    good = got[got["decode_ok"]]
    bad = got[~got["decode_ok"]]
    assert len(good) == 6 and len(bad) == 2
    for i, row in good.iterrows():
        ns, ch, rate = 40 + 7 * i, 1 + i % 3, 1000 * (1 + i % 4)
        assert (row["sample_rate"], row["n_channels"], row["n_samples"]) == (
            rate,
            ch,
            ns,
        )
        assert row["duration_s"] == round(ns / rate, 6)
        assert row["peak"] == ns - 1
        # ramp 0..ns-1 on every channel: RMS = sqrt((ns-1)(2ns-1)/6)
        assert row["rms"] == round(float(np.sqrt((ns - 1) * (2 * ns - 1) / 6)), 6)
        assert row["size_bytes"] == 44 + ns * ch * 2
    assert bad[["sample_rate", "n_samples", "rms", "peak"]].isna().all().all()


def test_audio_frame_rms_mixed_corpus(spark):
    from pandasql_spark.operators.multimodal import audio_frame_rms

    got = (
        audio_frame_rms(_mixed_corpus(spark), frame_len=16)
        .toPandas()
        .sort_values(["media_id", "frame_idx"], ignore_index=True)
    )
    # corrupt payloads contribute ZERO rows
    assert set(got["media_id"]) == set(range(6))
    for i, grp in got.groupby("media_id"):
        ns = 40 + 7 * i
        assert len(grp) == -(-ns // 16)  # ceil
        assert grp["frame_samples"].sum() == ns
        assert list(grp["frame_idx"]) == list(range(len(grp)))
        # final (possibly partial) frame: RMS over the tail of the ramp
        f0 = 16 * ((ns - 1) // 16)
        tail = np.arange(f0, ns, dtype=np.float64)
        assert grp["frame_rms"].iloc[-1] == round(
            float(np.sqrt((tail**2).mean())), 6
        )
        # increasing ramp => strictly increasing frame RMS
        assert grp["frame_rms"].is_monotonic_increasing


def test_audio_frame_rms_validates_frame_len(spark):
    from pandasql_spark.operators.multimodal import audio_frame_rms

    with pytest.raises(ValueError):
        audio_frame_rms(_mixed_corpus(spark), frame_len=0)
