"""Hypothesis property suites for the native media codecs: GIF
round-trips EXACTLY on arbitrary palette images (lossless by
construction); JPEG reconstructs flat tiles within the DC-quantization
bound and never crashes/garbles on arbitrary content; both decoders
normalize arbitrary byte mutations to ImageDecodeError, never other
exceptions."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import soak_examples

from pandasql_spark.functions.imagecodec import (
    ImageDecodeError,
    decode_gif,
    encode_gif,
)
from pandasql_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

_SETTINGS = dict(
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@st.composite
def _palette_image(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    ncol = draw(st.integers(1, 16))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncol, (h, w))]


@settings(max_examples=soak_examples(40), **_SETTINGS)
@given(rgb=_palette_image())
def test_gif_roundtrip_exact(rgb):
    got = decode_gif(encode_gif(rgb))
    assert got.shape == rgb.shape
    assert (got == rgb).all()


@settings(max_examples=soak_examples(30), **_SETTINGS)
@given(rgb=_palette_image(), data=st.data())
def test_gif_mutation_never_garbles_silently(rgb, data):
    """Any single-byte corruption either still decodes to a VALID-shape
    image or raises ImageDecodeError — never another exception type."""
    b = bytearray(encode_gif(rgb))
    i = data.draw(st.integers(0, len(b) - 1))
    v = data.draw(st.integers(0, 255))
    b[i] = v
    try:
        out = decode_gif(bytes(b))
        assert out.ndim == 3 and out.shape[2] == 3
    except ImageDecodeError:
        pass


@settings(max_examples=soak_examples(25), **_SETTINGS)
@given(
    bh=st.integers(1, 3),
    bw=st.integers(1, 3),
    seed=st.integers(0, 2**31 - 1),
    quality=st.integers(50, 95),
)
def test_jpeg_flat_tiles_within_dc_bound(bh, bw, seed, quality):
    rng = np.random.default_rng(seed)
    tiles = rng.integers(0, 256, (bh, bw), dtype=np.uint8)
    img = np.kron(tiles, np.ones((8, 8), np.uint8))
    got = decode_jpeg(encode_jpeg(img, quality=quality))[:, :, 0]
    exp = img.astype(int)
    # DC quant step at quality q: bound = ceil(step/8/2) + 1 rounding
    from pandasql_spark.functions.jpegcodec import QUANT_LUMA, _scaled_quant

    q0 = int(_scaled_quant(QUANT_LUMA, quality)[0, 0])
    bound = q0 / 16 + 1
    assert np.abs(got - exp).max() <= bound


@settings(max_examples=soak_examples(20), **_SETTINGS)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
    color=st.booleans(),
)
def test_jpeg_arbitrary_content_roundtrip_bounded(h, w, seed, color):
    """Noise is the worst case for DCT quantization: the decode must
    stay within a generous-but-finite bound and exact dims/channels."""
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape[:2] == (h, w)
    assert out.shape[2] == (3 if color else 1)
    ref = img if color else img[:, :, None]
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 48


@settings(max_examples=soak_examples(25), **_SETTINGS)
@given(
    h=st.integers(1, 16), w=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1), data=st.data(),
)
def test_jpeg_mutation_never_garbles_silently(h, w, seed, data):
    rng = np.random.default_rng(seed)
    b = bytearray(encode_jpeg(rng.integers(0, 256, (h, w), dtype=np.uint8)))
    i = data.draw(st.integers(0, len(b) - 1))
    b[i] = data.draw(st.integers(0, 255))
    try:
        out = decode_jpeg(bytes(b))
        assert out.ndim == 3
    except ImageDecodeError:
        pass


# ---------------------------------------------------------------------------
# WAV: single-byte mutations normalize to AudioDecodeError or decode to
# a shape-valid result (same robustness contract as the image codecs)


@settings(max_examples=soak_examples(30), **_SETTINGS)
@given(
    ns=st.integers(1, 200),
    ch=st.integers(1, 3),
    k=st.integers(0, 3),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
def test_wav_mutation_never_garbles_silently(ns, ch, k, seed, data):
    from pandasql_spark.functions.audiocodec import (
        AudioDecodeError,
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2**15), 2**15, (ns, ch)).astype(np.int16)
    b = bytearray(encode_wav(samples, 1000 * (1 << k)))
    i = data.draw(st.integers(0, len(b) - 1))
    b[i] = data.draw(st.integers(0, 255))
    try:
        rate, out = decode_wav(bytes(b))
        assert out.ndim == 2 and rate > 0
    except AudioDecodeError:
        pass


# ---------------------------------------------------------------------------
# MJPEG AVI (round 9): flat-tile videos round-trip within the DC quant
# bound through the full container walk, and single-byte mutations
# normalize to VideoDecodeError or a shape-valid decode


@settings(max_examples=soak_examples(20), **_SETTINGS)
@given(
    nf=st.integers(1, 4),
    bh=st.integers(1, 2),
    bw=st.integers(1, 3),
    fps=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
)
def test_mjpeg_avi_flat_tiles_within_dc_bound(nf, bh, bw, fps, seed):
    from pandasql_spark.functions.videocodec import decode_avi, encode_avi

    rng = np.random.default_rng(seed)
    tiles = rng.integers(0, 256, (nf, bh, bw), dtype=np.uint8)
    frames = np.kron(tiles, np.ones((1, 8, 8), np.uint8))[..., None].repeat(
        3, axis=3
    )
    got_fps, got = decode_avi(encode_avi(frames, fps=fps, codec="mjpg"))
    assert got_fps == float(fps)
    assert got.shape == frames.shape
    assert np.abs(got.astype(int) - frames.astype(int)).max() <= 1


@settings(max_examples=soak_examples(20), **_SETTINGS)
@given(
    nf=st.integers(1, 3),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
def test_mjpeg_avi_mutation_never_garbles_silently(nf, seed, data):
    from pandasql_spark.functions.videocodec import (
        VideoDecodeError,
        decode_avi,
        encode_avi,
    )

    rng = np.random.default_rng(seed)
    tiles = rng.integers(0, 256, (nf, 1, 2), dtype=np.uint8)
    frames = np.kron(tiles, np.ones((1, 8, 8), np.uint8))[..., None].repeat(
        3, axis=3
    )
    b = bytearray(encode_avi(frames, fps=5, codec="mjpg"))
    i = data.draw(st.integers(0, len(b) - 1))
    b[i] = data.draw(st.integers(0, 255))
    try:
        _, out = decode_avi(bytes(b))
        assert out.ndim == 4 and out.shape[3] == 3
    except VideoDecodeError:
        pass


# ------------------------- r13 batched perceptual-kernel differentials


@st.composite
def _pixel_batch(draw):
    """A small batch of decoded images with DELIBERATE shape reuse so
    both the stacked groups and the singleton fallback are exercised
    in one example."""
    n = draw(st.integers(1, 8))
    shapes = draw(
        st.lists(
            st.tuples(st.integers(1, 20), st.integers(1, 20)),
            min_size=1,
            max_size=3,
        )
    )
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        h, w = shapes[i % len(shapes)]
        if i % 3 == 0:
            out.append(rng.integers(0, 256, (h, w), dtype=np.uint8))
        elif i % 3 == 1:
            out.append(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        else:
            out.append(np.full((h, w, 3), int(rng.integers(0, 256)), np.uint8))
    return out


@settings(max_examples=soak_examples(40), **_SETTINGS)
@given(pxs=_pixel_batch())
def test_dhash_batch_equals_scalar_property(pxs):
    """_dhash64_batch == per-image _dhash64 bit-for-bit on arbitrary
    grey/RGB/flat batches with mixed shape-group sizes (the q41/q96
    oracle closed forms depend on this identity)."""
    from pandasql_spark.operators.dedup import _dhash64, _dhash64_batch

    assert _dhash64_batch(pxs) == [_dhash64(p) for p in pxs]


@st.composite
def _clip_batch(draw):
    n = draw(st.integers(1, 6))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    clips = []
    for _ in range(n):
        rate = draw(
            st.sampled_from([1000, 2000, 4000, 8000, 16000, 44100])
        )
        ln = draw(st.integers(1, 2500))
        ch = draw(st.integers(1, 3))
        kind = draw(st.integers(0, 3))
        if kind == 0:
            arr = np.zeros((ln, ch), dtype=np.int16)
        elif kind == 1:
            arr = np.repeat(
                np.arange(ln, dtype=np.int16)[:, None], ch, axis=1
            )
        elif kind == 2:
            arr = rng.integers(-32768, 32767, (ln, ch)).astype(np.int16)
        else:
            t = np.arange(ln) / rate
            hz = draw(st.sampled_from([50, 440, 1900, 3900]))
            arr = np.repeat(
                (9000 * np.sin(2 * np.pi * hz * t)).astype(np.int16)[:, None],
                ch,
                axis=1,
            )
        clips.append((arr, rate))
    return clips


@settings(max_examples=soak_examples(30), **_SETTINGS)
@given(clips=_clip_batch())
def test_audio_fp_batch_equals_scalar_property(clips):
    """_audio_fp64_batch == per-clip _audio_fp64 bit-for-bit on
    arbitrary clip batches across rates that change the FFT window
    (the q80 oracle closed form depends on this identity)."""
    from pandasql_spark.operators.dedup import _audio_fp64, _audio_fp64_batch

    assert _audio_fp64_batch(clips) == [_audio_fp64(a, r) for a, r in clips]
