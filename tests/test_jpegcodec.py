"""Native baseline JPEG codec: round-trip error bounds, exactness on
flat images, marker/stream structure, 4:2:0 + restart-marker decode
via hand-rolled spec streams, corrupt-payload normalization, and the
decode_image routing without PIL."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pandasql_spark.functions.imagecodec import ImageDecodeError
from pandasql_spark.functions.jpegcodec import (
    AC_LUMA_SPEC,
    DC_CHROMA_SPEC,
    DC_LUMA_SPEC,
    QUANT_LUMA,
    ZIGZAG,
    _BitWriter,
    _canonical_codes,
    _magnitude,
    _scaled_quant,
    decode_jpeg,
    encode_jpeg,
)


def test_flat_images_roundtrip_exactly():
    for shape, val in [((16, 24), 100), ((8, 8), 0), ((9, 13), 255)]:
        g = np.full(shape, val, np.uint8)
        d = decode_jpeg(encode_jpeg(g, quality=90))
        assert d.shape == (*shape, 1)
        assert (d[:, :, 0] == val).all()
    c = np.zeros((24, 16, 3), np.uint8)
    c[:] = (200, 30, 90)
    d = decode_jpeg(encode_jpeg(c, quality=90))
    assert d.shape == (24, 16, 3)
    assert (d == c).all()


def test_block_tiled_flat_colors_tight():
    """8x8-aligned flat tiles: DC-only blocks, DC differential + Huffman
    across blocks; reconstruction within DC quantization error."""
    rng = np.random.default_rng(1)
    tiles = rng.integers(0, 256, (4, 5), dtype=np.uint8)
    img = np.kron(tiles, np.ones((8, 8), np.uint8))
    d = decode_jpeg(encode_jpeg(img, quality=90))[:, :, 0]
    exp = np.kron(tiles, np.ones((8, 8), np.uint8)).astype(int)
    assert np.abs(d.astype(int) - exp).max() <= 1


def test_gradient_and_noise_error_bounds():
    x = np.linspace(0, 255, 64)
    grad = np.round(np.add.outer(x, x) / 2).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(grad, quality=90))[:, :, 0]
    assert np.abs(d.astype(int) - grad.astype(int)).max() <= 3
    rng = np.random.default_rng(0)
    noisy = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(noisy, quality=95))
    assert np.abs(d.astype(int) - noisy.astype(int)).max() <= 32


def test_quality_monotone():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    errs, sizes = [], []
    for q in (30, 60, 95):
        b = encode_jpeg(img, quality=q)
        d = decode_jpeg(b)[:, :, 0]
        errs.append(np.abs(d.astype(int) - img.astype(int)).mean())
        sizes.append(len(b))
    assert errs[0] > errs[-1]
    assert sizes[0] < sizes[-1]


def test_header_parity_with_meta_parser():
    from pandasql_spark.functions.imagecodec import decode_image_meta

    b = encode_jpeg(np.zeros((21, 37, 3), np.uint8))
    fmt, w, h, mode = decode_image_meta(b)
    assert (fmt, w, h) == ("jpeg", 37, 21)


def test_decode_image_routes_jpeg_without_pil():
    from pandasql_spark.functions import imagecodec as ic

    img = np.full((10, 12, 3), 64, np.uint8)
    b = encode_jpeg(img)
    orig = ic.HAVE_PIL
    ic.HAVE_PIL = False
    try:
        got = ic.decode_image(b)
    finally:
        ic.HAVE_PIL = orig
    assert (got == img).all()


def test_header_only_jfif_still_fails_pixel_decode():
    """q41's corrupt-branch contract: a header-only JFIF stream parses
    metadata but must raise on pixel decode."""
    from pandasql_spark.functions.imagecodec import jfif_header_bytes

    with pytest.raises(ImageDecodeError, match="no scan data"):
        decode_jpeg(jfif_header_bytes(5, 4))


def test_corrupt_payloads_raise():
    good = encode_jpeg(np.full((8, 8), 9, np.uint8))
    for bad in [b"", b"\xff\xd8", good[:30], good[:-4] + b"\x00" * 4,
                b"NO" + good[2:]]:
        with pytest.raises(ImageDecodeError):
            decode_jpeg(bad)


def test_progressive_rejected_not_garbled():
    good = bytearray(encode_jpeg(np.full((8, 8), 9, np.uint8)))
    i = bytes(good).find(b"\xff\xc0")
    good[i + 1] = 0xC2  # claim progressive
    with pytest.raises(ImageDecodeError, match="non-baseline"):
        decode_jpeg(bytes(good))


def test_encode_validation():
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((4, 4), np.float32))
    with pytest.raises(ValueError, match="need"):
        encode_jpeg(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(np.zeros((4, 4), np.uint8), quality=0)


# ---------------------------------------------------------------------------
# hand-rolled spec streams: 4:2:0 sampling and restart markers — paths
# our encoder never emits, decoded against values computed from the spec


def _dc_only_stream(dc_codes, blocks_syms):
    """Entropy-code a sequence of DC-only blocks: per block (table,
    diff) — AC is EOB immediately. Returns stuffed bytes."""
    ac_l = _canonical_codes(*AC_LUMA_SPEC)
    wr = _BitWriter()
    for table, diff, ac_table in blocks_syms:
        s, bits = _magnitude(diff)
        code, ln = table[s]
        wr.write(code, ln)
        if s:
            wr.write(bits, s)
        code, ln = (ac_table or ac_l)[0x00]
        wr.write(code, ln)
    return wr.flush()


def _marker(m, payload):
    return bytes([0xFF, m]) + struct.pack(">H", len(payload) + 2) + payload


def _dqt_flat():
    qt = _scaled_quant(QUANT_LUMA, 90)
    return _marker(0xDB, bytes([0]) + qt.ravel()[ZIGZAG].astype(np.uint8).tobytes()), qt


def _dht_segments():
    segs = b""
    for cls, spec, ti in ((0, DC_LUMA_SPEC, 0), (0, DC_CHROMA_SPEC, 1),
                          (1, AC_LUMA_SPEC, 0), (1, AC_LUMA_SPEC, 1)):
        bits_, vals = spec
        segs += _marker(0xC4, bytes([cls << 4 | ti]) + bytes(bits_) + bytes(vals))
    return segs


def test_420_subsampled_decode():
    """16x16 4:2:0 gray-in-color stream: Y carries 4 DC-only blocks of
    one value, Cb/Cr one block each at 128 (neutral) — decoded result
    must be the flat gray the DC values encode, through the MCU
    interleave + chroma upsample paths."""
    dqt, qt = _dqt_flat()
    q0 = int(qt[0, 0])
    val = 180
    dc = int(round((val - 128) * 8.0 / q0))
    recon = int(np.clip(round(dc * q0 / 8.0 + 128), 0, 255))

    sof = _marker(0xC0, struct.pack(">BHHB", 8, 16, 16, 3)
                  + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0]))
    sos = _marker(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00")
    dc_l = _canonical_codes(*DC_LUMA_SPEC)
    dc_c = _canonical_codes(*DC_CHROMA_SPEC)
    # one MCU: 4 Y blocks (first carries diff=dc, rest 0) + Cb + Cr (0)
    blocks = [(dc_l, dc, None)] + [(dc_l, 0, None)] * 3 \
        + [(dc_c, 0, None), (dc_c, 0, None)]
    data = _dc_only_stream(dc_l, blocks)
    b = (b"\xff\xd8" + dqt + _dht_segments() + sof + sos + data + b"\xff\xd9")
    out = decode_jpeg(b)
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - recon).max() <= 1  # YCbCr roundoff
    # all three channels equal (neutral chroma)
    assert (out[:, :, 0] == out[:, :, 1]).all()


def test_restart_markers_reset_prediction():
    """Two MCUs with DRI=1: an RST0 between them byte-aligns and RESETS
    the DC predictor, so the second block's diff is absolute."""
    dqt, qt = _dqt_flat()
    q0 = int(qt[0, 0])
    vals = [60, 200]
    dcs = [int(round((v - 128) * 8.0 / q0)) for v in vals]
    recon = [int(np.clip(round(d * q0 / 8.0 + 128), 0, 255)) for d in dcs]

    sof = _marker(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    dri = _marker(0xDD, struct.pack(">H", 1))
    sos = _marker(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    dc_l = _canonical_codes(*DC_LUMA_SPEC)
    seg1 = _dc_only_stream(dc_l, [(dc_l, dcs[0], None)])
    seg2 = _dc_only_stream(dc_l, [(dc_l, dcs[1], None)])  # absolute again
    b = (b"\xff\xd8" + dqt + _dht_segments() + sof + dri + sos
         + seg1 + b"\xff\xd0" + seg2 + b"\xff\xd9")
    out = decode_jpeg(b)[:, :, 0]
    assert out.shape == (8, 16)
    assert np.abs(out[:, :8].astype(int) - recon[0]).max() == 0
    assert np.abs(out[:, 8:].astype(int) - recon[1]).max() == 0


def test_422_and_440_subsampled_decode():
    """4:2:2 (h=2,v=1) and 4:4:0 (h=1,v=2) MCU layouts through the
    same hand-rolled DC-only construction as the 4:2:0 test."""
    dqt, qt = _dqt_flat()
    q0 = int(qt[0, 0])
    val = 77
    dc = int(round((val - 128) * 8.0 / q0))
    recon = int(np.clip(round(dc * q0 / 8.0 + 128), 0, 255))
    dc_l = _canonical_codes(*DC_LUMA_SPEC)
    dc_c = _canonical_codes(*DC_CHROMA_SPEC)

    for hv, w, h, ny in ((0x21, 16, 8, 2), (0x12, 8, 16, 2)):
        sof = _marker(0xC0, struct.pack(">BHHB", 8, h, w, 3)
                      + bytes([1, hv, 0]) + bytes([2, 0x11, 0])
                      + bytes([3, 0x11, 0]))
        sos = _marker(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11])
                      + b"\x00\x3f\x00")
        blocks = [(dc_l, dc, None)] + [(dc_l, 0, None)] * (ny - 1) \
            + [(dc_c, 0, None), (dc_c, 0, None)]
        data = _dc_only_stream(dc_l, blocks)
        b = (b"\xff\xd8" + dqt + _dht_segments() + sof + sos + data
             + b"\xff\xd9")
        out = decode_jpeg(b)
        assert out.shape == (h, w, 3)
        assert np.abs(out.astype(int) - recon).max() <= 1


def test_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2: 0xFF fill bytes may precede any marker."""
    img = np.full((8, 8), 42, np.uint8)
    good = encode_jpeg(img)
    # inject fill bytes before the DQT marker (first marker after APP0)
    i = good.find(b"\xff\xdb")
    padded = good[:i] + b"\xff\xff\xff" + good[i:]
    out = decode_jpeg(padded)
    assert (out[:, :, 0] == 42).all()
