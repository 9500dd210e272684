"""Real image decode: native PNG codec round-trips, header parsers,
JVM-side dim expressions, and the decode-aware multimodal operators."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandasql_spark.functions import imagecodec as ic
from pandasql_spark.operators import multimodal as mm


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter(channels, filter_type):
    rng = np.random.default_rng(channels * 10 + filter_type)
    a = rng.integers(0, 256, size=(13, 17, channels), dtype=np.uint8)
    b = ic.encode_png(a, filter_type=filter_type)
    assert np.array_equal(ic.decode_png(b), a)
    fmt, w, h, mode = ic.decode_image_meta(b)
    assert (fmt, w, h) == ("png", 17, 13)
    assert mode == {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[channels]


def test_png_grayscale_2d_input():
    g = np.arange(45, dtype=np.uint8).reshape(5, 9)
    out = ic.decode_png(ic.encode_png(g, filter_type=4))
    assert out.shape == (5, 9, 1)
    assert np.array_equal(out[:, :, 0], g)


def test_jpeg_and_gif_headers():
    jfif = b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + bytes([8])
        + struct.pack(">HH", 240, 320)
        + bytes([3, 1, 0x11, 0])
    )
    assert ic.decode_image_meta(jfif + sof0 + b"\xff\xd9") == (
        "jpeg", 320, 240, "RGB",
    )
    gif = b"GIF89a" + struct.pack("<HH", 64, 48) + b"\x00" * 10
    assert ic.decode_image_meta(gif) == ("gif", 64, 48, "P")


def test_garbage_raises_decode_error():
    for junk in (b"", b"hello world, definitely not an image", b"\x89PNGbroken"):
        with pytest.raises(ic.ImageDecodeError):
            ic.decode_image_meta(junk)
    with pytest.raises(ic.ImageDecodeError):
        ic.decode_png(b"\xff\xd8 jpeg is not png")


def test_jvm_png_gif_dims_match_header(spark):
    """png_dims/gif_dims are pure column expressions — assert they agree
    with the Python header parse on real encoded bytes."""
    pngs = [
        ic.encode_png(np.zeros((h, w, 3), dtype=np.uint8))
        for w, h in [(1, 1), (17, 13), (300, 2)]
    ]
    gif = b"GIF89a" + struct.pack("<HH", 513, 300) + b"\x00" * 10
    sdf = spark.createDataFrame(
        pd.DataFrame({"i": range(3), "payload": pngs})
    )
    w, h = mm.png_dims("payload")
    got = sdf.select("i", w.alias("w"), h.alias("h")).toPandas().set_index("i")
    assert list(got["w"]) == [1, 17, 300] and list(got["h"]) == [1, 13, 2]
    gdf = spark.createDataFrame(pd.DataFrame({"payload": [gif]}))
    gw, gh = mm.gif_dims("payload")
    row = gdf.select(gw.alias("w"), gh.alias("h")).first()
    assert (row.w, row.h) == (513, 300)

    # attach_media_meta carries the JVM dims into the struct, and leaves
    # NULLs for a payload that fails the magic check
    mixed = spark.createDataFrame(
        pd.DataFrame({"payload": [pngs[1], b"not a png"]})
    )
    meta = mm.attach_media_meta(mixed, "payload", "image", "png").select(
        "media_meta.*"
    ).toPandas()
    ok = meta[meta["width"].notna()].iloc[0]
    assert (ok["width"], ok["height"]) == (17, 13)
    assert meta["width"].isna().sum() == 1


def test_image_meta_mixed_corpus(spark):
    """Real decode over a mixed corpus: PNGs decode with pixel stats,
    garbage survives as decode_ok=false rows (no job failure)."""
    rng = np.random.default_rng(3)
    img0 = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    img1 = np.full((2, 3, 1), 7, dtype=np.uint8)
    pdf = pd.DataFrame(
        {
            "media_id": [0, 1, 2],
            "payload": [
                ic.encode_png(img0, filter_type=3),
                ic.encode_png(img1),
                b"corrupt bytes here",
            ],
        }
    )
    out = (
        mm.image_meta(spark.createDataFrame(pdf), decode_pixels=True)
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    assert out.loc[0, "decode_ok"] and out.loc[1, "decode_ok"]
    assert not out.loc[2, "decode_ok"]
    assert (out.loc[0, "width"], out.loc[0, "height"], out.loc[0, "mode"]) == (6, 4, "RGB")
    assert out.loc[0, "mean_px"] == pytest.approx(img0.mean())
    assert out.loc[1, "mean_px"] == pytest.approx(7.0)
    assert out.loc[1, "n_pixels"] == 6


def test_extract_image_features_real_content(spark):
    """Features from decoded pixels: dims flow through, constant-fill
    images of different brightness separate on the luma coordinates,
    and identical content yields identical features."""
    dark = ic.encode_png(np.full((8, 8, 3), 10, dtype=np.uint8))
    bright = ic.encode_png(np.full((8, 8, 3), 240, dtype=np.uint8))
    pdf = pd.DataFrame(
        {"media_id": [0, 1, 2], "payload": [dark, bright, dark]}
    )
    out = (
        mm.extract_image_features(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    assert out["decode_ok"].all()
    assert set(out["width"]) == {8} and set(out["height"]) == {8}
    f_dark, f_bright = out.loc[0, "feature"], out.loc[1, "feature"]
    assert list(out.loc[2, "feature"]) == list(f_dark)
    assert f_bright[4] > f_dark[4] + 100  # mean-luma coordinate


def test_truncated_headers_raise_decode_error_not_struct_error():
    import pytest

    # truncated GIF (magic present, screen descriptor cut short)
    with pytest.raises(ic.ImageDecodeError):
        ic.decode_image_meta(b"GIF89a\x01")
    # truncated PNG IHDR payload
    with pytest.raises(ic.ImageDecodeError):
        ic.decode_image_meta(b"\x89PNG\r\n\x1a\n" + b"\x00" * 10)
    # truncated JPEG (SOI then garbage that runs off the end)
    with pytest.raises(ic.ImageDecodeError):
        ic.decode_image_meta(b"\xff\xd8\xff\xc0\x00")


def test_corrupt_idat_raises_decode_error_not_zlib_error():
    import numpy as np
    import pytest

    good = ic.encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    # corrupt one byte inside the IDAT deflate stream
    idat_at = good.index(b"IDAT") + 8
    bad = bytearray(good)
    bad[idat_at] ^= 0xFF
    with pytest.raises(ic.ImageDecodeError):
        ic.decode_png(bytes(bad))


def test_jpeg_ff_fill_padding_before_sof():
    # spec-legal FF fill bytes before the SOF marker must not derail
    # the scanner: SOI, padding, then SOF0 for a 7x5 3-component frame
    sof = b"\xff\xff\xff\xc0" + b"\x00\x11" + b"\x08" + b"\x00\x05\x00\x07" + b"\x03"
    w, h, mode = ic._jpeg_dims(b"\xff\xd8" + sof + b"\x00" * 20)
    assert (w, h, mode) == (7, 5, "RGB")


def test_jfif_header_bytes_parses_but_never_pixel_decodes():
    """The q41 JPEG-branch corpus: jfif_header_bytes carries REAL SOF0
    dims for every header parser, and pixel decode fails
    deterministically (no scan data) — the decode_ok=false contract."""
    import pytest

    b = ic.jfif_header_bytes(9, 4, ncomp=3)
    assert ic.sniff_format(b) == "jpeg"
    assert ic.decode_image_meta(b) == ("jpeg", 9, 4, "RGB")
    with pytest.raises(ic.ImageDecodeError):
        ic.decode_image(b)
    # 1-component variant parses as grayscale
    assert ic.decode_image_meta(ic.jfif_header_bytes(3, 2, ncomp=1))[3] == "L"
    with pytest.raises(ValueError):
        ic.jfif_header_bytes(0, 5)


def test_decode_image_pil_branch(monkeypatch):
    """Exercise the PIL branch of decode_image without PIL in the
    container: a stub module pins the branch's contracts — 3-D output,
    grayscale channel-axis normalization, and exception normalization
    to ImageDecodeError."""
    import io

    import numpy as np
    import pytest

    class FakeImg:
        def __init__(self, arr, mode):
            self._arr, self.mode = arr, mode

        def convert(self, mode):
            assert mode in ("RGB", "L", "LA", "RGBA")
            return self._arr

    class FakePIL:
        payload_to_img = {}

        @staticmethod
        def open(fh):
            data = fh.read() if isinstance(fh, io.BytesIO) else fh
            img = FakePIL.payload_to_img.get(bytes(data))
            if img is None:
                raise OSError("cannot identify image file")
            return img

    monkeypatch.setattr(ic, "HAVE_PIL", True)
    monkeypatch.setattr(ic, "_PILImage", FakePIL)

    rgb = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    FakePIL.payload_to_img[b"rgb-bytes"] = FakeImg(rgb, "RGB")
    out = ic.decode_image(b"rgb-bytes")
    assert out.shape == (2, 4, 3) and (out == rgb).all()

    gray = np.arange(8, dtype=np.uint8).reshape(2, 4)  # PIL 'L' is 2-D
    FakePIL.payload_to_img[b"gray-bytes"] = FakeImg(gray, "L")
    out = ic.decode_image(b"gray-bytes")
    assert out.shape == (2, 4, 1)  # contract: ALWAYS 3-D

    with pytest.raises(ic.ImageDecodeError):
        ic.decode_image(b"not-an-image")


# ---------------------------------------------------------------------------
# GIF codec (native LZW)


def _rand_rgb(rng, h, w, ncol):
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncol, (h, w))]


def test_gif_roundtrip_shapes_and_palettes():
    from pandasql_spark.functions.imagecodec import decode_gif, encode_gif

    rng = np.random.default_rng(7)
    for (h, w), ncol in [((1, 1), 2), ((3, 5), 4), ((16, 16), 7),
                         ((40, 33), 256), ((7, 9), 1), ((2, 300), 16)]:
        rgb = _rand_rgb(rng, h, w, ncol)
        got = decode_gif(encode_gif(rgb))
        assert got.shape == (h, w, 3)
        assert (got == rgb).all()


def test_gif_grayscale_input_expands():
    from pandasql_spark.functions.imagecodec import decode_gif, encode_gif

    g = np.arange(64, dtype=np.uint8).reshape(8, 8) * 3
    got = decode_gif(encode_gif(g))
    assert (got == np.repeat(g[:, :, None], 3, axis=2)).all()


def test_gif_canonical_1x1_real_world():
    """The ubiquitous 1x1 'transparent pixel' GIF — output of a REAL
    standard encoder, so it cross-checks our LZW against the ecosystem,
    not just against our own encoder."""
    import base64

    from pandasql_spark.functions.imagecodec import decode_gif

    b = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    px = decode_gif(b)
    assert px.shape == (1, 1, 3) and (px == 0).all()


def test_gif_interlaced_decode():
    """Handcraft an interlaced file: rows stored in 4-pass order with
    the interlace flag set must come back in display order."""
    from pandasql_spark.functions.imagecodec import (
        _GIF_INTERLACE, decode_gif, encode_gif,
    )

    rng = np.random.default_rng(3)
    rgb = _rand_rgb(rng, 13, 6, 5)
    pass_rows = [
        r for start, step in _GIF_INTERLACE for r in range(start, 13, step)
    ]
    b = bytearray(encode_gif(rgb[pass_rows]))
    # image descriptor: 6(sig)+7(lsd)+3*GCT... find 0x2C block, set bit 6
    gct_depth = (b[10] & 0x07) + 1
    desc = 13 + 3 * (1 << gct_depth)
    assert b[desc] == 0x2C
    b[desc + 9] |= 0x40
    got = decode_gif(bytes(b))
    assert (got == rgb).all()


def test_gif_local_color_table():
    """Move the palette from the global to a local color table."""
    from pandasql_spark.functions.imagecodec import decode_gif, encode_gif

    rng = np.random.default_rng(5)
    rgb = _rand_rgb(rng, 4, 4, 8)
    b = bytearray(encode_gif(rgb))
    depth = (b[10] & 0x07) + 1
    n = 1 << depth
    gct = bytes(b[13:13 + 3 * n])
    rest = bytes(b[13 + 3 * n:])
    out = bytes(b[:10]) + bytes([b[10] & 0x7F]) + bytes(b[11:13])  # GCT off
    assert rest[0] == 0x2C
    out += rest[:9] + bytes([rest[9] | 0x80 | (depth - 1)]) + gct + rest[10:]
    got = decode_gif(out)
    assert (got == rgb).all()


def test_gif_corrupt_payloads_raise():
    from pandasql_spark.functions.imagecodec import (
        ImageDecodeError, decode_gif, encode_gif,
    )

    rng = np.random.default_rng(11)
    good = encode_gif(_rand_rgb(rng, 6, 6, 4))
    for bad in [b"", b"GIF89a", good[:20], good[:-10],
                b"NOTGIF" + good[6:], good[:11] + b"\xff" * 5]:
        with pytest.raises(ImageDecodeError):
            decode_gif(bad)


def test_gif_encode_validation():
    from pandasql_spark.functions.imagecodec import encode_gif

    with pytest.raises(ValueError, match="uint8"):
        encode_gif(np.zeros((2, 2, 3), np.float32))
    with pytest.raises(ValueError, match="shape|need"):
        encode_gif(np.zeros((2, 2, 4), np.uint8))
    rng = np.random.default_rng(13)
    toomany = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    if len(np.unique(toomany.reshape(-1, 3), axis=0)) > 256:
        with pytest.raises(ValueError, match="256"):
            encode_gif(toomany)


def test_gif_decode_image_native_route():
    """decode_image must pixel-decode GIF without PIL."""
    from pandasql_spark.functions import imagecodec as ic

    rng = np.random.default_rng(17)
    rgb = _rand_rgb(rng, 5, 7, 6)
    b = ic.encode_gif(rgb)
    orig = ic.HAVE_PIL
    ic.HAVE_PIL = False
    try:
        got = ic.decode_image(b)
    finally:
        ic.HAVE_PIL = orig
    assert (got == rgb).all()


def test_gif_lzw_table_overflow_reset():
    """A high-entropy image large enough to overflow the 12-bit table
    forces the mid-stream CLEAR/reset path on both sides."""
    from pandasql_spark.functions.imagecodec import decode_gif, encode_gif

    rng = np.random.default_rng(19)
    rgb = _rand_rgb(rng, 120, 120, 256)  # 14400 px, 256 colors
    got = decode_gif(encode_gif(rgb))
    assert (got == rgb).all()


def test_gif87a_header_variant_decodes():
    from pandasql_spark.functions.imagecodec import decode_gif, encode_gif

    rng = np.random.default_rng(23)
    rgb = _rand_rgb(rng, 5, 5, 4)
    b = bytearray(encode_gif(rgb))
    b[3:6] = b"87a"
    assert (decode_gif(bytes(b)) == rgb).all()
