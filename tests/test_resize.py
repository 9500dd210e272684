"""Image resize operator (operators/multimodal.resize_images):
nearest-exact semantics, bilinear identity/flatness invariants,
PNG round-trip, corrupt-media contract, validation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pandasql_spark.functions.imagecodec import decode_png, encode_png
from pandasql_spark.operators.multimodal import _resize_np, resize_images


def test_nearest_exact_mapping():
    # 4x4 gradient -> 2x2 nearest must pick centers (rows/cols 1 and 3... 
    # with half-pixel centers: (0.5)*4/2=1.0 -> idx 1, (1.5)*4/2=3.0 -> 3)
    px = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    got = _resize_np(px, 2, 2, "nearest")
    assert got[:, :, 0].tolist() == [[5, 7], [13, 15]]


def test_bilinear_identity_and_flat():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    assert (_resize_np(px, 7, 5, "bilinear") == px).all()  # identity
    flat = np.full((6, 6, 3), 123, np.uint8)
    assert (_resize_np(flat, 3, 9, "bilinear") == 123).all()  # flat stays flat
    # upscale of a gradient stays monotone along the gradient axis
    g = np.tile(np.arange(0, 250, 50, dtype=np.uint8)[None, :, None], (2, 1, 3))
    up = _resize_np(g, 2, 10, "bilinear").astype(int)
    assert (np.diff(up[0, :, 0]) >= 0).all()


def test_resize_images_end_to_end(spark):
    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 256, (8, 6, 3), dtype=np.uint8) for _ in range(3)]
    pdf = pd.DataFrame(
        {
            "media_id": [0, 1, 2, 3],
            "payload": [encode_png(a) for a in imgs] + [b"not an image"],
        }
    )
    out = resize_images(
        spark.createDataFrame(pdf), 4, 4, method="nearest"
    ).toPandas().sort_values("media_id", ignore_index=True)
    bad = out[~out["decode_ok"]]
    assert list(bad["media_id"]) == [3]
    for i in range(3):
        r = out.iloc[i]
        assert (r["src_height"], r["src_width"]) == (8, 6)
        px = decode_png(bytes(r["resized_png"]))
        assert px.shape == (4, 4, 3)
        assert (px == _resize_np(imgs[i], 4, 4, "nearest")).all()


def test_resize_validation(spark):
    df = None
    with pytest.raises(ValueError, match="dims"):
        resize_images(df, 0, 4)
    with pytest.raises(ValueError, match="method"):
        resize_images(df, 4, 4, method="lanczos")
