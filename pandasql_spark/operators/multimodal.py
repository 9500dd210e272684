"""Multimodal (image/audio/video) column handling.

Media payloads are opaque ``binary`` columns with a typed metadata
struct — the only scalable representation: the bytes never leave the
executors, all planning happens on metadata. Decode/feature kernels are
Arrow-batched ``mapInPandas`` functions.

Every modality decodes for REAL with no external libraries: PNG (zlib
inflate + scanline unfilter), GIF (LZW), baseline JPEG (Huffman +
IDCT) via ``functions/imagecodec.py``/``jpegcodec.py``; WAV/PCM audio
via ``functions/audiocodec.py``; uncompressed-AVI video via
``functions/videocodec.py`` (frame sampling re-encodes frames as PNG
so they compose with the image operators). COMPRESSED video codecs
(H.264, MJPEG, …) are explicitly rejected — no codec library exists
in this container, and rejected-not-garbled is the contract; an
optional PIL fast path accelerates images when installed.

Scale notes: ``mapInPandas`` is shuffle-free (embarrassingly parallel);
``spark.sql.files.maxPartitionBytes`` bounds the bytes a single task
holds; decode emits small fixed-width rows, so output is orders of
magnitude smaller than input — the right direction for a 100 TB media
crawl. For the PNG/GIF fast path, header dims are also available as
pure JVM column expressions (``png_dims`` / ``gif_dims``) — zero Python
crossing for the metadata-only question.

Reference parity: the reference engine (pandasql) has no media surface;
this module is part of the beyond-reference pipeline operators.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.imagecodec import (
    ImageDecodeError,
    decode_image,
    decode_image_meta,
)

#: typed metadata struct carried next to every media binary column.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),      # png|jpeg|wav|mp4…
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
        # pixel stats (decode_pixels=True only; NULL otherwise)
        T.StructField("n_pixels", T.LongType()),
        T.StructField("mean_px", T.DoubleType()),
    ]
)


# ---------------------------------------------------------------------------
# JVM-side header dims (no Python crossing)
# ---------------------------------------------------------------------------


def png_dims(payload: Column | str) -> tuple[Column, Column]:
    """(width, height) straight out of the PNG IHDR as JVM column
    expressions — big-endian u32 at byte offsets 16/20. Whole-stage
    codegen, no UDF: the scale path when only dimensions are needed."""
    p = F.col(payload) if isinstance(payload, str) else payload
    def be32(off: int) -> Column:
        return F.conv(F.hex(F.substring(p, off, 4)), 16, 10).cast("int")
    return be32(17), be32(21)  # substring is 1-indexed


def gif_dims(payload: Column | str) -> tuple[Column, Column]:
    """(width, height) from the GIF logical screen descriptor —
    little-endian u16 at offsets 6/8, as JVM column expressions."""
    p = F.col(payload) if isinstance(payload, str) else payload
    def le16(off: int) -> Column:
        lo = F.conv(F.hex(F.substring(p, off, 1)), 16, 10).cast("int")
        hi = F.conv(F.hex(F.substring(p, off + 1, 1)), 16, 10).cast("int")
        return lo + hi * 256
    return le16(7), le16(9)


def attach_media_meta(
    df: DataFrame, payload_col: str, media_type: str, fmt: str
) -> DataFrame:
    """Attach the typed metadata struct. PNG/GIF payload dims are parsed
    JVM-side (header offsets, see png_dims/gif_dims); other formats get
    NULL dims here — use ``image_meta`` for the full Python-side parse."""
    p = F.col(payload_col)
    if fmt == "png":
        w, h = png_dims(p)
        is_fmt = F.substring(p, 1, 8) == F.lit(bytes([0x89]) + b"PNG\r\n\x1a\n")
    elif fmt == "gif":
        w, h = gif_dims(p)
        is_fmt = F.substring(p, 1, 3) == F.lit(b"GIF")
    else:
        w = h = F.lit(None).cast("int")
        is_fmt = F.lit(False)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.when(is_fmt, w).cast("int").alias("width"),
            F.when(is_fmt, h).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(p).cast("long").alias("size_bytes"),
        ),
    )


# ---------------------------------------------------------------------------
# Python-side decode kernels (Arrow-batched)
# ---------------------------------------------------------------------------


def image_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decode_pixels: bool = False,
) -> DataFrame:
    """Real image metadata per payload: format sniff + header parse
    (PNG/JPEG/GIF). With ``decode_pixels=True`` the PNG pixel data is
    fully decoded (zlib + unfilter) and per-image pixel stats
    (n_pixels, mean_px) are emitted — proof of decode, not just header
    reads. Undecodable payloads survive as decode_ok=false rows."""

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in IMAGE_META_SCHEMA.fields}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                rows["media_id"].append(int(mid))
                rows["size_bytes"].append(len(b))
                try:
                    fmt, w, h, mode = decode_image_meta(b)
                    ok = True
                except ImageDecodeError:
                    fmt = w = h = mode = None
                    ok = False
                npx = mean = None
                if ok and decode_pixels:
                    try:
                        px = decode_image(b)
                        npx = int(px.shape[0] * px.shape[1])
                        mean = float(px.mean())
                    except ImageDecodeError:
                        ok = False
                rows["format"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mode"].append(mode)
                rows["decode_ok"].append(ok)
                rows["n_pixels"].append(npx)
                rows["mean_px"].append(mean)
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(_batch, IMAGE_META_SCHEMA)


def _content_feature(px: np.ndarray, dim: int = 16) -> np.ndarray:
    """Real content feature from decoded pixels: [w/256, h/256, aspect,
    n_channels, mean & std luma, 1 mean per RGB channel, 3×3 downsampled
    luma grid] → L2-comparable fixed-width vector, padded/truncated to
    ``dim``. Deterministic; no learned weights (no model in container)."""
    h, w, ch = px.shape
    f = px.astype(np.float64)
    luma = f.mean(axis=2) if ch >= 3 else f[:, :, 0]
    # 3×3 grid means via integer block slicing (cheap, shape-stable)
    ys = np.linspace(0, h, 4, dtype=int)
    xs = np.linspace(0, w, 4, dtype=int)
    grid = [
        luma[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
        for i in range(3)
        for j in range(3)
    ]
    rgb = [f[:, :, min(c, ch - 1)].mean() for c in range(3)]
    vec = np.array(
        [w / 256.0, h / 256.0, w / max(h, 1), float(ch), luma.mean(), luma.std()]
        + [v / 255.0 for v in rgb]
        + [v / 255.0 for v in grid],
        dtype=np.float32,
    )
    if len(vec) < dim:
        vec = np.pad(vec, (0, dim - len(vec)))
    return vec[:dim]


def _fallback_feature(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic hash-derived vector for undecodable payloads: keeps
    the (bytes → float[dim]) contract total, so one corrupt file can't
    kill a 100 TB job; decode_ok=false marks these rows for filtering."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 16,
) -> DataFrame:
    """bytes → (media_id, sha256, n_bytes, decode_ok, width, height,
    feature[dim]) via Arrow-batched mapInPandas. Decodable images get a
    REAL content feature (pixel statistics, see _content_feature);
    undecodable payloads a deterministic hash fallback with
    decode_ok=false."""

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, shas, sizes, oks, ws, hs = [], [], [], [], [], []
            for payload in pdf[payload_col]:
                b = bytes(payload)
                shas.append(hashlib.sha256(b).hexdigest())
                sizes.append(len(b))
                try:
                    px = decode_image(b)
                    feats.append(_content_feature(px, dim).tolist())
                    oks.append(True)
                    hs.append(int(px.shape[0]))
                    ws.append(int(px.shape[1]))
                except ImageDecodeError:
                    feats.append(_fallback_feature(b, dim).tolist())
                    oks.append(False)
                    ws.append(None)
                    hs.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "sha256": shas,
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "decode_ok": oks,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "feature": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_batch, IMAGE_FEATURES_SCHEMA)


def _resize_np(px: np.ndarray, h: int, w: int, method: str) -> np.ndarray:
    """uint8 (ih, iw, c) → (h, w, c); vectorized numpy, deterministic.
    Sampling uses half-pixel centers (align_corners=False — the
    convention of every training-data pipeline resizer)."""
    ih, iw = px.shape[:2]
    if method == "nearest":
        yi = np.minimum(((np.arange(h) + 0.5) * ih / h).astype(np.int64), ih - 1)
        xi = np.minimum(((np.arange(w) + 0.5) * iw / w).astype(np.int64), iw - 1)
        return px[yi][:, xi]
    # bilinear: gather the 4 neighbours, lerp in float64, round half-up
    fy = (np.arange(h) + 0.5) * ih / h - 0.5
    fx = (np.arange(w) + 0.5) * iw / w - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, ih - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, iw - 1)
    y1 = np.minimum(y0 + 1, ih - 1)
    x1 = np.minimum(x0 + 1, iw - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.floor(out + 0.5).astype(np.uint8)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized_png", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    height: int,
    width: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    method: str = "bilinear",
) -> DataFrame:
    """REAL image resize to a fixed (height, width) — the
    normalize-before-training step of a multimodal pipeline: decode
    (PNG/GIF/JPEG via the native codecs, all formats under PIL),
    vectorized numpy nearest/bilinear resample at half-pixel centers,
    re-encode PNG so the result flows back into image_meta /
    extract_image_features. One Arrow-batched ``mapInPandas`` pass —
    no shuffle, scales with cores exactly like the decode benchmarks
    in SCALING.md's per-core codec table. A payload that does not
    decode survives as ONE decode_ok=false row (the corrupt-media
    contract)."""
    if height < 1 or width < 1:
        raise ValueError(f"target dims must be >= 1, got {height}x{width}")
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"method must be nearest|bilinear, got {method!r}")

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.imagecodec import (
            ImageDecodeError,
            decode_image,
            encode_png,
        )

        for pdf in it:
            rows: dict[str, list] = {f.name: [] for f in RESIZED_SCHEMA.fields}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["media_id"].append(int(mid))
                try:
                    px = decode_image(bytes(payload))
                except ImageDecodeError:
                    rows["decode_ok"].append(False)
                    for c in ("src_width", "src_height", "width", "height",
                              "resized_png"):
                        rows[c].append(None)
                    continue
                rows["decode_ok"].append(True)
                rows["src_height"].append(px.shape[0])
                rows["src_width"].append(px.shape[1])
                rows["height"].append(height)
                rows["width"].append(width)
                rows["resized_png"].append(
                    encode_png(_resize_np(px, height, width, method))
                )
            yield pd.DataFrame(
                {
                    "media_id": rows["media_id"],
                    "decode_ok": rows["decode_ok"],
                    "src_width": pd.array(rows["src_width"], dtype="Int32"),
                    "src_height": pd.array(rows["src_height"], dtype="Int32"),
                    "width": pd.array(rows["width"], dtype="Int32"),
                    "height": pd.array(rows["height"], dtype="Int32"),
                    "resized_png": rows["resized_png"],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_batch, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_ms: int = 1000,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """REAL video frame sampling: one output row per sampled frame,
    decoded by the native AVI codec (functions/videocodec.py — AVI is
    RIFF like WAV; uncompressed DIB and Motion-JPEG streams decode,
    other compressed codecs are explicitly unsupported, there is no
    codec library in this container). Frames are sampled on the
    ``every_ms`` grid (index =
    floor(t·fps/1000), deduplicated) and each sampled frame is
    re-encoded as PNG (``frame_png``) so it flows straight into the
    image operators (image_meta/extract_image_features). A payload that
    is not a decodable AVI survives as ONE decode_ok=false row — the
    corrupt-media contract, never a poisoned job.

    ``keep_cols`` carries the named input columns (typed metadata —
    codec flags, source tags, lengths) onto every output row of their
    video, replicated per sampled frame inside the Arrow batch. At
    scale this is the ONLY sane way to keep metadata with frames: the
    alternative is a second corpus scan joined back on media_id — a
    full extra shuffle (or a corpus-sized broadcast) that this
    parameter exists to delete."""
    if every_ms < 1:
        raise ValueError(f"every_ms must be >= 1, got {every_ms}")
    keep_cols = list(keep_cols)
    reserved = {
        "media_id", "decode_ok", "frame_idx", "frame_ms", "width",
        "height", "frame_png", payload_col, id_col,
    }
    clash = sorted(set(keep_cols) & reserved)
    if clash:
        raise ValueError(f"keep_cols clash with output columns: {clash}")
    in_fields = {f.name: f for f in df.schema.fields}
    missing = [c for c in keep_cols if c not in in_fields]
    if missing:
        raise KeyError(f"keep_cols not in input: {missing}")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("decode_ok", T.BooleanType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ms", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("frame_png", T.BinaryType()),
        ]
        + [T.StructField(c, in_fields[c].dataType) for c in keep_cols]
    )

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.imagecodec import encode_png
        from ..functions.videocodec import VideoDecodeError, decode_avi

        for pdf in it:
            rows: dict[str, list] = {k.name: [] for k in out_schema.fields}
            kept = [pdf[c] for c in keep_cols]
            for j, (mid, payload) in enumerate(
                zip(pdf[id_col], pdf[payload_col])
            ):
                mid = int(mid)
                try:
                    fps, frames = decode_avi(bytes(payload))
                except VideoDecodeError:
                    rows["media_id"].append(mid)
                    rows["decode_ok"].append(False)
                    for c in ("frame_idx", "frame_ms", "width", "height",
                              "frame_png"):
                        rows[c].append(None)
                    for c, col in zip(keep_cols, kept):
                        rows[c].append(col.iloc[j])
                    continue
                n, h, w, _ = frames.shape
                if fps <= 0:  # degenerate header: treat as 1 fps
                    fps = 1.0
                dur_ms = n * 1000.0 / fps
                seen: set[int] = set()
                t = 0.0
                while t < dur_ms or (t == 0.0 and n):
                    idx = min(int(t * fps / 1000.0), n - 1)
                    if idx not in seen:
                        seen.add(idx)
                        rows["media_id"].append(mid)
                        rows["decode_ok"].append(True)
                        rows["frame_idx"].append(idx)
                        rows["frame_ms"].append(int(round(idx * 1000.0 / fps)))
                        rows["width"].append(w)
                        rows["height"].append(h)
                        rows["frame_png"].append(encode_png(frames[idx]))
                        for c, col in zip(keep_cols, kept):
                            rows[c].append(col.iloc[j])
                    t += every_ms
            out = {
                "media_id": rows["media_id"],
                "decode_ok": rows["decode_ok"],
                "frame_idx": pd.array(rows["frame_idx"], dtype="Int32"),
                "frame_ms": pd.array(rows["frame_ms"], dtype="Int64"),
                "width": pd.array(rows["width"], dtype="Int32"),
                "height": pd.array(rows["height"], dtype="Int32"),
                "frame_png": rows["frame_png"],
            }
            for c in keep_cols:
                out[c] = rows[c]
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col, *keep_cols).mapInPandas(
        _batch, out_schema
    )


# ---------------------------------------------------------------------------
# Audio (REAL decode — native WAV/PCM codec, functions/audiocodec.py)
# ---------------------------------------------------------------------------

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def audio_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Real per-payload audio stats: full PCM decode (native WAV codec)
    → sample rate, channels, duration, RMS, peak. Same contract as
    image_meta: undecodable payloads survive as decode_ok=false rows
    (header fields NULL), so one corrupt file can't kill a 100 TB job.
    RMS/duration are rounded to 6 places — the exact arithmetic the q80
    oracle recomputes."""
    from ..functions.audiocodec import AudioDecodeError, decode_wav

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {f.name: [] for f in AUDIO_META_SCHEMA.fields}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                rows["media_id"].append(int(mid))
                rows["size_bytes"].append(len(b))
                try:
                    rate, arr = decode_wav(b)
                    f = arr.astype(np.float64)
                    rows["sample_rate"].append(rate)
                    rows["n_channels"].append(arr.shape[1])
                    rows["n_samples"].append(arr.shape[0])
                    rows["duration_s"].append(round(arr.shape[0] / rate, 6))
                    rows["rms"].append(round(float(np.sqrt((f**2).mean())), 6))
                    rows["peak"].append(int(np.abs(arr).max()))
                    rows["decode_ok"].append(True)
                except AudioDecodeError:
                    for k in (
                        "sample_rate",
                        "n_channels",
                        "n_samples",
                        "duration_s",
                        "rms",
                        "peak",
                    ):
                        rows[k].append(None)
                    rows["decode_ok"].append(False)
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(_batch, AUDIO_META_SCHEMA)


AUDIO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_samples", T.IntegerType()),
        T.StructField("frame_rms", T.DoubleType()),
    ]
)


def audio_frame_rms(
    df: DataFrame,
    frame_len: int = 256,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-level feature extraction over decoded PCM: one row per
    ``frame_len``-sample window (channel-averaged RMS; the final
    partial frame is kept with its true sample count). The media → many
    frames row explosion is the same shape as video frame sampling —
    but unlike that stub, this decode is real. Undecodable payloads
    contribute zero rows (filter them via audio_meta.decode_ok)."""
    if frame_len < 1:
        raise ValueError(f"frame_len must be >= 1, got {frame_len}")
    from ..functions.audiocodec import AudioDecodeError, decode_wav

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {f.name: [] for f in AUDIO_FRAMES_SCHEMA.fields}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    _, arr = decode_wav(bytes(payload))
                except AudioDecodeError:
                    continue
                f = arr.astype(np.float64)
                n = arr.shape[0]
                for i in range(0, n, frame_len):
                    chunk = f[i : i + frame_len]
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(i // frame_len)
                    rows["frame_samples"].append(chunk.shape[0])
                    rows["frame_rms"].append(
                        round(float(np.sqrt((chunk**2).mean())), 6)
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(_batch, AUDIO_FRAMES_SCHEMA)
