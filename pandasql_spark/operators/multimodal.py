"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata
struct — the only scalable representation: the bytes never leave the
executors, all planning happens on metadata. The decode/feature kernels
are Arrow-batched ``mapInPandas`` functions; the actual codec calls are
STUBBED (no image/audio libraries in this container) behind
``_decode_stub``, which produces a deterministic fake so the Spark-side
plumbing — schema, batching, partitioning — is real and testable.
Swap ``_decode_stub`` for PIL/torchaudio/ffmpeg in a real deployment.

Scale notes: ``mapInPandas`` is shuffle-free (embarrassingly parallel);
``spark.sql.files.maxPartitionBytes`` bounds the bytes a single task
holds; feature extraction emits small fixed-width rows, so the output
is orders of magnitude smaller than the input — the right direction for
a 100 TB media crawl.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_stub(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic fake 'decode + embed': hashes the payload into a
    fixed-width float vector. REPLACE with a real codec (PIL / torchcodec)
    in deployment — the function contract (bytes → float vector) is the
    real one."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def attach_media_meta(df: DataFrame, payload_col: str, media_type: str, fmt: str) -> DataFrame:
    """Attach the typed metadata struct computed from the payload (sizes
    now; width/height/duration come from the real decoder in deployment)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(payload_col)).cast("long").alias("size_bytes"),
        ),
    )


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 16,
) -> DataFrame:
    """bytes → (media_id, sha256, n_bytes, feature[dim]) via Arrow-batched
    mapInPandas. Decode step is stubbed (see module docstring); the
    batching/schema/parallelism shape is production-real."""

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, shas, sizes = [], [], []
            for payload in pdf[payload_col]:
                b = bytes(payload)
                shas.append(hashlib.sha256(b).hexdigest())
                sizes.append(len(b))
                feats.append(_decode_stub(b, dim).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "sha256": shas,
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "feature": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_batch, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_ms: int = 1000,
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame.
    Frame extraction is stubbed to 3 deterministic frames; the row
    explosion shape (media → many frames, each a binary) is real."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ms", T.LongType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "frame_ms": [], "frame_bytes": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                for i in range(3):  # stub: real decoder derives count from duration
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(i)
                    rows["frame_ms"].append(i * every_ms)
                    rows["frame_bytes"].append(
                        hashlib.sha256(b + i.to_bytes(4, "little")).digest()
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(_batch, out_schema)
