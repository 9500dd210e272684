"""read_binary_files → multimodal pipeline: the ingest half of the
media path. Files on disk become (path, length, content) rows that feed
extract_image_features without any driver-side file walking."""

from __future__ import annotations

import os
import tempfile

import pandasql_spark as ps
from pandasql_spark.operators.multimodal import extract_image_features
from pandasql_spark.sources.io import read_binary_files
from pyspark.sql import functions as F


def test_binary_files_feed_feature_extraction(spark):
    d = tempfile.mkdtemp(prefix="media_")
    payloads = {f"img_{i}.bin": bytes([i]) * (100 + i) for i in range(5)}
    for fname, data in payloads.items():
        with open(os.path.join(d, fname), "wb") as f:
            f.write(data)
    # a file the glob must exclude
    with open(os.path.join(d, "notes.txt"), "wb") as f:
        f.write(b"not media")

    df = read_binary_files(d, pattern="*.bin", spark=spark)
    sdf = df.to_spark()
    assert {"path", "length", "content", "modificationTime"} <= set(sdf.columns)
    assert sdf.count() == 5

    media = sdf.select(
        F.monotonically_increasing_id().alias("media_id"),
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        F.col("content").alias("payload"),
    )
    feats = extract_image_features(media).toPandas()
    assert len(feats) == 5
    assert (feats["n_bytes"].sort_values().to_numpy()
            == sorted(len(v) for v in payloads.values())).all()
    assert all(len(v) == 16 for v in feats["feature"])

    # glob pushdown: the length filter reaches the source listing level,
    # not a post-scan filter over the excluded file
    only_big = read_binary_files(d, pattern="*.bin", spark=spark).to_spark().filter(
        F.col("length") >= 103
    )
    assert only_big.count() == 2
