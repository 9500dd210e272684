"""Readers (reference ``/root/reference/pandasql/io.py``).

Every reader returns a lazy :class:`pandasql_spark.core.DataFrame`.

Scale notes: ``read_csv``/``read_json``/``read_parquet`` are distributed
Spark scans — partitioned, predicate-pushdown-capable (parquet), schema
inferred by sampling (the reference's 1,000-row sample at
``memory_utils.py:15-35`` is the same idea, single-node). ``read_pickle``
and ``read_numpy`` are driver-side by nature (pickle is not splittable);
they parallelize the resulting frame out to executors and are only meant
for small inputs — matching the reference, where they are thin
``pd.read_*`` wrappers (``io.py:31-40``).
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import SparkSession

from ..core import DataFrame
from ..session import get_spark


def read_csv(
    path: str,
    name: str | None = None,
    header: bool = True,
    infer_schema: bool = True,
    sql_load: bool = False,
    spark: SparkSession | None = None,
    **options: Any,
) -> DataFrame:
    """CSV → DataFrame (reference ``read_csv``, io.py:12-28). The
    reference's memory-estimation / chunking / CLI-import machinery is
    subsumed by Spark's distributed scan. ``name`` is accepted for API
    parity and used as a temp-view name when given; ``sql_load`` (the
    reference's read-through-SQLite path, io.py:19-20) is a no-op —
    there is one engine here. ``nrows`` is rejected exactly like the
    reference (io.py:14-16)."""
    if "nrows" in options:
        raise ValueError("nrows is not supported")
    spark = spark or get_spark()
    sdf = spark.read.options(**options).csv(path, header=header, inferSchema=infer_schema)
    df = DataFrame(sdf=sdf)
    if name:
        sdf.createOrReplaceTempView(name)
    return df


def read_json(path: str, name: str | None = None, spark: SparkSession | None = None,
              **options: Any) -> DataFrame:
    """JSON lines → DataFrame (reference ``read_json``, io.py:31-32)."""
    spark = spark or get_spark()
    sdf = spark.read.options(**options).json(path)
    df = DataFrame(sdf=sdf)
    if name:
        sdf.createOrReplaceTempView(name)
    return df


def read_parquet(path: str, spark: SparkSession | None = None) -> DataFrame:
    """Parquet → DataFrame (beyond-reference; the scale-native format)."""
    spark = spark or get_spark()
    return DataFrame(sdf=spark.read.parquet(path))


def read_pickle(path: str, spark: SparkSession | None = None) -> DataFrame:
    """Pickled pandas frame → DataFrame (reference io.py:39-40).
    Driver-side read, then parallelized out — small inputs only."""
    return DataFrame(pd.read_pickle(path))


def read_numpy(array, columns=None, spark: SparkSession | None = None) -> DataFrame:
    """ndarray → DataFrame. The reference's version calls a nonexistent
    ``pd.read_numpy`` (latent bug, io.py:35-36); ours actually works."""
    pdf = pd.DataFrame(array, columns=columns)
    return DataFrame(pdf)


def read_orc(path: str, spark: SparkSession | None = None) -> DataFrame:
    """ORC scan (beyond-reference format; same distributed-scan contract
    as read_parquet — predicate pushdown and column pruning apply)."""
    spark = spark or get_spark()
    return DataFrame(sdf=spark.read.orc(path))


def read_binary_files(
    path: str,
    pattern: str | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Directory of media/blob files → DataFrame via Spark's built-in
    ``binaryFile`` source: (path, modificationTime, length, content:
    binary). The ingest half of the multimodal pipeline
    (operators/multimodal.py consumes exactly this shape): each file
    becomes one row, scans are distributed and partition-pruned by
    path, and ``pattern`` (e.g. ``"*.jpg"``) pushes a pathGlobFilter to
    the listing — no driver-side file walking. Large blobs: one file
    per row, so set ``spark.sql.files.maxPartitionBytes`` to bound
    per-task memory rather than splitting (binary files aren't
    splittable)."""
    spark = spark or get_spark()
    reader = spark.read.format("binaryFile")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    return DataFrame(sdf=reader.load(path))


def write_compacted(
    df,
    path: str,
    target_file_mb: int = 256,
    compression_ratio: float = 0.25,
    fmt: str = "parquet",
    mode: str = "overwrite",
    max_files: int = 100_000,
) -> int:
    """Small-files-proof sink: size the output file count from the
    optimizer's size estimate instead of inheriting the upstream
    partitioning. A 100 TB pipeline stage that ends in 200k shuffle
    partitions would otherwise write 200k tiny files — the classic
    downstream-killer; conversely one giant partition serializes the
    write. Returns the file count used.

    ``compression_ratio`` converts the in-memory estimate to on-disk
    parquet/orc bytes (~4× columnar compression by default). Uses
    ``repartition`` (round-robin, even files); if the frame is already
    hash/range-partitioned on a useful key, write it directly instead.
    """
    import math

    sdf = df.to_spark() if hasattr(df, "to_spark") else df
    est_bytes = int(sdf._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    disk_bytes = est_bytes * compression_ratio
    n = max(1, min(max_files, math.ceil(disk_bytes / (target_file_mb * 1024 * 1024))))
    sdf.repartition(n).write.mode(mode).format(fmt).save(path)
    return n
