"""Snapshot diff — what changed between two corpus snapshots.

The incremental-crawl primitive: yesterday's corpus vs today's, keyed
by a stable document id. Output is one row per key that appears in
either snapshot, labeled:

- ``added``     — key only in the new snapshot
- ``removed``   — key only in the old snapshot
- ``changed``   — key in both, content fingerprint differs
- ``unchanged`` — key in both, fingerprint equal

Scale shape: the content comparison NEVER ships content. Each side is
reduced map-side to (key, md5-of-content) — 16 bytes per row on the
wire regardless of document size — then a single full-outer equi-join
on the key (co-partitionable; AQE handles the residual skew). On an
incremental pipeline the old side's fingerprints are a by-product of
the previous run (persist them; ``fingerprints`` is that entry point)
so the diff costs one scan of the NEW data plus a hash-sized join.

Reference scope note: the reference engine (pandasql) has no multi-
snapshot or diff surface at all; part of the beyond-reference
LLM-pipeline inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprints(
    df: DataFrame, key_col: str, content_cols: list[str]
) -> DataFrame:
    """(key, fp): md5 over the concatenated content columns. The unit
    separator (\\x1f) keeps ("ab","c") distinct from ("a","bc"), and
    NULLs are coalesced to a \\x00 sentinel BEFORE concat_ws — both
    Spark and DuckDB silently SKIP nulls (separator included) in
    concat_ws, which would collide (NULL,"x") with ("x",NULL)."""
    if not content_cols:
        raise ValueError("content_cols must be non-empty")
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in content_cols
    ]
    fp = F.md5(F.concat_ws("\x1f", *parts))
    return df.select(F.col(key_col).alias("key"), fp.alias("fp"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    content_cols: list[str],
) -> DataFrame:
    """(key, status) for every key in either snapshot; see module doc.
    ``key_col`` must be unique per snapshot (enforce upstream — a
    duplicate key would fan out the join)."""
    o = fingerprints(old, key_col, content_cols).withColumnRenamed("fp", "fp_old")
    n = fingerprints(new, key_col, content_cols).withColumnRenamed("fp", "fp_new")
    joined = o.join(n, on="key", how="full_outer")
    status = (
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") == F.col("fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select("key", status.alias("status"))


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    content_cols: list[str],
) -> DataFrame:
    """(status, n) rollup of :func:`snapshot_diff` — the monitoring
    number an incremental pipeline alerts on (churn rate)."""
    return (
        snapshot_diff(old, new, key_col, content_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
