"""Bucketed-table co-location: pre-shuffle once at write time, join and
aggregate shuffle-free forever after.

At 100 TB the single biggest recurring cost is re-shuffling the fact
table for every join/agg on its key. Bucketing (`bucketBy` at write)
materializes the partitioning: every subsequent equi-join or groupBy
whose keys match the bucket spec reads co-located buckets and skips the
Exchange entirely (asserted in tests/test_bucketing.py).

Notes:
- The local test env uses Spark's in-memory catalog, so bucket metadata
  lives for the session; a real deployment points
  ``spark.sql.warehouse.dir`` + a metastore at durable storage and the
  bucketing survives across jobs.
- Bucket counts should be sized so each bucket ≈ one task's worth
  (128–512 MB); at 100 TB that's tens of thousands of buckets.
- Spark 4 elides the shuffle whenever the join/groupBy keys CONTAIN the
  bucket keys (clustering by a subset of join keys satisfies the
  distribution requirement), so bucketing lineitem by l_orderkey covers
  both the l_orderkey join and the (l_orderkey, l_linenumber) composite
  join — both asserted shuffle-free in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bucketize(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Write ``df`` as a bucketed (and optionally sorted) managed table
    and return the re-read handle whose scans carry the bucket spec."""
    writer = (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .format("parquet")
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
    spark = SparkSession.getActiveSession()
    return spark.table(table)


def drop_bucketed(table: str) -> None:
    spark = SparkSession.getActiveSession()
    spark.sql(f"DROP TABLE IF EXISTS {table}")
