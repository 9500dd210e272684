"""Stratified sampling for dataset curation.

Balancing classes (languages, sources, quality buckets) is a standard
step before training-data mixing. Two variants with different
scale/exactness trades:

- `stratified_sample_fraction`: Spark-native `sampleBy` — one scan, no
  shuffle, per-row Bernoulli draws. Approximate counts (binomial
  spread), seeded/deterministic per Spark version. The 100 TB default.
- `stratified_sample_exact`: EXACTLY n rows per stratum, chosen by
  md5-rank of the id — a deterministic, engine-portable "random" order
  (the q61 gate oracle reproduces it verbatim in DuckDB). One shuffle on
  the stratum key; per-stratum window sort. Use when class budgets are
  contracts, not targets — and note the window sorts each stratum, so
  strata must individually fit the usual window-partition envelope
  (they do: a stratum is a class, not a row group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample_fraction(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (`sampleBy`): strata absent from
    ``fractions`` are dropped (fraction 0.0), matching pandas'
    groupby-sample-with-dict semantics."""
    return df.sampleBy(stratum_col, fractions, seed=seed)


def stratified_sample_exact(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    id_col: str,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, deterministically:
    rank rows inside each stratum by ``md5(cast(id as string))`` — an
    order uncorrelated with any data attribute but identical on every
    engine — and keep the first n. Returns the original columns."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__srank", F.row_number().over(w))
        .filter(F.col("__srank") <= n_per_stratum)
        .drop("__srank")
    )


def sample_exact_global(df: DataFrame, n: int, id_col: str) -> DataFrame:
    """Exactly ``min(n, |df|)`` rows, deterministically and
    engine-portably: global md5-rank of the id (the same "portable
    random order" trick as `stratified_sample_exact`), selected with
    the distributed ranking recipe — no stratum key here, so a naive
    `Window.orderBy` would be a single-reducer sort; instead this rides
    `ranking.with_global_row_number` (range partition + offsets).
    Returns the original columns."""
    from .cache import attach_cleanup
    from .ranking import with_global_row_number

    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    ranked = with_global_row_number(
        df.withColumn("__skey", F.md5(F.col(id_col).cast("string"))),
        ["__skey", id_col],
        rn_col="__srank",
    )
    out = ranked.filter(F.col("__srank") <= n).drop("__srank", "__skey")
    # pass through the ranking recipe's persisted-frame release hook
    return attach_cleanup(out, ranked.cleanup)
