"""As-of (most-recent-match) join — an operator Spark lacks natively.

The naive formulation is a range join (``l.ts >= r.ts`` + max) which
explodes quadratically per key. The scalable plan used here is the
union-and-carry trick:

1. tag right rows (carriers) and left rows (probes),
2. union them on (key, ts),
3. one window partitioned by key ordered by (ts, side):
   ``last(right_value, ignorenulls=True)`` carries the most recent right
   value forward,
4. keep probe rows.

Cost: ONE shuffle on the key + a per-partition ordered scan — the same
shape as a sort-merge join, with no pair blowup. This is the standard
distributed as-of algorithm (pandas ``merge_asof``'s semantics at
cluster scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    suffix: str = "_r",
    inner: bool = True,
) -> DataFrame:
    """For each left row, attach the ``right_cols`` of the most recent
    right row with ``right.on <= left.on`` within the same ``by`` group.

    ``inner=True`` drops left rows with no prior right match (DuckDB
    ASOF JOIN semantics); ``inner=False`` keeps them with nulls.

    Right rows that tie on (by, on) are deduplicated deterministically
    (max of each right col) before the union, so results are stable
    regardless of partitioning."""
    # deterministic tie-break for duplicate right timestamps
    r = right.groupBy(by, on).agg(*[F.max(c).alias(c) for c in right_cols])

    lmark = left.withColumn("__side", F.lit(1))
    for c in right_cols:
        lmark = lmark.withColumn(f"{c}{suffix}", F.lit(None).cast(dict(r.dtypes)[c]))
    rmark = r.select(
        by,
        on,
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    # align schemas: right rows carry nulls for left-only columns
    left_only = [c for c in lmark.columns if c not in rmark.columns]
    for c in left_only:
        rmark = rmark.withColumn(c, F.lit(None).cast(dict(lmark.dtypes)[c]))
    unioned = lmark.unionByName(rmark)

    # carriers sort before probes at equal ts (__side 0 < 1) so an exact
    # tie right row IS visible to the probe — `>=` semantics.
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"__carry_{c}")
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"__carry_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    if inner:
        out = out.filter(F.col(f"{right_cols[0]}{suffix}").isNotNull())
    return out
