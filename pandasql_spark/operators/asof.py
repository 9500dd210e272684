"""As-of (most-recent-match) join — an operator Spark lacks natively.

The naive formulation is a range join (``l.ts >= r.ts`` + max) which
explodes quadratically per key. The scalable plan used here is the
union-and-carry trick:

1. tag right rows (carriers) and left rows (probes),
2. union them on (key, ts),
3. one window partitioned by key ordered by (ts, side):
   ``last(carrier_struct, ignorenulls=True)`` carries the most recent
   right ROW forward,
4. keep probe rows.

Cost: ONE shuffle on the key + a per-partition ordered scan — the same
shape as a sort-merge join, with no pair blowup. This is the standard
distributed as-of algorithm (pandas ``merge_asof``'s semantics at
cluster scale).

NULL correctness: the carried value is a single STRUCT of all right
columns, which is NULL exactly on probe rows. This matters twice: (a) a
right row whose value column is NULL is still "the most recent match"
(carrying columns independently with ignorenulls would skip it and
resurrect an older value, diverging from DuckDB ASOF JOIN), and (b) all
output columns come from the SAME right row — never a mix of different
rows' non-null fields.
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

    # one struct per carrier row: NULL on probes, non-null on carriers
    # (even when every field inside is null — see module docstring).
    carrier_struct = F.struct(*[F.col(c).alias(c) for c in right_cols])
    struct_type = r.select(carrier_struct.alias("s")).schema["s"].dataType

    lmark = left.withColumn("__side", F.lit(1)).withColumn(
        "__rrow", F.lit(None).cast(struct_type)
    )
    rmark = r.select(
        by,
        on,
        F.lit(0).alias("__side"),
        carrier_struct.alias("__rrow"),
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
        "*", F.last("__rrow", ignorenulls=True).over(w).alias("__carry")
    )
    out = carried.filter(F.col("__side") == 1)
    if inner:
        out = out.filter(F.col("__carry").isNotNull())
    return out.select(
        *[c for c in left.columns],
        *[F.col(f"__carry.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
