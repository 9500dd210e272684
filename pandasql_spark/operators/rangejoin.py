"""Distributed range (interval) join — beyond-reference operator.

The reference has no theta/range/interval joins at all (SURVEY §2.4;
reference core.py:852-945 is inner-equi only). A naive Spark range join
``l.join(r, (l.by == r.by) & r.ts.between(l.ts - w, l.ts))`` degenerates
to BroadcastNestedLoop / per-key cartesian — quadratic in events per key.

Scale plan used here (the standard interval-bucketing scheme, as in
Spark's own range-join-hint literature and Flink's interval join):

1. pick ``bucket = span`` of the queried window (upper − lower);
2. each RIGHT row lands in exactly one bucket: ``floor(on / bucket)``;
3. each LEFT row's window overlaps ≤ 2 consecutive buckets → explode the
   left side into those bucket ids (constant ×2 fan-out, NOT data² );
4. equi-join on ``(by, bucket)`` — a plain shuffled hash join Catalyst
   can optimize/AQE-skew-split — then apply the exact range predicate as
   a post-filter.

Cost: one shuffle of each side on (by, bucket); candidate set is only
rows within ±1 bucket, so the post-filter rejects a bounded fraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_seconds(df: DataFrame, col: str) -> Column:
    """Numeric view of the range column. Timestamps cast to double =
    fractional epoch seconds (micros exact in a double until year ~2255,
    unlike unix_timestamp which floors to whole seconds)."""
    return F.col(col).cast("double")


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: str | list[str],
    on: str,
    lower: float,
    upper: float,
    right_suffix: str = "_r",
) -> DataFrame:
    """For each left row, every right row (same ``by`` keys) whose ``on``
    value lies in ``[left.on + lower, left.on + upper)``.

    ``on`` may be numeric or timestamp (bounds then in seconds). Right
    columns that collide with left names get ``right_suffix``.
    """
    if upper <= lower:
        raise ValueError("range_join requires upper > lower")
    by_keys = [by] if isinstance(by, str) else list(by)
    span = float(upper - lower)

    lsec = _as_seconds(left, on)

    # rename colliding right columns first so the equi-join output is flat
    collide = (set(left.columns) & set(right.columns)) - set(by_keys)
    r = right
    for c in collide:
        r = r.withColumnRenamed(c, f"{c}{right_suffix}")
    ron = f"{on}{right_suffix}" if on in collide else on
    r = r.withColumn("__rsec", _as_seconds(r, ron))
    r = r.withColumn("__bucket", F.floor(F.col("__rsec") / F.lit(span)))

    lo_bucket = F.floor((lsec + F.lit(float(lower))) / F.lit(span))
    hi_bucket = F.floor((lsec + F.lit(float(upper))) / F.lit(span))
    l = (
        left.withColumn("__lsec", lsec)
        .withColumn("__bucket", F.explode(F.array_distinct(F.array(lo_bucket, hi_bucket))))
    )

    joined = l.join(r, on=by_keys + ["__bucket"], how="inner").filter(
        (F.col("__rsec") >= F.col("__lsec") + F.lit(float(lower)))
        & (F.col("__rsec") < F.col("__lsec") + F.lit(float(upper)))
    )
    return joined.drop("__bucket", "__lsec", "__rsec")
