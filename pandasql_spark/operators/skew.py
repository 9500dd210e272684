"""Skew-handling utilities.

AQE's skew-join splitting handles most runtime skew automatically
(enabled in session defaults), but two cases still need explicit
treatment at 100 TB:

- **skewed aggregation** (`salted_groupby_sum`): one hot key funnels into
  one reducer. Two-phase salted agg: shuffle on (key, salt) first —
  spreading the hot key over ``num_salts`` reducers — then re-aggregate
  on the key. Exact same result, bounded per-task input.
- **skewed broadcast-unable join** (`salted_join_hot_keys`): replicate
  the small side's hot-key rows ``num_salts``-fold and salt the big
  side, so the hot key's pairs spread across tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_groupby_agg(
    df: DataFrame,
    keys: list[str],
    agg_cols: dict[str, str],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation: ``agg_cols`` maps column → one of
    sum/count/min/max (the re-aggregatable functions; avg must be
    decomposed into sum+count by the caller). Result equals a plain
    groupBy — the salt only reshapes the shuffle."""
    refold = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn in agg_cols.values():
        if fn not in refold:
            raise ValueError(f"{fn} is not re-aggregatable; decompose it first")
    salted = df.withColumn("__salt", (F.rand(seed=0) * num_salts).cast("int"))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[first[fn](c).alias(f"__p_{c}") for c, fn in agg_cols.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[refold[fn](f"__p_{c}").alias(c) for c, fn in agg_cols.items()]
    )


def salted_join_hot_keys(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_keys: list,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``hot_keys`` of ``big`` are heavily skewed:
    salt the big side's hot rows, replicate the small side's hot rows
    across all salts, join on (key, salt). Non-hot keys ride salt 0.
    Semantics equal a plain ``big.join(small, key, how)`` for inner/left
    joins on the big side."""
    if how not in ("inner", "left"):
        # Replicating the small side's hot rows across salts would emit
        # duplicated unmatched small-side rows under right/full joins.
        raise ValueError(
            f"salted_join_hot_keys supports how='inner'|'left', got {how!r}"
        )
    hot = F.col(key).isin(hot_keys)
    big_s = big.withColumn(
        "__salt",
        F.when(hot, (F.rand(seed=0) * num_salts).cast("int")).otherwise(F.lit(0)),
    )
    salts = F.when(hot, F.sequence(F.lit(0), F.lit(num_salts - 1))).otherwise(
        F.array(F.lit(0))
    )
    small_s = small.withColumn("__salt", F.explode(salts))
    out = big_s.join(small_s, on=[key, "__salt"], how=how)
    return out.drop("__salt")
