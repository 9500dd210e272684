"""Per-group document caps — exact top-n-per-key selection that
survives hot keys at corpus scale.

The curation use case: cap how many documents any one source/domain
contributes to a training mix (a handful of giant domains otherwise
dominate a crawl). The naive plan — ``row_number() OVER (PARTITION BY
source ORDER BY quality)`` then filter — shuffles EVERY row of every
group to that group's single reducer task: a 100 TB crawl with a
billion-document domain puts that domain's every row through one task.

``cap_per_group`` is two-phase instead (the per-group analog of
TakeOrderedAndProject's per-partition heaps):

1. **Partial top-n, no shuffle** — an Arrow-batched ``mapInPandas``
   keeps at most n rows per (group, input-partition): whatever rows a
   partition holds for a group, only its local top-n can be in the
   global top-n. Task memory is O(n × groups-per-partition).
2. **Global top-n over survivors** — the standard window rank, but on
   ≤ n × P rows per group instead of the whole group; the hot-key
   reducer handles n×P rows, not a billion.

The result is row-for-row EXACT vs the naive window (the q77 oracle is
that window in SQL) — the ordering must be made total with a unique
tiebreak column for this to be deterministic, exactly as a
deterministic SQL row_number requires.

Reference scope note: the reference engine (pandasql, see
pandasql/core.py) has no grouped top-k at all (its only top-k is the
ungrouped nlargest fallback, api_status.py:24-28); this operator is
part of the beyond-reference curation surface.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__cap_rn"


def cap_per_group(
    df: DataFrame,
    keys: list[str],
    order_by: list[tuple[str, bool]],
    n: int,
) -> DataFrame:
    """Keep the top ``n`` rows of each ``keys``-group under the total
    order ``order_by`` ([(column, ascending), ...] — make it total with
    a unique last column). Exact, deterministic, hot-key-safe; schema
    is preserved (no rank column leaks). Order columns must be
    non-NULL: Spark windows and pandas sorts place NULLs differently,
    so a NULL sort key would make the two phases disagree."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if not keys or not order_by:
        raise ValueError("keys and order_by must be non-empty")
    trimmed = partial_top_n(df, keys, order_by, n)
    order_cols: list[Column] = [
        F.col(c).asc() if a else F.col(c).desc() for c, a in order_by
    ]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        trimmed.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) <= n)
        .drop(_RN)
    )


def partial_top_n(
    df: DataFrame,
    keys: list[str],
    order_by: list[tuple[str, bool]],
    n: int,
) -> DataFrame:
    """Phase 1 alone: at most n rows per (group, input-partition), no
    shuffle. Exposed so tests (and shuffle audits) can measure the
    survivor count the rank window actually receives."""
    cols = [c for c, _ in order_by]
    ascs = [a for _, a in order_by]

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: pd.DataFrame | None = None
        for pdf in batches:
            if not len(pdf):
                continue
            cand = pdf if buf is None else pd.concat([buf, pdf])
            buf = (
                cand.sort_values(cols, ascending=ascs, kind="mergesort")
                .groupby(keys, sort=False, dropna=False)
                .head(n)
            )
        if buf is not None and len(buf):
            yield buf

    return df.mapInPandas(_partial, schema=df.schema)
