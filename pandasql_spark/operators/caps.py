"""Per-group document caps — exact top-n-per-key selection that
survives hot keys at corpus scale.

The curation use case: cap how many documents any one source/domain
contributes to a training mix (a handful of giant domains otherwise
dominate a crawl). The classical worry about the
``row_number() OVER (PARTITION BY source ORDER BY ...)`` plan is that
EVERY row of every group shuffles to that group's single reducer — a
billion-document domain through one task.

Spark ≥3.5 solves this in the engine: the ``WindowGroupLimit`` rule
(SPARK-37099) recognizes the rank-filter pattern and inserts a
PARTIAL group-limit below the exchange — each input partition forwards
at most n rows per group, exactly the two-phase
selection one would hand-write, but JVM-side with no Arrow crossing.
The shuffle then carries ≤ n × P rows per group; the hot-key reducer
sees n×P rows, not a billion. An earlier draft of this operator
hand-built the partial phase in ``mapInPandas``; the plan audit showed
Catalyst already emitting ``WindowGroupLimit Partial`` underneath it,
so the Python phase was pure overhead — deleted, and the native
optimization is plan-asserted in tests instead (the lesson from
SURVEY.md §4: declare the plan, let Catalyst pick the physical
strategy).

The result is row-for-row exact (the q77 oracle is the same window in
SQL); make the ordering total with a unique tiebreak column, exactly
as a deterministic SQL row_number requires.

Reference scope note: the reference engine (pandasql, see
pandasql/core.py) has no grouped top-k at all (its only top-k is the
ungrouped nlargest fallback, api_status.py:24-28); this operator is
part of the beyond-reference curation surface.
"""

from __future__ import annotations

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
    a unique last column). Exact, deterministic, hot-key-safe (native
    WindowGroupLimit partial trimming below the shuffle — see module
    doc); schema is preserved (no rank column leaks)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if not keys or not order_by:
        raise ValueError("keys and order_by must be non-empty")
    order_cols: list[Column] = [
        F.col(c).asc() if a else F.col(c).desc() for c, a in order_by
    ]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) <= n)
        .drop(_RN)
    )
