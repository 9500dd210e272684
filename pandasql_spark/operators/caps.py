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


def cap_tokens_per_group(
    df: DataFrame,
    keys: list[str],
    order_by: list[tuple[str, bool]],
    budget: int,
    token_col: str,
    min_tokens_per_doc: int = 0,
) -> DataFrame:
    """Keep each ``keys``-group's maximal ORDER-PREFIX whose running
    ``token_col`` sum stays ≤ ``budget`` — the token-budget version of
    `cap_per_group`: training mixes are balanced in TOKENS, not
    documents (a domain of ten-word pages and a domain of books are
    wildly different corpora at equal doc counts).

    Semantics (deterministic, reproducible): walk the group in
    ``order_by`` order (rank your docs best-first) and keep rows while
    the cumulative token count INCLUDING the current row is ≤ budget.
    The first overflowing doc is dropped and so is everything after it
    — prefix semantics, not greedy knapsack: a later small doc never
    "jumps the queue" past a dropped larger one, so the output is a
    rank-threshold cut that survives re-runs and audits. A zero-token
    doc before the cut is kept and consumes nothing — the same default
    the streaming twin (`admit_tokens_per_key_stream`) has always had,
    so batch/streaming parity holds with no arguments (ADVICE r13: the
    old default-1 prefilter silently dropped zero-token rows the
    documented prefix would keep whenever the corpus violated its
    unvalidated precondition).

    ``min_tokens_per_doc`` ≥ 1 is an explicit QUALITY FLOOR, not a
    hint: rows with fewer tokens are dropped from the walk entirely
    (sub-floor docs are exactly what a token-balanced mix excludes),
    and the floor is what makes the hot-key prefilter sound — with
    every surviving doc ≥ min tokens, no more than
    budget // min_tokens_per_doc docs can ever fit, so a native
    WindowGroupLimit cap at that count runs FIRST and bounds the
    cumsum window's input per group regardless of how hot the key is
    (the running sum itself is a partitioned window — each group in
    one task — which the prefilter makes safe at any key heat).

    Oracle status: driver-gated since r14 via the q77 token-cap fold
    (queries/_defs_c.py — rank window + SUM ... ROWS UNBOUNDED
    PRECEDING cumsum in SQL, zero-token rows riding through); the
    pandas-reference differential + edge cases in test_caps_delta.py
    and the property suite carry the adversarial shapes (exact-budget
    tie kept, first overflow closes the prefix, floor semantics)."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if min_tokens_per_doc < 0:
        raise ValueError(
            f"min_tokens_per_doc must be >= 0, got {min_tokens_per_doc}"
        )
    if not keys or not order_by:
        raise ValueError("keys and order_by must be non-empty")
    if min_tokens_per_doc >= 1:
        df = cap_per_group(
            df.filter(F.col(token_col) >= F.lit(min_tokens_per_doc)),
            keys,
            order_by,
            max(1, budget // min_tokens_per_doc),
        )
    order_cols: list[Column] = [
        F.col(c).asc() if a else F.col(c).desc() for c, a in order_by
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = "__cap_cum"
    return (
        df.withColumn(cum, F.sum(F.col(token_col)).over(w))
        .filter(F.col(cum) <= F.lit(budget))
        .drop(cum)
    )
