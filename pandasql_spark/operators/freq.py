"""Heavy hitters (frequent items) at corpus scale.

The naive plan — ``groupBy(item).count()`` then filter — shuffles one
record per DISTINCT item. For training-data pipelines the item domain is
the problem: n-grams, URLs, hostnames, shingles easily reach 10¹⁰+
distinct values at 100 TB, so the "simple" groupBy is a full-corpus
shuffle of mostly-singleton keys.

This module does candidates-then-verify instead (the same shape as the
dedup operators):

1. **Candidates** — per-partition Misra-Gries summaries of capacity m,
   via Arrow-batched ``mapInPandas`` (no shuffle; O(m) memory per task).
   MG's guarantee: any item with partition frequency > n_p/(m+1)
   survives the partition's summary. Summing over partitions, any item
   with GLOBAL count > n/(m+1) must exceed that bound in at least one
   partition, so the union of partition summaries contains every global
   heavy hitter — at most P·m candidate rows cross the wire.
2. **Verify** — exact counts for candidate items only: broadcast
   semi-join + groupBy. Map-side partial aggregation reduces the
   shuffle to ≤ P·(P·m) tiny rows.

The whole operator reads the corpus exactly TWICE: the candidate kernel
also emits per-partition row counts (one extra row per partition), so
the global n that sets the count floor comes out of the same scan —
no dedicated count() job (round-6 fix; the two-scan contract is
asserted by an accumulator test in tests/test_freq.py).

With ``capacity ≥ ceil(1/threshold)``, recall is exact and the verified
counts are exact, so the result is IDENTICAL to the naive groupBy plan
(the q62 gate checks this against DuckDB) — at a shuffle cost that
depends on the number of partitions and the capacity, not on the
distinct-item count.

Reference scope note: the reference engine (pandasql) has no frequency
sketch; this is part of the beyond-reference LLM-pipeline surface.
Sketch merge rule follows Agarwal et al., "Mergeable Summaries" (PODS
'12): combine counters, subtract the (m+1)-th largest, drop non-positive.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_candidates(df: DataFrame, item_col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries candidate items (one column, distinct).

    Superset guarantee: contains every item whose global count exceeds
    n/(capacity+1). NULL items are ignored (they are not countable
    "items"; filter upstream if NULL frequency matters). Memory is
    O(capacity) per task regardless of partition size — batches fold
    into one running summary."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    # keep the kernel's output schema tied to the input column's type
    # (hardcoding would break string/decimal item domains)
    field = df.schema[item_col]

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = None
        for pdf in batches:
            vc = pdf[item_col].value_counts()  # dropna=True
            counters = vc if counters is None else counters.add(vc, fill_value=0)
            if len(counters) > capacity:
                # mergeable-summaries decrement: subtract the
                # (capacity+1)-th largest count, keep strictly positive
                cut = counters.nlargest(capacity + 1).iloc[-1]
                counters = counters[counters > cut] - cut
        if counters is not None and len(counters):
            yield pd.DataFrame({item_col: counters.index})

    out_schema = f"`{field.name}` {field.dataType.simpleString()}"
    return df.select(item_col).mapInPandas(_mg, schema=out_schema).dropDuplicates()


def hh_min_count(threshold: float, n: int) -> int:
    """Exact integer cutoff for ``count >= ceil(threshold * n)``
    without the binary-float artifact: an exact-integer product like
    0.1 * 30 evaluates to 3.0000000000000004 in doubles, and a bare
    ceil would bump it to 4 — silently dropping a boundary heavy
    hitter the recall guarantee (c >= t*n) promises to keep.
    Rounding at 9 digits restores the mathematically-exact product
    for any realistic (t, n). Both the batch filter and the streaming
    verify path (streaming/hitters.py) share THIS function, and the
    q62 oracle mirrors it as ceil(round(t * n, 9)) — keep the three
    in lockstep (ADVICE r14)."""
    return math.ceil(round(threshold * n, 9))


def mg_candidate_counts(
    df: DataFrame, item_col: str, capacity: int
) -> tuple[list, int]:
    """The fused Misra-Gries candidate+count pass of
    :func:`heavy_hitters`, exposed: ONE corpus scan returning
    ``(sorted candidate values, non-NULL row count n)``. The candidate
    list is a superset of every item with global count > n/(capacity+1)
    and is bounded by P·capacity values (driver-safe by construction —
    the same ≤P·(capacity+1)-row collect discipline as ranking.py).

    Use directly when several candidate stages share one exact-count
    verify (:func:`verify_stage_candidates`); :func:`heavy_hitters` is
    the one-call single-stage composition."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    # Single fused candidate pass (two corpus scans total for the
    # composed operator, down from three): the MG kernel also emits one
    # (item=NULL, __pn=n_p) row per partition, so the global non-NULL
    # row count comes from the same scan that builds the summaries
    # instead of a dedicated count() job.
    field = df.schema[item_col]
    out_schema = f"`{field.name}` {field.dataType.simpleString()}, `__pn` long"

    def _mg_with_count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = None
        n_p = 0
        for pdf in batches:
            n_p += int(pdf[item_col].notna().sum())
            vc = pdf[item_col].value_counts()  # dropna=True
            counters = vc if counters is None else counters.add(vc, fill_value=0)
            if len(counters) > capacity:
                cut = counters.nlargest(capacity + 1).iloc[-1]
                counters = counters[counters > cut] - cut
        items = list(counters.index) if counters is not None else []
        # Build both columns with object dtype: appending the None
        # count-sentinel to a typed int column would coerce it to float64
        # and silently corrupt items above 2**53 (e.g. xxhash64 ids).
        # Arrow converts object-dtype Python/numpy ints to int64 exactly.
        yield pd.DataFrame(
            {
                item_col: pd.Series(items + [None], dtype=object),
                "__pn": pd.Series([None] * len(items) + [n_p], dtype=object),
            }
        )

    summary = df.select(item_col).mapInPandas(_mg_with_count, schema=out_schema)
    # The summary is tiny by construction (≤ P·(capacity+1) rows), so
    # one bounded collect fetches BOTH the row count and the candidate
    # set — the same ≤P-rows-to-driver discipline as ranking.py. No
    # persist is needed: nothing downstream re-reads the kernel.
    rows = summary.collect()
    n = sum(r["__pn"] for r in rows if r["__pn"] is not None)
    cand_values = sorted(
        {r[item_col] for r in rows if r[item_col] is not None}
    )
    return cand_values, int(n)


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    threshold: float = 0.001,
    capacity: int | None = None,
) -> DataFrame:
    """Exact (item, cnt) for every item occurring in at least
    ``ceil(threshold * n)`` of the n non-NULL rows.

    ``capacity`` defaults to ``ceil(1/threshold)`` — the smallest value
    for which the Misra-Gries candidate pass provably misses no heavy
    hitter. A larger capacity only adds candidate rows; a smaller one
    voids the recall guarantee, so it is rejected."""
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    floor_cap = math.ceil(1 / threshold)
    if capacity is None:
        capacity = floor_cap
    elif capacity < floor_cap:
        raise ValueError(
            f"capacity={capacity} voids the recall guarantee for "
            f"threshold={threshold}; need >= {floor_cap}"
        )
    cand_values, n = mg_candidate_counts(df, item_col, capacity)
    if n == 0 or not cand_values:
        return (
            df.select(item_col)
            .limit(0)
            .withColumn("cnt", F.lit(0).cast("long"))
        )
    min_count = hh_min_count(threshold, n)
    spark = df.sparkSession
    cand = spark.createDataFrame(
        [(v,) for v in cand_values], schema=df.select(item_col).schema
    )
    return (
        df.join(F.broadcast(cand), item_col, "leftsemi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def _candidate_counts_frame(df: DataFrame, item_col: str, union_vals) -> DataFrame:
    """The one corpus pass of :func:`verify_stage_candidates`: exact
    counts of the candidate union via broadcast semi-join + partial-
    aggregated groupBy — the corpus never shuffles by item. Exposed so
    plan tests can pin the broadcast shape (the composed result frame
    is a literal and hides this join from its own plan)."""
    cand = df.sparkSession.createDataFrame(
        [(v,) for v in union_vals], schema=df.select(item_col).schema
    )
    return (
        df.join(F.broadcast(cand), item_col, "leftsemi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def verify_stage_candidates(
    df: DataFrame,
    item_col: str,
    stages: dict,
    threshold: float,
) -> DataFrame:
    """ONE exact-count pass serving several candidate stages: counts
    the UNION of all stages' candidate items over ``df``, then filters
    per stage by membership and that stage's own cutoff. Returns
    (stage, <item_col>, cnt) — a stage's rows are exactly what a
    standalone verify of its candidate set would produce.

    ``stages`` maps stage name → (candidate values, n) as returned by
    :func:`mg_candidate_counts` (batch) or derived from
    streaming/hitters shard summaries (Σ n_shard). The point at 100 TB:
    a batch pass and a streaming replay that verify independently each
    scan the corpus once; counting the union once and filtering per
    stage deletes all but one of those passes (VERDICT r16 task 4).

    The counted frame is candidate-bounded BY CONSTRUCTION
    (≤ Σ|stage candidates| ≤ P·capacity + shards·capacity rows — the
    same ≤P·(cap+1)-row discipline as the MG collect), so it is
    collected once and the per-stage membership/cutoff filters run
    driver-side: one corpus job total, no persist, no per-stage join
    jobs (a first cut kept the counts distributed behind a persist +
    two broadcast semi-joins and measured ~12% slower at sf0.1 for
    identical scans — pure scheduler overhead). The returned frame
    carries the standard no-op ``cleanup()`` hook so consumers compose
    it unconditionally."""
    from .cache import attach_cleanup

    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    spark = df.sparkSession
    item_schema = df.select(item_col).schema
    out_schema = (
        f"stage string, `{item_col}` "
        f"{item_schema[item_col].dataType.simpleString()}, cnt long"
    )
    union_vals = sorted({v for vals, _ in stages.values() for v in vals})
    if not union_vals:
        return attach_cleanup(spark.createDataFrame([], out_schema))
    # bounded collect: ≤ |union_vals| rows
    counted = _candidate_counts_frame(df, item_col, union_vals).collect()
    counts = {r[item_col]: r["cnt"] for r in counted}
    rows = []
    for name in sorted(stages):
        vals, n = stages[name]
        if not vals or n <= 0:
            continue
        floor = hh_min_count(threshold, n)
        for v in sorted(set(vals)):
            c = counts.get(v)
            if c is not None and c >= floor:
                rows.append((name, v, c))
    return attach_cleanup(spark.createDataFrame(rows, out_schema))


def heavy_hitter_tokens(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.001,
    capacity: int | None = None,
) -> DataFrame:
    """Frequent tokens across a document corpus: whitespace-tokenize,
    explode, then :func:`heavy_hitters` over the token rows. The explode
    never materializes a distinct-token table — exactly the case where
    the sketch path beats the naive groupBy at scale.

    Tokenization contract (r16 review → r17 lockstep): this operator
    uses the canonical ``functions.text.tokens`` helper — single-space
    split, the engine-wide convention that keeps exact parity with
    DuckDB's ``string_split(text, ' ')`` in the q62 oracle. Changing
    the tokenizer means changing text.tokens, the q62 oracle, and the
    q16 profile together."""
    from ..functions.text import tokens

    toks = df.select(F.explode(tokens(text_col)).alias("token"))
    return heavy_hitters(toks, "token", threshold, capacity)
