"""Streaming windowed KMV distinct sketch — bounded-state distinct
counting per event-time window, via ``applyInPandasWithState``.

The problem: per-window COUNT(DISTINCT user) over a stream either
keeps every distinct key in state (exact, unbounded) or uses an
engine-internal HLL nobody can audit. The KMV sketch (see
operators/sketch.py) bounds state at k hashes PER WINDOW — a keyed
process function whose state is the window's k smallest md5 values:

- state per window = ``array<string>`` of ≤ k fixed-width hex hashes
  (k=256 ⇒ ~8 KB per window) — bounded regardless of traffic;
- merging a micro-batch is set-union + re-truncate to bottom-k, the
  sketch's exact merge, so the final state after any batch split is
  identical to a single-batch run (replay-tested);
- the emitted estimate uses the SAME (k−1)·M/h(k) arithmetic as the
  batch operator, so a DuckDB oracle recomputes the streamed result
  exactly (q76) — including which windows took the exact-below-k
  branch.

Production topology: Kafka source → this operator (update mode,
event-time timeout evicting windows older than the watermark) →
upsert sink. The gate replay uses NoTimeout + AvailableNow, where the
final row per window equals the batch bottom-k, which is what the
oracle checks; timeout-based eviction follows user_running_totals'
pattern (streaming/events.py:187-211).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketch import M

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("hour", T.TimestampType()),
        T.StructField("n_hashes", T.LongType()),
        T.StructField("kth_hash", T.StringType()),
        T.StructField("estimate", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [T.StructField("hashes", T.ArrayType(T.StringType()))]
)


def _estimate(merged: list[str], k: int) -> tuple[int, str | None, float | None]:
    n = len(merged)
    if not merged:
        return 0, None, None
    if n < k:
        return n, merged[-1], float(n)
    kth = merged[-1]
    return n, kth, round((k - 1) * M / float(int(kth[:13], 16)), 6)


def windowed_kmv_distinct(events: DataFrame, k: int = 256) -> DataFrame:
    """(hour, n_hashes, kth_hash, estimate): per-hour distinct-user
    estimate from a bounded k-hash sketch per window. Works on a
    streaming OR batch frame with (ts, user_id); streaming state is one
    ≤k-element sorted hash array per hour."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    # NULL users are excluded (COUNT DISTINCT semantics) BEFORE hashing:
    # md5(NULL) is None, which would poison the stateful sorted() merge
    # and grab a bottom-k slot in the batch twin's NULLS-FIRST sort
    hashed = events.filter(F.col("user_id").isNotNull()).select(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.md5(F.col("user_id").cast("string")).alias("hx"),
    )

    if not events.isStreaming:
        # batch twin: per-window bottom-k via a rank window — identical
        # output, no keyed state (applyInPandasWithState is
        # streaming-only). Used for backfills and as the oracle shape.
        from pyspark.sql import Window

        w = Window.partitionBy("hour").orderBy("hx")
        agg = (
            hashed.dropDuplicates(["hour", "hx"])
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .groupBy("hour")
            .agg(
                F.count(F.lit(1)).alias("n_hashes"),
                F.max("hx").alias("kth_hash"),
            )
        )
        from ..operators.sketch import estimate_expr

        return agg.select("hour", "n_hashes", "kth_hash", estimate_expr(k))

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (hour,) = key
        hashes = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            hashes.update(pdf["hx"])
        merged = sorted(hashes)[:k]  # exact KMV merge: union + bottom-k
        state.update((merged,))
        n, kth, est = _estimate(merged, k)
        yield pd.DataFrame(
            {"hour": [hour], "n_hashes": [n], "kth_hash": [kth], "estimate": [est]}
        )

    return hashed.groupBy("hour").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def replay_windowed_kmv(
    spark: SparkSession,
    events_path: str,
    k: int = 256,
    query_name: str = "q76_kmv_replay",
) -> DataFrame:
    """Run `windowed_kmv_distinct` through the REAL streaming engine
    over a bounded replay (update mode; the single-file testdata is one
    micro-batch, so the sink's final row per hour equals the batch
    bottom-k the oracle computes). Multi-batch merge equivalence is
    covered in tests/test_streaming_sketch.py with maxFilesPerTrigger
    pacing."""
    from .events import _replay

    return _replay(
        spark,
        events_path,
        lambda ev: windowed_kmv_distinct(ev, k=k),
        query_name,
        output_mode="update",
    )
