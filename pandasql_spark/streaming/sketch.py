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
``ttl_seconds`` event-time timeout evicting closed windows past the
watermark) → upsert sink. State is then bounded in BOTH dimensions:
≤ k hashes per window AND only in-flight windows in the store. The
gate replay (q76) runs the eviction path: an AvailableNow replay's
final no-data batch fires the timeouts, which remove state without
emitting, so the sink's last row per window still equals the batch
bottom-k the oracle computes. Eviction mechanics follow
user_running_totals (streaming/events.py:187-211).
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


def windowed_kmv_distinct(
    events: DataFrame, k: int = 256, ttl_seconds: int | None = 7200
) -> DataFrame:
    """(hour, n_hashes, kth_hash, estimate): per-hour distinct-user
    estimate from a bounded k-hash sketch per window. Works on a
    streaming OR batch frame with (ts, user_id); streaming state is one
    ≤k-element sorted hash array per hour.

    State eviction (streaming only) — the caller picks the trade-off:
    - ``ttl_seconds=N`` (default 7200 = window length + 1 h slack):
      N doubles as the watermark lateness allowance (events more than
      N behind the newest hour are dropped, the standard watermark
      contract) and as the idle timeout: a window untouched for N
      seconds past the watermark is closed — state removed WITHOUT
      emitting (update-mode sinks already hold its final row). Bounds
      the store by in-flight windows (~2×ttl of event time).
    - ``ttl_seconds=None``: NoTimeout, no watermark — every window
      ever seen stays in state and arbitrarily late events still
      merge. Right for bounded, possibly unordered backfills/replays;
      wrong for an unbounded production stream.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if ttl_seconds is not None and ttl_seconds <= 0:
        raise ValueError(f"ttl_seconds must be positive, got {ttl_seconds}")

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
        if state.hasTimedOut:
            # Window closed: watermark passed its ttl with no new data.
            # The update-mode sink already holds this window's final
            # row, so evict silently.
            state.remove()
            return
        hashes = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            hashes.update(pdf["hx"])
        merged = sorted(hashes)[:k]  # exact KMV merge: union + bottom-k
        state.update((merged,))
        if ttl_seconds is not None:
            # Re-armed on every batch that touches this window; fires
            # once the event-time watermark is ttl past the last touch.
            state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + ttl_seconds * 1000
            )
        n, kth, est = _estimate(merged, k)
        yield pd.DataFrame(
            {"hour": [hour], "n_hashes": [n], "kth_hash": [kth], "estimate": [est]}
        )

    if ttl_seconds is not None:
        # `hour` is itself the event-time column (date_trunc of ts), so
        # watermark it directly: watermark = max(hour) − ttl, i.e. the
        # ttl doubles as the lateness allowance. A window is evicted
        # once the watermark advances ttl past its last touch — total
        # event-time retention ≈ 2×ttl after the stream moves on.
        hashed = hashed.withWatermark("hour", f"{ttl_seconds} seconds")
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout

    return hashed.groupBy("hour").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def replay_windowed_kmv(
    spark: SparkSession,
    events_path: str,
    k: int = 256,
    ttl_seconds: int | None = None,
    query_name: str = "q76_kmv_replay",
) -> DataFrame:
    """Run `windowed_kmv_distinct` through the REAL streaming engine
    over a bounded replay (update mode; the single-file testdata is one
    micro-batch, so the sink's final row per hour equals the batch
    bottom-k the oracle computes).

    Default ``ttl_seconds=None`` (NoTimeout, no watermark): a bounded
    replay is a BACKFILL, and backfill inputs are not guaranteed
    time-ordered across files — a ttl installs a watermark that would
    silently drop stragglers more than ttl behind the max hour seen.
    The production entry point `windowed_kmv_distinct` keeps its 7200 s
    eviction default (bounded state is non-negotiable on an unbounded
    stream); pass ``ttl_seconds`` explicitly here only for time-ordered
    replays (the q76 gate does, to exercise the eviction path).
    Multi-batch merge equivalence and state-count eviction assertions
    live in tests/test_streaming_sketch.py with maxFilesPerTrigger
    pacing."""
    from .events import _replay

    return _replay(
        spark,
        events_path,
        lambda ev: windowed_kmv_distinct(ev, k=k, ttl_seconds=ttl_seconds),
        query_name,
        output_mode="update",
    )
