"""Streaming per-key uniform sample — bounded-state reservoir-style
sampling over an unbounded stream, via ``applyInPandasWithState``.

The problem: "keep a uniform sample of ≤ k events per domain for
inspection / eval-set construction" over a live stream. The textbook
answer is per-key reservoir sampling (Vitter's Algorithm R), but RNG
state makes replays non-reproducible — a retry draws a DIFFERENT
sample, which is poison for audits and exactly-once sinks. The
deterministic equivalent is PRIORITY sampling: give every row the
pseudo-uniform priority ``md5(salt ‖ id)`` and keep the k SMALLEST
priorities per key. Bottom-k of i.i.d.-uniform priorities IS a
uniform sample without replacement, the stream's final sample equals
the batch pick on the bounded corpus (replay-oracle-able, the
engine-portable md5-rank convention of `stratified_sample_exact` /
the q61 gate), and a retry reproduces the identical sample.

Mechanics mirror the windowed-KMV sketch (streaming/sketch.py) — the
other bottom-k-state operator here:

- state per key = parallel sorted arrays of ≤ k (priority, id) — a
  few KB regardless of traffic;
- merging a micro-batch is union + re-sort + truncate-to-k, the exact
  bottom-k merge, so any batch split yields the single-batch result
  (replay-tested in tests/test_streaming_sample.py);
- update mode: each batch emits the key's CURRENT sample as one
  (key, n_sample, sample_ids) row; the sink's final row per key is
  the answer (the KMV consumption contract).

Keys are domains/sources — bounded cardinality — so NoTimeout state
is bounded at keys × k; for unbounded key spaces compose with
admission caps (streaming/admission.py) upstream.

Reference scope note: the reference engine (pandasql, see
pandasql/core.py) has no sampling or streaming surface; this is part
of the beyond-reference curation superset (batch twin gated by q61's
md5-rank machinery; this streaming twin gated via the q61 fold, r14).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _out_schema(key_field: T.StructField) -> T.StructType:
    return T.StructType(
        [
            key_field,
            T.StructField("n_sample", T.LongType()),
            T.StructField("sample_ids", T.ArrayType(T.LongType())),
        ]
    )


def priority_sample_per_key(
    events: DataFrame,
    key_col: str = "event_type",
    k: int = 25,
    id_col: str = "event_id",
    salt: str = "",
) -> DataFrame:
    """(key, n_sample, sample_ids): a deterministic uniform sample of
    ≤ k ids per key — the k smallest ``md5(salt ‖ id)`` priorities,
    ids ordered by (priority, id) in the output array. Works on a
    streaming OR batch frame; the batch twin is the md5-rank window
    (the q61 oracle shape), so a bounded replay's final row per key
    equals the batch pick exactly. NULL ids are excluded before
    hashing (md5(NULL) would poison the bottom-k sort on both
    paths)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    prio = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    slim = events.filter(F.col(id_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.col(id_col).cast("long").alias("id"),
        prio.alias("px"),
    )

    if not events.isStreaming:
        from pyspark.sql import Window

        w = Window.partitionBy("key").orderBy("px", "id")
        return (
            slim.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .groupBy("key")
            .agg(
                F.count(F.lit(1)).alias("n_sample"),
                # sort_array over structs: deterministic order regardless
                # of collect_list's arrival order
                F.transform(
                    F.sort_array(F.collect_list(F.struct("px", "id"))),
                    lambda s: s.id,
                ).alias("sample_ids"),
            )
            .withColumnRenamed("key", key_col)
        )

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        held: list = list(zip(*state.get)) if state.exists else []
        # state tuples are (px, id); batch rows join them, then exact
        # bottom-k merge: union + sort + truncate
        for pdf in pdfs:
            held.extend(zip(pdf["px"], pdf["id"]))
        held = sorted(set(held))[:k]
        pxs = [p for p, _ in held]
        ids = [int(i) for _, i in held]
        state.update((pxs, ids))
        yield pd.DataFrame(
            {"key": [key[0]], "n_sample": [len(ids)], "sample_ids": [ids]}
        )

    key_field = T.StructField(
        "key", events.schema[key_col].dataType
    )
    out = slim.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=_out_schema(key_field),
        stateStructType="pxs array<string>, ids array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.withColumnRenamed("key", key_col)


def replay_priority_sample(
    spark,
    events_path: str,
    key_col: str = "event_type",
    k: int = 25,
    id_col: str = "event_id",
    salt: str = "",
    query_name: str = "priority_sample_replay",
) -> DataFrame:
    """Run `priority_sample_per_key` through the REAL streaming engine
    over a bounded replay (update mode, one emission per key on the
    single-file testdata — the replay_windowed_kmv recipe). Multi-batch
    merge equivalence is pinned in tests/test_streaming_sample.py with
    maxFilesPerTrigger pacing."""
    from .events import _replay

    return _replay(
        spark,
        events_path,
        lambda ev: priority_sample_per_key(ev, key_col, k, id_col, salt),
        query_name,
        output_mode="update",
    )
