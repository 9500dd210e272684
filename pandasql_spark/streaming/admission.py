"""Streaming admission caps — the streaming twin of
operators/caps.cap_per_group (q77). Batch caps pick the TOP-n of a
finished corpus; a live ingest pipeline instead needs ADMISSION
control: accept at most n rows per key over the stream's lifetime,
first-come first-served, and drop the rest at the door (per-source
crawl budgets, per-domain rate ceilings, freemium quotas).

applyInPandasWithState keyed by the cap key; state is ONE counter per
key — the smallest possible state for the job, no row retention, no
watermark needed (a counter never grows). Output mode is append:
admitted rows flow through exactly once, rejected rows simply don't.

Determinism: within a micro-batch the group's rows are sorted by
``order_cols`` before admission, so replays are reproducible given the
same batch sequence; across batches admission follows batch arrival
order (that IS the semantics — arrival wins). A time-ordered replay of
a bounded corpus therefore equals the batch first-n-by-(order_cols)
pick, which is how the tests oracle it.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def admit_per_key_stream(
    events: DataFrame,
    key_col: str,
    n: int,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Admit the first ``n`` rows per ``key_col`` value across the
    stream's lifetime; subsequent rows are dropped. Output schema ==
    input schema."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    schema = events.schema
    cols = [f.name for f in schema.fields]
    missing = [c for c in (key_col, *order_cols) if c not in cols]
    if missing:
        raise ValueError(f"columns not in stream: {missing}")

    def _fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (admitted,) = state.get if state.exists else (0,)
        remaining = n - admitted
        if remaining <= 0:
            for _ in pdfs:  # drain the iterator; nothing to admit
                pass
            return
        # one group's slice of ONE micro-batch — bounded by batch size;
        # sorted so intra-batch admission is deterministic
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(list(order_cols), ignore_index=True)
        take = batch.head(remaining)
        state.update((admitted + len(take),))
        if len(take):
            yield take[cols]

    return events.groupBy(key_col).applyInPandasWithState(
        _fn,
        outputStructType=schema,
        stateStructType="admitted long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def admit_tokens_per_key_stream(
    events: DataFrame,
    key_col: str,
    budget: int,
    token_col: str,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Token-budget admission — the streaming twin of
    operators/caps.cap_tokens_per_group, with the SAME prefix
    semantics: rows are admitted per ``key_col`` while the lifetime
    running ``token_col`` sum (including the current row) stays ≤
    ``budget``; the first overflowing row CLOSES the key permanently —
    later smaller rows never jump a dropped larger one, so a
    time-ordered replay of a bounded corpus equals the batch
    token-cap pick, which is how the tests oracle it. Zero-token rows
    ride through while the key is open — cap_tokens_per_group's
    default exactly (batch/streaming parity with no arguments).

    State per key: (consumed tokens, closed flag) — two scalars, no
    row retention, no watermark. ``consumed`` is a DOUBLE carried by
    sequential accumulation (the running cumsum's last value), so
    fractional token columns keep exact batch parity across
    micro-batch boundaries (ADVICE r13: a long state truncated the
    running sum at each batch edge, admitting rows the batch op
    drops). Output mode append; output schema == input schema."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    schema = events.schema
    cols = [f.name for f in schema.fields]
    missing = [c for c in (key_col, token_col, *order_cols) if c not in cols]
    if missing:
        raise ValueError(f"columns not in stream: {missing}")

    def _fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        consumed, closed = (
            state.get if state.exists else (0.0, False)
        )
        if closed:
            for _ in pdfs:  # drain; the key's prefix ended in the past
                pass
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(list(order_cols), ignore_index=True)
        toks = batch[token_col].to_numpy()
        cum = consumed + toks.cumsum()  # sequential, like the batch window
        ok = cum <= budget
        k = len(batch) if bool(ok.all()) else int(ok.argmin())
        state.update(
            (float(cum[k - 1]) if k else float(consumed),
             bool(k < len(batch)))
        )
        if k:
            yield batch.head(k)[cols]

    return events.groupBy(key_col).applyInPandasWithState(
        _fn,
        outputStructType=schema,
        stateStructType="consumed double, closed boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
