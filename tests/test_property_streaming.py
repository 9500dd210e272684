"""Property-based differential tests for the streaming twins.

The fixed-corpus streaming tests (test_streaming.py) replay one events
table; these replay HYPOTHESIS-GENERATED event frames through the real
streaming engine (file source → memory sink, processAllAvailable) and
compare to the batch twin on the same rows. Tiny ts/user domains force
the surfaces fixtures rarely hit: exact-tie timestamps, single-event
sessions, sessions that merge across micro-batch boundaries, sliding
windows with zero-or-tied membership, interval-join boundary hits
(c_ts exactly window-width before p_ts), and out-of-order file replay
(files are not time-sorted, so later micro-batches deliver earlier
events — the watermark is widened past the data span so none drop).

Values are integer-valued doubles so rounded sums are order-independent
and the streaming/batch comparison is exact.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid
from datetime import datetime, timedelta

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import soak_examples

from pandasql_spark.streaming import (
    click_purchase_interval_join,
    read_event_stream,
    session_windows,
    sliding_value_stats,
)
from pandasql_spark.streaming.events import EVENT_SCHEMA

_BASE = datetime(2024, 1, 1)
_WIDE = "365 days"  # >> data span: unordered replay must drop nothing


@st.composite
def event_frames(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for i in range(n):
        # minute offsets cluster around session-gap (30m) and interval-
        # join (60m) boundaries; duplicates create exact ts ties
        minutes = draw(st.integers(min_value=0, max_value=200))
        rows.append(
            {
                "event_id": i,
                "ts": _BASE + timedelta(minutes=minutes),
                "user_id": draw(st.integers(min_value=0, max_value=3)),
                "event_type": draw(
                    st.sampled_from(["click", "purchase", "view"])
                ),
                "value": float(draw(st.integers(min_value=-50, max_value=50))),
                "props": "{}",
            }
        )
    return pd.DataFrame(rows)


def _replay_vs_batch(spark, pdf, build, mode):
    """Write the frame as a 3-file parquet dir, run `build` on the
    file-source stream AND on the batch read of the same dir, return
    (streamed, batch) pandas frames."""
    d = tempfile.mkdtemp(prefix="prop_stream_")
    try:
        sdf = spark.createDataFrame(pdf, schema=EVENT_SCHEMA)
        sdf.repartition(3).write.mode("overwrite").parquet(d)
        name = "p" + uuid.uuid4().hex[:10]
        q = (
            build(read_event_stream(spark, d))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.table(name).toPandas()
        expected = build(spark.read.parquet(d)).toPandas()
        return got, expected
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _assert_same(got, expected, key=None):
    # Sort on ALL columns, not just a caller-chosen key: a partial key is
    # not a total order, so ties (e.g. two clicks with identical
    # (user_id, ts) but different values) would flip row order between the
    # streamed and batch frames even though they are the same multiset.
    def _norm(frame):
        frame = frame.sort_index(axis=1)
        return frame.sort_values(list(frame.columns), ignore_index=True)

    pd.testing.assert_frame_equal(_norm(got), _norm(expected), check_dtype=False)


@settings(
    max_examples=soak_examples(5),
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.data_too_large,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(pdf=event_frames())
def test_session_windows_stream_matches_batch(spark, pdf):
    got, expected = _replay_vs_batch(
        spark,
        pdf,
        lambda ev: session_windows(ev, gap="30 minutes", watermark=_WIDE),
        mode="complete",
    )
    _assert_same(got, expected, ["user_id", "session_start"])
    # invariant: per-user sessions never overlap and are > gap apart
    for _, grp in got.sort_values("session_start").groupby("user_id"):
        starts, ends = grp["session_start"].tolist(), grp["session_end"].tolist()
        assert all(ends[i] <= starts[i + 1] for i in range(len(grp) - 1))


@settings(
    max_examples=soak_examples(5),
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.data_too_large,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(pdf=event_frames())
def test_sliding_windows_stream_matches_batch(spark, pdf):
    got, expected = _replay_vs_batch(
        spark,
        pdf,
        lambda ev: sliding_value_stats(ev, watermark=_WIDE),
        mode="complete",
    )
    _assert_same(got, expected, ["window_start"])
    # overlap invariant: every event is in exactly window/slide windows
    assert got["n_events"].sum() == 3 * len(pdf)


@settings(
    max_examples=soak_examples(5),
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.data_too_large,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(pdf=event_frames())
def test_interval_join_stream_matches_batch(spark, pdf):
    got, expected = _replay_vs_batch(
        spark,
        pdf,
        lambda ev: click_purchase_interval_join(ev, watermark=_WIDE),
        mode="append",
    )
    _assert_same(got, expected, ["purchase_id", "c_ts"])
