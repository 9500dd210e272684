"""Streaming tests: drive each operator through an actual streaming query
(file source → memory sink, processAllAvailable) and check against the
batch equivalent on the same data — the standard differential harness
for Structured Streaming."""

from __future__ import annotations

import shutil
import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandasql_spark.queries import load_events
from pandasql_spark.streaming import (
    dedup_event_stream,
    hourly_event_counts,
    read_event_stream,
    session_windows,
    sliding_value_stats,
    user_running_totals,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """events.parquet re-written as a 4-file directory so the file source
    produces multiple micro-batches (maxFilesPerTrigger=1)."""
    d = tmp_path_factory.mktemp("events_stream")
    ev = load_events(spark, SF)
    ev.repartition(4).write.mode("overwrite").parquet(str(d / "data"))
    yield str(d / "data")
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, stream_df, mode="append"):
    name = "t" + uuid.uuid4().hex[:10]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).toPandas()


def test_hourly_tumbling(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    got = _run_stream(spark, hourly_event_counts(stream), mode="complete")
    batch = load_events(spark, SF)
    expected = hourly_event_counts(batch).toPandas()
    key = ["window_start", "event_type"]
    pd.testing.assert_frame_equal(
        got.sort_values(key, ignore_index=True).sort_index(axis=1),
        expected.sort_values(key, ignore_index=True).sort_index(axis=1),
        check_dtype=False,
    )


def test_sliding_windows(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    got = _run_stream(spark, sliding_value_stats(stream), mode="complete")
    expected = sliding_value_stats(load_events(spark, SF)).toPandas()
    key = ["window_start"]
    pd.testing.assert_frame_equal(
        got.sort_values(key, ignore_index=True).sort_index(axis=1),
        expected.sort_values(key, ignore_index=True).sort_index(axis=1),
        check_dtype=False,
    )
    # overlap factor: every event is in 3 windows (30min/10min)
    n_events = load_events(spark, SF).count()
    assert got["n_events"].sum() == 3 * n_events


def test_session_windows(spark, event_dir):
    # the 4-file split is not time-ordered, so a realistic watermark
    # would (correctly) drop late arrivals; widen it past the 30-day data
    # span to make streaming == batch for the differential check.
    stream = read_event_stream(spark, event_dir)
    got = _run_stream(spark, session_windows(stream, watermark="45 days"), mode="complete")
    expected = session_windows(load_events(spark, SF), watermark="45 days").toPandas()
    key = ["user_id", "session_start"]
    pd.testing.assert_frame_equal(
        got.sort_values(key, ignore_index=True).sort_index(axis=1),
        expected.sort_values(key, ignore_index=True).sort_index(axis=1),
        check_dtype=False,
    )
    # sessions never overlap per user
    for _, grp in got.sort_values("session_start").groupby("user_id"):
        starts = grp["session_start"].to_list()
        ends = grp["session_end"].to_list()
        assert all(ends[i] <= starts[i + 1] for i in range(len(grp) - 1))


def test_streaming_dedup(spark, tmp_path):
    """An at-least-once replay (every event delivered twice) dedups back
    to exactly the original rows."""
    ev = load_events(spark, SF)
    d = str(tmp_path / "dup")
    ev.repartition(2).write.mode("overwrite").parquet(d)
    ev.repartition(2).write.mode("append").parquet(d)
    stream = read_event_stream(spark, d)
    got = _run_stream(
        spark, dedup_event_stream(stream, ["event_id"], watermark="45 days")
    )
    assert len(got) == ev.count()
    assert got["event_id"].is_unique


def test_user_running_totals_stateful(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    got = _run_stream(spark, user_running_totals(stream), mode="update")
    # update mode emits one row per user per micro-batch; the LAST row per
    # user is the final running total → compare to batch groupBy
    final = got.groupby("user_id").last()
    batch = (
        load_events(spark, SF)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    final = final.sort_index()
    assert list(final["n_events"]) == list(batch["n_events"])
    assert final["total_value"].tolist() == pytest.approx(batch["total_value"].tolist(), abs=0.05)


def test_stream_stream_interval_join(spark, event_dir):
    from pandasql_spark.streaming import click_purchase_interval_join

    stream = read_event_stream(spark, event_dir)
    # 45-day watermark >> the data span so the unordered 4-file replay
    # doesn't drop legitimate matches (same rationale as session test)
    got = _run_stream(
        spark, click_purchase_interval_join(stream, watermark="45 days")
    )
    expected = click_purchase_interval_join(load_events(spark, SF)).toPandas()
    key = ["purchase_id", "c_ts"]
    pd.testing.assert_frame_equal(
        got.sort_values(key, ignore_index=True).sort_index(axis=1),
        expected.sort_values(key, ignore_index=True).sort_index(axis=1),
        check_dtype=False,
    )
    assert len(got) > 0
