"""Streaming windowed KMV sketch (streaming/sketch.py): replay vs
batch equivalence, multi-batch merge correctness, bounded state, and
branch coverage at small k."""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from pandasql_spark.queries import load_events
from pandasql_spark.streaming.sketch import (
    replay_windowed_kmv,
    windowed_kmv_distinct,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("kmv_stream")
    load_events(spark, SF).repartition(4).write.mode("overwrite").parquet(
        str(d / "data")
    )
    yield str(d / "data")
    shutil.rmtree(d, ignore_errors=True)


def _batch_expected(spark, k):
    """Batch bottom-k per hour, straight from the batch frame."""
    ev = load_events(spark, SF)
    h = ev.select(
        F.date_trunc("hour", "ts").alias("hour"),
        F.md5(F.col("user_id").cast("string")).alias("hx"),
    ).dropDuplicates(["hour", "hx"])
    from pyspark.sql import Window

    w = Window.partitionBy("hour").orderBy("hx")
    return (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("hour")
        .agg(F.count(F.lit(1)).alias("n_hashes"), F.max("hx").alias("kth_hash"))
    )


def test_replay_equals_batch_bottom_k(spark):
    k = 4  # below the busiest sf0.001 hour (6 distinct users)
    got = {
        r.hour: (r.n_hashes, r.kth_hash)
        for r in replay_windowed_kmv(
            spark, f"{SF}/events.parquet", k=k,
            query_name="t" + uuid.uuid4().hex[:8],
        ).collect()
    }
    exp = {
        r.hour: (r.n_hashes, r.kth_hash)
        for r in _batch_expected(spark, k).collect()
    }
    assert got == exp and len(got) > 0
    # both estimator branches exercised at k=4 on this corpus
    ns = {n for n, _ in got.values()}
    assert any(n == 4 for n in ns) and any(n < 4 for n in ns)


def test_multi_batch_merge_equals_single_batch(spark, event_dir):
    """4 micro-batches (maxFilesPerTrigger=1): the per-window state
    merges union+bottom-k across batches; the FINAL row per hour must
    equal the single-batch (= batch) sketch. The files are random
    (not time-ordered) splits — an unordered backfill — so this runs
    ttl_seconds=None: with a watermark, cross-batch stragglers would
    correctly be dropped as late."""
    from pandasql_spark.streaming.events import EVENT_SCHEMA

    k = 16
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_dir)
    )
    name = "t" + uuid.uuid4().hex[:8]
    q = (
        windowed_kmv_distinct(stream, k=k, ttl_seconds=None)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode appends one row per window per touching batch; the
    # LAST row per window is the final state
    pdf = spark.table(name).toPandas()
    final = pdf.groupby("hour").last()
    exp = {
        r.hour: (r.n_hashes, r.kth_hash)
        for r in _batch_expected(spark, k).collect()
    }
    got = {
        h: (int(row["n_hashes"]), row["kth_hash"])
        for h, row in final.iterrows()
    }
    assert got == exp


def test_state_is_bounded_at_k(spark):
    out = replay_windowed_kmv(
        spark, f"{SF}/events.parquet", k=4,
        query_name="t" + uuid.uuid4().hex[:8],
    )
    assert out.agg(F.max("n_hashes")).first()[0] <= 4


def test_batch_mode_estimate_accuracy(spark):
    # the same operator runs on a batch frame; estimates track truth
    ev = load_events(spark, SF)
    est = {
        r.hour: r.estimate
        for r in windowed_kmv_distinct(ev, k=64).collect()
    }
    true = {
        r.hour: r.d
        for r in ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    assert est.keys() == true.keys()
    for h in est:
        if true[h] < 64:
            assert est[h] == float(true[h])  # exact branch
        else:
            assert abs(est[h] - true[h]) / true[h] < 0.5


def test_ttl_evicts_closed_windows_from_state(spark, tmp_path):
    """Eviction gate (VERDICT r5 task 2): with ttl_seconds set, windows
    the watermark has passed leave the state store — numRowsTotal at
    the end of a chronological multi-batch replay is far below the
    total window count — while the sink's final row per window still
    equals the batch bottom-k (chunks split on day boundaries, so no
    window straddles a batch and nothing is dropped as late)."""
    import glob
    import os
    import shutil as sh

    ev = load_events(spark, SF).withColumn("d", F.dayofmonth("ts"))
    stream_dir = str(tmp_path / "ordered")
    os.makedirs(stream_dir)
    # three chronological chunks (days 1-10, 11-20, 21-31), one file
    # each, ascending mtimes so the file source replays them in order
    for i, (lo, hi) in enumerate([(1, 10), (11, 20), (21, 31)]):
        stage = str(tmp_path / f"stage{i}")
        ev.filter((F.col("d") >= lo) & (F.col("d") <= hi)).drop(
            "d"
        ).coalesce(1).write.parquet(stage)
        (part,) = glob.glob(f"{stage}/part-*.parquet")
        dst = f"{stream_dir}/chunk{i}.parquet"
        sh.move(part, dst)
        os.utime(dst, (1700000000 + i * 100, 1700000000 + i * 100))

    from pandasql_spark.streaming.events import EVENT_SCHEMA

    k = 8
    ttl = 7200  # 2 h: windows idle 2 h past the watermark are evicted
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    name = "t" + uuid.uuid4().hex[:8]
    q = (
        windowed_kmv_distinct(stream, k=k, ttl_seconds=ttl)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    finally:
        q.stop()

    n_windows = _batch_expected(spark, k).count()
    # closed windows left the store: only the tail of the stream's
    # event time (~last chunk + 2x ttl) may remain
    assert state_rows < n_windows / 2, (state_rows, n_windows)
    # and the sink's final row per window is still the batch bottom-k
    pdf = spark.table(name).toPandas()
    final = pdf.groupby("hour").last()
    exp = {
        r.hour: (r.n_hashes, r.kth_hash)
        for r in _batch_expected(spark, k).collect()
    }
    got = {
        h: (int(row["n_hashes"]), row["kth_hash"])
        for h, row in final.iterrows()
    }
    assert got == exp


def test_null_user_does_not_crash_stream(spark, tmp_path):
    import pandas as pd

    from pandasql_spark.streaming.events import EVENT_SCHEMA

    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(["2024-01-01 10:00"] * 3),
            "user_id": [1, None, 2],
            "event_type": ["click"] * 3,
            "value": [1.0] * 3,
            "props": ["{}"] * 3,
        }
    )
    d = str(tmp_path / "nulls")
    spark.createDataFrame(pdf, EVENT_SCHEMA).write.parquet(d)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(d)
    name = "t" + uuid.uuid4().hex[:8]
    q = (
        windowed_kmv_distinct(stream, k=8)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    assert len(rows) == 1 and rows[0].n_hashes == 2  # NULL user excluded
