"""Streaming per-key priority sample (streaming/sample.py): replay vs
batch-twin equivalence, multi-batch bottom-k merge, bounded state,
determinism, and salt variation."""

from __future__ import annotations

import hashlib
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from pandasql_spark.queries import load_events
from pandasql_spark.streaming.sample import (
    priority_sample_per_key,
    replay_priority_sample,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("psample_stream")
    load_events(spark, SF).repartition(4).write.mode("overwrite").parquet(
        str(d / "data")
    )
    yield str(d / "data")
    shutil.rmtree(d, ignore_errors=True)


def _py_expected(spark, k, salt=""):
    """Pure-python bottom-k md5 priorities per event_type."""
    rows = (
        load_events(spark, SF)
        .select("event_type", "event_id")
        .collect()
    )
    by_key: dict = {}
    for r in rows:
        px = hashlib.md5(f"{salt}{r.event_id}".encode()).hexdigest()
        by_key.setdefault(r.event_type, []).append((px, r.event_id))
    return {
        key: [i for _, i in sorted(v)[:k]] for key, v in by_key.items()
    }


def test_batch_twin_matches_python(spark):
    got = {
        r.event_type: list(r.sample_ids)
        for r in priority_sample_per_key(load_events(spark, SF), k=10).collect()
    }
    assert got == _py_expected(spark, 10)


def test_replay_equals_batch_twin(spark):
    k = 12
    got = {
        r.event_type: (r.n_sample, list(r.sample_ids))
        for r in replay_priority_sample(
            spark, f"{SF}/events.parquet", k=k,
            query_name="t" + uuid.uuid4().hex[:8],
        ).collect()
    }
    exp = {
        r.event_type: (r.n_sample, list(r.sample_ids))
        for r in priority_sample_per_key(load_events(spark, SF), k=k).collect()
    }
    assert got == exp and len(got) > 0


def test_multi_batch_merge_equals_single_batch(spark, event_dir):
    """4 micro-batches (maxFilesPerTrigger=1, random splits): the
    per-key bottom-k state merges across batches; the FINAL row per
    key must equal the batch twin on the whole corpus."""
    from pandasql_spark.streaming.events import EVENT_SCHEMA

    k = 8
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_dir)
    )
    name = "t" + uuid.uuid4().hex[:8]
    q = (
        priority_sample_per_key(stream, k=k)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pdf = spark.table(name).toPandas()
    final = pdf.groupby("event_type").last()
    got = {
        t: (int(row["n_sample"]), list(row["sample_ids"]))
        for t, row in final.iterrows()
    }
    exp = {
        r.event_type: (r.n_sample, list(r.sample_ids))
        for r in priority_sample_per_key(load_events(spark, SF), k=k).collect()
    }
    assert got == exp
    # sample genuinely merged across batches: n_sample == k somewhere
    assert any(n == k for n, _ in got.values())


def test_sample_bounded_and_deterministic(spark):
    ev = load_events(spark, SF)
    a = priority_sample_per_key(ev, k=5).collect()
    b = priority_sample_per_key(ev, k=5).collect()
    assert sorted((r.event_type, tuple(r.sample_ids)) for r in a) == sorted(
        (r.event_type, tuple(r.sample_ids)) for r in b
    )
    assert all(r.n_sample <= 5 for r in a)


def test_salt_changes_the_sample(spark):
    ev = load_events(spark, SF)
    a = {
        r.event_type: tuple(r.sample_ids)
        for r in priority_sample_per_key(ev, k=10, salt="a").collect()
    }
    b = {
        r.event_type: tuple(r.sample_ids)
        for r in priority_sample_per_key(ev, k=10, salt="b").collect()
    }
    assert a != b
    assert a == _py_expected_tuples(spark, 10, "a")


def _py_expected_tuples(spark, k, salt):
    return {
        key: tuple(v) for key, v in _py_expected(spark, k, salt).items()
    }


def test_validation(spark):
    with pytest.raises(ValueError):
        priority_sample_per_key(load_events(spark, SF), k=0)
