"""Cleanup hooks (operators/cache.py): operators that persist an
internal frame expose ``result.cleanup()`` to release it once the caller
has materialized the result."""

from __future__ import annotations

import pandas as pd

from pandasql_spark.operators.dedup import (
    dedup_corpus,
    jaccard_verified_neardup_pairs,
    minhash_neardup_pairs,
)
from pandasql_spark.operators.ranking import exact_ntile, with_global_row_number


def _ids(spark) -> set:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def _docs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                "the quick brown fox jumps over the lazy dog " * 3,
                "the quick brown fox jumps over the lazy dog " * 3 + "tail",
                "entirely different content about spark catalyst plans",
                "entirely different content about spark catalyst plans too",
                "lorem ipsum dolor sit amet consectetur adipiscing elit",
                "lorem ipsum dolor sit amet consectetur adipiscing elit sed",
                "unrelated verse of text with its own vocabulary entirely",
                "a final standalone document with nothing shared at all",
            ],
        }
    )
    return spark.createDataFrame(pdf)


# Assertions track the SPECIFIC RDD ids each operator creates: the
# session is shared across test files, and Spark's ContextCleaner
# asynchronously unpersists other tests' garbage-collected frames, so
# global counts drift in both directions mid-test.


def test_minhash_pairs_cleanup_releases_cache(spark):
    base = _ids(spark)
    out = minhash_neardup_pairs(_docs(spark), threshold=0.3)
    out.count()
    mine = _ids(spark) - base
    assert mine
    out.cleanup(blocking=True)
    assert not (_ids(spark) & mine)


def test_dedup_corpus_cleanup_composes(spark):
    base = _ids(spark)
    out = dedup_corpus(_docs(spark), threshold=0.3)
    n = out.count()
    assert 0 < n <= 8
    out.cleanup(blocking=True)
    # every persist/checkpoint the pipeline created is gone: the
    # component loop released superseded rounds inline, cleanup() the rest
    assert not (_ids(spark) - base)


def test_ranking_cleanup(spark):
    base = _ids(spark)
    df = spark.range(100).withColumnRenamed("id", "v")
    ranked = with_global_row_number(df, ["v"], num_partitions=4)
    ranked.count()
    mine = _ids(spark) - base
    assert mine
    ranked.cleanup(blocking=True)
    assert not (_ids(spark) & mine)

    base = _ids(spark)
    tiles = exact_ntile(df, 4, ["v"], num_partitions=4)
    tiles.count()
    tiles.cleanup(blocking=True)
    assert not (_ids(spark) - base)


def test_jaccard_verified_cleanup(spark):
    base = _ids(spark)
    out = jaccard_verified_neardup_pairs(_docs(spark), threshold=0.3)
    out.count()
    out.cleanup(blocking=True)
    assert not (_ids(spark) - base)


def test_stage_ordered_chunks_releases_ntile_persist(spark, tmp_path):
    """ADVICE r10 item 1: after the staged write, stage_ordered_chunks
    must release exact_ntile's internal range-partitioned persist —
    the staging leaves NO new persisted RDDs behind."""
    from pandasql_spark.streaming.events import stage_ordered_chunks

    base = _ids(spark)
    df = spark.range(40).withColumnRenamed("id", "v")
    stage_ordered_chunks(df, 4, ["v"], str(tmp_path / "stage"))
    assert not (_ids(spark) - base)
