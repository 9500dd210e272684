"""Streaming crawl ingest (streaming/crawl_ingest.py): real-engine
replays vs the batch closed form (host-cap admission → min-id URL
dedup → token gate), retry-of-batch idempotency, host-cap continuation
across micro-batches, batch-count invariance, and the staging guard."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pandasql_spark.operators.crawl import extract_crawl_columns
from pandasql_spark.streaming.crawl_ingest import (
    process_crawl_batch,
    replay_crawl_ingest,
)

SF = "/root/testdata/sf0.001"
HOST_CAP = 25
MIN_TOKENS = 40


def _crawl_frame(spark, limit=200):
    """Messy crawl records over documents: q92-style HTML page, q93-style
    messy URL (case, default port, fragment, tracking params) whose
    path is doc_id % 11, so canonical-URL collisions occur WITHIN a
    host's admission budget and the dedup stage does real work."""
    d = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < limit)
    )
    page = F.concat(
        F.lit("<html><head><title>doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body><p>"),
        F.replace(F.col("text"), F.lit(" "), F.lit("</p> <p>")),
        F.lit("</p></body></html>"),
    )
    url = F.concat(
        F.lit("HTTP://Site"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".COM"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/p/"),
        (F.col("doc_id") % 11).cast("string"),
        F.lit("?b=2&utm_source=t&a=1"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    return d.select("doc_id", url.alias("url"), page.alias("html"))


def _closed_form(crawl):
    """The batch closed form the module docstring promises: first
    host_cap docs per host by id → min-id per canonical URL → token
    gate. Built on the SAME extraction the stream uses (shared by
    construction), so the equality below tests the streaming
    composition — admission state, store anti-join, sink idempotency —
    not the extraction chain (q92/q93/q94 pin that)."""
    ext = extract_crawl_columns(crawl)
    wh = Window.partitionBy("host").orderBy(F.col("doc_id").asc())
    wu = Window.partitionBy("url_norm").orderBy(F.col("doc_id").asc())
    return (
        ext.withColumn("__h", F.row_number().over(wh))
        .filter(F.col("__h") <= HOST_CAP)
        .withColumn("__u", F.row_number().over(wu))
        .filter(F.col("__u") == 1)
        .drop("__h", "__u")
        .filter(F.col("n_tokens") >= MIN_TOKENS)
    )


def _pdf(df):
    return (
        df.toPandas()
        .sort_index(axis=1)
        .sort_values("doc_id", ignore_index=True)
    )


@pytest.fixture(scope="module")
def crawl(spark):
    return _crawl_frame(spark)


@pytest.fixture(scope="module")
def expected(spark, crawl):
    return _pdf(_closed_form(crawl))


def test_replay_matches_closed_form(spark, crawl, expected):
    got = replay_crawl_ingest(
        spark, crawl, n_batches=3, host_cap=HOST_CAP, min_tokens=MIN_TOKENS
    )
    import pandas as pd

    pd.testing.assert_frame_equal(_pdf(got), expected, check_dtype=False)
    # the run must have exercised CROSS-BATCH admission continuation:
    # no host may fill its cap inside the first chunk alone
    n = crawl.count()
    first_chunk = extract_crawl_columns(
        crawl.orderBy("doc_id").limit(n // 3)
    )
    max_host = (
        first_chunk.groupBy("host").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_host < HOST_CAP, "cap filled in batch 1 — continuation untested"
    # and the cap must actually bind overall
    assert (
        extract_crawl_columns(crawl)
        .groupBy("host")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
        > HOST_CAP
    )


@pytest.mark.parametrize("n_batches", [1, 5])
def test_batch_count_invariance(spark, crawl, expected, n_batches):
    """Same corpus regardless of how the bounded crawl is chunked into
    micro-batches (monotone-id arrival contract)."""
    got = replay_crawl_ingest(
        spark,
        crawl,
        n_batches=n_batches,
        host_cap=HOST_CAP,
        min_tokens=MIN_TOKENS,
    )
    import pandas as pd

    pd.testing.assert_frame_equal(_pdf(got), expected, check_dtype=False)


@pytest.fixture()
def dirs():
    work = tempfile.mkdtemp(prefix="crawl_batch_")
    yield os.path.join(work, "store"), os.path.join(work, "corpus")
    shutil.rmtree(work, ignore_errors=True)


def test_retry_of_batch_is_idempotent(spark, crawl, dirs):
    """A retried foreachBatch invocation (same batch_id) must neither
    duplicate corpus rows nor anti-join the batch out against its own
    previous store write (the ``batch_id < current`` filter)."""
    store, corpus = dirs
    pdf = crawl.toPandas().sort_values("doc_id", ignore_index=True)
    half = len(pdf) // 2
    b0 = spark.createDataFrame(pdf.iloc[:half])
    b1 = spark.createDataFrame(pdf.iloc[half:])
    process_crawl_batch(b0, 0, store, corpus, min_tokens=MIN_TOKENS)
    process_crawl_batch(b1, 1, store, corpus, min_tokens=MIN_TOKENS)
    once = _pdf(spark.read.parquet(corpus).drop("batch_id"))
    # retry both batches, out of order, then retry batch 1 again
    for bid, b in [(1, b1), (0, b0), (1, b1)]:
        process_crawl_batch(b, bid, store, corpus, min_tokens=MIN_TOKENS)
    import pandas as pd

    again = _pdf(spark.read.parquet(corpus).drop("batch_id"))
    pd.testing.assert_frame_equal(again, once, check_dtype=False)
    # store partitions were overwritten, not appended
    urls = spark.read.parquet(os.path.join(store, "urls"))
    assert urls.count() == urls.dropDuplicates(["url_norm", "batch_id"]).count()


def test_thin_first_fetch_shadows_rich_refetch(spark, dirs):
    """Dedup keeps the first FETCH per canonical URL; quality judges
    its text. A thin first fetch that fails the token gate must still
    enter the URL store and shadow a later rich refetch — the
    crawl_to_corpus contract, held across micro-batches."""
    store, corpus = dirs
    thin = spark.createDataFrame(
        [(1, "http://a.com/x", "<html><body><p>tiny</p></body></html>")],
        "doc_id long, url string, html string",
    )
    rich = spark.createDataFrame(
        [
            (
                2,
                "http://a.com/x?utm_source=t",  # same canonical URL
                "<html><body><p>"
                + " ".join(f"w{i}" for i in range(50))
                + "</p></body></html>",
            ),
            (3, "http://a.com/y", "<html><body><p>"
             + " ".join(f"v{i}" for i in range(50))
             + "</p></body></html>"),
        ],
        "doc_id long, url string, html string",
    )
    process_crawl_batch(thin, 0, store, corpus, min_tokens=5)
    process_crawl_batch(rich, 1, store, corpus, min_tokens=5)
    out = spark.read.parquet(corpus)
    assert [r.doc_id for r in out.collect()] == [3]


def test_replay_too_many_batches_raises(spark):
    tiny = spark.createDataFrame(
        [(1, "http://a.com/", "<p>x</p>"), (2, "http://b.com/", "<p>y</p>")],
        "doc_id long, url string, html string",
    )
    with pytest.raises(ValueError, match="non-empty micro-batches"):
        replay_crawl_ingest(spark, tiny, n_batches=5, host_cap=3)


def test_fully_filtered_crawl_yields_empty_corpus(spark):
    """SOAK-found regression: when every page is capped out, deduped,
    or under the token gate, the corpus sink holds zero part files —
    the replay must return an EMPTY frame with the corpus schema, not
    die in schema inference (UNABLE_TO_INFER_SCHEMA)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": range(4),
            "url": ["http://A.com/p"] * 4,
            "html": ["<html><head><title>t</title></head>"
                     "<body><p>w</p></body></html>"] * 4,
        }
    )
    crawl = spark.createDataFrame(
        pdf, schema="doc_id long, url string, html string"
    )
    out = replay_crawl_ingest(
        spark, crawl, n_batches=2, host_cap=1, min_tokens=100
    )
    assert out.count() == 0
    assert set(out.columns) == {
        "doc_id", "url_norm", "host", "title", "text", "n_tokens",
    }


def test_batch_computed_once_per_invocation(spark, crawl, dirs):
    """process_crawl_batch runs TWO actions (URL-store write + corpus
    write); the persisted extracted frame must make the upstream batch
    compute ONCE per invocation (r18: without the cache a foreachBatch
    frame is lazily re-evaluated per action, so the staged read, the
    admission stateful op and the HTML extraction all ran twice per
    micro-batch). Accumulator-tap pattern: a pass-through mapInPandas
    counts every row that flows out of the batch source."""
    store, corpus = dirs
    acc = spark.sparkContext.accumulator(0)

    def tap(batches):
        for b in batches:
            acc.add(len(b))
            yield b

    n = crawl.count()
    tapped = crawl.mapInPandas(tap, schema=crawl.schema)
    process_crawl_batch(tapped, 0, store, corpus, min_tokens=MIN_TOKENS)
    assert acc.value == n, (
        f"batch source computed {acc.value / n:.1f}x; the extracted "
        f"persist must bound it to one pass per invocation"
    )
