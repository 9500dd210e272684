"""Crawl -> corpus pipeline: stage semantics (dedup-before-quality,
min-id survivor, host-consistent split), one-shuffle plan, validation."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandasql_spark.operators.crawl import crawl_to_corpus


@pytest.fixture(scope="module")
def crawl_df(spark):
    rows = [
        (1, "HTTP://A.com:80/x?b=1&utm_source=s",
         "<html><title>T1</title><body><p>hello world one</p></body></html>"),
        (2, "http://a.COM/x?b=1",
         "<p>dup of one richer page content here</p>"),
        (3, "http://b.org/y", "<script>junk</script><p>tiny</p>"),
        (4, "http://b.org/z", "<p>good page with enough tokens here</p>"),
        (5, "http://a.com/other", "<p>another fine a dot com page here</p>"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "url", "html"])
    )


def test_stages_compose(crawl_df):
    out = {r["doc_id"]: r for r in crawl_to_corpus(
        crawl_df, min_tokens=3,
        split_weights={"train": 0.8, "eval": 0.2},
    ).collect()}
    # URL variants collapsed to the min-id fetch
    assert set(out) == {1, 4, 5}
    assert out[1]["url_norm"] == "http://a.com/x?b=1"
    assert out[1]["title"] == "T1"
    assert out[1]["text"] == "T1 hello world one"
    # host-consistent split: both a.com docs share a split
    assert out[1]["split"] == out[5]["split"]


def test_dedup_happens_before_quality(crawl_df):
    # doc 2's text is rich, but doc 1 (min id, same URL) wins dedup and
    # its 4-token text then faces the gate
    out = crawl_to_corpus(crawl_df, min_tokens=5).collect()
    ids = {r["doc_id"] for r in out}
    assert 1 not in ids and 2 not in ids  # URL collapsed to doc1, gated out
    assert 4 in ids and 5 in ids


def test_no_split_variant_and_validation(crawl_df):
    out = crawl_to_corpus(crawl_df)
    assert "split" not in out.columns
    assert out.count() == 4  # min_tokens=1 keeps the tiny page
    with pytest.raises(ValueError, match="min_tokens"):
        crawl_to_corpus(crawl_df, min_tokens=-1)


def test_single_shuffle_plan(crawl_df):
    out = crawl_to_corpus(crawl_df, split_weights={"a": 0.5, "b": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "WindowGroupLimit" in plan


def test_empty_extraction_counts_zero_tokens(spark):
    rows = [(1, "http://a.com/x", "<script>only junk</script><style>p{}</style>"),
            (2, "http://a.com/y", "<p>word</p>")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "url", "html"]))
    out = {r["doc_id"]: r for r in crawl_to_corpus(df, min_tokens=1).collect()}
    # the tags-only page extracts to '' -> 0 tokens -> gated OUT even
    # at the min_tokens=1 default
    assert set(out) == {2}
    assert out[2]["n_tokens"] == 1
