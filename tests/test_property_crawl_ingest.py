"""Property-based differential test for the streaming crawl ingest
(streaming/crawl_ingest.py, the q99 surface).

test_crawl_ingest.py replays ONE fixed corpus; here Hypothesis
generates adversarial crawl frames — host-key collisions through case
variants ("A.com" vs "a.COM" must share one admission budget),
canonical-URL collisions through tracking params / default ports /
fragments / scheme case, caps that saturate inside one micro-batch or
never bind at all, tags-only pages (zero tokens) colliding with rich
pages at the same canonical URL — and replays each through the REAL
streaming engine, asserting the batch closed form the module
docstring promises: first host_cap docs per host by id → min-id per
canonical URL → token gate.

The closed form is computed with the SAME extraction projection the
stream uses (extract_crawl_columns, shared by construction), so the
equality tests the stateful streaming composition — admission state
across micro-batches, the dedup-store anti-join, the idempotent sink —
not the extraction chain (q92/q93/q94 pin that)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import soak_examples

from pandasql_spark.operators.crawl import extract_crawl_columns
from pandasql_spark.streaming.crawl_ingest import replay_crawl_ingest

# every variant pair here canonicalizes to one url_norm / one host key
_HOSTS = ["A.com", "a.COM", "b.org"]
_SCHEMES = ["http://", "HTTP://", "https://"]
_PATHS = ["/p", "/p/", "/q"]
_SUFFIXES = ["", "?utm_source=t", "?a=1&utm_campaign=x", "#frag", ":80/p"]


@st.composite
def crawl_frames(draw):
    n = draw(st.integers(min_value=4, max_value=18))
    rows = []
    for i in range(n):
        host = draw(st.sampled_from(_HOSTS))
        scheme = draw(st.sampled_from(_SCHEMES))
        suffix = draw(st.sampled_from(_SUFFIXES))
        path = "" if suffix.startswith(":") else draw(st.sampled_from(_PATHS))
        n_words = draw(st.integers(min_value=0, max_value=4))
        body = " ".join(f"w{draw(st.integers(0, 2))}" for _ in range(n_words))
        rows.append(
            {
                "doc_id": i,  # arrival order = id order (replay contract)
                "url": f"{scheme}{host}{path}{suffix}",
                "html": f"<html><head><title>t{i}</title></head>"
                f"<body><p>{body}</p></body></html>",
            }
        )
    host_cap = draw(st.integers(min_value=1, max_value=4))
    min_tokens = draw(st.integers(min_value=1, max_value=3))
    # always ≥2 micro-batches: cross-batch admission/dedup continuation
    # is what this suite exists to stress (n_batches=1 degenerates to
    # the batch pipeline, pinned elsewhere); each extra micro-batch
    # costs ~2 s of real streaming machinery, so the domain stays small
    n_batches = draw(st.integers(min_value=2, max_value=3))
    return pd.DataFrame(rows), host_cap, min_tokens, n_batches


def _closed_form(crawl, host_cap, min_tokens):
    ext = extract_crawl_columns(crawl)
    wh = Window.partitionBy("host").orderBy(F.col("doc_id").asc())
    wu = Window.partitionBy("url_norm").orderBy(F.col("doc_id").asc())
    return (
        ext.withColumn("__h", F.row_number().over(wh))
        .filter(F.col("__h") <= host_cap)
        .withColumn("__u", F.row_number().over(wu))
        .filter(F.col("__u") == 1)
        .drop("__h", "__u")
        .filter(F.col("n_tokens") >= min_tokens)
    )


def _pdf(df):
    return (
        df.toPandas()
        .sort_index(axis=1)
        .sort_values("doc_id", ignore_index=True)
    )


@settings(
    max_examples=soak_examples(2),
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.data_too_large,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(case=crawl_frames())
def test_replay_matches_closed_form(spark, case):
    pdf, host_cap, min_tokens, n_batches = case
    crawl = spark.createDataFrame(pdf, schema="doc_id long, url string, html string")
    got = replay_crawl_ingest(
        spark, crawl, n_batches=n_batches, host_cap=host_cap,
        min_tokens=min_tokens,
    )
    expected = _closed_form(crawl, host_cap, min_tokens)
    pd.testing.assert_frame_equal(
        _pdf(got), _pdf(expected), check_dtype=False
    )
