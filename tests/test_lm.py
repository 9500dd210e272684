"""Unigram LM quality scoring (operators/lm.py): known-value math,
Python-oracle differential, cross-corpus smoothing, and the count
pass's partial-aggregation plan."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pandasql_spark.operators.lm import (
    score_against,
    unigram_counts,
    unigram_logprob_scores,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_known_values(spark):
    # corpus: a:2 b:2 c:1, N=5
    out = {
        r.doc_id: (r.n_tokens, r.logprob)
        for r in unigram_logprob_scores(_docs(spark, ["a a b", "b c"])).collect()
    }
    exp0 = round((3 * math.log(2 / 5)) / 3, 6)
    exp1 = round((math.log(2 / 5) + math.log(1 / 5)) / 2, 6)
    assert out == {0: (3, exp0), 1: (2, exp1)}


def test_python_differential_on_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    from collections import Counter

    c = Counter(t for _, txt in rows for t in txt.split(" "))
    n = sum(c.values())
    expected = {
        i: (
            len(txt.split(" ")),
            round(sum(math.log(c[t] / n) for t in txt.split(" ")) / len(txt.split(" ")), 6),
        )
        for i, txt in rows
    }
    got = {
        r.doc_id: (r.n_tokens, r.logprob)
        for r in unigram_logprob_scores(docs).collect()
    }
    # float sum order differs (Spark partial aggs vs Python fold): allow
    # the last rounded digit to wobble, values must agree to 1e-6
    assert got.keys() == expected.keys()
    for k in got:
        assert got[k][0] == expected[k][0]
        assert abs(got[k][1] - expected[k][1]) <= 1e-6, k


def test_rare_token_docs_score_lower(spark):
    docs = _docs(spark, ["common common common", "common rare"])
    out = {r.doc_id: r.logprob for r in unigram_logprob_scores(docs).collect()}
    assert out[1] < out[0]


def test_score_against_with_smoothing(spark):
    model = _docs(spark, ["a a b"])  # N=3, V=2
    target = _docs(spark, ["a x"])   # a: (2+1)/5, x unseen: 1/5
    r = score_against(target, model).first()
    exp = round((math.log(3 / 5) + math.log(1 / 5)) / 2, 6)
    assert (r.n_tokens, r.logprob) == (2, exp)


def test_count_pass_partial_aggregation(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        unigram_counts(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # two HashAggregates around one Exchange = map-side combine
    assert plan.count("HashAggregate") >= 2 and "Exchange" in plan, plan
