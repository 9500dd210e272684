"""Hashed-feature linear classifier (operators/classifier.py):
pure-Python fold differential, expression-path vs weight-table-path
equality, bias/empty-text contracts, and sigmoid sanity."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandasql_spark.operators.classifier import (
    _MIX,
    _MOD,
    linear_quality_score,
    score_column,
    seeded_weight,
    token_bucket,
)

M = 1 << 18


def _py_bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:13], 16) % M


def _py_weight(b: int, seed: int = 0) -> float:
    return ((b + seed) * _MIX % _MOD) / 1_000_000.0 - 1.0


def _py_score(text: str, seed: int = 0, bias: float = 0.0) -> float:
    s = bias
    for t in text.split(" "):  # left-to-right, like the F.aggregate fold
        s += _py_weight(_py_bucket(t), seed)
    return s


TEXTS = [
    "the quick brown fox",
    "the the the",
    "",            # split('') == [''] — one empty-string token, by contract
    "a  b",        # double space → empty middle token
    "solo",
]


def _docs(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    )


def test_expression_path_matches_python_fold_exactly(spark):
    out = linear_quality_score(_docs(spark), seed=7, bias=0.25).collect()
    for r in sorted(out, key=lambda r: r.doc_id):
        want = _py_score(TEXTS[r.doc_id], seed=7, bias=0.25)
        assert r.clf_score == want, (r.doc_id, r.clf_score, want)  # bit-exact
        assert r.clf_prob == 1.0 / (1.0 + math.exp(-want))


def test_weight_table_path_matches_expression_path(spark):
    docs = _docs(spark)
    buckets = sorted({_py_bucket(t) for x in TEXTS for t in x.split(" ")})
    wdf = spark.createDataFrame(
        pd.DataFrame(
            {"bucket": buckets, "weight": [_py_weight(b, 3) for b in buckets]}
        )
    )
    a = {
        r.doc_id: r.clf_score
        for r in linear_quality_score(docs, seed=3, bias=0.5).collect()
    }
    b = {
        r.doc_id: r.clf_score
        for r in linear_quality_score(docs, wdf, bias=0.5).collect()
    }
    # groupBy sum order is partition-dependent → compare at 1e-9, not ==
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) < 1e-9, (k, a[k], b[k])


def test_sparse_weight_table_scores_bias_for_unknown_tokens(spark):
    docs = _docs(spark)
    wdf = spark.createDataFrame(
        pd.DataFrame({"bucket": [_py_bucket("solo")], "weight": [2.0]})
    )
    got = {
        r.doc_id: (r.clf_score, r.clf_prob)
        for r in linear_quality_score(docs, wdf, bias=-1.0).collect()
    }
    assert got[4] == (1.0, 1.0 / (1.0 + math.exp(-1.0)))
    # a doc with zero table hits scores exactly the bias
    assert got[0] == (-1.0, 1.0 / (1.0 + math.exp(1.0)))
    assert len(got) == len(TEXTS)  # never drops rows


def test_custom_weight_fn_and_validation(spark):
    docs = _docs(spark)
    out = linear_quality_score(docs)  # defaults run
    assert {"clf_score", "clf_prob"} <= set(out.columns)
    # constant weight fn: score == bias + n_tokens * c
    col = score_column("text", weight_fn=lambda b: F.lit(0.5))
    got = {
        r.doc_id: r.s
        for r in docs.select("doc_id", col.alias("s")).collect()
    }
    assert got[0] == 0.5 * 4 and got[2] == 0.5  # '' is one token
    with pytest.raises(ValueError, match="n_buckets"):
        score_column("text", n_buckets=0)


def test_seeded_weight_range_and_bucket_domain(spark):
    row = (
        _docs(spark)
        .select(
            F.explode(F.split("text", " ")).alias("t")
        )
        .select(
            token_bucket(F.col("t"), M).alias("b"),
        )
        .select(
            F.min("b").alias("lo"),
            F.max("b").alias("hi"),
            F.min(seeded_weight(F.col("b"))).alias("wlo"),
            F.max(seeded_weight(F.col("b"))).alias("whi"),
        )
        .collect()[0]
    )
    assert 0 <= row.lo <= row.hi < M
    assert -1.0 <= row.wlo <= row.whi < 1.0
