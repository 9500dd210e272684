"""DSIR importance resampling (operators/dsir.py): known-value math,
pure-python differential on real corpus data, selection semantics
(deterministic top-k + Gumbel-top-k vs a numpy reference), and the
one-scan-per-corpus plan contract."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pandasql_spark.operators.dsir import (
    _py_bucket,
    _py_logweight,
    dsir_importance_weights,
    dsir_select,
    hashed_ngram_bucket_counts,
    hashed_ngram_doc_counts,
)

SF = "/root/testdata/sf0.001"
B = 64  # small bucket count so tests exercise collisions


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_featurizer_matches_python(spark):
    texts = ["a b a", "b", "x y z x y"]
    got = {
        (r.doc_id, r.bucket): r.c
        for r in hashed_ngram_doc_counts(_docs(spark, texts), n_buckets=B).collect()
    }
    exp: dict[tuple[int, int], int] = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        for g in toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]:
            k = (i, _py_bucket(g, B))
            exp[k] = exp.get(k, 0) + 1
    assert got == exp


def test_bucket_marginal_consistent(spark):
    # corpus-level direct aggregation == sum of the per-doc counts
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    direct = {
        r.bucket: r.cnt
        for r in hashed_ngram_bucket_counts(docs, n_buckets=B).collect()
    }
    via_docs = {
        r.bucket: r.s
        for r in hashed_ngram_doc_counts(docs, n_buckets=B)
        .groupBy("bucket")
        .agg(F.sum("c").alias("s"))
        .collect()
    }
    assert direct == via_docs


def _py_model(texts, n_buckets):
    counts: dict[int, int] = {}
    total = 0
    for t in texts:
        toks = t.split(" ")
        for g in toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]:
            b = _py_bucket(g, n_buckets)
            counts[b] = counts.get(b, 0) + 1
            total += 1
    return counts, total


def test_weights_match_python_on_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    raw = docs.limit(60)
    target = docs.filter(F.col("lang") == "en").limit(25)
    got = {
        r.doc_id: r.logweight
        for r in dsir_importance_weights(raw, target, n_buckets=B).collect()
    }
    raw_rows = [(r.doc_id, r.text) for r in raw.select("doc_id", "text").collect()]
    t_counts, t_total = _py_model(
        [r.text for r in target.select("text").collect()], B
    )
    r_counts, r_total = _py_model([t for _, t in raw_rows], B)
    assert len(got) == len(raw_rows)  # every raw doc weighted
    for did, text in raw_rows:
        exp = _py_logweight(text, t_counts, r_counts, t_total, r_total, B, 1.0)
        assert got[did] == round(exp, 6), did


def test_target_like_docs_rank_higher(spark):
    # raw mixes target-vocabulary docs with alien-vocabulary docs; the
    # target-like ones must take the top slots
    target = _docs(spark, ["the cat sat", "the dog sat", "a cat ran"])
    raw = _docs(
        spark,
        [
            "the cat ran",          # 0: target-like
            "zz qq ww ee rr",       # 1: alien
            "a dog sat",            # 2: target-like
            "mm nn oo pp",          # 3: alien
        ],
    )
    top = dsir_select(raw, target, k=2, n_buckets=B)
    assert sorted(r.doc_id for r in top.collect()) == [0, 2]


def test_select_deterministic_tiebreak(spark):
    # identical texts -> identical weights; the id tiebreak decides
    raw = _docs(spark, ["same text", "same text", "same text"])
    target = _docs(spark, ["same text"])
    top = dsir_select(raw, target, k=2, n_buckets=B)
    assert sorted(r.doc_id for r in top.collect()) == [0, 1]


def test_gumbel_matches_numpy_reference(spark):
    import hashlib

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    raw = docs.limit(50)
    target = docs.filter(F.col("lang") == "de").limit(20)
    k, salt, temp = 10, "s1", 2.0
    got = [
        r.doc_id
        for r in dsir_select(
            raw, target, k=k, n_buckets=B, gumbel_salt=salt, temperature=temp
        ).collect()
    ]
    w = {
        r.doc_id: r.logweight
        for r in dsir_importance_weights(raw, target, n_buckets=B).collect()
    }

    def gkey(did):
        bits = int(
            hashlib.md5(f"{salt}{did}".encode()).hexdigest()[:13], 16
        )
        u = (float(bits) + 1.0) / (float(2**52) + 2.0)
        return w[did] / temp - math.log(-math.log(u))

    exp = sorted(w, key=lambda d: (-gkey(d), d))[:k]
    assert sorted(got) == sorted(exp)
    # different salt -> (almost surely) different pick on 50 docs
    got2 = {
        r.doc_id
        for r in dsir_select(
            raw, target, k=k, n_buckets=B, gumbel_salt="s2", temperature=temp
        ).collect()
    }
    assert got2 != set(got)


def test_plan_one_scan_per_corpus_and_broadcast_model(spark):
    raw = spark.read.parquet(f"{SF}/documents.parquet")
    target = raw.filter(F.col("lang") == "en")
    out = dsir_importance_weights(raw, target)
    out.collect()  # exchange reuse is finalized by AQE at runtime
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # the raw (doc,bucket) counts exchange is REUSED for the marginal,
    # the R total and the scoring join (the unigram-N lesson applied
    # from birth): the executed plan runs scans for raw + target only
    n_scans = final.count("Scan parquet")
    assert n_scans == 2, final
    assert "ReusedExchange" in final, final
    # the lambda-table join into scoring is broadcast, never a corpus shuffle
    assert "BroadcastHashJoin" in final, final


def test_validation():
    import pytest

    for bad in (
        lambda: dsir_importance_weights(None, None, n_buckets=0),
        lambda: dsir_importance_weights(None, None, alpha=0.0),
        lambda: dsir_select(None, None, k=0),
    ):
        with pytest.raises(ValueError):
            bad()


def test_null_text_docs_excluded_by_contract(spark):
    """A NULL-text raw doc is excluded from weighting (NULL gram array,
    dropped by explode) — the documented treat-NULL-as-absent
    convention (ADVICE r14); non-null docs are unaffected."""
    raw = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, "beta gamma")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10, "alpha beta alpha")], "doc_id long, text string"
    )
    out = dsir_importance_weights(raw, target, n_buckets=64)
    ids = sorted(r.doc_id for r in out.select("doc_id").collect())
    assert ids == [1, 3]


def test_dsir_select_carries_cleanup_hook(spark):
    """r16 review: dsir_select must re-attach the weights table's
    release hook — orderBy/limit return fresh frames that would
    otherwise drop it, leaving the persisted target bucket table
    unreleasable."""
    from pandasql_spark.operators.dsir import dsir_select

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(80)
    tgt = docs.filter(F.col("lang") == "en")
    for salt in (None, "s1"):
        out = dsir_select(docs, tgt, k=5, gumbel_salt=salt)
        rows = out.collect()
        assert len(rows) == 5
        out.cleanup()  # must exist and release without error
