"""End-to-end curation pipeline (operators/curation.py): per-stage
behavior on a handcrafted corpus, optional-stage skipping, and the
pipeline's composition against a pandas-computed expectation."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandasql_spark.operators.curation import curate_corpus

SF = "/root/testdata/sf0.001"


def _corpus(spark):
    rows = [
        (0, "alpha beta gamma delta", "en"),      # 4 tokens
        (1, "alpha beta gamma delta", "en"),      # exact dup of 0
        (2, "Alpha  beta gamma delta", "en"),     # normalized dup of 0
        (3, "one two three", "en"),               # too short (min 4)
        (4, "eval overlap trigram here now", "en"),  # contaminated
        (5, "clean text body stays here", "es"),
        (6, "w x y z p q r s t u v a b c d e f g h i j k", "en"),  # too long
        (7, "another clean en document four", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _eval(spark):
    return spark.createDataFrame(
        [(100, "eval overlap trigram payload")], "doc_id long, text string"
    )


def test_stages_compose(spark):
    out = curate_corpus(
        _corpus(spark),
        eval_df=_eval(spark),
        min_tokens=4,
        max_tokens=10,
        ngram_n=3,
        hashed=False,
    )
    kept = sorted(r.doc_id for r in out.collect())
    # 1,2 exact/normalized dups of 0; 3 short; 4 contaminated
    # ("eval overlap trigram"); 6 long
    assert kept == [0, 5, 7]


def test_stages_optional(spark):
    df = _corpus(spark)
    # no eval set, no mixture: only quality + dedup run
    kept = sorted(
        r.doc_id
        for r in curate_corpus(df, min_tokens=4, max_tokens=10).collect()
    )
    assert kept == [0, 4, 5, 7]
    # no bounds at all: dedup only
    kept = sorted(r.doc_id for r in curate_corpus(df).collect())
    assert kept == [0, 3, 4, 5, 6, 7]


def test_mixture_stage_applies_budget(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = curate_corpus(
        docs,
        mixture={"en": 1, "de": 1},
        total_n=20,
        stratum_col="lang",
    )
    got = dict(out.groupBy("lang").count().collect())
    assert got == {"en": 10, "de": 10}


def test_pipeline_on_real_corpus_monotone(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    tr = docs.filter(F.col("doc_id") % 50 != 0)
    n_tr = tr.count()
    curated = curate_corpus(
        tr, eval_df=ev, min_tokens=40, max_tokens=65, ngram_n=3, hashed=False
    )
    n_cur = curated.count()
    assert 0 < n_cur < n_tr
    # survivors still satisfy the quality gate
    from pandasql_spark.functions.text import token_count

    bad = curated.filter((token_count("text") < 40) | (token_count("text") > 65))
    assert bad.count() == 0
