"""Stratified sampling: exact variant determinism/counts and the
approximate sampleBy path's seeded reproducibility."""

from __future__ import annotations

import pyspark.sql.functions as F

from pandasql_spark.operators.sampling import (
    stratified_sample_exact,
    stratified_sample_fraction,
)

SF = "/root/testdata/sf0.001"


def test_exact_counts_and_determinism(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s1 = stratified_sample_exact(docs, "lang", 10, "doc_id")
    counts = {r["lang"]: r["n"] for r in
              s1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(10, sizes[lang]), (lang, n, sizes[lang])
    # deterministic: same rows both runs
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in
            stratified_sample_exact(docs, "lang", 10, "doc_id").select("doc_id").collect()}
    assert ids1 == ids2


def test_fraction_sampling_drops_unlisted_strata(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    keep = langs[0]
    samp = stratified_sample_fraction(docs, "lang", {keep: 0.5}, seed=7)
    got_langs = {r["lang"] for r in samp.select("lang").distinct().collect()}
    assert got_langs <= {keep}
    # seeded → reproducible
    a = {r["doc_id"] for r in samp.select("doc_id").collect()}
    b = {r["doc_id"] for r in
         stratified_sample_fraction(docs, "lang", {keep: 0.5}, seed=7)
         .select("doc_id").collect()}
    assert a == b


def test_sample_exact_global(spark):
    from pandasql_spark.operators.sampling import sample_exact_global

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    total = docs.count()
    out = sample_exact_global(docs, 40, "doc_id")
    assert out.count() == 40
    assert out.columns == docs.columns
    # deterministic: same 40 ids on a second run
    a = sorted(r.doc_id for r in out.select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in sample_exact_global(docs, 40, "doc_id").select("doc_id").collect()
    )
    assert a == b
    # n >= |df| returns everything; n=0 returns nothing
    assert sample_exact_global(docs, total + 10, "doc_id").count() == total
    assert sample_exact_global(docs, 0, "doc_id").count() == 0
    # matches the portable oracle: first 40 by md5(doc_id) rank
    pdf = docs.select("doc_id").toPandas()
    import hashlib

    pdf["k"] = pdf.doc_id.map(lambda i: hashlib.md5(str(i).encode()).hexdigest())
    exp = sorted(pdf.sort_values(["k", "doc_id"]).head(40).doc_id)
    assert a == exp
