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
