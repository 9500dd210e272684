"""Stratified sampling: exact variant determinism/counts and the
approximate sampleBy path's seeded reproducibility."""

from __future__ import annotations

import pandas as pd
import pytest
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


def test_mixture_resample_counts(spark):
    from pandasql_spark.operators.sampling import resample_to_mixture

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    avail = dict(docs.groupBy("lang").count().collect())
    out = resample_to_mixture(
        docs, "lang", {"en": 2, "de": 2, "es": 3, "fr": 2, "zh": 1},
        total_n=40, id_col="doc_id",
    )
    got = dict(out.groupBy("lang").count().collect())
    # apportionment: 40 * (2,2,3,2,1)/10 = 8,8,12,8,4 — capped by avail
    expect = {"en": 8, "de": 8, "es": 12, "fr": 8, "zh": 4}
    assert got == {k: min(n, avail.get(k, 0)) for k, n in expect.items() if min(n, avail.get(k, 0)) > 0}


def test_mixture_resample_largest_remainder_and_cap(spark):
    from pandasql_spark.operators.sampling import resample_to_mixture

    df = spark.createDataFrame(
        [(i, "a") for i in range(10)] + [(100 + i, "b") for i in range(2)]
        + [(200 + i, "c") for i in range(10)],
        "doc_id long, lang string",
    )
    # weights 1:1:1, total 10 -> floor 3,3,3 rem 1/3 each; leftover 1
    # goes to the alphabetically-first stratum 'a'; 'b' capped at 2
    out = resample_to_mixture(df, "lang", {"a": 1, "b": 1, "c": 1}, 10, "doc_id")
    got = dict(out.groupBy("lang").count().collect())
    assert got == {"a": 4, "b": 2, "c": 3}


def test_mixture_resample_drops_unlisted_and_validates(spark):
    import pytest as _pytest

    from pandasql_spark.operators.sampling import resample_to_mixture

    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, lang string"
    )
    out = resample_to_mixture(df, "lang", {"a": 1}, 1, "doc_id")
    assert [r.lang for r in out.collect()] == ["a"]
    with _pytest.raises(ValueError, match="non-empty"):
        resample_to_mixture(df, "lang", {}, 1, "doc_id")
    with _pytest.raises(ValueError, match="non-negative"):
        resample_to_mixture(df, "lang", {"a": -1.0}, 1, "doc_id")
    with _pytest.raises(ValueError, match="all be zero"):
        resample_to_mixture(df, "lang", {"a": 0.0}, 1, "doc_id")


def test_mixture_resample_deterministic(spark):
    from pandasql_spark.operators.sampling import resample_to_mixture

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w = {"en": 3, "de": 1}
    a = sorted(r.doc_id for r in resample_to_mixture(docs, "lang", w, 30, "doc_id").collect())
    b = sorted(r.doc_id for r in resample_to_mixture(docs, "lang", w, 30, "doc_id").collect())
    assert a == b and len(a) == 30


def test_mixture_apportionment_properties(spark):
    """Largest-remainder invariants, on a corpus where no stratum caps:
    targets sum to total_n exactly and each stratum is within 1 row of
    its exact fractional share (the defining property of the method)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pandasql_spark.operators.sampling import resample_to_mixture

    strata = ["a", "b", "c", "d"]
    df = spark.createDataFrame(
        [(100 * i + j, s) for i, s in enumerate(strata) for j in range(60)],
        "doc_id long, lang string",
    )

    @settings(
        max_examples=15, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        w=st.lists(st.integers(1, 9), min_size=4, max_size=4),
        total=st.integers(0, 50),
    )
    def inner(w, total):
        weights = dict(zip(strata, w))
        got = dict(
            resample_to_mixture(df, "lang", weights, total, "doc_id")
            .groupBy("lang").count().collect()
        )
        s = sum(w)
        assert sum(got.values()) == total
        for k, wt in weights.items():
            exact = wt / s * total
            assert abs(got.get(k, 0) - exact) < 1.0

    inner()


def test_mixture_resample_int_stratum(spark):
    from pandasql_spark.operators.sampling import resample_to_mixture

    df = spark.createDataFrame(
        [(i, i % 2) for i in range(40)], "doc_id long, domain int"
    )
    out = resample_to_mixture(
        df, "domain", {0: 1, 1: 1}, 10, "doc_id", 
    )
    got = dict(out.groupBy("domain").count().collect())
    assert got == {0: 5, 1: 5}


# ---------------------------------------------------------------------------
# hash_split (leakage-safe deterministic splits)


def test_hash_split_proportions_and_total(spark):
    from pandasql_spark.operators.sampling import hash_split

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = docs.count()
    assert sum(counts.values()) == n
    assert abs(counts["train"] / n - 0.8) < 0.08
    assert counts["val"] > 0 and counts["test"] > 0


def test_hash_split_group_consistent(spark):
    """The leakage contract: splitting by a group key puts every row of
    the group in the same split."""
    from pandasql_spark.operators.sampling import hash_split

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = hash_split(docs, {"a": 0.5, "b": 0.5}, "source")
    per_group = (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .collect()
    )
    assert all(r["k"] == 1 for r in per_group)


def test_hash_split_deterministic_and_salt_rerolls(spark):
    from pandasql_spark.operators.sampling import hash_split

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w = {"train": 0.5, "test": 0.5}
    a1 = {r["doc_id"]: r["split"] for r in hash_split(docs, w, "doc_id").collect()}
    a2 = {r["doc_id"]: r["split"] for r in
          hash_split(docs.repartition(13), w, "doc_id").collect()}
    assert a1 == a2  # partitioning-independent
    b = {r["doc_id"]: r["split"] for r in
         hash_split(docs, w, "doc_id", salt="v2").collect()}
    assert a1 != b  # salt re-rolls


def test_hash_split_no_shuffle(spark):
    from pandasql_spark.operators.sampling import hash_split

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = hash_split(docs, {"a": 0.5, "b": 0.5}, "doc_id")
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_hash_split_validation(spark):
    from pandasql_spark.operators.sampling import hash_split

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError, match="two splits"):
        hash_split(docs, {"all": 1.0}, "doc_id")
    with pytest.raises(ValueError, match="positive"):
        hash_split(docs, {"a": 1.1, "b": -0.1}, "doc_id")
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, {"a": 0.5, "b": 0.4}, "doc_id")


def test_hash_split_null_key_raises(spark):
    from pandasql_spark.operators.sampling import hash_split

    d = spark.createDataFrame(
        pd.DataFrame({"k": [1.0, None], "v": ["x", "y"]})
    )
    with pytest.raises(Exception) as ei:
        hash_split(d, {"a": 0.5, "b": 0.5}, "k").collect()
    assert "no identity" in str(ei.value)


def test_resample_zero_weight_stratum_pruned(spark):
    """r16 review: a zero-weight stratum contributes no rows AND its
    rows never enter the ranking window (pruned with the unlisted
    strata); targets still apportion exactly."""
    from pandasql_spark.operators.sampling import resample_to_mixture

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    langs = [r["lang"] for r in df.select("lang").distinct().collect()]
    assert len(langs) >= 2
    zero, keep = langs[0], langs[1]
    out = resample_to_mixture(df, "lang", {zero: 0.0, keep: 1.0}, 20, "doc_id")
    got = out.groupBy("lang").count().collect()
    assert {r["lang"]: r["count"] for r in got} == {keep: 20}
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the zero stratum is pruned BEFORE the window: with one surviving
    # stratum the isin collapses to an EqualTo pushed to the scan
    assert f"EqualTo(lang,{keep})" in plan, plan


def test_apportion_negative_leftover_restores_exact_total():
    """ADVICE r16: when float error pushes Σfloor past total_n the
    excess is taken back from the SMALLEST fractional remainders (ties
    by name), never clamped away — the output must sum to exactly
    total_n in every corner."""
    from pandasql_spark.operators.sampling import _apportion

    # crafted raw dict standing in for the float-error corner: the
    # floors already sum past total_n
    got = _apportion({"a": 2.0, "b": 2.0, "c": 1.0}, 4)
    assert sum(got.values()) == 4
    # all remainders 0.0 → tie broken by name → 'a' loses the excess
    assert got == {"a": 1, "b": 2, "c": 1}

    # smallest remainder loses first when remainders differ
    got = _apportion({"a": 1.9, "b": 2.2}, 2)
    assert got == {"a": 1, "b": 1}

    # zero-target strata are never decremented below zero
    assert _apportion({"a": 0.0, "b": 3.0}, 2) == {"a": 0, "b": 2}

    # excess exceeding the positive-stratum count needs a second sweep
    assert _apportion({"a": 1.0, "b": 1.0}, 0) == {"a": 0, "b": 0}

    # and the normal largest-remainder path is unchanged
    got = _apportion({"a": 1.5, "b": 1.5, "c": 0.9}, 4)
    assert sum(got.values()) == 4 and got["c"] == 1

    # the POSITIVE mirror (r17 review): an undershoot larger than the
    # stratum count needs repeated sweeps too — a single [:leftover]
    # slice would quietly sum short of total_n
    got = _apportion({"a": 1.0, "b": 1.0}, 5)
    assert sum(got.values()) == 5
    assert got == {"a": 3, "b": 2}  # extra rows by remainder order, ties by name
