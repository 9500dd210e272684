"""KMV bottom-k distinct sketch (operators/sketch.py): accuracy vs
exact counts, the exact-below-k regime, merge associativity, and the
bottom-k plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandasql_spark.operators.sketch import (
    kmv_set_relations,
    estimate_from_sketch,
    kmv_distinct_estimate,
    kmv_sketch,
    merge_sketches,
)

SF = "/root/testdata/sf0.001"


def test_exact_when_under_k(spark):
    df = spark.range(100).select((F.col("id") % 37).alias("v"))
    r = kmv_distinct_estimate(df, "v", k=256).first()
    assert (r.n_hashes, r.estimate) == (37, 37.0)


def test_estimate_within_expected_error(spark):
    # 10_000 distinct values, k=256 -> rel. err ~ 1/sqrt(254) ≈ 6.3%;
    # allow 4 sigma
    df = spark.range(30_000).select((F.col("id") % 10_000).alias("v"))
    r = kmv_distinct_estimate(df, "v", k=256).first()
    assert r.n_hashes == 256
    assert abs(r.estimate - 10_000) / 10_000 < 0.25


def test_merge_equals_sketch_of_union(spark):
    a = spark.range(0, 4_000).select(F.col("id").alias("v"))
    b = spark.range(2_000, 7_000).select(F.col("id").alias("v"))
    merged = merge_sketches(kmv_sketch(a, "v", 128), kmv_sketch(b, "v", 128), k=128)
    direct = kmv_sketch(a.unionByName(b), "v", 128)
    assert [r.hx for r in merged.collect()] == [r.hx for r in direct.collect()]
    # and the estimate off the merged sketch equals the direct one
    em = estimate_from_sketch(merged, 128).first().estimate
    ed = kmv_distinct_estimate(a.unionByName(b), "v", 128).first().estimate
    assert em == ed


def test_deterministic_across_runs(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet")
    a = kmv_distinct_estimate(df, "o_custkey", 64).first()
    b = kmv_distinct_estimate(df, "o_custkey", 64).first()
    assert a == b


def test_bottom_k_plan_is_take_ordered(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet")
    plan = (
        kmv_sketch(df, "o_custkey", 256)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_set_relations_identical_sets(spark):
    df = spark.range(5_000).select(F.col("id").alias("v"))
    r = kmv_set_relations(df, "v", df, "v", k=128).first()
    assert r.jaccard == 1.0
    assert r.n_union_sample == r.n_inter_sample > 0
    assert abs(r.est_union - 5_000) / 5_000 < 0.4


def test_set_relations_disjoint(spark):
    a = spark.range(0, 3_000).select(F.col("id").alias("v"))
    b = spark.range(3_000, 6_000).select(F.col("id").alias("v"))
    r = kmv_set_relations(a, "v", b, "v", k=128).first()
    assert r.jaccard == 0.0 and r.n_inter_sample == 0


def test_set_relations_known_overlap(spark):
    # |A|=6k, |B|=6k, |A∩B|=2k, |A∪B|=10k -> J = 0.2
    a = spark.range(0, 6_000).select(F.col("id").alias("v"))
    b = spark.range(4_000, 10_000).select(F.col("id").alias("v"))
    r = kmv_set_relations(a, "v", b, "v", k=256).first()
    assert abs(r.jaccard - 0.2) < 0.08
    assert abs(r.est_union - 10_000) / 10_000 < 0.25
    assert abs(r.est_intersection - 2_000) / 2_000 < 0.5


def test_null_keys_excluded(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(40)] + [(None,)] * 3, "v int"
    )
    sk = kmv_sketch(df, "v", k=8)
    assert all(r.hx is not None for r in sk.collect())
    r = kmv_distinct_estimate(df, "v", k=256).first()
    assert (r.n_hashes, r.estimate) == (40, 40.0)  # NULL not counted


def test_set_relations_identical_singletons(spark):
    # theta == the only hash; inclusive theta keeps it in the sample
    a = spark.createDataFrame([(7,)], "v int")
    r = kmv_set_relations(a, "v", a, "v", k=8).first()
    assert r.jaccard == 1.0 and r.n_union_sample == r.n_inter_sample == 1


def test_set_relations_empty_inputs(spark):
    """BOTH empty: everything zero (NULL theta coalesced away, not
    propagated into NULL estimates — ADVICE r5)."""
    a = spark.createDataFrame([], "v int")
    r = kmv_set_relations(a, "v", a, "v", k=8).first()
    assert (r.n_union_sample, r.n_inter_sample, r.jaccard) == (0, 0, 0.0)
    assert (r.est_union, r.est_intersection) == (0.0, 0.0)


def test_set_relations_one_empty_input(spark):
    """ONE empty: theta falls back to the non-empty sketch's max, so
    est_union tracks the non-empty set (exact below saturation),
    intersection and jaccard are zero — the degenerate answer, not
    NULLs (ADVICE r5)."""
    a = spark.createDataFrame([], "v int")
    b = spark.createDataFrame([(i,) for i in range(5)], "v int")
    r = kmv_set_relations(a, "v", b, "v", k=8).first()
    assert r.n_inter_sample == 0 and r.jaccard == 0.0
    assert r.n_union_sample == 5
    # theta-scaled, not exact-below-k (documented estimator design):
    # est = n * M / theta, so > 0 and near n — never NULL
    assert r.est_union is not None and r.est_union > 0
    assert r.est_intersection == 0.0


def test_hash_sampled_quantiles_deterministic_and_close(spark):
    """The sample predicate is a pure function of the key, so two runs
    (and any partitioning) give identical output; estimates track the
    exact quantiles within the O(1/sqrt(rate*n)) rank error."""
    import pandas as pd

    from pandasql_spark.operators.ranking import exact_percentiles
    from pandasql_spark.operators.sketch import hash_sampled_quantiles

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    qs = [0.25, 0.5, 0.75]
    a = hash_sampled_quantiles(o, "o_totalprice", "o_orderkey", qs, rate=0.25)
    b = hash_sampled_quantiles(
        o.repartition(13), "o_totalprice", "o_orderkey", qs, rate=0.25
    )
    pa = a.toPandas().sort_values("q").reset_index(drop=True)
    pb = b.toPandas().sort_values("q").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa, pb)  # partitioning-independent
    exact = {
        r.q: r.value
        for r in exact_percentiles(
            o, "o_totalprice", qs, tiebreak="o_orderkey"
        ).collect()
    }
    n = o.count()
    for _, row in pa.iterrows():
        # rank error ~ 1/sqrt(rate*n); translate to a generous value
        # tolerance via the empirical spread of the distribution
        rel = abs(row["value"] - exact[row["q"]]) / max(exact[row["q"]], 1.0)
        assert rel < 0.2, (row["q"], row["value"], exact[row["q"]])
    assert len(pa) == 3


def test_hash_sampled_quantiles_rate_validation(spark):
    import pytest

    from pandasql_spark.operators.sketch import hash_sampled_quantiles

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    with pytest.raises(ValueError):
        hash_sampled_quantiles(o, "o_totalprice", "o_orderkey", [0.5], rate=0)
    with pytest.raises(ValueError):
        hash_sampled_quantiles(o, "o_totalprice", "o_orderkey", [0.5], rate=1.5)
