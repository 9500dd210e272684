"""Routed cosine_topk_pairs (functions/similarity.py): branch routing,
exact-branch equivalence, and LSH-branch top-k agreement on a
planted-duplicate corpus (VERDICT r5 task 6 — q25's registered default
is the router, not the O(n²) join)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandasql_spark.functions.similarity import (
    cosine_topk_pairs,
    cosine_topk_pairs_exact,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted(spark):
    """sf0.001 embeddings + a 0.9x+0.01 twin per vector: the top pairs
    are the planted (id, id+100000) twins at cosine ~0.996, far above
    the corpus's natural max ~0.51."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    twins = e.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: x * F.lit(0.9) + F.lit(0.01)
        ).alias("embedding"),
    )
    return e.unionByName(twins).persist()


def _pdf(df):
    return (
        df.toPandas()
        .sort_values(["cos_sim", "id_a", "id_b"], ascending=[False, True, True])
        .reset_index(drop=True)
    )


def test_small_corpus_routes_exact(spark):
    """Below exact_below the router IS the exact operator — identical
    plans modulo the routing count, identical rows."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = _pdf(cosine_topk_pairs(e, k=10))
    exp = _pdf(cosine_topk_pairs_exact(e, k=10))
    pd.testing.assert_frame_equal(got, exp)


@pytest.fixture(scope="module")
def planted_exact_top20(spark, planted):
    """The O(n²) exact top-20 over the planted corpus — the oracle for
    both the LSH-branch and escape-hatch tests; computed ONCE (it was
    the suite's slowest duplicated work, ~12 s per pass)."""
    return _pdf(cosine_topk_pairs_exact(planted, k=20))


def test_routed_lsh_branch_matches_exact(spark, planted, planted_exact_top20):
    """Force the LSH branch (exact_below=1): on the planted corpus the
    true top-20 pairs are all ~0.996-cosine twins, which multi-table
    sign-bit LSH recalls with per-pair miss probability ~2e-6 — the
    routed top-k must equal the exact top-k."""
    got = _pdf(cosine_topk_pairs(planted, k=20, exact_below=1))
    exp = planted_exact_top20
    pd.testing.assert_frame_equal(got, exp)
    assert (got["cos_sim"] > 0.99).all()  # the twins, not noise pairs


def test_lsh_branch_no_cosine_floor(spark, planted):
    """threshold=-1.0 inside the router keeps NEGATIVE-cosine candidate
    pairs rankable: asking for a huge k returns bucket-colliding pairs
    below zero rather than silently clamping at 0."""
    out = cosine_topk_pairs(planted, k=10_000, exact_below=1).toPandas()
    assert len(out) > 20  # more than just the twins survive ranking
    assert out["cos_sim"].min() < 0.95  # sub-threshold pairs included


def test_exact_escape_hatch_overrides_routing(spark, planted, planted_exact_top20):
    """exact=True forces the all-pairs branch on a corpus the size
    routing would send to LSH (exact_below=1), and exact=False forces
    LSH on a corpus that would route exact — both without touching the
    routing threshold."""
    forced_exact = _pdf(cosine_topk_pairs(planted, k=20, exact_below=1, exact=True))
    pd.testing.assert_frame_equal(forced_exact, planted_exact_top20)

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    forced_lsh = cosine_topk_pairs(e, k=5, exact=False)
    # LSH branch marker: result carries the candidate-frame cleanup hook
    assert hasattr(forced_lsh, "cleanup")
    assert len(forced_lsh.toPandas()) == 5


def test_zero_norm_pairs_excluded_from_both_branches(spark):
    """A zero vector has undefined cosine; both branches must rank the
    same pair set, so zero-norm pairs are dropped everywhere instead of
    the exact branch sorting them NULLS-LAST."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 0.0]),  # zero-norm: every pair through it is undefined
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got_exact = cosine_topk_pairs(df, k=10, exact=True).toPandas()
    got_lsh = cosine_topk_pairs(df, k=10, exact=False).toPandas()
    assert set(zip(got_exact["id_a"], got_exact["id_b"])) == {(1, 2)}
    assert set(zip(got_lsh["id_a"], got_lsh["id_b"])) <= {(1, 2)}
    assert got_exact["cos_sim"].notna().all()
    assert got_lsh["cos_sim"].notna().all()
