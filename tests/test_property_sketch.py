"""Hypothesis property suite for the KMV sketch family
(operators/sketch.py) — VERDICT r5 task 8.

The fixed-corpus tests (test_sketch.py) pin known answers; these
generate key sets and k to hit the estimator's edge regimes the
fixtures miss: saturation boundaries (distinct == k, k±1), θ-drift
(distinct barely above k), heavy overlap vs disjoint sets, and
singleton/tiny sketches. All checks are INVARIANTS, not golden values,
so they hold at any k:

- merge is commutative and associative, and merging a sketch with
  itself is idempotent (bottom-k of a union of bottom-k's);
- the estimate is EXACT below saturation;
- set relations: jaccard ∈ [0, 1], n_inter ≤ n_union,
  est_intersection ≤ est_union, and both exact for saturating inputs.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pandasql_spark.operators.sketch import (
    estimate_from_sketch,
    kmv_set_relations,
    kmv_sketch,
    merge_sketches,
)
from tests.conftest import soak_examples

_SETTINGS = dict(
    max_examples=soak_examples(8),
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.data_too_large,
        HealthCheck.function_scoped_fixture,
    ],
)

keysets = st.lists(
    st.integers(min_value=0, max_value=400), min_size=1, max_size=120
)
ks = st.sampled_from([2, 3, 8, 16, 64])


def _frame(spark, keys):
    return spark.createDataFrame(pd.DataFrame({"v": keys}))


def _hashes(sk):
    return [r.hx for r in sk.collect()]


@settings(**_SETTINGS)
@given(a=keysets, b=keysets, c=keysets, k=ks)
def test_merge_commutative_associative(spark, a, b, c, k):
    sa = _frame(spark, a)
    sb = _frame(spark, b)
    sc_ = _frame(spark, c)
    ka, kb, kc = (kmv_sketch(x, "v", k) for x in (sa, sb, sc_))
    ab = _hashes(merge_sketches(ka, kb, k))
    ba = _hashes(merge_sketches(kb, ka, k))
    assert ab == ba  # commutative (bottom-k output is sorted)
    left = _hashes(merge_sketches(merge_sketches(ka, kb, k), kc, k))
    right = _hashes(merge_sketches(ka, merge_sketches(kb, kc, k), k))
    assert left == right  # associative
    assert _hashes(merge_sketches(ka, ka, k)) == _hashes(ka)  # idempotent
    # merge == sketch-of-union (the mergeability contract)
    direct = _hashes(kmv_sketch(sa.unionByName(sb), "v", k))
    assert ab == direct


@settings(**_SETTINGS)
@given(a=keysets, k=ks)
def test_estimate_exact_below_saturation(spark, a, k):
    distinct = len(set(a))
    r = estimate_from_sketch(kmv_sketch(_frame(spark, a), "v", k), k).first()
    assert r.n_hashes == min(distinct, k)
    if distinct < k:
        assert r.estimate == float(distinct)  # exact branch
    else:
        assert r.estimate > 0  # theta branch: positive, finite
        assert r.estimate < 10 * max(distinct, 1) * (1 + 3 / (k - 1))


@settings(**_SETTINGS)
@given(a=keysets, b=keysets, k=ks)
def test_set_relations_matches_python_reference(spark, a, b, k):
    """Full differential oracle in pure Python: recompute bottom-k md5
    sketches, θ = min of the two maxima (inclusive), the ≤θ union /
    intersection samples, and the M/θ-scaled estimates — every output
    column must agree bit-for-bit. Subsumes the invariant checks
    (jaccard range, inter ≤ union) by construction and exercises the
    θ-drift regime (distinct barely above k) the fixed corpus misses."""
    import hashlib

    out = kmv_set_relations(_frame(spark, a), "v", _frame(spark, b), "v", k)
    r = out.first()
    # invariants first (cheap, and they localize failures)
    assert 0.0 <= r.jaccard <= 1.0
    assert r.n_inter_sample <= r.n_union_sample
    assert r.est_intersection <= r.est_union

    def bottomk(keys):
        return sorted(
            {hashlib.md5(str(x).encode()).hexdigest() for x in set(keys)}
        )[:k]

    ha, hb = bottomk(a), bottomk(b)
    theta = min(ha[-1], hb[-1])
    ua = {h for h in ha if h <= theta}
    ub = {h for h in hb if h <= theta}
    n_union, n_inter = len(ua | ub), len(ua & ub)
    assert r.n_union_sample == n_union
    assert r.n_inter_sample == n_inter
    m = float(16**13)
    theta_val = float(int(theta[:13], 16))
    assert r.est_union == round(n_union * m / theta_val, 6)
    assert r.est_intersection == round(n_inter * m / theta_val, 6)
    exp_j = round(n_inter / n_union, 6) if n_union else 0.0
    assert r.jaccard == exp_j
