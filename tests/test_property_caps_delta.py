"""Hypothesis property suites for the round-6 operators (VERDICT r6
task 6): cap_per_group vs a naive pandas top-n under generated ties,
snapshot_diff's status partition + separator/NULL-sentinel properties,
and hash_sampled_quantiles vs an independent Python replication of the
md5-Bernoulli predicate + inverse-CDF."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import soak_examples

from pandasql_spark.operators.caps import cap_per_group
from pandasql_spark.operators.delta import snapshot_diff
from pandasql_spark.operators.sketch import hash_sampled_quantiles

_SETTINGS = dict(
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.data_too_large,
        HealthCheck.function_scoped_fixture,
    ],
)


# ---------------------------------------------------------------------------
# cap_per_group == naive top-n, under ties and every partition shape
# ---------------------------------------------------------------------------


@settings(max_examples=soak_examples(12), **_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # key: few groups
            st.integers(min_value=0, max_value=4),  # value: dense ties
        ),
        min_size=1,
        max_size=50,
    ),
    n=st.integers(min_value=1, max_value=5),
    asc=st.booleans(),
    parts=st.integers(min_value=1, max_value=4),
)
def test_cap_per_group_matches_naive(spark, rows, n, asc, parts):
    pdf = pd.DataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)], columns=["k", "v", "id"]
    )
    df = spark.createDataFrame(pdf).repartition(parts)
    got = (
        cap_per_group(df, ["k"], [("v", asc), ("id", True)], n)
        .toPandas()
        .sort_values(["k", "v", "id"], ignore_index=True)
    )
    exp = (
        pdf.sort_values(["v", "id"], ascending=[asc, True])
        .groupby("k", sort=False)
        .head(n)
        .sort_values(["k", "v", "id"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


# ---------------------------------------------------------------------------
# snapshot_diff: status partition / separator / NULL sentinel
# ---------------------------------------------------------------------------

_content = st.one_of(st.none(), st.sampled_from(["a", "b", "ab", "", "a\x1fb"]))
_snapshot = st.dictionaries(
    st.integers(min_value=0, max_value=9),
    st.tuples(_content, _content),
    max_size=10,
)


@settings(max_examples=soak_examples(12), **_SETTINGS)
@given(old=_snapshot, new=_snapshot)
def test_snapshot_diff_status_partition(spark, old, new):
    """Every key in either snapshot appears EXACTLY once, labeled by
    pure set logic on the raw content (no fingerprints in the oracle) —
    including NULL-vs-empty and separator-adjacent contents."""
    if not old and not new:
        return
    schema = "key long, c1 string, c2 string"
    o = spark.createDataFrame([(k, *v) for k, v in old.items()] or [], schema)
    n = spark.createDataFrame([(k, *v) for k, v in new.items()] or [], schema)
    got = dict(
        snapshot_diff(o, n, key_col="key", content_cols=["c1", "c2"])
        .toPandas()
        .itertuples(index=False, name=None)
    )
    assert set(got) == set(old) | set(new)
    for k in got:
        if k not in old:
            assert got[k] == "added"
        elif k not in new:
            assert got[k] == "removed"
        elif old[k] == new[k]:
            assert got[k] == "unchanged"
        else:
            assert got[k] == "changed", (k, old[k], new[k])


def test_snapshot_diff_separator_and_null_sentinel(spark):
    """The two classic fingerprint collisions must read as 'changed':
    boundary shift ("ab","c") vs ("a","bc"), and NULL swap (NULL,"x")
    vs ("x",NULL) — engines that concat_ws-skip NULLs collide these."""
    schema = "key long, c1 string, c2 string"
    o = spark.createDataFrame([(1, "ab", "c"), (2, None, "x")], schema)
    n = spark.createDataFrame([(1, "a", "bc"), (2, "x", None)], schema)
    got = dict(
        snapshot_diff(o, n, key_col="key", content_cols=["c1", "c2"])
        .toPandas()
        .itertuples(index=False, name=None)
    )
    assert got == {1: "changed", 2: "changed"}


# ---------------------------------------------------------------------------
# hash_sampled_quantiles vs an independent Python replication
# ---------------------------------------------------------------------------


def _py_sample(keys, rate):
    cut = rate * float(16**13)
    return [
        k
        for k in keys
        if int(hashlib.md5(str(k).encode()).hexdigest()[:13], 16) < cut
    ]


@settings(max_examples=soak_examples(15), **_SETTINGS)
@given(
    values=st.lists(
        st.integers(min_value=-100, max_value=100), min_size=1, max_size=80
    ),
    rate=st.sampled_from([1.0, 0.5, 0.25]),
    qs=st.sets(st.sampled_from([0.01, 0.25, 0.5, 0.9, 1.0]), min_size=1),
)
def test_sampled_quantiles_match_python_replication(spark, values, rate, qs):
    """The md5-Bernoulli predicate and the inverse-CDF (value at 1-based
    rank ceil(q·m)) are both engine-portable by design — an independent
    hashlib+numpy replication must agree bit-for-bit, including
    rate=1.0 (sample == population == exact_percentiles)."""
    quantiles = sorted(qs)
    pdf = pd.DataFrame({"id": range(len(values)), "v": values})
    df = spark.createDataFrame(pdf).repartition(3)
    got = (
        hash_sampled_quantiles(df, "v", "id", quantiles, rate=rate)
        .toPandas()
        .sort_values("q", ignore_index=True)
    )
    kept = set(_py_sample(range(len(values)), rate))
    sample = sorted(v for i, v in enumerate(values) if i in kept)
    if not sample:
        assert len(got) == 0
        return
    exp = pd.DataFrame(
        {
            "q": quantiles,
            "value": [sample[math.ceil(q * len(sample)) - 1] for q in quantiles],
        }
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@settings(max_examples=soak_examples(10), **_SETTINGS)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    rate=st.sampled_from([0.25, 0.5]),
)
def test_sampled_quantile_rank_error_bound(spark, seed, rate):
    """Statistical sanity on a bigger draw: the sampled median's rank in
    the population stays within a generous Chernoff-style band around
    n/2 (~4·sqrt(n/rate)); a broken predicate or rank-off-by-one would
    blow through it."""
    rng = np.random.default_rng(seed)
    n = 2_000
    values = rng.integers(0, 1_000_000, size=n)
    pdf = pd.DataFrame({"id": range(n), "v": values})
    df = spark.createDataFrame(pdf).repartition(4)
    got = hash_sampled_quantiles(df, "v", "id", [0.5], rate=rate).toPandas()
    assert len(got) == 1
    est = got["value"].iloc[0]
    rank = int((values < est).sum())
    tol = 4 * math.sqrt(n / rate)
    assert abs(rank - n / 2) <= tol, (rank, n / 2, tol)


# ---------------------------------------------------------------------------
# cap_tokens_per_group == pandas prefix-cumsum reference (r13)
# ---------------------------------------------------------------------------


@settings(max_examples=soak_examples(12), **_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # key: few groups
            st.integers(min_value=0, max_value=7),   # tokens incl. zero
        ),
        min_size=1,
        max_size=40,
    ),
    budget=st.integers(min_value=0, max_value=30),
    prefilter=st.booleans(),
    parts=st.integers(min_value=1, max_value=4),
)
def test_cap_tokens_matches_prefix_reference(
    spark, rows, budget, prefilter, parts
):
    """Prefix semantics under arbitrary group shapes, zero-token rows,
    zero budgets, and both prefilter modes (min_tokens_per_doc=1 is
    only claimed for corpora honoring it, so the prefilter arm bumps
    zero-token rows to 1)."""
    from pandasql_spark.operators.caps import cap_tokens_per_group

    pdf = pd.DataFrame(
        [
            (k, t + 1 if prefilter else t, i)
            for i, (k, t) in enumerate(rows)
        ],
        columns=["k", "tok", "id"],
    )
    df = spark.createDataFrame(pdf).repartition(parts)
    got = (
        cap_tokens_per_group(
            df,
            ["k"],
            [("id", True)],
            budget,
            "tok",
            min_tokens_per_doc=1 if prefilter else 0,
        )
        .toPandas()
        .sort_values("id", ignore_index=True)
    )
    keep = []
    for _, g in pdf.groupby("k", sort=False):
        g = g.sort_values("id")
        keep.append(g[g["tok"].cumsum() <= budget])
    exp = (
        pd.concat(keep).sort_values("id", ignore_index=True)
        if keep
        else pdf.iloc[:0]
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp)
