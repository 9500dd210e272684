"""Heavy-hitters tests: the sketch path must be INDISTINGUISHABLE from
the naive groupBy-count-filter plan (that is its contract), across
skewed, uniform, tie-at-threshold, and NULL-bearing inputs."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import soak_examples

from pandasql_spark.operators import freq


def _naive(df, item_col, threshold):
    n = df.filter(F.col(item_col).isNotNull()).count()
    mc = freq.hh_min_count(threshold, n)
    return (
        df.groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= mc)
    )


def _sorted(pdf):
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


@pytest.fixture(scope="module")
def zipf_df(spark):
    """50k rows: zipf head + 20k near-singleton tail — the domain shape
    (few heavy, huge distinct tail) the sketch plan exists for."""
    rng = np.random.default_rng(1)
    items = np.concatenate(
        [
            rng.zipf(1.5, 30000).astype(str),
            np.char.add("rare_", rng.integers(0, 10**9, 20000).astype(str)),
        ]
    )
    rng.shuffle(items)
    df = spark.createDataFrame(pd.DataFrame({"item": items})).repartition(8)
    df.persist().count()
    yield df, len(items)
    df.unpersist()


@pytest.mark.parametrize("threshold", [0.0005, 0.001, 0.01, 0.05])
def test_matches_naive_groupby(zipf_df, spark, threshold):
    df, _ = zipf_df
    got = _sorted(freq.heavy_hitters(df, "item", threshold).toPandas())
    exp = _sorted(_naive(df, "item", threshold).toPandas())
    pd.testing.assert_frame_equal(got, exp)


def test_candidate_set_is_small_superset(zipf_df, spark):
    """The point of the operator: candidates ≪ distinct items, yet a
    superset of every true heavy hitter."""
    df, n = zipf_df
    cap = 1000
    cand = set(freq.mg_candidates(df, "item", cap).toPandas()["item"])
    n_parts = df.rdd.getNumPartitions()
    assert len(cand) <= n_parts * cap
    distinct = df.select("item").distinct().count()
    assert len(cand) < distinct / 10  # 21k distinct → a few hundred
    heavy = set(
        _naive(df, "item", 1 / (cap + 1)).toPandas()["item"]
    )  # freq > n/(cap+1) ⊂ the guarantee
    assert heavy <= cand


def test_nulls_ignored_and_empty_input(spark):
    pdf = pd.DataFrame({"item": ["a", "a", "a", None, "b", None]})
    df = spark.createDataFrame(pdf)
    got = freq.heavy_hitters(df, "item", 0.5).toPandas()
    # n = 4 non-NULL rows; min_count = 2 → only "a" (3)
    assert list(got.itertuples(index=False, name=None)) == [("a", 3)]
    empty = spark.createDataFrame([], schema="item string")
    out = freq.heavy_hitters(empty, "item", 0.1).toPandas()
    assert len(out) == 0 and list(out.columns) == ["item", "cnt"]


def test_capacity_guard(spark):
    df = spark.range(10).select(F.col("id").cast("string").alias("item"))
    with pytest.raises(ValueError, match="voids the recall guarantee"):
        freq.heavy_hitters(df, "item", 0.01, capacity=10)
    with pytest.raises(ValueError, match="threshold"):
        freq.heavy_hitters(df, "item", 0.0)
    with pytest.raises(ValueError, match="capacity"):
        freq.mg_candidates(df, "item", 0)


def test_long_item_type(spark):
    """Output schema follows the item column's type (no hardcoded
    string schema in the kernel)."""
    df = spark.range(100).select((F.col("id") % 5).alias("item"))
    got = _sorted(freq.heavy_hitters(df, "item", 0.1).toPandas())
    assert got["item"].dtype == np.int64
    assert list(got["cnt"]) == [20] * 5


def test_bigint_items_above_2_53_survive_exactly(spark):
    """Items above 2**53 (e.g. xxhash64 ids) must round-trip the MG
    kernel exactly: a float64 coercion anywhere in the candidate path
    would collapse adjacent ids (2**53 + 1 == 2**53 in float64) and drop
    true heavy hitters."""
    a, b = 2**53 + 1, 2**53 + 3  # distinct ints, equal as float64
    rows = [(a,)] * 40 + [(b,)] * 35 + [(2**62 + 7,)] * 25
    df = spark.createDataFrame(rows, "item long").repartition(4)
    got = _sorted(freq.heavy_hitters(df, "item", 0.2, capacity=8).toPandas())
    assert got["item"].dtype == np.int64
    assert list(got["item"]) == sorted([a, b, 2**62 + 7])
    assert list(got["cnt"]) == [40, 35, 25]


@settings(
    max_examples=soak_examples(18),
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.data_too_large,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(
    items=st.lists(
        st.integers(min_value=0, max_value=8), min_size=1, max_size=60
    ),
    threshold=st.sampled_from([0.01, 0.1, 0.25, 0.5, 1.0]),
    parts=st.integers(min_value=1, max_value=4),
)
def test_property_matches_naive(spark, items, threshold, parts):
    """Tiny domains force threshold ties, single-item frames, capacity
    >= distinct, and every partition-boundary shape."""
    df = spark.createDataFrame(
        pd.DataFrame({"item": [str(i) for i in items]})
    ).repartition(parts)
    got = _sorted(freq.heavy_hitters(df, "item", threshold).toPandas())
    exp = _sorted(_naive(df, "item", threshold).toPandas())
    pd.testing.assert_frame_equal(got, exp)


def test_all_null_items(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"item": pd.Series([None, None, None], dtype="object")}),
        schema="item string",
    )
    out = freq.heavy_hitters(df, "item", 0.5).toPandas()
    assert len(out) == 0


def test_corpus_scanned_exactly_twice(spark):
    """The 100 TB contract: one fused candidate+count pass plus one
    verify pass — a row-count accumulator tapped onto the input must
    read exactly 2n rows end-to-end (was 3n when heavy_hitters ran a
    dedicated count() job)."""
    import numpy as np

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({"item": [str(x) for x in rng.zipf(1.6, 4000)]})
    src = spark.createDataFrame(pdf).repartition(4)
    acc = spark.sparkContext.accumulator(0)

    def tap(batches):
        for b in batches:
            acc.add(len(b))
            yield b

    tapped = src.mapInPandas(tap, schema="item string")
    out = freq.heavy_hitters(tapped, "item", 0.01).toPandas()
    assert len(out) > 0  # force full evaluation happened above
    assert acc.value == 2 * len(pdf), acc.value


def test_hh_min_count_no_float_artifact():
    # 0.07 * 100 evaluates to 7.000000000000001 in doubles: a bare ceil
    # reads 8 and silently drops a count-7 boundary heavy hitter the
    # recall guarantee (c >= t*n) promises to keep (ADVICE r14).
    assert math.ceil(0.07 * 100) == 8  # the artifact this helper kills
    assert freq.hh_min_count(0.07, 100) == 7
    assert freq.hh_min_count(0.07, 300) == 21
    assert freq.hh_min_count(0.1, 30) == 3
    # non-boundary values are plain ceil
    assert freq.hh_min_count(0.01, 350) == 4
    assert freq.hh_min_count(0.3, 10) == 3


def test_boundary_heavy_hitter_kept(spark):
    # exactly t*n occurrences: 7 of 100 rows at threshold 0.07 — must
    # surface (>=, and no float-artifact bump of the cutoff to 8)
    rows = [("hot",)] * 7 + [(f"x{i}",) for i in range(93)]
    df = spark.createDataFrame(rows, "item string")
    got = {
        (r.item, r.cnt)
        for r in freq.heavy_hitters(df, "item", threshold=0.07).collect()
    }
    assert got == {("hot", 7)}


def test_verify_stage_candidates_matches_standalone_verifies(spark):
    """r17 unification (VERDICT r16 task 4): one exact-count pass over
    the candidate UNION, filtered per stage, must reproduce each
    stage's standalone verify rows exactly."""
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({"item": [str(x) for x in rng.zipf(1.6, 3000)]})
    src = spark.createDataFrame(pdf).repartition(4)

    t = 0.02
    vals, n = freq.mg_candidate_counts(src, "item", capacity=50)
    # a second "stage" with a DIFFERENT candidate superset: the true
    # hitters plus some non-hitters — verify must filter per stage
    extra = sorted(set(vals[: len(vals) // 2]) | {"999991", "999992"})
    out = freq.verify_stage_candidates(
        src, "item", {"a": (vals, n), "b": (extra, n)}, threshold=t
    )
    got = out.toPandas()
    standalone_a = freq.heavy_hitters(src, "item", threshold=t, capacity=50).toPandas()
    a_rows = got[got.stage == "a"][["item", "cnt"]].reset_index(drop=True)
    assert sorted(map(tuple, a_rows.values.tolist())) == sorted(
        map(tuple, standalone_a[["item", "cnt"]].values.tolist())
    )
    # stage b's rows = true hitters restricted to b's candidate set
    b_rows = got[got.stage == "b"]
    truth = {(r["item"], r.cnt) for _, r in standalone_a.iterrows() if r["item"] in set(extra)}
    assert {(r["item"], r.cnt) for _, r in b_rows.iterrows()} == truth
    out.cleanup(blocking=True)


def test_verify_stage_candidates_single_count_pass(spark):
    """The unified verify reads the corpus once for ALL stages — the
    accumulator must see exactly n rows (the old shape read n per
    stage)."""
    pdf = pd.DataFrame({"item": ["a"] * 40 + ["b"] * 30 + [str(i) for i in range(30)]})
    src = spark.createDataFrame(pdf).repartition(4)
    acc = spark.sparkContext.accumulator(0)

    def tap(batches):
        for b in batches:
            acc.add(len(b))
            yield b

    tapped = src.mapInPandas(tap, schema="item string")
    out = freq.verify_stage_candidates(
        tapped,
        "item",
        {"x": (["a", "b"], 100), "y": (["a"], 100)},
        threshold=0.25,
    )
    got = out.toPandas()
    assert acc.value == len(pdf), acc.value
    assert {(r.stage, r["item"], r.cnt) for _, r in got.iterrows()} == {
        ("x", "a", 40), ("x", "b", 30), ("y", "a", 40)
    }
    out.cleanup(blocking=True)


def test_verify_stage_candidates_empty_stages(spark):
    df = spark.createDataFrame([("a",)], "item string")
    out = freq.verify_stage_candidates(df, "item", {"x": ([], 0)}, threshold=0.5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["stage", "item", "cnt"]


def test_verify_stage_candidates_empty_keeps_cleanup_contract(spark):
    """r17 review: the empty paths carry the documented no-op cleanup()
    hook so consumers compose it unconditionally."""
    df = spark.createDataFrame([("a",)], "item string")
    out = freq.verify_stage_candidates(df, "item", {"x": ([], 0)}, threshold=0.5)
    out.cleanup(blocking=True)  # must not raise
    out2 = freq.verify_stage_candidates(df, "item", {}, threshold=0.5)
    out2.cleanup()  # no stages at all — same contract
