"""Superset operators beyond the reference surface: semi/anti joins,
set operations, statistical aggregates, and the bucketed range join.
Differential-tested against pandas (conftest harness, SURVEY.md §5).
"""

from __future__ import annotations

import pandas as pd
import pytest

import pandasql_spark as ps
from tests.conftest import assert_frame_equals_pandas


@pytest.fixture(scope="module")
def base(spark):
    pdf_l = pd.DataFrame(
        {"k": [1, 2, 3, 4, 5], "a": [10.0, 20.0, 30.0, 40.0, 50.0]}
    )
    pdf_r = pd.DataFrame({"k": [2, 4, 6], "b": ["x", "y", "z"]})
    return pdf_l, pdf_r, ps.DataFrame(pdf_l), ps.DataFrame(pdf_r)


def test_semi_join(base):
    pdf_l, pdf_r, l, r = base
    got = l.merge(r, on="k", how="semi")
    expected = pdf_l[pdf_l.k.isin(pdf_r.k)]
    assert list(got.columns) == ["a", "k"]
    assert_frame_equals_pandas(got, expected)


def test_anti_join(base):
    pdf_l, pdf_r, l, r = base
    got = l.merge(r, on="k", how="anti")
    expected = pdf_l[~pdf_l.k.isin(pdf_r.k)]
    assert_frame_equals_pandas(got, expected)


def test_anti_join_diffkeys(base):
    pdf_l, pdf_r, l, r = base
    r2 = r.rename(columns={"k": "m"})
    got = l.merge(r2, left_on="k", right_on="m", how="anti")
    expected = pdf_l[~pdf_l.k.isin(pdf_r.k)]
    assert list(got.columns) == ["a", "k"]
    assert_frame_equals_pandas(got, expected)


def test_intersect_difference(spark):
    a = ps.DataFrame(pd.DataFrame({"x": [1, 1, 2, 3]}))
    b = ps.DataFrame(pd.DataFrame({"x": [2, 3, 3, 4]}))
    assert_frame_equals_pandas(a.intersect(b), pd.DataFrame({"x": [2, 3]}))
    assert_frame_equals_pandas(a.difference(b), pd.DataFrame({"x": [1]}))
    # bag EXCEPT ALL keeps surviving multiplicity
    assert_frame_equals_pandas(a.difference(b, bag=True), pd.DataFrame({"x": [1, 1]}))


def test_statistical_aggs(spark):
    pdf = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b", "b", "b", "b"],
            "v": [1.0, 2.0, 4.0, 10.0, 20.0, 30.0, 40.0],
        }
    )
    df = ps.DataFrame(pdf)
    got = df.groupby("g", as_index=False).agg(
        s=("v", "std"), va=("v", "var"), med=("v", "median"), nu=("v", "nunique")
    )
    expected = (
        pdf.groupby("g")
        .agg(s=("v", "std"), va=("v", "var"), med=("v", "median"), nu=("v", "nunique"))
        .reset_index()
    )
    assert_frame_equals_pandas(got, expected)


def test_range_join_matches_bruteforce(spark):
    from pandasql_spark.operators.rangejoin import range_join

    import itertools
    import random

    rng = random.Random(7)
    left_rows = [
        (i, rng.randrange(3), float(rng.randrange(0, 1000))) for i in range(60)
    ]
    right_rows = [
        (100 + i, rng.randrange(3), float(rng.randrange(0, 1000)))
        for i in range(120)
    ]
    l = spark.createDataFrame(left_rows, "id long, u long, t double")
    r = spark.createDataFrame(right_rows, "rid long, u long, t double")

    got = sorted(
        (row.id, row.rid)
        for row in range_join(l, r, by="u", on="t", lower=-50.0, upper=25.0).collect()
    )
    expected = sorted(
        (lid, rid)
        for (lid, lu, lt), (rid, ru, rt) in itertools.product(left_rows, right_rows)
        if lu == ru and lt - 50.0 <= rt < lt + 25.0
    )
    assert got == expected


def test_range_join_rejects_bad_bounds(spark):
    from pandasql_spark.operators.rangejoin import range_join

    l = spark.createDataFrame([(1, 1, 1.0)], "id long, u long, t double")
    with pytest.raises(ValueError):
        range_join(l, l, by="u", on="t", lower=5.0, upper=5.0)


def test_winnowing_guarantee(spark):
    """Winnowing guarantee: two docs sharing a run of >= w+k-1 tokens
    share at least one fingerprint; disjoint docs share none."""
    from pandasql_spark.functions.text import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
    docs = [
        (1, f"intro words here {shared} tail one"),
        (2, f"{shared} completely different ending text"),
        (3, "nothing in common with the others at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = df.select(
        "doc_id", winnowing_fingerprints("text", k=3, w=4).alias("fps")
    ).collect()
    fps = {r.doc_id: set(r.fps) for r in rows}
    assert fps[1] & fps[2], "docs sharing a 6-token run must share a fingerprint"
    assert not fps[1] & fps[3]
    assert not fps[2] & fps[3]


def test_missing_data_surface(spark):
    pdf = pd.DataFrame(
        {"a": [1.0, None, 3.0, None], "b": ["x", "y", None, None], "c": [1, 2, 3, 4]}
    )
    df = ps.DataFrame(pdf)
    assert_frame_equals_pandas(df.dropna(), pdf.dropna())
    assert_frame_equals_pandas(df.dropna(subset=["a"]), pdf.dropna(subset=["a"]))
    assert_frame_equals_pandas(
        df.fillna({"a": 0.0, "b": "missing"}), pdf.fillna({"a": 0.0, "b": "missing"})
    )


def test_astype_and_sample(spark):
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["1.5", "2.5", "3.5"]})
    df = ps.DataFrame(pdf).astype({"a": "float64", "b": "float64"})
    got = df.compute()
    assert str(got["a"].dtype) == "float64" and str(got["b"].dtype) == "float64"
    assert got["b"].tolist() == [1.5, 2.5, 3.5]

    big = ps.DataFrame(pd.DataFrame({"x": range(1000)}))
    n = len(big.sample(0.1, seed=7).compute())
    assert 40 < n < 200  # Bernoulli ~100


def test_value_counts_and_describe(spark):
    pdf = pd.DataFrame({"g": ["a", "b", "a", "c", "a", "b"]})
    df = ps.DataFrame(pdf)
    got = df.value_counts("g").compute()
    assert got["g"].tolist() == ["a", "b", "c"]
    assert got["count"].tolist() == [3, 2, 1]

    d = ps.DataFrame(pd.DataFrame({"v": [1.0, 2.0, 3.0]})).describe().compute()
    stats = dict(zip(d["summary"], d["v"]))
    assert float(stats["mean"]) == 2.0 and int(stats["count"]) == 3


def test_str_transforms(spark):
    pdf = pd.DataFrame({"s": ["  Hello World  ", "foo bar", "Spark SQL"]})
    df = ps.DataFrame(pdf)
    df["n_chars"] = df["s"].str.len()
    df["stripped"] = df["s"].str.strip()
    df["prefix"] = df["s"].str.slice(0, 3)
    df["swapped"] = df["s"].str.replace("o", "0")
    got = df.compute()
    assert got["n_chars"].tolist() == pdf.s.str.len().tolist()
    assert got["stripped"].tolist() == pdf.s.str.strip().tolist()
    assert got["prefix"].tolist() == pdf.s.str.slice(0, 3).tolist()
    assert got["swapped"].tolist() == pdf.s.str.replace("o", "0", regex=False).tolist()


def test_dt_accessor(spark):
    ts = pd.to_datetime(
        ["2026-01-15 10:30:45", "2026-08-13 23:59:59", "2025-12-31 00:00:00"]
    )
    pdf = pd.DataFrame({"t": ts})
    df = ps.DataFrame(pdf)
    df["y"] = df["t"].dt.year
    df["m"] = df["t"].dt.month
    df["d"] = df["t"].dt.day
    df["h"] = df["t"].dt.hour
    df["dow"] = df["t"].dt.dayofweek
    got = df.compute()
    assert got["y"].tolist() == ts.year.tolist()
    assert got["m"].tolist() == ts.month.tolist()
    assert got["d"].tolist() == ts.day.tolist()
    assert got["h"].tolist() == ts.hour.tolist()
    assert got["dow"].tolist() == ts.dayofweek.tolist()


def test_dt_filter(spark):
    pdf = pd.DataFrame(
        {"t": pd.to_datetime(["2026-01-15", "2026-06-15", "2025-06-15"]), "v": [1, 2, 3]}
    )
    df = ps.DataFrame(pdf)
    got = df[df["t"].dt.year == 2026].compute()
    assert sorted(got["v"].tolist()) == [1, 2]


def test_assign(spark):
    pdf = pd.DataFrame({"x": [1, 2, 3]})
    df = ps.DataFrame(pdf)
    out = df.assign(
        double=df["x"] * 2,
        plus=lambda d: d["double"] + 1,  # depends on earlier assignment
    )
    got = out.compute()
    assert got["double"].tolist() == [2, 4, 6]
    assert got["plus"].tolist() == [3, 5, 7]
    # non-mutating: original frame untouched
    assert list(df.columns) == ["x"]


def test_projection_value_counts_nunique(spark):
    pdf = pd.DataFrame({"g": ["a", "b", "a", "a"]})
    df = ps.DataFrame(pdf)
    vc = df["g"].value_counts().compute()
    assert vc["g"].tolist() == ["a", "b"] and vc["count"].tolist() == [3, 1]
    assert df["g"].nunique() == 2


def test_sql_surface(spark):
    pdf = pd.DataFrame({"k": [1, 2, 3], "v": [10.0, 20.0, 30.0]})
    ps.register(ps.DataFrame(pdf), "t_sql_surface")
    out = ps.sql("SELECT k, v * 2 AS v2 FROM t_sql_surface WHERE k >= 2")
    got = out.compute().sort_values("k", ignore_index=True)
    assert got["k"].tolist() == [2, 3] and got["v2"].tolist() == [40.0, 60.0]
    # interchangeable with the veneer mid-pipeline
    # 1-col projection computes to a Series (reference presentation rule)
    back = out[out["v2"] > 40.0]["k"].compute()
    assert back.tolist() == [3]
