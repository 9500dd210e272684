"""Scale-safe global ranking (operators/ranking.py): exactness vs the
single-reducer window spelling, and plan shape (no SinglePartition
Exchange — the whole point of the operator)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pandasql_spark.operators.ranking import (
    exact_ntile,
    ntile_bucket,
    with_global_row_number,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_global_row_number_matches_window(spark, orders):
    keys = [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]
    got = (
        with_global_row_number(orders, keys, "rn", num_partitions=7)
        .select("o_orderkey", "rn")
        .toPandas()
        .sort_values("o_orderkey", ignore_index=True)
    )
    w = Window.orderBy(*keys)
    want = (
        orders.select("o_orderkey", F.row_number().over(w).alias("rn"))
        .toPandas()
        .sort_values("o_orderkey", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("n,total", [(10, 95), (10, 100), (7, 5), (3, 1)])
def test_ntile_bucket_closed_form(spark, n, total):
    df = spark.range(1, total + 1).select(F.col("id").alias("rn"))
    got = df.select("rn", ntile_bucket(F.col("rn"), total, n).alias("b")).toPandas()
    w = Window.orderBy("rn")
    want = df.select("rn", F.ntile(n).over(w).cast("long").alias("b")).toPandas()
    pd.testing.assert_frame_equal(
        got.sort_values("rn", ignore_index=True),
        want.sort_values("rn", ignore_index=True),
        check_dtype=False,
    )


def test_exact_ntile_matches_window_ntile(spark, orders):
    keys = [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]
    got = (
        exact_ntile(orders, 10, keys, bucket_col="d", num_partitions=5)
        .select("o_orderkey", "d")
        .toPandas()
        .sort_values("o_orderkey", ignore_index=True)
    )
    w = Window.orderBy(*keys)
    want = (
        orders.select("o_orderkey", F.ntile(10).over(w).cast("long").alias("d"))
        .toPandas()
        .sort_values("o_orderkey", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_exact_ntile_plan_has_no_single_partition_exchange(spark, orders):
    from pandasql_spark.plans import explain_str

    keys = [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]
    plan = explain_str(exact_ntile(orders, 10, keys), "formatted")
    assert "SinglePartition" not in plan, plan
    # and the naive spelling DOES have one — the test guards the contrast
    w = Window.orderBy(*keys)
    naive = explain_str(orders.select(F.ntile(10).over(w)), "formatted")
    assert "SinglePartition" in naive


def test_exact_ntile_tiny_inputs(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("v", T.DoubleType()), T.StructField("k", T.LongType())]
    )
    empty = spark.createDataFrame([], schema)
    keys = [F.col("v").asc(), F.col("k").asc()]
    assert exact_ntile(empty, 10, keys).count() == 0
    one = spark.createDataFrame([(1.5, 1)], schema)
    out = exact_ntile(one, 10, keys, bucket_col="b").toPandas()
    assert list(out["b"]) == [1]


def test_exact_percentiles_matches_numpy(spark, orders):
    from pandasql_spark.operators.ranking import exact_percentiles

    got = (
        exact_percentiles(
            orders, "o_totalprice", [0.1, 0.5, 0.9], tiebreak="o_orderkey"
        )
        .toPandas()
        .sort_values("q", ignore_index=True)
    )
    vals = sorted(r.o_totalprice for r in orders.select("o_totalprice").collect())
    import math

    n = len(vals)
    exp = [vals[math.ceil(q * n) - 1] for q in (0.1, 0.5, 0.9)]
    assert list(got["value"]) == exp


def test_exact_percentiles_edges(spark):
    import pandas as pd

    from pandasql_spark.operators.ranking import exact_percentiles

    df = spark.createDataFrame(pd.DataFrame({"v": [5.0, 1.0, 3.0], "k": [1, 2, 3]}))
    # q=1.0 is the max; colliding positions at tiny n emit one row per q
    got = (
        exact_percentiles(df, "v", [0.2, 0.3, 1.0], tiebreak="k")
        .toPandas()
        .sort_values("q", ignore_index=True)
    )
    assert list(got["q"]) == [0.2, 0.3, 1.0]
    assert list(got["value"]) == [1.0, 1.0, 5.0]  # ceil(.2*3)=ceil(.3*3)=1
    empty = spark.createDataFrame([], schema="v double, k long")
    assert exact_percentiles(empty, "v", [0.5], tiebreak="k").count() == 0
    import pytest as _pt

    with _pt.raises(ValueError, match="quantiles"):
        exact_percentiles(df, "v", [])
    with _pt.raises(ValueError, match="quantiles"):
        exact_percentiles(df, "v", [0.0])


def test_exact_percentiles_plan_no_single_partition(spark, orders):
    from pandasql_spark.operators.ranking import exact_percentiles
    from pandasql_spark.plans import explain_str

    plan = explain_str(
        exact_percentiles(orders, "o_totalprice", [0.5], tiebreak="o_orderkey"),
        "formatted",
    )
    assert "SinglePartition" not in plan, plan


def test_grouped_exact_percentiles(spark, orders):
    import math

    import pandas as pd

    from pandasql_spark.operators.ranking import grouped_exact_percentiles

    qs = [0.5, 0.9]
    got = (
        grouped_exact_percentiles(
            orders, ["o_orderstatus"], "o_totalprice", qs, tiebreak="o_orderkey"
        )
        .toPandas()
        .sort_values(["o_orderstatus", "q"], ignore_index=True)
    )
    pdf = orders.select("o_orderstatus", "o_totalprice").toPandas()
    rows = []
    for g, grp in pdf.groupby("o_orderstatus"):
        vals = sorted(grp.o_totalprice)
        for q in qs:
            rows.append((g, q, vals[math.ceil(round(q * len(vals), 9)) - 1]))
    exp = pd.DataFrame(rows, columns=["o_orderstatus", "q", "value"]).sort_values(
        ["o_orderstatus", "q"], ignore_index=True
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


# ---------------------------------------------------------------------------
# quantile_normalize (per-group score calibration)


def test_quantile_normalize_matches_pandas_ecdf(spark):
    from pandasql_spark.operators.ranking import quantile_normalize

    o = spark.read.parquet(f"{SF}/orders.parquet")
    k = 10
    got = {
        r["o_orderkey"]: r["pct"]
        for r in quantile_normalize(
            o, "o_totalprice", ["o_orderpriority"], k=k
        ).collect()
    }
    pdf = o.select("o_orderkey", "o_orderpriority", "o_totalprice").toPandas()
    for g, grp in pdf.groupby("o_orderpriority"):
        vals = grp["o_totalprice"].sort_values().tolist()
        n = len(vals)
        cuts = [vals[int(__import__("math").ceil(q * n)) - 1]
                for q in [i / k for i in range(1, k)]]
        for _, row in grp.iterrows():
            exp = sum(1 for c in cuts if c < row["o_totalprice"]) / k
            assert got[row["o_orderkey"]] == exp


def test_quantile_normalize_distribution_flat(spark):
    from pandasql_spark.operators.ranking import quantile_normalize

    o = spark.read.parquet(f"{SF}/orders.parquet")
    out = quantile_normalize(o, "o_totalprice", ["o_orderpriority"], k=20)
    stats = out.groupBy("o_orderpriority").agg(
        F.min("pct").alias("lo"), F.max("pct").alias("hi"),
        F.avg("pct").alias("m"), F.count(F.lit(1)).alias("n"),
    ).collect()
    for r in stats:
        assert r["lo"] == 0.0 and r["hi"] == 0.95
        assert abs(r["m"] - 0.475) < 0.02  # near-uniform buckets


def test_quantile_normalize_null_and_validation(spark):
    import pandas as pd

    from pandasql_spark.operators.ranking import quantile_normalize

    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * 4, "v": [1.0, 2.0, None, 4.0]})
    )
    rows = {r["v"]: r["pct"] for r in quantile_normalize(df, "v", ["g"], k=2).collect()}
    assert rows[None] is None
    with pytest.raises(ValueError, match="k must"):
        quantile_normalize(df, "v", ["g"], k=1)


def test_quantile_normalize_row_count_preserved(spark):
    from pandasql_spark.operators.ranking import quantile_normalize

    o = spark.read.parquet(f"{SF}/orders.parquet")
    assert quantile_normalize(o, "o_totalprice", ["o_orderpriority"], k=7).count() == o.count()


def test_quantile_normalize_null_values_do_not_shift_cuts(spark):
    """NULL scores must not occupy cut ranks: the non-null rows'
    percentiles are computed over the non-null distribution only."""
    import pandas as _pd

    from pandasql_spark.operators.ranking import quantile_normalize

    vals = [float(v) for v in range(1, 11)]
    with_nulls = spark.createDataFrame(
        _pd.DataFrame({"g": ["a"] * 20, "v": vals + [None] * 10})
    )
    clean = spark.createDataFrame(_pd.DataFrame({"g": ["a"] * 10, "v": vals}))
    got_n = {r["v"]: r["pct"] for r in
             quantile_normalize(with_nulls, "v", ["g"], k=5).collect()
             if r["v"] is not None}
    got_c = {r["v"]: r["pct"] for r in
             quantile_normalize(clean, "v", ["g"], k=5).collect()}
    assert got_n == got_c


def test_quantile_rank_no_float_artifact(spark):
    """ceil(q·n) at an exact-integer boundary: 0.07·100 evaluates to
    7.000000000000001 in doubles, so a bare ceil picks rank 8 — while
    DuckDB's DECIMAL arithmetic (every oracle's shape) computes 7
    exactly. Both ranking paths round before ceiling (the hh_min_count
    guard): the 0.07-quantile of 1..100 must be 7, global and
    grouped."""
    import pandas as pd

    from pandasql_spark.operators.ranking import (
        exact_percentiles,
        grouped_exact_percentiles,
    )

    pdf = pd.DataFrame({"v": range(1, 101), "g": ["a"] * 100})
    df = spark.createDataFrame(pdf)
    got = {r.q: r.value for r in exact_percentiles(df, "v", [0.07, 0.25]).collect()}
    assert got == {0.07: 7, 0.25: 25}, got
    # r17 lockstep: the grouped path now shares the exact-boundary
    # convention (ceil(round(q·n, 9))) with the global path AND the
    # q91/q16 oracles — both sides moved together; the r15 one-sided
    # fix (code only) turned the q91 sf0.01 replica red and was the
    # documented regression this pin guards
    gg = {
        r.q: r.value
        for r in grouped_exact_percentiles(df, ["g"], "v", [0.07, 0.25]).collect()
    }
    assert gg == {0.07: 7, 0.25: 25}, gg


def test_grouped_quantile_boundary_matches_exact_rank(spark):
    """The REAL gate boundary (q91 at sf0.01): group n=3020, q=0.55 —
    0.55·3020 = 1661.0000000000002 in doubles, so a bare ceil picked
    rank 1662 where the exact inverse-CDF position is 1661. Since the
    r17 code+oracle lockstep both paths pick 1661."""
    import pandas as pd

    from pandasql_spark.operators.ranking import (
        exact_percentiles,
        grouped_exact_percentiles,
    )

    assert 0.55 * 3020 > 1661  # the artifact this test pins

    pdf = pd.DataFrame({"v": range(1, 3021), "g": ["a"] * 3020})
    df = spark.createDataFrame(pdf)
    gg = {r.q: r.value for r in grouped_exact_percentiles(df, ["g"], "v", [0.55]).collect()}
    assert gg == {0.55: 1661}, gg
    glob = {r.q: r.value for r in exact_percentiles(df, "v", [0.55]).collect()}
    assert glob == {0.55: 1661}, glob
