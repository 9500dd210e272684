"""Bucketed-table tests: the write-once-shuffle-never property.

Asserts the physical plans: groupBy and self-join on the bucket key have
ZERO Exchange operators; results equal the unbucketed equivalents."""

from __future__ import annotations

import re

import pytest

from pandasql_spark.operators.bucketing import bucketize, drop_bucketed

SF = "/root/testdata/sf0.001"


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))


@pytest.fixture(scope="module")
def bucketed(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    t = bucketize(li, "t_li_bucketed", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    yield t
    drop_bucketed("t_li_bucketed")


def test_groupby_on_bucket_key_no_shuffle(spark, bucketed):
    agg = bucketed.groupBy("l_orderkey").count()
    assert _exchanges(agg) == 0
    plain = spark.read.parquet(f"{SF}/lineitem.parquet").groupBy("l_orderkey").count()
    assert agg.count() == plain.count()


def test_selfjoin_on_bucket_key_no_shuffle(spark, bucketed):
    a = bucketed.select("l_orderkey", "l_linenumber", "l_quantity")
    b = bucketed.groupBy("l_orderkey").count()
    j = a.join(b, "l_orderkey")
    assert _exchanges(j) == 0, j._jdf.queryExecution().executedPlan().toString()[:800]
    assert j.count() == bucketed.count()


def test_superset_key_join_also_shuffle_free(spark, bucketed):
    """Spark 4 satisfies the join's clustering requirement from a SUBSET
    of the join keys: bucketing by l_orderkey alone covers the
    (l_orderkey, l_linenumber) join too — no Exchange."""
    a = bucketed.select("l_orderkey", "l_linenumber", "l_quantity")
    b = bucketed.select("l_orderkey", "l_linenumber", "l_extendedprice")
    j = a.join(b, ["l_orderkey", "l_linenumber"])
    assert _exchanges(j) == 0, j._jdf.queryExecution().executedPlan().toString()[:800]
    assert j.count() > 0
