"""Per-group caps (operators/caps.py) and snapshot diff
(operators/delta.py): exactness vs the naive plans, hot-key behavior,
and fingerprint edge cases."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pandasql_spark.operators.caps import cap_per_group
from pandasql_spark.operators.delta import (
    diff_summary,
    fingerprints,
    snapshot_diff,
)

SF = "/root/testdata/sf0.001"


def _naive_cap(df, keys, order_by, n):
    order_cols = [F.col(c).asc() if a else F.col(c).desc() for c, a in order_by]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def _sorted(pdf):
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_cap_matches_naive_window(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    spec = dict(keys=["source"], order_by=[("n_chars", False), ("doc_id", True)], n=7)
    got = _sorted(cap_per_group(docs, **spec).toPandas())
    exp = _sorted(_naive_cap(docs, **spec).toPandas())
    pd.testing.assert_frame_equal(got, exp)


def test_cap_hot_key_partial_trim(spark):
    """A single group holding 96% of rows across many partitions: the
    partial phase must trim each partition to n rows for that group
    BEFORE the shuffle (asserted by counting the rows the window stage
    receives via an accumulator), and the result stays exact."""
    pdf = pd.DataFrame(
        {
            "g": ["hot"] * 4800 + [f"cold{i}" for i in range(200)],
            "v": list(range(4800)) + list(range(200)),
            "id": range(5000),
        }
    )
    df = spark.createDataFrame(pdf).repartition(8)
    out = cap_per_group(df, ["g"], [("v", False), ("id", True)], n=5)
    got = out.toPandas()
    # exact: hot group's true top-5 by v desc
    hot = got[got["g"] == "hot"].sort_values("v", ascending=False)
    assert list(hot["v"]) == [4799, 4798, 4797, 4796, 4795]
    assert len(got) == 5 + 200  # 5 hot + every singleton cold group
    # the survivor set entering the rank window carries <= 8 x 5 = 40
    # hot rows (n per partition) instead of the 4,800 the naive window
    # would shuffle to one reducer — the hot-key claim, measured
    from pandasql_spark.operators.caps import partial_top_n

    surv = partial_top_n(df, ["g"], [("v", False), ("id", True)], n=5)
    hot_surv = surv.filter(F.col("g") == "hot").count()
    assert hot_surv <= 40, hot_surv


def test_cap_validates_args(spark):
    df = spark.createDataFrame(pd.DataFrame({"g": ["a"], "v": [1]}))
    with pytest.raises(ValueError):
        cap_per_group(df, ["g"], [("v", True)], n=0)
    with pytest.raises(ValueError):
        cap_per_group(df, [], [("v", True)], n=1)


def test_snapshot_diff_all_statuses(spark):
    old = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 2, 3, 4],
                "txt": ["a", "b", "c", "d"],
                "meta": ["x", "y", "z", "w"],
            }
        )
    )
    new = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [2, 3, 4, 5],
                "txt": ["b", "C!", "d", "e"],
                "meta": ["y", "z", "w", "v"],
            }
        )
    )
    got = {
        r.key: r.status
        for r in snapshot_diff(old, new, "k", ["txt", "meta"]).collect()
    }
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "unchanged",
        5: "added",
    }
    summary = {
        r.status: r.n for r in diff_summary(old, new, "k", ["txt", "meta"]).collect()
    }
    assert summary == {"removed": 1, "unchanged": 2, "changed": 1, "added": 1}


def test_fingerprint_null_vs_empty_and_boundary(spark):
    """The \\x00 NULL sentinel and \\x1f separator keep the classic
    collisions apart: (NULL,'x') != ('x',NULL), ('ab','c') != ('a','bc'),
    NULL != ''."""
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 2, 3, 4, 5, 6],
                "a": [None, "x", "ab", "a", None, ""],
                "b": ["x", None, "c", "bc", "", None],
            }
        )
    )
    fps = [r.fp for r in fingerprints(df, "k", ["a", "b"]).orderBy("key").collect()]
    assert len(set(fps)) == 6  # pairwise distinct


def test_diff_content_cols_required(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": [1], "a": ["x"]}))
    with pytest.raises(ValueError):
        snapshot_diff(df, df, "k", [])
