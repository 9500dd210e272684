"""As-of join tests vs pandas.merge_asof (the semantics oracle), plus
edge cases: exact-tie timestamps, no prior match, inner vs outer."""

from __future__ import annotations

import pandas as pd
import pytest

from pandasql_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    trades = pd.DataFrame(
        {
            "tid": range(6),
            "sym": ["A", "A", "A", "B", "B", "C"],
            "t": pd.to_datetime(
                ["2024-01-01 10:00:05", "2024-01-01 10:00:10", "2024-01-01 10:00:20",
                 "2024-01-01 10:00:07", "2024-01-01 10:00:30", "2024-01-01 10:00:01"]
            ),
        }
    )
    quotes = pd.DataFrame(
        {
            "sym": ["A", "A", "A", "B", "B"],
            "t": pd.to_datetime(
                ["2024-01-01 10:00:00", "2024-01-01 10:00:10", "2024-01-01 10:00:15",
                 "2024-01-01 10:00:06", "2024-01-01 10:00:29"]
            ),
            "px": [1.0, 2.0, 3.0, 10.0, 11.0],
        }
    )
    return spark.createDataFrame(trades), spark.createDataFrame(quotes), trades, quotes


def test_asof_matches_pandas(spark, frames):
    st, sq, pt, pq = frames
    got = (
        asof_join(st, sq, on="t", by="sym", right_cols=["px"], inner=False)
        .toPandas()
        .sort_values("tid", ignore_index=True)
    )
    expected = pd.merge_asof(
        pt.sort_values("t"), pq.sort_values("t"), on="t", by="sym"
    ).sort_values("tid", ignore_index=True)
    assert got["px_r"].fillna(-1).tolist() == expected["px"].fillna(-1).tolist()


def test_asof_exact_tie_is_matched(spark, frames):
    st, sq, *_ = frames
    got = asof_join(st, sq, on="t", by="sym", right_cols=["px"]).toPandas()
    row = got[got["tid"] == 1].iloc[0]  # trade at 10:00:10, quote at 10:00:10
    assert row["px_r"] == 2.0  # >= semantics: exact tie matches


def test_asof_inner_drops_unmatched(spark, frames):
    st, sq, *_ = frames
    inner = asof_join(st, sq, on="t", by="sym", right_cols=["px"], inner=True).toPandas()
    # sym C has no quotes at all → dropped in inner mode
    assert set(inner["sym"]) == {"A", "B"}
    outer = asof_join(st, sq, on="t", by="sym", right_cols=["px"], inner=False).toPandas()
    assert set(outer["sym"]) == {"A", "B", "C"}
    assert outer[outer["sym"] == "C"]["px_r"].isna().all()


def test_asof_duplicate_right_ts_deterministic(spark):
    left = pd.DataFrame({"k": ["x"], "t": pd.to_datetime(["2024-01-01 10:00:10"]), "lid": [1]})
    right = pd.DataFrame(
        {
            "k": ["x", "x"],
            "t": pd.to_datetime(["2024-01-01 10:00:05", "2024-01-01 10:00:05"]),
            "v": [7.0, 9.0],
        }
    )
    out = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="t", by="k", right_cols=["v"],
    ).toPandas()
    assert out["v_r"].tolist() == [9.0]  # max-dedup tie policy


def test_asof_null_value_and_same_row_semantics(spark):
    """A right row whose value is NULL is still the most recent match
    (not skipped for an older non-null), and multi-column outputs come
    from the SAME right row — never a mix."""
    from pandasql_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [(1, 10.0, 5.0, None), (1, 20.0, None, 7.0)],
        "u long, t double, a double, b double",
    )
    left = spark.createDataFrame([(100, 1, 30.0)], "id long, u long, t double")
    out = asof_join(left, right, on="t", by="u", right_cols=["a", "b"]).collect()
    assert len(out) == 1
    row = out[0]
    # most recent right row is (t=20, a=NULL, b=7): a_r must be NULL
    # (not the older 5.0) and b_r must be 7.0 — one row, not a mix
    assert row.a_r is None and row.b_r == 7.0

    # inner=True keeps a match whose carried fields are all NULL
    right2 = spark.createDataFrame([(1, 10.0, None)], "u long, t double, a double")
    out2 = asof_join(left, right2, on="t", by="u", right_cols=["a"]).collect()
    assert len(out2) == 1 and out2[0].a_r is None
    # ...but drops left rows with NO match at all
    early = spark.createDataFrame([(7, 1, 5.0)], "id long, u long, t double")
    assert asof_join(early, right2, on="t", by="u", right_cols=["a"]).count() == 0
