"""Property-based differential tests for the as-of join (vs
pandas.merge_asof) and salted aggregation (vs its unsalted twin).

asof_join's union-and-carry construction has the classic off-by-one
surfaces — ties between probe and carrier timestamps, multiple carriers
at one timestamp, probes before any carrier — which random (ts, key)
layouts hit far more often than fixtures do. merge_asof(backward,
allow_exact_matches=True) is the independent oracle with one alignment:
the operator max-dedups right rows tying on (by, on), so the oracle
frame is pre-deduped the same way."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import soak_examples

from pandasql_spark.operators.asof import asof_join
from pandasql_spark.operators.skew import salted_groupby_agg


@st.composite
def event_frames(draw):
    n_left = draw(st.integers(min_value=1, max_value=25))
    n_right = draw(st.integers(min_value=0, max_value=25))
    # tiny ts/key domains force ties and empty groups
    def rows(n, with_id):
        out = []
        for i in range(n):
            out.append(
                {
                    "k": draw(st.integers(min_value=0, max_value=3)),
                    "ts": draw(st.integers(min_value=0, max_value=12)),
                    "val": draw(st.integers(min_value=-100, max_value=100)),
                    **({"row_id": i} if with_id else {}),
                }
            )
        return pd.DataFrame(out)

    return rows(n_left, True), rows(n_right, False)


@settings(
    max_examples=soak_examples(40),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(frames=event_frames())
def test_asof_join_matches_pandas_merge_asof(spark, frames):
    lpdf, rpdf = frames
    left = spark.createDataFrame(lpdf)
    if len(rpdf) == 0:
        rpdf = pd.DataFrame({"k": [], "ts": [], "val": []}, dtype="int64")
    right = spark.createDataFrame(
        rpdf if len(rpdf) else pd.DataFrame({"k": [0], "ts": [99], "val": [0]})
    )

    got = asof_join(
        left, right, on="ts", by="k", right_cols=["val"], inner=False
    ).toPandas()

    # oracle: dedup right ties exactly like the operator (max per (k,ts)),
    # then backward merge_asof per key
    rdedup = (
        rpdf.groupby(["k", "ts"], as_index=False)["val"].max()
        if len(rpdf)
        else pd.DataFrame({"k": [0], "ts": [99], "val": [0]})
    )
    want = pd.merge_asof(
        lpdf.sort_values("ts", kind="mergesort"),
        rdedup.sort_values("ts", kind="mergesort").rename(columns={"val": "val_r"}),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )

    got = got.sort_values("row_id", ignore_index=True)
    want = want.sort_values("row_id", ignore_index=True)
    assert len(got) == len(want)
    a = got["val_r"].astype("float64").to_numpy()
    b = want["val_r"].astype("float64").to_numpy()
    assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), (
        lpdf.to_dict("records"), rpdf.to_dict("records"), a, b
    )


@settings(
    max_examples=soak_examples(30),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(frames=event_frames(), num_salts=st.integers(min_value=1, max_value=8))
def test_salted_agg_equals_plain_agg(spark, frames, num_salts):
    pdf, _ = frames
    df = spark.createDataFrame(pdf)
    got = (
        salted_groupby_agg(
            df, ["k"], {"val": "sum", "ts": "max"}, num_salts=num_salts
        )
        .toPandas()
        .sort_values("k", ignore_index=True)
    )
    want = (
        pdf.groupby("k", as_index=False)
        .agg(val=("val", "sum"), ts=("ts", "max"))
        .sort_values("k", ignore_index=True)
    )
    assert got["k"].tolist() == want["k"].tolist()
    assert got["val"].tolist() == want["val"].tolist()
    assert got["ts"].tolist() == want["ts"].tolist()
