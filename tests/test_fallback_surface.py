"""Escape-hatch + introspection parity surface: fallback (reference
FallbackOperation, core.py:1266-1284), memory_usage (core.py:70-82),
offloading_strategy (core.py:1546-1556), and the distributed analogs
map_in_pandas / groupby-apply.
"""

from __future__ import annotations

import pandas as pd
import pytest

import pandasql_spark as ps
from tests.conftest import assert_frame_equals_pandas


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame({"g": ["a", "b", "a", "b", "a"], "v": [5.0, 3.0, 9.0, 1.0, 7.0]})


def test_fallback_nlargest(spark, pdf):
    df = ps.DataFrame(pdf)
    got = df.fallback("nlargest", 2, "v")
    assert_frame_equals_pandas(got, pdf.nlargest(2, "v"))


def test_fallback_scalar_result(spark, pdf):
    df = ps.DataFrame(pdf)
    # non-frame results pass through (reference replays any pandas method)
    assert df.fallback("shape") == (5, 2)


def test_memory_usage_positive_without_materialization(spark, pdf):
    df = ps.DataFrame(pdf)
    assert df.memory_usage() > 0


def test_offloading_strategy_shim(spark):
    assert ps.offloading_strategy() in ("ALWAYS", "NEVER", "BEST")
    assert ps.offloading_strategy("best") == "BEST"
    with pytest.raises(ValueError):
        ps.offloading_strategy("sometimes")
    ps.offloading_strategy("ALWAYS")


def test_map_in_pandas(spark, pdf):
    df = ps.DataFrame(pdf)

    def double_v(batches):
        for b in batches:
            b = b.copy()
            b["v"] = b["v"] * 2
            yield b

    got = df.map_in_pandas(double_v, "g string, v double")
    expected = pdf.assign(v=pdf.v * 2)
    assert_frame_equals_pandas(got, expected)


def test_groupby_apply(spark, pdf):
    df = ps.DataFrame(pdf)

    def demean(key, g):
        return pd.DataFrame(
            {"g": g["g"], "v_centered": g["v"] - g["v"].mean()}
        )

    got = df.groupby("g").apply(demean, "g string, v_centered double")
    expected = pdf.assign(v_centered=pdf.v - pdf.groupby("g").v.transform("mean"))[
        ["g", "v_centered"]
    ]
    assert_frame_equals_pandas(got, expected)
