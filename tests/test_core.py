"""Core operator tests — projection / selection / limit / predicates /
arithmetic / column writes, differential against pandas.

Fixtures follow FIXTURES.md §1 (the reference's own test inputs) so group
cardinalities and expected outputs line up with the reference suite
(``/root/reference/tests/test_data_frame.py``)."""

from __future__ import annotations

import pandas as pd
import pytest

import pandasql_spark as ps
from tests.conftest import assert_frame_equals_pandas, assert_series_equals_pandas


@pytest.fixture(scope="module")
def ns_small(spark):
    pdf = pd.DataFrame([{"n": i, "s": str(i * 2)} for i in range(10)])
    return ps.DataFrame(pdf), pdf


@pytest.fixture(scope="module")
def nm_int(spark):
    pdf = pd.DataFrame([{"n": i, "m": 10 - i} for i in range(1, 10)])
    return ps.DataFrame(pdf), pdf


@pytest.fixture(scope="module")
def chars(spark):
    pdf = pd.DataFrame([{"n": str(i), "m": chr(97 + i)} for i in range(26)])
    return ps.DataFrame(pdf), pdf


def test_projection_single(ns_small):
    df, pdf = ns_small
    assert_series_equals_pandas(df["n"], pdf["n"])


def test_projection_multi_source_order(ns_small):
    df, pdf = ns_small
    # request order ['s','n'] but output must follow source order n,s
    # (reference core.py:780)
    result = df[["s", "n"]]
    assert list(result.columns) == ["n", "s"]
    assert_frame_equals_pandas(result, pdf[["n", "s"]])


def test_attribute_access(ns_small):
    df, pdf = ns_small
    assert_series_equals_pandas(df.n, pdf["n"])


def test_selection_simple(ns_small):
    df, pdf = ns_small
    assert_frame_equals_pandas(df[df["n"] > 4], pdf[pdf["n"] > 4])


def test_selection_compound(ns_small):
    df, pdf = ns_small
    crit = (df["n"] > 2) & ~(df["s"] == "8") | (df["n"] == 0)
    pcrit = (pdf["n"] > 2) & ~(pdf["s"] == "8") | (pdf["n"] == 0)
    assert_frame_equals_pandas(df[crit], pdf[pcrit])


def test_selection_isin(ns_small):
    df, pdf = ns_small
    assert_frame_equals_pandas(df[df["n"].isin([1, 3, 5])], pdf[pdf["n"].isin([1, 3, 5])])


def test_cross_frame_criterion_rejected(ns_small, nm_int):
    df1, _ = ns_small
    df2, _ = nm_int
    with pytest.raises(ValueError):
        _ = df1["n"] == df2["n"]


def test_limit_slice(ns_small):
    df, pdf = ns_small
    assert len(df[:3]) == 3
    with pytest.raises(ValueError):
        df[1:3]


def test_head(ns_small):
    df, _ = ns_small
    assert len(df.head(4)) == 4


def test_string_predicates(chars):
    df, pdf = chars
    assert_frame_equals_pandas(df[df["n"].str.contains("1")], pdf[pdf["n"].str.contains("1")])
    assert_frame_equals_pandas(
        df[df["n"].str.startswith("2")], pdf[pdf["n"].str.startswith("2")]
    )
    assert_frame_equals_pandas(df[df["n"].str.endswith("5")], pdf[pdf["n"].str.endswith("5")])


def test_arithmetic_basic(nm_int):
    df, pdf = nm_int
    assert_series_equals_pandas(df["n"] + df["m"], pdf["n"] + pdf["m"])
    assert_series_equals_pandas(df["n"] - 2, pdf["n"] - 2)
    assert_series_equals_pandas(3 * df["n"], 3 * pdf["n"])
    assert_series_equals_pandas(-df["n"], -pdf["n"])
    assert_series_equals_pandas(abs(df["n"] - 5), abs(pdf["n"] - 5))


def test_arithmetic_python_semantics(nm_int):
    """/, //, %, ** must match Python/pandas, not engine-native semantics
    (reference sql_utils.py:9-48)."""
    df, pdf = nm_int
    assert_series_equals_pandas(df["n"] / df["m"], pdf["n"] / pdf["m"])
    assert_series_equals_pandas(df["n"] // 3, pdf["n"] // 3)
    # negative dividend: Python floors toward -inf
    assert_series_equals_pandas((df["n"] - 5) // 3, (pdf["n"] - 5) // 3)
    assert_series_equals_pandas((df["n"] - 5) % 3, (pdf["n"] - 5) % 3)
    assert_series_equals_pandas(df["n"] % df["m"], pdf["n"] % pdf["m"])
    assert_series_equals_pandas(df["n"] ** 2, pdf["n"] ** 2)


def test_arithmetic_bitwise(nm_int):
    df, pdf = nm_int
    assert_series_equals_pandas(df["n"] & df["m"], pdf["n"] & pdf["m"])
    assert_series_equals_pandas(df["n"] | 8, pdf["n"] | 8)
    assert_series_equals_pandas(df["n"] ^ df["m"], pdf["n"] ^ pdf["m"])
    assert_series_equals_pandas(~df["n"], ~pdf["n"])


def test_nested_expression(nm_int):
    """Reference golden: 3 / ((abs(-n // 2) ** m) % 13)
    (tests/test_data_frame.py:350-364)."""
    df, pdf = nm_int
    expr = 3 / ((abs((-df["n"]) // 2) ** df["m"]) % 13)
    pexpr = 3 / ((abs((-pdf["n"]) // 2) ** pdf["m"]) % 13)
    assert_series_equals_pandas(expr, pexpr)


def test_expression_computes_as_res(nm_int):
    df, _ = nm_int
    expr = df["n"] + 1
    s = expr.compute()
    assert s.name == "res"  # reference core.py:1430-1431


def test_setitem_copy_on_write(spark):
    """Old projections keep pre-write values (reference core.py:545-578,
    tests/test_data_frame.py:316-332)."""
    pdf = pd.DataFrame([{"n": i, "s": str(i * 2)} for i in range(10)])
    df = ps.DataFrame(pdf)
    old_proj = df["n"]
    df["n"] = df["n"] * 10
    new_vals = df["n"].compute().sort_values(ignore_index=True)
    old_vals = old_proj.compute().sort_values(ignore_index=True)
    assert list(new_vals) == [i * 10 for i in range(10)]
    assert list(old_vals) == list(range(10))


def test_setitem_new_column(ns_small):
    df, pdf = ns_small
    df2 = ps.DataFrame(pdf)
    df2["t"] = df2["n"] + 100
    expected = pdf.copy()
    expected["t"] = expected["n"] + 100
    assert list(df2.columns) == ["n", "s", "t"]
    assert_frame_equals_pandas(df2, expected)


def test_rename(ns_small):
    _, pdf = ns_small
    df = ps.DataFrame(pdf)
    out = df.rename(columns={"n": "b"})
    assert list(out.columns) == ["b", "s"]  # position preserved
    with pytest.raises(ValueError):
        df.rename(columns={"zz": "b"})


def test_drop_duplicates(spark):
    pdf = pd.DataFrame([{"n": int(i / 2), "s": 0} for i in range(10)])
    df = ps.DataFrame(pdf)
    assert_frame_equals_pandas(df.drop_duplicates(), pdf.drop_duplicates())
    # subset superset
    assert len(df.drop_duplicates(subset=["n"])) == 5


def test_sort_values(spark):
    pdf = pd.DataFrame([{"x": i // 2, "y": i % 2} for i in range(10)])
    df = ps.DataFrame(pdf)
    out = df.sort_values(["x", "y"], ascending=[False, True])
    expected = pdf.sort_values(["x", "y"], ascending=[False, True])
    assert_frame_equals_pandas(out, expected, check_row_order=True)


def test_nlargest_nsmallest(ns_small):
    df, pdf = ns_small
    assert_frame_equals_pandas(
        df.nlargest(3, "n"), pdf.nlargest(3, "n"), check_row_order=True
    )
    assert_frame_equals_pandas(
        df.nsmallest(3, "n"), pdf.nsmallest(3, "n"), check_row_order=True
    )


def test_concat(spark):
    parts_p = [
        pd.DataFrame([{"n": i, "s": str(i)} for i in rng])
        for rng in (range(8), range(4, 12), range(8, 16))
    ]
    parts = [ps.DataFrame(p) for p in parts_p]
    assert_frame_equals_pandas(ps.concat(parts), pd.concat(parts_p))
    bad = ps.DataFrame(pd.DataFrame({"z": [1]}))
    with pytest.raises(ValueError):
        ps.concat([parts[0], bad])


def test_repr_bounded(spark):
    pdf = pd.DataFrame({"n": range(100)})
    df = ps.DataFrame(pdf)
    text = repr(df)
    assert "preview of first" in text
