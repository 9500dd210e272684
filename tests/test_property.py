"""Property-based differential testing: random operator pipelines on the
veneer vs the same pipeline on pandas (the reference's oracle, SURVEY §5,
upgraded with hypothesis as the §5 'mirrors + upgrades' plan calls for).

Each example builds a random pipeline from a small op grammar and applies
it stepwise to (our DataFrame, pandas DataFrame); results must agree
set-wise. Ints only in arithmetic (float compare noise excluded by
construction); division always compares with tolerance via rounding."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pandasql_spark as ps

COLS = ["n", "m", "s"]


@st.composite
def frames(draw):
    nrows = draw(st.integers(min_value=1, max_value=25))
    rows = [
        {
            "n": draw(st.integers(min_value=-50, max_value=50)),
            "m": draw(st.integers(min_value=1, max_value=20)),
            "s": draw(st.sampled_from(["a", "b", "ab", "ba", "c"])),
        }
        for _ in range(nrows)
    ]
    return pd.DataFrame(rows)


@st.composite
def pipelines(draw):
    n_ops = draw(st.integers(min_value=1, max_value=4))
    ops = []
    for _ in range(n_ops):
        kind = draw(
            st.sampled_from(
                ["filter_num", "filter_str", "project", "arith", "dedup", "sort"]
            )
        )
        if kind == "filter_num":
            col = draw(st.sampled_from(["n", "m"]))
            op = draw(st.sampled_from(["gt", "le", "eq", "ne"]))
            val = draw(st.integers(min_value=-20, max_value=20))
            ops.append(("filter_num", col, op, val))
        elif kind == "filter_str":
            pat = draw(st.sampled_from(["a", "b", "ab"]))
            mode = draw(st.sampled_from(["contains", "startswith", "endswith"]))
            ops.append(("filter_str", mode, pat))
        elif kind == "project":
            cols = draw(
                st.lists(st.sampled_from(COLS), min_size=1, max_size=3, unique=True)
            )
            ops.append(("project", cols))
        elif kind == "arith":
            expr = draw(st.sampled_from(["add", "floordiv", "mod", "mul", "neg_abs"]))
            ops.append(("arith", expr))
        elif kind == "dedup":
            ops.append(("dedup",))
        else:
            ops.append(("sort", draw(st.sampled_from(["n", "m"]))))
    return ops


_CMP = {
    "gt": lambda c, v: c > v,
    "le": lambda c, v: c <= v,
    "eq": lambda c, v: c == v,
    "ne": lambda c, v: c != v,
}


def _apply(df, pdf, op):
    kind = op[0]
    if kind == "filter_num":
        _, col, cmp_, val = op
        if col not in pdf.columns:
            return df, pdf
        return df[_CMP[cmp_](df[col], val)], pdf[_CMP[cmp_](pdf[col], val)]
    if kind == "filter_str":
        _, mode, pat = op
        if "s" not in pdf.columns:
            return df, pdf
        return (
            df[getattr(df["s"].str, mode)(pat)],
            pdf[getattr(pdf["s"].str, mode)(pat)],
        )
    if kind == "project":
        cols = [c for c in op[1] if c in pdf.columns]
        if not cols:
            return df, pdf
        out = df[cols]
        # veneer keeps source order; align pandas to the same order
        return ps.from_spark(out.to_spark()), pdf[list(out.columns)]
    if kind == "arith":
        expr = op[1]
        if "n" not in pdf.columns or "m" not in pdf.columns:
            return df, pdf
        pdf = pdf.copy()
        if expr == "add":
            df["t"] = df["n"] + df["m"]
            pdf["t"] = pdf["n"] + pdf["m"]
        elif expr == "floordiv":
            df["t"] = df["n"] // df["m"]
            pdf["t"] = pdf["n"] // pdf["m"]
        elif expr == "mod":
            df["t"] = df["n"] % df["m"]
            pdf["t"] = pdf["n"] % pdf["m"]
        elif expr == "mul":
            df["t"] = df["n"] * 3 - 1
            pdf["t"] = pdf["n"] * 3 - 1
        else:
            df["t"] = abs(-df["n"])
            pdf["t"] = abs(-pdf["n"])
        return df, pdf
    if kind == "dedup":
        return df.drop_duplicates(), pdf.drop_duplicates()
    if kind == "sort":
        col = op[1]
        if col not in pdf.columns:
            return df, pdf
        return df.sort_values(col), pdf.sort_values(col)
    raise AssertionError(kind)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(pdf=frames(), pipeline=pipelines())
def test_random_pipeline_matches_pandas(spark, pdf, pipeline):
    df = ps.DataFrame(pdf)
    cur_pdf = pdf
    for op in pipeline:
        df, cur_pdf = _apply(df, cur_pdf, op)
    got = df.compute()
    if isinstance(got, pd.Series):
        got = got.to_frame()
    got = got.reset_index(drop=True).sort_index(axis=1)
    expected = cur_pdf.reset_index(drop=True).sort_index(axis=1)
    assert list(got.columns) == list(expected.columns)
    cols = list(got.columns)
    got = got.sort_values(cols, ignore_index=True) if cols else got
    expected = expected.sort_values(cols, ignore_index=True) if cols else expected
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(pdf=frames(), keys=st.lists(st.sampled_from(["n", "m", "s"]),
                                   min_size=1, max_size=2, unique=True))
def test_random_groupby_matches_pandas(spark, pdf, keys):
    df = ps.DataFrame(pdf)
    agg_cols = [c for c in ["n", "m"] if c not in keys]
    if not agg_cols:
        return
    got = df.groupby(keys, as_index=False).sum().compute()
    expected = pdf.groupby(keys, as_index=False)[agg_cols].sum()
    got = got.sort_values(keys, ignore_index=True).sort_index(axis=1)
    expected = expected.sort_values(keys, ignore_index=True).sort_index(axis=1)
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)
