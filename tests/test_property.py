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

from tests.conftest import soak_examples

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
                ["filter_num", "filter_str", "project", "arith", "dedup",
                 "sort", "rename", "limit"]
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
        elif kind == "rename":
            ops.append(("rename", draw(st.sampled_from(["n", "m", "s"]))))
        elif kind == "limit":
            ops.append(("limit", draw(st.integers(min_value=1, max_value=30))))
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
    if kind == "rename":
        col = op[1]
        if col not in pdf.columns:
            return df, pdf
        new = col + "_r"
        return df.rename(columns={col: new}), pdf.rename(columns={col: new})
    if kind == "limit":
        # limit row SET is engine-dependent unless sorted; sort first on
        # all columns for a deterministic prefix both sides
        n = op[1]
        cols = list(pdf.columns)
        return (
            df.sort_values(cols)[:n],
            pdf.sort_values(cols, kind="mergesort").head(n),
        )
    if kind == "sort":
        col = op[1]
        if col not in pdf.columns:
            return df, pdf
        return df.sort_values(col), pdf.sort_values(col)
    raise AssertionError(kind)


@settings(
    max_examples=soak_examples(100),
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


@settings(max_examples=soak_examples(15), deadline=None,
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


@given(
    left=frames(),
    right=frames(),
    how=st.sampled_from(["inner", "left", "semi", "anti"]),
)
@settings(
    max_examples=soak_examples(100),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_merge_matches_pandas(spark, left, right, how):
    """merge across join types vs the pandas oracle. Right side is
    key-deduplicated for inner/left so row multiplicity matches pandas
    exactly; semi/anti are existence joins (pandas: isin filter)."""
    lf = ps.DataFrame(left)
    key = "m"
    if how in ("inner", "left"):
        rdedup = right.drop_duplicates(subset=[key])
        rf = ps.DataFrame(rdedup)
        got = lf.merge(rf, on=key, how=how).compute()
        expected = left.merge(
            rdedup, on=key, how=how, suffixes=(None, "__rdup")
        )
        # veneer: left wins name conflicts, only new right cols survive
        expected = expected[[c for c in expected.columns if not c.endswith("__rdup")]]
        expected = expected.reindex(sorted(expected.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        sort_cols = list(got.columns)
        pd.testing.assert_frame_equal(
            got.sort_values(sort_cols, ignore_index=True),
            expected.sort_values(sort_cols, ignore_index=True),
            check_dtype=False,
        )
    else:
        rf = ps.DataFrame(right)
        got = lf.merge(rf, on=key, how=how).compute()
        mask = left[key].isin(right[key])
        expected = left[mask] if how == "semi" else left[~mask]
        expected = expected.reindex(sorted(expected.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        sort_cols = list(got.columns)
        pd.testing.assert_frame_equal(
            got.sort_values(sort_cols, ignore_index=True),
            expected.sort_values(sort_cols, ignore_index=True),
            check_dtype=False,
        )


@settings(max_examples=soak_examples(15), deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(lpdf=frames(), rpdf=frames(), key=st.sampled_from(["n", "m", "s"]))
def test_random_join_matches_pandas(spark, lpdf, rpdf, key):
    """Random inner equi-joins agree with pandas merge (set-wise)."""
    rpdf = rpdf.rename(columns={c: c + "_r" for c in rpdf.columns if c != key})
    got = ps.DataFrame(lpdf).merge(ps.DataFrame(rpdf), on=key).compute()
    want = lpdf.merge(rpdf, on=key)
    got = got.reset_index(drop=True).sort_index(axis=1)
    want = want.reset_index(drop=True).sort_index(axis=1)
    assert list(got.columns) == list(want.columns)
    cols = list(got.columns)
    pd.testing.assert_frame_equal(
        got.sort_values(cols, ignore_index=True),
        want.sort_values(cols, ignore_index=True),
        check_dtype=False,
    )
