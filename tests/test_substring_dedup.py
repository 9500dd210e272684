"""Substring-granularity exact dedup (operators/dedup.py:
substring_dedup): pure-Python differential over real testdata, planted
passages, edge cases, md5/xxhash path equality, and the plan contract
(agg+join on fp, no cartesian, no Python in the hot path)."""
from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandasql_spark.operators.dedup import substring_dedup

SF_DIR = "/root/testdata/sf0.001"


def _py_substring_dedup(rows: list[tuple[int, str]], k: int,
                        keep: str = "first"):
    """Reference implementation: dict-of-first-occurrence (or global
    counts for keep='none') over windows in (id, pos) order, then
    interval-union splice."""
    first: dict[tuple, tuple] = {}
    counts: dict[tuple, int] = {}
    for doc_id, text in sorted(rows):
        toks = text.split(" ")
        for pos in range(len(toks) - k + 1):
            key = tuple(toks[pos:pos + k])
            first.setdefault(key, (doc_id, pos))
            counts[key] = counts.get(key, 0) + 1
    out = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        if keep == "first":
            dup_pos = [
                pos
                for pos in range(len(toks) - k + 1)
                if first[tuple(toks[pos:pos + k])] != (doc_id, pos)
            ]
        else:
            dup_pos = [
                pos
                for pos in range(len(toks) - k + 1)
                if counts[tuple(toks[pos:pos + k])] > 1
            ]
        covered = set()
        for p in dup_pos:
            covered.update(range(p, p + k))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        out[doc_id] = (
            " ".join(kept), len(toks), len(dup_pos), len(covered)
        )
    return out


def _run(spark, rows, k, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = substring_dedup(df, k=k, **kw).toPandas()
    return {
        r.doc_id: (r.text, r.n_tokens, r.sub_dup_windows, r.sub_dup_tokens)
        for r in got.itertuples()
    }


def test_planted_passage(spark):
    """A 6-token passage pasted into three docs survives exactly once
    (in the lowest (id, pos) occurrence); within-doc repetition also
    dedups; short docs pass through."""
    passage = "lorem ipsum dolor sit amet consectetur"
    rows = [
        (1, f"alpha beta {passage} gamma"),
        (2, f"{passage} delta epsilon"),
        (3, f"zeta {passage} eta {passage}"),
        (4, "too short"),
        (5, ""),
    ]
    got = _run(spark, rows, k=6)
    want = _py_substring_dedup(rows, k=6)
    assert got == want
    # the doc-1 occurrence is canonical: its text is unchanged
    assert got[1][0] == rows[0][1]
    # docs 2 and 3 lost every copy of the passage
    for d in (2, 3):
        assert passage not in got[d][0]
    assert got[4] == ("too short", 2, 0, 0)
    assert got[5] == ("", 1, 0, 0)  # '' splits to one empty token


def test_differential_on_real_documents(spark):
    """Column-exact agreement with the pure-Python reference over the
    full sf0.001 documents table at k=20 (the q88 fold's k) and k=50
    (the operator default; still binds — the generator plants repeated
    passages)."""
    pdf = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    rows = list(pdf.itertuples(index=False, name=None))
    df = spark.createDataFrame(pdf)
    for k in (20, 50):
        got = {
            r.doc_id: (
                r.text, r.n_tokens, r.sub_dup_windows, r.sub_dup_tokens
            )
            for r in substring_dedup(df, k=k).toPandas().itertuples()
        }
        want = _py_substring_dedup(rows, k=k)
        assert got == want
        assert sum(g[2] for g in got.values()) > 0, f"k={k} never bound"


def test_keep_none_differential(spark):
    """keep='none' (drop EVERY occurrence of a repeated window,
    canonical included) agrees with the reference on real documents;
    it is at least as aggressive as keep='first' everywhere."""
    pdf = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(250)
        .toPandas()
    )
    rows = list(pdf.itertuples(index=False, name=None))
    df = spark.createDataFrame(pdf)
    got = {
        r.doc_id: (r.text, r.n_tokens, r.sub_dup_windows, r.sub_dup_tokens)
        for r in substring_dedup(df, k=20, keep="none")
        .toPandas()
        .itertuples()
    }
    want = _py_substring_dedup(rows, k=20, keep="none")
    assert got == want
    first = _py_substring_dedup(rows, k=20, keep="first")
    assert all(got[d][3] >= first[d][3] for d in got)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep must be"):
        substring_dedup(df, k=5, keep="all")


def test_fingerprint_paths_agree(spark):
    """fingerprint='xxhash' (8-byte scale path) and 'xxhash128' (the
    16-byte two-seed struct key, ADVICE r11) must produce the identical
    result frame as the portable md5 path."""
    df = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    a = substring_dedup(df, k=20).toPandas().sort_values("doc_id")
    for fp in ("xxhash", "xxhash128"):
        b = (
            substring_dedup(df, k=20, fingerprint=fp)
            .toPandas()
            .sort_values("doc_id")
        )
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )


def test_merged_dup_intervals():
    """Interval fold: overlap/touch merge, gaps stay disjoint, empty
    passes through; the splice mask is interval-driven (VERDICT r11)."""
    from pandasql_spark.operators.dedup import merged_dup_intervals
    from pandasql_spark.session import get_spark

    spark = get_spark()
    df = spark.createDataFrame(
        [
            (1, [0, 1, 2]),            # chained overlap -> one interval
            (2, [0, 5]),               # touching (k=5) -> one interval
            (3, [0, 6]),               # gap -> two intervals
            (4, []),                   # no dups
            (5, [0, 3, 20, 22, 40]),   # mixed
        ],
        "id long, dup array<int>",
    )
    got = {
        r.id: [(iv.s, iv.e) for iv in r.ivs]
        for r in df.select(
            "id", merged_dup_intervals("dup", 5).alias("ivs")
        ).collect()
    }
    assert got == {
        1: [(0, 7)],
        2: [(0, 10)],
        3: [(0, 5), (6, 11)],
        4: [],
        5: [(0, 8), (20, 27), (40, 45)],
    }


def test_pathological_fully_duplicated_doc(spark):
    """The VERDICT-r11 worst case: a large doc whose EVERY window is a
    duplicate (a verbatim copy of another doc). With the interval
    splice this is O(n_tokens) work, and the output must still be
    exact: the copy splices to empty, the canonical is untouched."""
    n = 4000
    text = " ".join(f"w{i % 97}x{i % 89}" for i in range(n))
    rows = [(1, text), (2, text)]
    got = _run(spark, rows, k=50)
    assert got[1] == (text, n, 0, 0)
    assert got[2] == ("", n, n - 50 + 1, n)


def test_full_doc_duplicate_splices_to_empty(spark):
    """A doc that is one whole duplicated window loses every token and
    survives as an empty string, never a lost row."""
    rows = [(1, "a b c"), (2, "a b c")]
    got = _run(spark, rows, k=3)
    assert got[1] == ("a b c", 3, 0, 0)
    assert got[2] == ("", 3, 1, 3)


def test_validation():
    with pytest.raises(ValueError, match="k must be"):
        substring_dedup(None, k=0)
    with pytest.raises(ValueError, match="fingerprint must be"):
        substring_dedup(None, k=5, fingerprint="sha")


def test_plan_contract(spark):
    """No cartesian product, no Python eval in the plan; canonical
    selection is a partial-aggregated groupBy on fp (hot-fp safe), not
    a single-reducer window sort."""
    from pandasql_spark.plans.explain import explain_str, operator_names

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    out = substring_dedup(df, k=20)
    plan = explain_str(out)
    ops = " ".join(operator_names(out))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "ArrowEval" not in plan and "BatchEvalPython" not in plan
    assert "Window" not in ops, "canonical pick must be agg+join, not window"
    assert "HashAggregate" in ops
