"""Per-group caps (operators/caps.py) and snapshot diff
(operators/delta.py): exactness vs the naive plans, hot-key behavior,
and fingerprint edge cases."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandasql_spark.operators.caps import cap_per_group, cap_tokens_per_group
from pandasql_spark.operators.delta import (
    diff_summary,
    fingerprints,
    snapshot_diff,
)

SF = "/root/testdata/sf0.001"


def _sorted(pdf):
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_cap_matches_pandas_oracle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = _sorted(
        cap_per_group(
            docs, ["source"], [("n_chars", False), ("doc_id", True)], n=7
        ).toPandas()
    )
    exp = _sorted(
        docs.toPandas()
        .sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .groupby("source", sort=False)
        .head(7)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_cap_hot_key_partial_group_limit_in_plan(spark):
    """The hot-key safety claim is Catalyst's WindowGroupLimit rule
    (SPARK-37099): a PARTIAL group-limit must sit BELOW the exchange —
    each input partition forwards at most n rows per group, so a group
    holding 96% of rows ships n×P rows, not all of them — and the
    result stays exact."""
    pdf = pd.DataFrame(
        {
            "g": ["hot"] * 4800 + [f"cold{i}" for i in range(200)],
            "v": list(range(4800)) + list(range(200)),
            "id": range(5000),
        }
    )
    df = spark.createDataFrame(pdf).repartition(8)
    out = cap_per_group(df, ["g"], [("v", False), ("id", True)], n=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    partial = plan.find("WindowGroupLimit")
    assert partial != -1, plan
    assert "Partial" in plan and "Final" in plan, plan
    # rendering is top-down: the Partial phase must print AFTER (below)
    # the Exchange, i.e. on the map side of the shuffle
    assert plan.find("Partial") > plan.find("Exchange"), plan
    got = out.toPandas()
    hot = got[got["g"] == "hot"].sort_values("v", ascending=False)
    assert list(hot["v"]) == [4799, 4798, 4797, 4796, 4795]
    assert len(got) == 5 + 200  # 5 hot + every singleton cold group


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


# ---------------------------------------------------------------------------
# CDC apply + SCD2 merge (operators/delta.py)


def test_apply_changes_upsert_insert_delete(spark):
    cur = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    )
    chg = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [2, 3, 4],
                "v": ["B", None, "d"],
                "op": ["upsert", "delete", "upsert"],
            }
        )
    )
    from pandasql_spark.operators.delta import apply_changes

    got = _sorted(apply_changes(cur, chg, "k").toPandas())
    exp = _sorted(pd.DataFrame({"k": [1, 2, 4], "v": ["a", "B", "d"]}))
    pd.testing.assert_frame_equal(got, exp)


def test_apply_changes_unknown_op_raises(spark):
    from py4j.protocol import Py4JJavaError

    from pandasql_spark.operators.delta import apply_changes

    cur = spark.createDataFrame(pd.DataFrame({"k": [1], "v": ["a"]}))
    chg = spark.createDataFrame(
        pd.DataFrame({"k": [1], "v": ["x"], "op": ["replace"]})
    )
    with pytest.raises(Exception) as ei:
        apply_changes(cur, chg, "k").collect()
    assert "unknown op" in str(ei.value)


def _hist(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "text", "valid_from", "valid_to"]).astype(
            {"valid_from": "int64", "valid_to": "Int64"}
        )
    )


def test_scd2_merge_all_transitions(spark):
    from pandasql_spark.operators.delta import scd2_merge

    # key 1: unchanged; key 2: changed; key 3: removed; key 4: added;
    # key 5: was closed long ago (passes through), re-appears -> added.
    hist = _hist(
        spark,
        [
            (1, "one", 0, None),
            (2, "two", 0, None),
            (3, "three", 0, None),
            (5, "five-old", 0, 7),
        ],
    )
    snap = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 2, 4, 5], "text": ["one", "two v2", "four", "five-new"]}
        )
    )
    got = _sorted(
        scd2_merge(hist, snap, "k", ["text"], as_of=10).toPandas()
    )
    exp = _sorted(
        pd.DataFrame(
            {
                "k": [1, 2, 2, 3, 4, 5, 5],
                "text": [
                    "one", "two", "two v2", "three", "four",
                    "five-old", "five-new",
                ],
                "valid_from": [0, 0, 10, 0, 10, 0, 10],
                "valid_to": [None, 10, None, 10, None, 7, None],
            }
        ).astype({"valid_from": "int64", "valid_to": "float64"})
    )
    got["valid_to"] = got["valid_to"].astype("float64")
    pd.testing.assert_frame_equal(got, exp)


def test_scd2_merge_idempotent_rerun(spark):
    from pandasql_spark.operators.delta import scd2_merge

    hist = _hist(spark, [(1, "one", 0, None), (2, "two", 0, None)])
    snap = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "text": ["one", "two v2"]})
    )
    once = scd2_merge(hist, snap, "k", ["text"], as_of=5)
    # re-merging the SAME snapshot at the same clock into the merged
    # history changes nothing (open rows already match the snapshot)
    twice = scd2_merge(once, snap, "k", ["text"], as_of=5)
    a = _sorted(once.toPandas())
    b = _sorted(twice.toPandas())
    pd.testing.assert_frame_equal(a, b)


def test_scd2_merge_validation(spark):
    from pandasql_spark.operators.delta import scd2_merge

    hist = _hist(spark, [(1, "one", 0, None)])
    snap = spark.createDataFrame(pd.DataFrame({"k": [1], "text": ["one"]}))
    with pytest.raises(ValueError, match="non-empty"):
        scd2_merge(hist, snap, "k", [], as_of=1)
    with pytest.raises(ValueError, match="valid_from"):
        scd2_merge(hist.drop("valid_from"), snap, "k", ["text"], as_of=1)


def _py_token_cap(pdf, keys, order, budget, token_col):
    """Pure-pandas reference for cap_tokens_per_group's prefix
    semantics: per group, sort, cumsum, keep while <= budget."""
    cols, asc = [c for c, _ in order], [a for _, a in order]
    out = []
    for _, g in pdf.groupby(keys, sort=False):
        g = g.sort_values(cols, ascending=asc)
        keep = g[token_col].cumsum() <= budget
        out.append(g[keep])
    return pd.concat(out) if out else pdf.iloc[:0]


def test_token_cap_matches_pandas_oracle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "tok", F.size(F.split("text", " "))
    )
    order = [("n_chars", False), ("doc_id", True)]
    got = _sorted(
        cap_tokens_per_group(
            docs, ["source"], order, budget=3000, token_col="tok"
        ).toPandas()
    )
    exp = _sorted(
        _py_token_cap(docs.toPandas(), ["source"], order, 3000, "tok")
    )
    pd.testing.assert_frame_equal(got, exp)


def test_token_cap_edges(spark):
    """Prefix semantics pinned: the first overflowing doc is dropped
    AND everything after it (no knapsack jump-ahead); an exact-budget
    hit is kept; zero-token docs before the cut are kept with
    min_tokens_per_doc=0; prefilter path == unfiltered path."""
    rows = [
        # (id, src, tok): order by id asc; budget 10
        (1, "a", 4),   # cum 4  keep
        (2, "a", 6),   # cum 10 keep (exact hit)
        (3, "a", 1),   # cum 11 drop
        (4, "a", 1),   # cum 12 drop — even though it alone would fit
        (1, "b", 20),  # cum 20 drop (first doc already overflows)
        (2, "b", 3),   # cum 23 drop — prefix, not knapsack
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, tok long")
    got = {
        (r.src, r.doc_id)
        for r in cap_tokens_per_group(
            df, ["src"], [("doc_id", True)], 10, "tok"
        ).collect()
    }
    assert got == {("a", 1), ("a", 2)}

    zrows = [(1, "a", 0), (2, "a", 10), (3, "a", 0)]
    zdf = spark.createDataFrame(zrows, "doc_id long, src string, tok long")
    kept = {
        r.doc_id
        for r in cap_tokens_per_group(
            zdf, ["src"], [("doc_id", True)], 10, "tok"
        ).collect()
    }
    assert kept == {1, 2, 3}  # zero-token docs ride along BY DEFAULT

    # min_tokens_per_doc >= 1 is an explicit quality floor: sub-floor
    # rows are dropped from the walk entirely (they neither consume
    # budget nor ride through), never silently position-dependent
    # (ADVICE r13)
    frows = [(1, "a", 1), (2, "a", 5), (3, "a", 2), (4, "a", 5)]
    fdf = spark.createDataFrame(frows, "doc_id long, src string, tok long")
    floored = {
        r.doc_id
        for r in cap_tokens_per_group(
            fdf, ["src"], [("doc_id", True)], 10, "tok",
            min_tokens_per_doc=2,
        ).collect()
    }
    assert floored == {2, 3}  # 1 and 4 sub-floor-or-overflow: 5+2+5>10

    # prefilter equivalence on data satisfying min_tokens_per_doc
    docs = spark.createDataFrame(
        [(i, "s" + str(i % 3), 1 + i % 5) for i in range(200)],
        "doc_id long, src string, tok long",
    )
    a = _sorted(cap_tokens_per_group(
        docs, ["src"], [("doc_id", True)], 25, "tok",
        min_tokens_per_doc=1).toPandas())
    b = _sorted(cap_tokens_per_group(
        docs, ["src"], [("doc_id", True)], 25, "tok").toPandas())
    pd.testing.assert_frame_equal(a, b)

    with pytest.raises(ValueError, match="budget"):
        cap_tokens_per_group(docs, ["src"], [("doc_id", True)], -1, "tok")


def test_token_cap_prefilter_plan(spark):
    """The hot-key prefilter must appear as a native WindowGroupLimit
    below the cumsum window when min_tokens_per_doc >= 1, and must be
    ABSENT with min_tokens_per_doc=0 (zero-token correctness mode)."""
    from pandasql_spark.plans.explain import operator_names

    docs = spark.createDataFrame(
        [(i, "s", 1) for i in range(50)], "doc_id long, src string, tok long"
    )
    with_pf = cap_tokens_per_group(
        docs, ["src"], [("doc_id", True)], 10, "tok", min_tokens_per_doc=1
    )
    ops = operator_names(with_pf)
    assert "WindowGroupLimit" in ops, ops
    without = cap_tokens_per_group(
        docs, ["src"], [("doc_id", True)], 10, "tok"
    )
    assert "WindowGroupLimit" not in operator_names(without)
