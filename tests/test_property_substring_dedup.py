"""Property test for substring_dedup: on random small-vocab corpora
(heavy window collisions by construction) the operator agrees
column-exactly with the pure-Python first-occurrence/interval-union
reference — probing window-boundary arithmetic, within-doc repeats,
whole-doc duplicates, and empty/short docs that fixtures miss."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import soak_examples

from pandasql_spark.operators.dedup import substring_dedup
from tests.test_substring_dedup import _py_substring_dedup

VOCAB = ["a", "b", "c"]  # 3 symbols + k=3 → constant collisions


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(min_value=2, max_value=6))
    rows = []
    for i in range(n_docs):
        n_tok = draw(st.integers(min_value=0, max_value=10))
        toks = [draw(st.sampled_from(VOCAB)) for _ in range(n_tok)]
        rows.append((i, " ".join(toks)))
    return rows


@settings(
    max_examples=soak_examples(12),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(rows=corpus())
def test_substring_dedup_matches_python_reference(spark, rows):
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
            {"doc_id": "int64", "text": "string"}
        )
    )
    got = {
        r.doc_id: (r.text, r.n_tokens, r.sub_dup_windows, r.sub_dup_tokens)
        for r in substring_dedup(df, k=3).toPandas().itertuples()
    }
    assert got == _py_substring_dedup(rows, k=3)


@settings(
    max_examples=soak_examples(25),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    pos=st.lists(st.integers(min_value=0, max_value=40), max_size=25),
    k=st.integers(min_value=1, max_value=8),
)
def test_merged_dup_intervals_matches_python(spark, pos, k):
    """The interval fold (r12 splice rewrite) equals the pure-Python
    sorted-merge of [p, p+k) windows for arbitrary position sets —
    the helper the splice's O(n·intervals) bound rests on."""
    from pyspark.sql import functions as F

    from pandasql_spark.operators.dedup import merged_dup_intervals

    spos = sorted(set(pos))  # the operator feeds sort_array(distinct)
    want = []
    for p in spos:
        if want and p <= want[-1][1]:
            want[-1] = (want[-1][0], p + k)
        else:
            want.append((p, p + k))
    df = spark.createDataFrame([(spos,)], "dup array<int>")
    got = [
        (iv.s, iv.e)
        for iv in df.select(
            merged_dup_intervals("dup", k).alias("ivs")
        ).collect()[0].ivs
    ]
    assert got == want
