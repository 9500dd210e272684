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
