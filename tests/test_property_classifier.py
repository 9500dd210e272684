"""Property-based differential for the hashed-feature classifier
(operators/classifier.py): the expression-path score must equal the
pure-Python fold BIT-EXACTLY on adversarial text — exotic unicode
(non-BMP emoji: the UTF-16 code-unit trap the BPE operator hit),
empty strings, repeated/multiple spaces, md5-prefix-heavy repetition —
across buckets counts, seeds, and biases. Spark's md5 hashes the
token's UTF-8 bytes; so does the reference, so any divergence is a
real engine-semantics bug, not float noise (the fold order is pinned
left-to-right on both sides)."""

from __future__ import annotations

import hashlib

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import soak_examples

from pandasql_spark.operators.classifier import linear_quality_score

# tokens: ASCII words, astral-plane emoji, combining marks, CJK —
# everything valid UTF-8 (lone surrogates excluded: not encodable).
# Multi-codepoint graphemes (ZWJ emoji) join as whole tokens.
_TOKENS = st.one_of(
    st.text(
        alphabet=st.sampled_from(list("abz09.,!") + ["é", "ß", "中", "🌊", "́"]),
        min_size=0,
        max_size=6,
    ),
    st.sampled_from(["👩‍🔬", "🌊🌊", "x́y"]),
)


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    texts = [
        " ".join(draw(_TOKENS) for _ in range(draw(st.integers(0, 5))))
        for _ in range(n)
    ]
    m = draw(st.sampled_from([1, 7, 1 << 10, 1 << 18]))
    seed = draw(st.integers(0, 3))
    bias = draw(st.sampled_from([0.0, -1.5, 0.25]))
    return texts, m, seed, bias


def _py_score(text, m, seed, bias):
    from pandasql_spark.operators.classifier import _MIX, _MOD

    s = bias
    for t in text.split(" "):
        b = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:13], 16) % m
        s += ((b + seed) * _MIX % _MOD) / 1_000_000.0 - 1.0
    return s


@settings(
    max_examples=soak_examples(15),
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(case=corpora())
def test_expression_score_matches_python_fold(spark, case):
    texts, m, seed, bias = case
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {
        r.doc_id: r.clf_score
        for r in linear_quality_score(
            df, n_buckets=m, seed=seed, bias=bias
        ).collect()
    }
    for i, t in enumerate(texts):
        want = _py_score(t, m, seed, bias)
        assert got[i] == want, (t, got[i], want)  # bit-exact
