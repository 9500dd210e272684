"""Hypothesis property suites for the r14 operators: DSIR importance
weights vs a doc-at-a-time Python scorer on generated corpora, and the
priority sample's batch twin vs a Python bottom-k — plus the selection
laws (prefix-of-ranking, k-bound, salt independence of membership
size)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import soak_examples

from pandasql_spark.operators.dsir import (
    _py_logweight,
    dsir_importance_weights,
    dsir_select,
)
from pandasql_spark.streaming.sample import priority_sample_per_key

_SETTINGS = dict(
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.data_too_large,
        HealthCheck.function_scoped_fixture,
    ],
)

_words = st.sampled_from(["a", "b", "cat", "dog", "x", ""])
_texts = st.lists(_words, min_size=1, max_size=6).map(" ".join)
_corpora = st.lists(_texts, min_size=1, max_size=12)
B = 32  # tiny bucket table => heavy collisions


def _model(texts):
    counts: dict[int, int] = {}
    total = 0
    for t in texts:
        toks = t.split(" ")
        for g in toks + [f"{w1} {w2}" for w1, w2 in zip(toks, toks[1:])]:
            b = int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B
            counts[b] = counts.get(b, 0) + 1
            total += 1
    return counts, total


@settings(max_examples=soak_examples(12), **_SETTINGS)
@given(raw=_corpora, target=_corpora)
def test_dsir_weights_match_python(spark, raw, target):
    rdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(raw)], "doc_id long, text string"
    )
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(target)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.logweight
        for r in dsir_importance_weights(rdf, tdf, n_buckets=B).collect()
    }
    tc, tt = _model(target)
    rc, rt = _model(raw)
    assert len(got) == len(raw)
    for i, t in enumerate(raw):
        exp = round(_py_logweight(t, tc, rc, tt, rt, B, 1.0), 6)
        assert got[i] == exp, (i, t)


@settings(max_examples=soak_examples(8), **_SETTINGS)
@given(raw=st.lists(_texts, min_size=2, max_size=10), k=st.integers(1, 12))
def test_dsir_select_is_ranking_prefix(spark, raw, k):
    rdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(raw)], "doc_id long, text string"
    )
    tdf = rdf.limit(2)
    w = {
        r.doc_id: r.logweight
        for r in dsir_importance_weights(rdf, tdf, n_buckets=B).collect()
    }
    sel = [
        r.doc_id for r in dsir_select(rdf, tdf, k=k, n_buckets=B).collect()
    ]
    exp = [d for d, _ in sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))][:k]
    assert sorted(sel) == sorted(exp)
    assert len(sel) == min(k, len(raw))


_keys = st.sampled_from(["p", "q", "r"])


@settings(max_examples=soak_examples(10), **_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(_keys, st.integers(0, 500)), min_size=1, max_size=30
    ),
    k=st.integers(1, 6),
    salt=st.sampled_from(["", "s"]),
)
def test_priority_sample_matches_python_bottom_k(spark, rows, k, salt):
    # dedupe ids (the events contract); keep first key per id
    seen, data = set(), []
    for key, i in rows:
        if i not in seen:
            seen.add(i)
            data.append((key, i))
    df = spark.createDataFrame(data, "event_type string, event_id long")
    got = {
        r.event_type: list(r.sample_ids)
        for r in priority_sample_per_key(df, k=k, salt=salt).collect()
    }
    by_key: dict = {}
    for key, i in data:
        px = hashlib.md5(f"{salt}{i}".encode()).hexdigest()
        by_key.setdefault(key, []).append((px, i))
    exp = {key: [i for _, i in sorted(v)[:k]] for key, v in by_key.items()}
    assert got == exp


# ---------------------------------------------------------------------------
# fuzzy contamination laws: every reported pair's jaccard is the true
# hashed-shingle jaccard and clears the threshold; every HIGH-jaccard
# cross pair is found (32x2 banding: P(miss) < 1e-12 above J=0.8)
# ---------------------------------------------------------------------------

_ftexts = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=3, max_size=8
).map(" ".join)


@settings(max_examples=soak_examples(8), **_SETTINGS)
@given(
    train=st.lists(_ftexts, min_size=1, max_size=8),
    ev=st.lists(_ftexts, min_size=1, max_size=4),
)
def test_fuzzy_contamination_laws(spark, train, ev):
    from pandasql_spark.operators.contamination import fuzzy_contaminated_docs

    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string"
    )
    edf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ev)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.eval_id): r.jaccard
        for r in fuzzy_contaminated_docs(tdf, edf, threshold=0.5).collect()
    }

    def shingles(t):
        toks = t.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))}

    truth = {}
    for i, tt in enumerate(train):
        for j, et in enumerate(ev):
            a, b = shingles(tt), shingles(et)
            truth[(i, j)] = round(len(a & b) / len(a | b), 6)
    # soundness: every reported pair true and above threshold
    for pair, jac in got.items():
        assert jac == truth[pair] and jac >= 0.5, pair
    # recall at high J: shared-band probability ~1 above 0.8
    for pair, jac in truth.items():
        if jac >= 0.8:
            assert pair in got, (pair, jac)
