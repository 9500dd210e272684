"""Hypothesis property suites for the round-7 operators: scd2_merge vs
a Python state-machine oracle, hash_split's partition/consistency laws
under generated weights, chunk_documents vs an independent Python
chunker, and bm25_scores vs a doc-at-a-time Python BM25.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import soak_examples

from pandasql_spark.operators.delta import scd2_merge
from pandasql_spark.operators.packing import chunk_documents
from pandasql_spark.operators.retrieval import bm25_scores
from pandasql_spark.operators.sampling import hash_split

_SETTINGS = dict(
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.data_too_large,
        HealthCheck.function_scoped_fixture,
    ],
)


# ---------------------------------------------------------------------------
# scd2_merge == Python state machine
# ---------------------------------------------------------------------------

_texts = st.sampled_from(["a", "b", "c", ""])


@st.composite
def _scd2_case(draw):
    keys = draw(st.lists(st.integers(0, 8), unique=True, max_size=8))
    # open subset + closed history rows + snapshot over overlapping keys
    open_rows = {
        k: draw(_texts) for k in keys if draw(st.booleans())
    }
    closed_rows = [
        (k, draw(_texts), 0, draw(st.integers(1, 5)))
        for k in keys
        if draw(st.booleans())
    ]
    snap_keys = draw(st.lists(st.integers(0, 10), unique=True, max_size=10))
    snap = {k: draw(_texts) for k in snap_keys}
    return open_rows, closed_rows, snap


@settings(max_examples=soak_examples(10), **_SETTINGS)
@given(case=_scd2_case())
def test_scd2_matches_python_state_machine(spark, case):
    open_rows, closed_rows, snap = case
    as_of = 10
    hist_pdf = pd.DataFrame(
        [(k, v, 0, None) for k, v in open_rows.items()] + list(closed_rows),
        columns=["k", "text", "valid_from", "valid_to"],
    )
    snap_pdf = pd.DataFrame(
        list(snap.items()) or [(None, None)], columns=["k", "text"]
    ).dropna(subset=["k"])
    hist = spark.createDataFrame(
        hist_pdf.astype({"valid_from": "int64", "valid_to": "Int64"}),
        schema="k long, text string, valid_from long, valid_to long",
    )
    snapshot = spark.createDataFrame(
        snap_pdf.astype({"k": "int64"}), schema="k long, text string"
    )

    def _norm(rows):
        # valid_to None -> -1 so tuples are totally ordered
        return sorted(
            (k, t, vf, -1 if vt is None else vt) for (k, t, vf, vt) in rows
        )

    got = _norm(
        (r["k"], r["text"], r["valid_from"], r["valid_to"])
        for r in scd2_merge(hist, snapshot, "k", ["text"], as_of=as_of).collect()
    )

    # python oracle: closed rows pass through; open rows close on change/
    # disappearance; added/changed keys open fresh rows
    exp = [(k, v, 0, vt) for (k, v, _vf, vt) in closed_rows]
    for k, v in open_rows.items():
        if k in snap and snap[k] == v:
            exp.append((k, v, 0, None))
        else:
            exp.append((k, v, 0, as_of))
    for k, v in snap.items():
        if k not in open_rows or open_rows[k] != v:
            exp.append((k, v, as_of, None))
    assert got == _norm(exp)


# ---------------------------------------------------------------------------
# hash_split laws
# ---------------------------------------------------------------------------


@settings(max_examples=soak_examples(10), **_SETTINGS)
@given(
    raw=st.lists(st.integers(1, 100), min_size=2, max_size=5),
    keys=st.lists(st.integers(-1000, 1000), unique=True, min_size=1, max_size=40),
    salt=st.sampled_from(["", "s1", "s2"]),
)
def test_hash_split_total_and_deterministic(spark, raw, keys, salt):
    total = sum(raw)
    weights = {f"s{i}": w / total for i, w in enumerate(raw)}
    pdf = pd.DataFrame({"k": keys})
    df = spark.createDataFrame(pdf)
    out1 = {r["k"]: r["split"] for r in hash_split(df, weights, "k", salt=salt).collect()}
    # every row assigned, to a declared split
    assert set(out1) == set(keys)
    assert set(out1.values()) <= set(weights)
    # independent of partitioning
    out2 = {
        r["k"]: r["split"]
        for r in hash_split(df.repartition(7), weights, "k", salt=salt).collect()
    }
    assert out1 == out2
    # python replication of the hash arithmetic
    for k, split in out1.items():
        frac = int(
            hashlib.md5((salt + str(k)).encode()).hexdigest()[:13], 16
        )
        cum = 0.0
        exp = list(weights)[-1]
        for name, w in list(weights.items())[:-1]:
            cum = cum + w
            if frac < cum * 4503599627370496.0:
                exp = name
                break
        assert split == exp


# ---------------------------------------------------------------------------
# chunk_documents == python chunker
# ---------------------------------------------------------------------------


@settings(max_examples=soak_examples(10), **_SETTINGS)
@given(
    ns=st.lists(st.integers(1, 60), min_size=1, max_size=8),
    w=st.integers(2, 20),
    data=st.data(),
)
def test_chunking_matches_python(spark, ns, w, data):
    o = data.draw(st.integers(0, w - 1))
    s = w - o
    texts = [" ".join(f"w{j}" for j in range(n)) for n in ns]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["start_tok"], r["end_tok"], r["chunk_text"])
        for r in chunk_documents(df, w, overlap=o).collect()
    )
    exp = []
    for d, text in enumerate(texts):
        toks = text.split(" ")
        n = len(toks)
        n_chunks = 1 if n <= w else 1 + (n - w + s - 1) // s
        for i in range(n_chunks):
            start, end = i * s, min(i * s + w, n)
            exp.append((d, i, start, end, " ".join(toks[start:end])))
    assert got == sorted(exp)


# ---------------------------------------------------------------------------
# bm25 == python BM25
# ---------------------------------------------------------------------------


@settings(max_examples=soak_examples(10), **_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["x", "y", "z", "q"]), min_size=1, max_size=8),
        min_size=1,
        max_size=8,
    ),
    terms=st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=3),
)
def test_bm25_matches_python(spark, docs, terms):
    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {
        r["doc_id"]: (r["hit_terms"], r["bm25"])
        for r in bm25_scores(df, terms, "text", "doc_id").collect()
    }
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    uterms = list(dict.fromkeys(terms))
    df_ct = {t: sum(1 for d in docs if t in d) for t in uterms}
    exp = {}
    for i, d in enumerate(docs):
        s, hits = 0.0, 0
        for t in uterms:
            tf = d.count(t)
            if not tf:
                continue
            hits += 1
            idf = math.log(1.0 + (n - df_ct[t] + 0.5) / (df_ct[t] + 0.5))
            s += idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len(d) / avgdl))
        if hits:
            exp[i] = (hits, round(s, 6))
    assert got == exp
