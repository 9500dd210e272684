"""Property tests for two operator-level THEOREMS:

1. Winnowing guarantee (Schleimer et al.): two documents sharing a run
   of >= w+k-1 tokens share at least one fingerprint. Random docs with a
   planted shared span probe the window/shingle boundary arithmetic that
   fixtures miss.
2. connected_components equals a union-find reference on random edge
   lists — including long chains, whose label-graph diameter stresses
   the iteration bound, and singleton self-edges.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import soak_examples

from pandasql_spark.functions.text import winnowing_fingerprints
from pandasql_spark.operators.cluster import connected_components

K, W = 3, 4
VOCAB = [f"w{i}" for i in range(30)]


@st.composite
def doc_pairs_with_shared_run(draw):
    run_len = draw(st.integers(min_value=W + K - 1, max_value=W + K + 6))
    run = [draw(st.sampled_from(VOCAB)) for _ in range(run_len)]
    def pad():
        n = draw(st.integers(min_value=0, max_value=10))
        return [draw(st.sampled_from(VOCAB)) for _ in range(n)]
    a = pad() + run + pad()
    b = pad() + run + pad()
    return " ".join(a), " ".join(b)


@settings(
    max_examples=soak_examples(25),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(pair=doc_pairs_with_shared_run())
def test_winnowing_shared_run_guarantee(spark, pair):
    a, b = pair
    pdf = pd.DataFrame({"doc_id": [0, 1], "text": [a, b]})
    got = (
        spark.createDataFrame(pdf)
        .select("doc_id", winnowing_fingerprints("text", K, W).alias("fp"))
        .toPandas()
        .set_index("doc_id")["fp"]
    )
    assert set(got[0]) & set(got[1]), (a, b)


@st.composite
def edge_lists(draw):
    n_nodes = draw(st.integers(min_value=1, max_value=20))
    n_edges = draw(st.integers(min_value=1, max_value=30))
    edges = [
        (
            draw(st.integers(min_value=0, max_value=n_nodes - 1)),
            draw(st.integers(min_value=0, max_value=n_nodes - 1)),
        )
        for _ in range(n_edges)
    ]
    # a worst-case chain to stress diameter (min label must travel far)
    if draw(st.booleans()):
        chain = list(range(n_nodes))
        edges += list(zip(chain, chain[1:]))
    return edges


def _uf_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(
    max_examples=soak_examples(15),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(edges=edge_lists())
def test_connected_components_matches_union_find(spark, edges):
    pdf = pd.DataFrame(edges, columns=["id_a", "id_b"])
    got = (
        connected_components(spark.createDataFrame(pdf), max_iter=40)
        .toPandas()
        .set_index("node")["cluster_id"]
        .to_dict()
    )
    want = _uf_components(edges)
    assert got == want, (edges, got, want)
