"""Property test for the one-call ``dedup_corpus`` composition GLUE
(r16 — the q50 `survivors` oracle's in-suite twin): on corpora with
randomized planted structure, the survivor set equals the Python
reference exactly.

Construction keeps every pair's Jaccard far from the 0.5 threshold so
the property tests the COMPOSITION (exact collapse -> pairs over
survivors -> components -> min-id retention), not LSH band-curve luck:

- each near-dup group uses a group-private token namespace (cross-
  group J = 0), copy j = base + j trailing edit tokens (within-group
  J >= 0.5 for the sizes drawn — the construction the 1x/10x/100x
  growth probe verified exhaustively at tools/growth_probe_dedup_corpus.py);
- exact duplicates are byte-identical copies (exercise the stage-1
  collapse and its keep-min interplay with the cluster min);
- doc ids are assigned by a drawn PERMUTATION, so "min id per group"
  is a nontrivial pick (a fixed layout would let an off-by-one in the
  retention anti-join hide).

Expected survivors = min assigned id per group + every singleton.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import soak_examples

from pandasql_spark.operators.dedup import dedup_corpus


@st.composite
def planted_corpus(draw):
    texts: list[tuple[int, str]] = []  # (group_key, text); -1 = singleton
    n_groups = draw(st.integers(min_value=0, max_value=3))
    for g in range(n_groups):
        base_len = draw(st.integers(min_value=25, max_value=32))
        base = " ".join(f"g{g}_{k}" for k in range(base_len))
        n_exact = draw(st.integers(min_value=0, max_value=2))
        edit_js = draw(
            st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=4)
        )
        for _ in range(n_exact):
            texts.append((g, base))
        for j in edit_js:
            texts.append((g, base + "".join(f" e{g}_{x}" for x in range(j))))
    n_single = draw(st.integers(min_value=0, max_value=4))
    for s in range(n_single):
        texts.append((-1 - s, " ".join(f"u{s}_{k}" for k in range(20))))
    if not texts:
        texts.append((-99, " ".join(f"z_{k}" for k in range(20))))
    perm = draw(st.permutations(list(range(len(texts)))))
    rows = [(perm[i] * 7 + 3, grp, txt) for i, (grp, txt) in enumerate(texts)]
    return rows


def _expected_survivors(rows):
    by_group: dict[int, list[int]] = {}
    survivors = set()
    for did, grp, _ in rows:
        if grp < 0:
            survivors.add(did)
        else:
            by_group.setdefault(grp, []).append(did)
    # within a group: exact copies collapse keep-min, then the whole
    # group is one J>=0.5 component whose min-id representative wins —
    # either way the group's global minimum id survives, nothing else
    for dids in by_group.values():
        survivors.add(min(dids))
    return survivors


@settings(
    # 5 examples keeps this inside the property-suite ~16 s warm budget
    # (~3 s of Spark work per example); breadth comes from the oracle
    # gate + the 1x/10x/100x growth probe on the same construction
    max_examples=soak_examples(5),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(rows=planted_corpus())
def test_dedup_corpus_survivors_match_reference(spark, rows):
    pdf = pd.DataFrame(
        [(d, t) for d, _, t in rows], columns=["doc_id", "text"]
    )
    out = dedup_corpus(
        spark.createDataFrame(pdf), threshold=0.5, num_bands=32
    )
    got = {r["doc_id"] for r in out.select("doc_id").collect()}
    want = _expected_survivors(rows)
    assert got == want, (rows, got, want)
