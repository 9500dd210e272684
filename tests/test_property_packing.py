"""Property test for pack_bpe_corpus: on random corpora and chunk
sizes, the packed chunk stream reproduces the corpus's subword stream
EXACTLY (the driver-side re-encode is the oracle), every chunk but the
last is full, and empty documents vanish without losing rows elsewhere
— probing chunk-boundary arithmetic across sizes the fixture test
can't."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import soak_examples

from pandasql_spark.operators.bpe import encode_word, train_bpe
from pandasql_spark.operators.packing import pack_bpe_corpus

VOCAB = ["cat", "cats", "concat", "scatter", "dog", "", "a"]


@st.composite
def corpus_and_chunk(draw):
    n_docs = draw(st.integers(min_value=1, max_value=5))
    rows = []
    for i in range(n_docs):
        n_words = draw(st.integers(min_value=0, max_value=8))
        rows.append(
            (i, " ".join(draw(st.sampled_from(VOCAB)) for _ in range(n_words)))
        )
    chunk = draw(st.integers(min_value=1, max_value=24))
    return rows, chunk


_MERGES = None


def _merges(spark):
    # train ONCE on a fixed corpus covering the vocab — the exactness
    # oracle (encode_word with the same merges) is valid for ANY packed
    # corpus, and keeping train_bpe out of the example loop keeps the
    # suite inside the per-test budget
    global _MERGES
    if _MERGES is None:
        fixed = spark.createDataFrame(
            [(i, w) for i, w in enumerate(VOCAB) if w],
            "doc_id long, text string",
        )
        _MERGES = train_bpe(fixed, n_merges=6)
    return _MERGES


@settings(
    max_examples=soak_examples(10),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(cc=corpus_and_chunk())
def test_pack_bpe_corpus_stream_exact(spark, cc):
    rows, chunk = cc
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = _merges(spark)
    packed = pack_bpe_corpus(df, merges, chunk_tokens=chunk)
    got = sorted(
        (r.chunk_id, list(r.tokens), r.n_tokens) for r in packed.collect()
    )
    packed.cleanup()

    want = []
    for _id, text in rows:
        for w in text.split(" "):
            if w:
                want.extend(encode_word(w, merges))
    got_stream = [t for _, toks, _ in got for t in toks]
    assert got_stream == want
    sizes = [n for _, _, n in got]
    if want:
        assert all(n == chunk for n in sizes[:-1])
        assert 0 < sizes[-1] <= chunk
        assert [c for c, _, _ in got] == list(range(len(sizes)))
    else:
        assert got == []
