"""Sequence-packing tests: differential vs a pandas cumsum oracle, the
token-conservation/utilization invariants, and the distributed running
sum against its single-machine twin."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import soak_examples

from pandasql_spark.operators.packing import chunk_utilization, pack_chunks
from pandasql_spark.operators.ranking import with_global_running_sum

SF = "/root/testdata/sf0.001"


def _pandas_pack(pdf: pd.DataFrame, L: int) -> pd.DataFrame:
    """Single-machine oracle: cumsum + per-doc chunk expansion."""
    pdf = pdf[pdf.n_tokens > 0].sort_values("doc_id").reset_index(drop=True)
    cend = pdf.n_tokens.cumsum()
    cstart = cend - pdf.n_tokens
    rows = []
    for doc, n, s, e in zip(pdf.doc_id, pdf.n_tokens, cstart, cend):
        for c in range(s // L, (e - 1) // L + 1):
            rows.append(
                {
                    "doc_id": doc,
                    "chunk_id": c,
                    "piece_start": max(0, c * L - s),
                    "piece_end": min(n, (c + 1) * L - s),
                    "chunk_pos": max(0, s - c * L),
                }
            )
    return pd.DataFrame(
        rows, columns=["doc_id", "chunk_id", "piece_start", "piece_end", "chunk_pos"]
    )


def _sorted(pdf):
    return pdf.sort_values(["doc_id", "chunk_id"], ignore_index=True).sort_index(
        axis=1
    )


def test_matches_pandas_oracle(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {"doc_id": range(500), "n_tokens": rng.integers(0, 300, 500)}
    )
    df = spark.createDataFrame(pdf).repartition(8)
    got = _sorted(pack_chunks(df, 128).toPandas())
    exp = _sorted(_pandas_pack(pdf, 128))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_invariants_and_utilization(spark):
    rng = np.random.default_rng(4)
    pdf = pd.DataFrame(
        {"doc_id": range(200), "n_tokens": rng.integers(1, 90, 200)}
    )
    L = 64
    df = spark.createDataFrame(pdf).repartition(5)
    packed = pack_chunks(df, L)
    out = packed.toPandas()
    # token conservation: pieces partition each doc exactly
    per_doc = out.groupby("doc_id").apply(
        lambda g: (g.piece_end - g.piece_start).sum(), include_groups=False
    )
    assert (per_doc == pdf.set_index("doc_id").n_tokens).all()
    # pieces within a doc are contiguous ascending
    for _, g in out.sort_values("chunk_id").groupby("doc_id"):
        assert g.piece_start.iloc[0] == 0
        assert (g.piece_end.iloc[:-1].values == g.piece_start.iloc[1:].values).all()
    # every chunk except the last is exactly full (zero padding waste)
    util = (
        chunk_utilization(pack_chunks(df, L), L)
        .toPandas()
        .sort_values("chunk_id")
    )
    assert (util.n_tokens.iloc[:-1] == L).all()
    assert util.n_tokens.iloc[-1] <= L
    # chunk ids are dense 0..K
    assert list(util.chunk_id) == list(range(len(util)))


def test_running_sum_matches_pandas(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({"k": range(1000), "v": rng.integers(-50, 50, 1000)})
    df = spark.createDataFrame(pdf).repartition(7)
    got = (
        with_global_running_sum(df, ["k"], "v", out_col="rs")
        .toPandas()
        .sort_values("k", ignore_index=True)
    )
    assert list(got["rs"]) == list(pdf.sort_values("k").v.cumsum())


def test_chunk_tokens_guard(spark):
    df = spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit(5).alias("n_tokens")
    )
    with pytest.raises(ValueError, match="chunk_tokens"):
        pack_chunks(df, 0)


@settings(
    max_examples=soak_examples(18),
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.data_too_large,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(
    tokens=st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=40),
    L=st.sampled_from([1, 2, 7, 16]),
    parts=st.integers(min_value=1, max_value=4),
)
def test_property_matches_pandas(spark, tokens, L, parts):
    """Tiny L and zero-token docs force every boundary case: docs
    spanning many chunks, docs exactly on a boundary, empty docs."""
    pdf = pd.DataFrame({"doc_id": range(len(tokens)), "n_tokens": tokens})
    df = spark.createDataFrame(pdf).repartition(parts)
    got = _sorted(pack_chunks(df, L).toPandas())
    exp = _sorted(_pandas_pack(pdf, L))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_custom_order_and_all_empty_docs(spark):
    # packing by a priority column instead of id order
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "n_tokens": [4, 4, 4], "prio": [3, 1, 2]}
    )
    df = spark.createDataFrame(pdf)
    out = (
        pack_chunks(df, 8, order_by=["prio", "doc_id"])
        .toPandas()
        .sort_values(["chunk_id", "chunk_pos"], ignore_index=True)
    )
    # prio order 2,3,1 → chunk 0 holds docs 2 and 3, chunk 1 holds doc 1
    assert list(out.doc_id) == [2, 3, 1]
    assert list(out.chunk_id) == [0, 0, 1]
    # all-zero-token input produces an empty assignment, not an error
    empty = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "n_tokens": [0, 0]})
    )
    assert pack_chunks(empty, 8).count() == 0


def test_running_sum_float_values(spark):
    """Float value columns must carry float partition offsets — int
    truncation of per-partition sums would corrupt every partition
    after the first."""
    pdf = pd.DataFrame({"k": range(400), "v": [0.1] * 400})
    df = spark.createDataFrame(pdf).repartition(6)
    got = (
        with_global_running_sum(df, ["k"], "v", out_col="rs")
        .toPandas()
        .sort_values("k", ignore_index=True)
    )
    exp = pdf.v.cumsum()
    assert np.allclose(got["rs"], exp, atol=1e-9)


def test_column_typed_order_by(spark):
    """order_by entries may be Column expressions (e.g. F.desc)."""
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "n_tokens": [4, 4, 4], "prio": [3, 1, 2]})
    df = spark.createDataFrame(pdf)
    out = (
        pack_chunks(df, 8, order_by=[F.col("prio").desc(), "doc_id"])
        .toPandas()
        .sort_values(["chunk_id", "chunk_pos"], ignore_index=True)
    )
    # prio desc → docs 1, 3, 2
    assert list(out.doc_id) == [1, 3, 2]


# ---------------------------------------------------------------------------
# chunk_documents (per-doc sliding windows, RAG prep)


def _py_chunks(text: str, w: int, o: int):
    toks = text.split(" ")
    n, s = len(toks), w - o
    n_chunks = 1 if n <= w else 1 + (n - w + s - 1) // s
    out = []
    for i in range(n_chunks):
        start, end = i * s, min(i * s + w, n)
        out.append((i, start, end, " ".join(toks[start:end])))
    return out


def test_chunk_documents_matches_python(spark):
    from pandasql_spark.operators.packing import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["start_tok"], r["end_tok"], r["chunk_text"])
        for r in chunk_documents(docs, 32, overlap=8).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        for i, start, end, txt in _py_chunks(row["text"], 32, 8):
            assert got[(row["doc_id"], i)] == (start, end, txt)
    assert len(got) == sum(
        len(_py_chunks(r["text"], 32, 8))
        for r in docs.select("text").collect()
    )


def test_chunk_documents_invariants(spark):
    """Coverage, overlap width, and no-contained-tail over generated
    shapes."""
    from pandasql_spark.operators.packing import chunk_documents

    import pandas as _pd

    texts = [" ".join(f"t{j}" for j in range(n)) for n in
             [1, 2, 7, 8, 9, 15, 16, 17, 31, 100]]
    d = spark.createDataFrame(
        _pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    for w, o in [(8, 0), (8, 4), (8, 7), (16, 5)]:
        rows = chunk_documents(d, w, overlap=o).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for doc_id, chunks in by_doc.items():
            chunks.sort(key=lambda r: r["chunk_idx"])
            n = len(texts[doc_id].split(" "))
            assert chunks[0]["start_tok"] == 0
            assert chunks[-1]["end_tok"] == n
            for a, b in zip(chunks, chunks[1:]):
                assert b["start_tok"] - a["start_tok"] == w - o  # stride
                assert a["end_tok"] > b["start_tok"] or o == 0 and a["end_tok"] == b["start_tok"]
                assert not (b["start_tok"] >= a["start_tok"] and b["end_tok"] <= a["end_tok"])  # no contained tail
            # token coverage with no gaps
            covered = set()
            for c in chunks:
                covered.update(range(c["start_tok"], c["end_tok"]))
            assert covered == set(range(n))


def test_chunk_documents_zero_shuffle(spark):
    from pandasql_spark.operators.packing import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = chunk_documents(docs, 64, 16)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_documents_validation(spark):
    from pandasql_spark.operators.packing import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(docs, 0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, 8, overlap=8)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, 8, overlap=-1)


def test_pack_bpe_corpus_exact_stream(spark):
    """End-to-end text → training sequences: train a merge table on
    the corpus itself, pack at chunk_tokens=16, and verify EXACTNESS —
    concatenating chunks in chunk_id order reproduces the corpus's
    subword stream in doc_id order, every chunk but the last is full,
    and the totals agree with a driver-side re-encode."""
    from pandasql_spark.operators.bpe import encode_word, train_bpe
    from pandasql_spark.operators.packing import pack_bpe_corpus

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the bat and the cat chat"),
        (2, ""),                      # empty doc: zero tokens, no rows
        (3, "flat rat splat"),
        (4, "the the the the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, n_merges=12)
    packed = pack_bpe_corpus(df, merges, chunk_tokens=16)
    got = sorted(
        ((r.chunk_id, list(r.tokens), r.n_tokens) for r in packed.collect())
    )

    want_stream = []
    for _id, text in rows:
        for w in text.split(" "):
            if w:
                want_stream.extend(encode_word(w, merges))
    got_stream = [t for _, toks, _ in got for t in toks]
    assert got_stream == want_stream
    sizes = [n for _, _, n in got]
    assert all(n == 16 for n in sizes[:-1]) and 0 < sizes[-1] <= 16
    packed.cleanup()
