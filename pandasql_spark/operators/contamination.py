"""Benchmark-contamination detection: find training documents that
share word n-grams with an evaluation set.

The standard pretraining-hygiene check (n-gram overlap between train
and eval corpora, typically n≈13 on words): any training document
containing an n-gram that also appears in any eval document is flagged
and usually dropped before training, so benchmark numbers measure
generalization rather than memorization.

Plan shape — the eval side is SMALL by nature (benchmarks are
thousands of docs, the corpus is billions), which makes this a
broadcast problem, not a shuffle problem:

1. distinct eval n-grams (hashed to 8-byte xxhash64 by default — the
   join key is the dominant byte cost at corpus scale);
2. explode the training corpus's n-grams — one codegen'd projection,
   no shuffle;
3. broadcast-join eval n-grams onto the exploded stream; per-doc
   groupBy counts the hits (map-side partial agg; only flagged docs'
   rows shuffle).

The corpus is scanned once and never shuffled by n-gram. If the eval
n-gram set outgrows broadcast range (it should not — even 10k docs ×
1k n-grams ≈ 80 MB of hashes), drop the broadcast hint and let AQE
decide. ``hashed=False`` joins on the raw n-gram string instead —
engine-portable, which is what the q66 gate's DuckDB oracle uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ngrams(text_col: str, n: int) -> Column:
    """Array of word n-grams of ``text_col`` (single-space tokens); docs
    shorter than n words produce no n-grams (nothing to match). One
    shared tokenization convention with the repetition signals — change
    it in repetition.word_ngrams and both q66 and q67 move together."""
    from .repetition import word_ngrams

    return word_ngrams(text_col, n)


def contaminated_docs(
    train_df: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = True,
) -> DataFrame:
    """(id_col, n_hits, n_distinct_hits): training docs sharing at least
    one word ``n``-gram with ANY eval document. ``n_hits`` counts
    matching n-gram occurrences in the training doc; ``n_distinct_hits``
    counts distinct matching n-grams."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    key = (lambda c: F.xxhash64(c)) if hashed else (lambda c: c)
    eval_grams = (
        eval_df.select(F.explode(_ngrams(text_col, n)).alias("g"))
        .select(key(F.col("g")).alias("k"))
        .distinct()
    )
    train_grams = train_df.select(
        id_col, F.explode(_ngrams(text_col, n)).alias("g")
    ).select(id_col, F.col("g"), key(F.col("g")).alias("k"))
    return (
        train_grams.join(F.broadcast(eval_grams), "k")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.count_distinct("g").alias("n_distinct_hits"),
        )
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = True,
) -> DataFrame:
    """``train_df`` minus every contaminated document (anti-join on the
    flagged id list — the tiny side of the join)."""
    flagged = contaminated_docs(
        train_df, eval_df, n, text_col, id_col, hashed
    ).select(id_col)
    return train_df.join(flagged, id_col, "anti")
