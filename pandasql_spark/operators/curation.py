"""One-call corpus curation: the standard pretraining prep pipeline as
a composition of this package's operators, in the canonical order —

    1. quality gate      (token-count bounds; cheap filters first so
                          every later stage scans less)
    2. exact dedup       (normalized-text fingerprint, keep lowest id)
    3. decontamination   (drop docs sharing word n-grams with the
                          held-out eval set)
    4. mixture resample  (optional: apply a domain-weight recipe to a
                          row budget)

Each stage is an operator that already carries its own oracle-gated
query (q16/q19/q66/q70); the composition is gated end-to-end as q71,
whose DuckDB oracle chains the same four stages in SQL. Plan shape:
stage 1 is a pushable scan filter; stage 2 one fingerprint shuffle;
stage 3 a broadcast anti-join (eval n-grams are tiny by nature);
stage 4 one stratum-key shuffle — nothing quadratic, nothing
driver-bound, every stage's 100 TB argument inherited from its
operator's own SCALING.md entry.

Reference scope note: beyond-reference surface; the reference engine
has no curation pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, token_count
from .contamination import contaminated_docs
from .sampling import resample_to_mixture


def curate_corpus(
    df: DataFrame,
    eval_df: DataFrame | None = None,
    min_tokens: int = 1,
    max_tokens: int | None = None,
    ngram_n: int = 13,
    hashed: bool = True,
    mixture: dict[str, float] | None = None,
    total_n: int | None = None,
    stratum_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-gate, dedup, decontaminate, and (optionally) resample a
    document corpus; returns surviving rows with the input columns.

    ``eval_df=None`` skips decontamination; ``mixture=None`` (or
    ``total_n=None``) skips resampling. ``hashed=False`` joins
    contamination n-grams as raw strings (engine-portable — what the
    q71 oracle uses) instead of xxhash64 keys."""
    tc = token_count(text_col)
    out = df.filter(tc >= min_tokens)
    if max_tokens is not None:
        out = out.filter(tc <= max_tokens)

    # exact dedup, keep-lowest-id: one shuffle on the 16-byte fingerprint
    keep = (
        out.groupBy(fingerprint(text_col).alias("__fp"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    out = out.join(keep, on=id_col, how="semi")

    if eval_df is not None:
        flagged = contaminated_docs(
            out, eval_df, n=ngram_n, text_col=text_col, id_col=id_col,
            hashed=hashed,
        ).select(id_col)
        out = out.join(flagged, on=id_col, how="anti")

    if mixture is not None and total_n is not None:
        out = resample_to_mixture(
            out, stratum_col=stratum_col, weights=mixture,
            total_n=total_n, id_col=id_col,
        )
    return out
