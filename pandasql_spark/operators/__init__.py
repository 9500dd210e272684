"""Custom operators beyond the reference's surface: deduplication,
similarity pair-mining, multimodal column plumbing.

Each operator is expressed as a composition of DataFrame ops where
semantics allow (MinHash/LSH/Jaccard are pure JVM-side column
expressions + joins), dropping to Arrow-batched pandas UDFs only where
per-row bit manipulation genuinely beats expression trees (SimHash).
"""

from . import (
    ann,
    asof,
    bpe,
    bucketing,
    caps,
    cluster,
    contamination,
    curation,
    dedup,
    delta,
    freq,
    lm,
    multimodal,
    packing,
    rangejoin,
    ranking,
    report,
    repetition,
    sampling,
    semantic,
    sketch,
    skew,
    zorder,
)

__all__ = [
    "ann",
    "asof",
    "bpe",
    "bucketing",
    "caps",
    "cluster",
    "contamination",
    "curation",
    "dedup",
    "delta",
    "freq",
    "lm",
    "multimodal",
    "packing",
    "rangejoin",
    "ranking",
    "report",
    "repetition",
    "sampling",
    "semantic",
    "sketch",
    "skew",
    "zorder",
]
