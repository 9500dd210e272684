"""Scalar (int8-range) embedding quantization — the first storage move
for a 100 TB vector corpus: 4-8× smaller embedding columns with a
bounded, per-vector reconstruction error, before anything fancier
(PQ/OPQ) is justified.

Per-vector affine min/max quantization: codes q = round((x - lo)/scale)
in [0, 255] with lo = min(x), scale = (max(x) - lo)/255. Every step is
a JVM-side higher-order function (transform/aggregate) — ZERO shuffles,
pure codegen, and the arithmetic is the same IEEE sequence on any
engine, so the q89 oracle hash-matches the codes themselves, not just
summary stats. Constant vectors (max == min) quantize to all-zero codes
with scale 0 and reconstruct exactly.

Reference scope: the reference engine has no vector surface at all
(SURVEY.md §2); beyond-reference inventory, composing with the
similarity/ANN stack (functions/similarity.py, operators/ann.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lo(vec: Column) -> Column:
    return F.array_min(vec)


def _scale(vec: Column) -> Column:
    return (F.array_max(vec) - F.array_min(vec)) / F.lit(255.0)


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "codes",
) -> DataFrame:
    """(id, codes array<int> in [0,255], lo, scale) — the compressed
    representation plus the two doubles needed to dequantize."""
    vec = F.col(vec_col).cast("array<double>")
    lo, scale = _lo(vec), _scale(vec)
    codes = F.when(scale == 0.0, F.transform(vec, lambda _: F.lit(0))).otherwise(
        F.transform(vec, lambda x: F.round((x - lo) / scale).cast("int"))
    )
    return df.select(
        F.col(id_col),
        codes.alias(code_col),
        lo.alias("lo"),
        scale.alias("scale"),
    )


def dequantize_embeddings(
    df: DataFrame,
    code_col: str = "codes",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Inverse map: x' = lo + codes*scale. Error is bounded by scale/2
    per dimension (round-to-nearest of the affine image)."""
    return df.select(
        F.col(id_col),
        F.transform(
            F.col(code_col), lambda q: F.col("lo") + q * F.col("scale")
        ).alias(vec_col),
    )


def quantization_report(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector quantization audit: (id, dim, lo, scale, max_abs_err,
    code fingerprint). max_abs_err is the TRUE reconstruction error
    (recomputed against the original vector in the same pass — still
    zero-shuffle); the ``scale/2`` bound holds by construction and is
    asserted in tests, measured here."""
    vec = F.col(vec_col).cast("array<double>")
    lo, scale = _lo(vec), _scale(vec)
    codes = F.when(scale == 0.0, F.transform(vec, lambda _: F.lit(0))).otherwise(
        F.transform(vec, lambda x: F.round((x - lo) / scale).cast("int"))
    )
    recon_err = F.zip_with(
        vec,
        codes,
        lambda x, q: F.abs(x - (lo + q.cast("double") * scale)),
    )
    return df.select(
        F.col(id_col),
        F.size(vec).cast("long").alias("dim"),
        F.round(lo, 6).alias("lo"),
        F.round(scale, 6).alias("scale"),
        F.round(F.array_max(recon_err), 6).alias("max_abs_err"),
        F.md5(F.array_join(F.transform(codes, lambda q: q.cast("string")), ",")).alias(
            "code_fp"
        ),
    )
