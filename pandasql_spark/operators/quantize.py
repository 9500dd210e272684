"""Scalar (int8-range) embedding quantization — the first storage move
for a 100 TB vector corpus: 4-8× smaller embedding columns with a
bounded, per-vector reconstruction error, before anything fancier
(PQ/OPQ) is justified.

Per-vector affine min/max quantization: codes q = round((x - lo)/scale)
in [0, 255] with lo = min(x), scale = (max(x) - lo)/255. Two kernels
with bit-identical results (same IEEE sequence; round is exact
half-up via fractional-part comparison, never floor(t + 0.5) whose
addition can misround at the boundary):

- ``impl="numpy"`` (default): Arrow-batched mapInPandas — vectorized
  BLAS-style array math. Higher-order functions run INTERPRETED in
  Spark (measured: the expr path is exactly linear at ~100 µs/vector,
  3× of it the md5-over-string-casts audit column), so the Arrow
  kernel is the production path, same trade the repetition/semantic
  operators made.
- ``impl="expr"``: pure column higher-order functions — zero Python,
  and the form the q89 DuckDB oracle mirrors 1:1. The equality of the
  two impls is asserted in tests (the repo's kernel/parity pattern).

Everything is one scan, ZERO shuffles either way. Constant vectors
(max == min) quantize to all-zero codes with scale 0 and reconstruct
exactly.

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


def _codes(vec: Column, lo: Column, scale: Column) -> Column:
    return F.when(scale == 0.0, F.transform(vec, lambda _: F.lit(0))).otherwise(
        F.transform(vec, lambda x: F.round((x - lo) / scale).cast("int"))
    )


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
    return df.select(
        F.col(id_col),
        _codes(vec, lo, scale).alias(code_col),
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
    impl: str = "numpy",
) -> DataFrame:
    """Per-vector quantization audit: (id, dim, lo, scale, max_abs_err,
    code fingerprint). max_abs_err is the TRUE reconstruction error
    (recomputed against the original vector in the same pass — still
    zero-shuffle); the ``scale/2`` bound holds by construction and is
    asserted in tests, measured here. See module doc for the
    numpy/expr kernel contract."""
    if impl not in ("numpy", "expr"):
        raise ValueError(f"impl must be 'numpy' or 'expr', got {impl!r}")
    if impl == "expr":
        vec = F.col(vec_col).cast("array<double>")
        lo, scale = _lo(vec), _scale(vec)
        codes = _codes(vec, lo, scale)
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
            F.md5(
                F.array_join(F.transform(codes, lambda q: q.cast("string")), ",")
            ).alias("code_fp"),
        )

    id_type = next(f.dataType.simpleString() for f in df.schema.fields
                   if f.name == id_col)
    schema = (f"{id_col} {id_type}, dim long, lo double, scale double, "
              "max_abs_err double, code_fp string")

    def kernel(it):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = {id_col: pdf[id_col], "dim": [], "lo": [], "scale": [],
                    "max_abs_err": [], "code_fp": []}
            for v in pdf[vec_col]:
                x = np.asarray(v, np.float64)
                if len(x) == 0:  # degenerate row: never a kernel crash
                    lo = hi = 0.0
                else:
                    lo, hi = x.min(), x.max()
                if hi == lo:
                    scale, q, err = 0.0, np.zeros(len(x), np.int64), 0.0
                else:
                    scale = (hi - lo) / 255.0
                    t = (x - lo) / scale
                    fl = np.floor(t)
                    # exact HALF_UP: frac = t - floor(t) is exact in
                    # IEEE; floor(t + 0.5) would misround when the
                    # addition itself rounds across the half boundary
                    q = (fl + (t - fl >= 0.5)).astype(np.int64)
                    err = float(np.abs(x - (lo + q * scale)).max())
                rows["dim"].append(len(x))
                rows["lo"].append(round(float(lo), 6))
                rows["scale"].append(round(float(scale), 6))
                rows["max_abs_err"].append(round(err, 6))
                rows["code_fp"].append(
                    hashlib.md5(
                        ",".join(str(int(c)) for c in q).encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, vec_col).mapInPandas(kernel, schema)
