"""KMV (k-minimum-values / bottom-k) distinct-count sketch —
deterministic and engine-portable, unlike HLL.

Spark's `approx_count_distinct` (HyperLogLog++) is the right default
at scale, but its register layout is engine-internal: no other system
can recompute it, sketches can't be checked against an oracle, and
estimates change across Spark versions. The KMV sketch (Bar-Yossef et
al. 2002; the bottom-k variant of the theta sketch family) trades a
little accuracy (rel. err ≈ 1/√(k−2)) for properties a data platform
actually wants:

- **deterministic & portable**: the sketch is the k smallest md5
  values of the distinct keys — any engine recomputes it bit-for-bit
  (the q74 oracle does, in SQL, including the estimate arithmetic);
- **mergeable**: bottom-k of a union = bottom-k of the unioned
  bottom-k's, so per-partition / per-day sketches combine exactly —
  the cross-shard distinct-count use case;
- **scale-shaped**: building it is map-side dedup + a global bottom-k
  (TakeOrderedAndProject: per-partition heap of k rows + driver merge
  of k×partitions), never a full sort, never a big shuffle.

Estimator: with M = 16^13 (13 hex chars = 52 bits, exact in a double)
and h(k) the k-th smallest hash mapped to [0, M), the estimate is
(k−1)·M / h(k); when fewer than k distinct hashes exist the sketch is
the exhaustive hash set and the count is EXACT. The hex→numeric
conversion is integer-valued and < 2^53, hence exact in a double on
every engine regardless of how it's computed — Spark uses `conv`, the
oracle a per-character list_reduce fold — so estimates agree
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 16^13 = 2^52 — the hash-space size used by the estimator; every
#: integer in range is exact in a double on every engine.
M = float(16 ** 13)


def _hex13_to_double(col: Column) -> Column:
    """First 13 hex chars → numeric value in [0, 16^13) as a double —
    exact (52-bit integer), so any engine computes the same number."""
    return F.conv(F.substring(col, 1, 13), 16, 10).cast("double")


def kmv_sketch(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """The sketch itself: ≤ k rows of (hx) — the k smallest md5 hex
    digests over the column's DISTINCT non-NULL values (NULL is
    excluded, matching COUNT(DISTINCT) semantics — and md5(NULL)'s
    NULL would otherwise grab a bottom-k slot under Spark's
    NULLS-FIRST ascending sort while DuckDB sorts NULLS LAST).
    Fixed-width hex sorts lexicographically = numerically, so the
    bottom-k needs no numeric conversion. Union two sketches and
    re-apply ``kmv_sketch``'s tail (bottom-k over hx) to merge
    exactly."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.md5(F.col(col).cast("string")).alias("hx"))
        .dropDuplicates(["hx"])
        .orderBy("hx")
        .limit(k)
    )


def merge_sketches(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Exact sketch union: bottom-k over the combined hash sets."""
    return a.unionByName(b).dropDuplicates(["hx"]).orderBy("hx").limit(k)


def estimate_expr(k: int) -> Column:
    """The KMV estimator as a column over (n_hashes, kth_hash) — the
    ONE definition every surface shares (global estimate, merged-sketch
    estimate, per-window batch twin, and the q74/q76 oracles' SQL
    mirror): exact below k, else (k−1)·M / h(k), rounded to 6."""
    return (
        F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double"))
        .otherwise(
            F.round(
                F.lit(float(k - 1)) * F.lit(M) / _hex13_to_double(F.col("kth_hash")),
                6,
            )
        )
        .alias("estimate")
    )


def kmv_distinct_estimate(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One row: (n_hashes, kth_hash, estimate). ``estimate`` is the
    KMV distinct-count estimate rounded to 6 places; exact (= n_hashes)
    when the column has fewer than k distinct values."""
    return estimate_from_sketch(kmv_sketch(df, col, k), k)


def kmv_set_relations(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    k: int = 256,
) -> DataFrame:
    """Theta-sketch-style set relations between two key sets from their
    KMV sketches: one row (n_union_sample, n_inter_sample, est_union,
    est_intersection, jaccard).

    θ is the smaller of the two sketches' maxima: at hashes ≤ θ each
    sketch is a COMPLETE record of its set's hashes (a bottom-k sketch
    contains every hash up to its own maximum), so the ≤θ union and
    intersection are exact samples of the real union/intersection at
    sampling rate ~θ/M. Estimates scale by M/θ; jaccard is the sample
    ratio (inclusive θ keeps the θ element itself in the sample, so
    identical singleton sets correctly give jaccard 1.0). Estimating
    corpus overlap (yesterday's crawl vs today's) this way costs two
    bottom-k scans and a k-row join instead of a full-table join — the
    two k-row sketches are persisted so theta/union/intersection reuse
    them instead of re-scanning the base tables (release via the
    result's ``cleanup()``). Accuracy degrades when the true distinct
    counts are ≲ k (the sketches stop being saturated and θ drifts
    up); in that regime just count exactly.

    Empty-input behavior: if ONE input is empty, ``least`` skips its
    NULL max so θ falls back to the other sketch's max — the correct
    degenerate answer (est_union ≈ the non-empty set's estimate,
    est_intersection 0, jaccard 0). If BOTH are empty, every output is
    zero (the NULL-θ scale is coalesced away)."""
    from .cache import attach_cleanup

    a = kmv_sketch(df_a, col_a, k).withColumnRenamed("hx", "ha").persist()
    b = kmv_sketch(df_b, col_b, k).withColumnRenamed("hx", "hb").persist()
    theta = (
        a.agg(F.max("ha").alias("ma"))
        .crossJoin(b.agg(F.max("hb").alias("mb")))
        .select(F.least("ma", "mb").alias("theta"))
    )
    # fixed-width hex compares lexicographically = numerically
    a_below = a.crossJoin(F.broadcast(theta)).filter(F.col("ha") <= F.col("theta"))
    b_below = b.crossJoin(F.broadcast(theta)).filter(F.col("hb") <= F.col("theta"))
    union_n = (
        a_below.select(F.col("ha").alias("hx"))
        .unionByName(b_below.select(F.col("hb").alias("hx")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_union_sample"))
    )
    inter_n = (
        a_below.select(F.col("ha").alias("hx"))
        .join(b_below.select(F.col("hb").alias("hx")), on="hx")
        .agg(F.count(F.lit(1)).alias("n_inter_sample"))
    )
    scale = F.lit(M) / _hex13_to_double(F.col("theta"))
    out = (
        union_n.crossJoin(inter_n)
        .crossJoin(theta)
        .select(
            "n_union_sample",
            "n_inter_sample",
            # coalesce: theta is NULL iff BOTH inputs are empty, where
            # the samples are 0 and the estimates must be 0.0, not NULL
            F.coalesce(
                F.round(F.col("n_union_sample") * scale, 6), F.lit(0.0)
            ).alias("est_union"),
            F.coalesce(
                F.round(F.col("n_inter_sample") * scale, 6), F.lit(0.0)
            ).alias("est_intersection"),
            F.when(F.col("n_union_sample") == 0, F.lit(0.0))
            .otherwise(
                F.round(F.col("n_inter_sample") / F.col("n_union_sample"), 6)
            )
            .alias("jaccard"),
        )
    )
    return attach_cleanup(out, a, b)


def estimate_from_sketch(sketch: DataFrame, k: int) -> DataFrame:
    """(n_hashes, kth_hash, estimate) from an existing (possibly
    merged) sketch frame — the distributed-merge read path."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_hashes"), F.max("hx").alias("kth_hash")
    )
    return agg.select("n_hashes", "kth_hash", estimate_expr(k))


def hash_sampled_quantiles(
    df: DataFrame,
    value_col: str,
    key_col: str,
    quantiles: list[float],
    rate: float = 1.0 / 16,
) -> DataFrame:
    """Deterministic sampled quantiles — the sketch-path complement of
    ranking.exact_percentiles (q65's exact distributed recipe).

    The sample is a HASH-Bernoulli subset: keep rows whose
    md5(key_col) maps below ``rate`` of the hash space — the same
    deterministic, engine-portable device as the KMV sketch, so any
    engine (the q78 DuckDB oracle included) reproduces the sample
    bit-for-bit; no RNG, no seed drift, stable under retries and
    re-partitioning. The quantiles of the sample are then computed
    EXACTLY with the distributed ranking recipe on ~rate·n rows.

    Why not Spark's percentile_approx: its KLL-ish buffer is bounded
    but engine-internal — no other system can recompute or audit it.
    Here the estimator is two auditable pieces: a reproducible sample
    predicate and an exact quantile definition (inverse-CDF at
    ceil(q·m)). Sampling error ~ O(1/sqrt(rate·n)) in rank space;
    at 100 TB the shuffle shrinks by 1/rate and the sample predicate
    evaluates scan-side (JVM codegen, no Python crossing).

    Returns (q double, value) — the same shape as exact_percentiles.
    ``key_col`` must be a stable row identity (hashing the value
    itself would correlate the sample with the estimand). Rows with a
    NULL key are EXCLUDED from the sample population — md5(NULL) is
    NULL and the predicate drops it (the dsir.py treat-NULL-as-absent
    convention; a NULL identity cannot be deterministically hashed).
    A corpus with systematic NULL keys therefore estimates quantiles
    of the keyed subpopulation — pre-assign surrogate keys if that is
    not the intent."""
    if not 0 < rate <= 1:
        raise ValueError(f"rate must be in (0, 1], got {rate}")
    cut = F.lit(float(rate) * M)
    sampled = df.filter(
        _hex13_to_double(F.md5(F.col(key_col).cast("string"))) < cut
    )
    from .ranking import exact_percentiles

    return exact_percentiles(
        sampled, value_col, quantiles, tiebreak=F.col(key_col)
    )
