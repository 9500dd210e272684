"""SemDeDup-style semantic deduplication: cluster the embedding space,
then near-dup only WITHIN clusters (Abbas et al., arXiv:2303.09540).

The scale argument is the clustering itself: all-pairs cosine is
O(n²); clustering first bounds the pair work to Σ|cluster|², and the
per-cluster join is an equi-join on the cluster id — bucketed by
construction, never a cross join. With k ≈ √n cells of roughly even
size the pair stage is ~O(n^1.5), and each cluster's pairs co-locate
on one reducer.

Clustering is a deterministic distributed Lloyd's k-means —
deliberately NOT Spark ML's KMeans (whose k-means|| init and
aggregation order are not reproducible across engines), because the
q69 gate recomputes the whole pipeline in DuckDB SQL:

- init: the k lowest-``id_col`` vectors (bit-exact both engines);
- assignment: squared-euclidean argmin, ties to the lowest cell id.
  Default is an Arrow-batched BLAS kernel; the ``assign_impl="expr"``
  left-to-right ``zip_with``/``aggregate`` fold (mirrored by
  ``list_reduce`` in the oracle — identical fold order ⇒ identical
  doubles) is the bit-exact cross-check (see ``assign_cells``);
- update: per-cell per-dimension mean, ROUNDED to 6 decimals — the
  one place engines could drift (summation order in a mean is not
  associative); quantizing each iteration's centroids makes the
  fixpoint engine-portable. Empty cells carry their previous centroid
  forward.

Centroids live on the driver between iterations (k × dim doubles —
the same topology as Spark ML KMeans; at k ≈ √n = 10⁴ and dim 10³
that is ~80 MB, still driver-sized), so each assignment pass is a
ZERO-shuffle projection against literal centroid arrays; each update
is one partial-aggregated groupBy of (cell, dim) rows.

Dedup rule: within a cluster, drop x when some y with y.id < x.id has
round(cosine(x, y), 6) ≥ tau. Simple, deterministic, oracle-friendly;
for transitive keep-one-per-component semantics compose with
operators/cluster.py's connected components instead.
"""

from __future__ import annotations

from py4j.protocol import Py4JError
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import cosine


def _sq_dist(vec, centroid: list[float]):
    """Left-to-right fold of squared euclidean distance to a literal
    centroid (fold order mirrored by the DuckDB oracle)."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    diffs = F.zip_with(vec, c, lambda a, b: (a - b) * (a - b))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "numpy",
) -> DataFrame:
    """Tag every row with the nearest centroid's index (``cid``) — one
    pass over the data, no shuffle either way. Ties go to the lowest
    cid (``np.argmin`` keeps the first minimum; the expr path's min
    over (dist, cid) structs orders lexicographically — identical).

    ``impl="numpy"`` (default) is an Arrow-batched ``mapInPandas``
    kernel: distances via one BLAS slab per batch. The ``impl="expr"``
    fold path (k × dim interpreted HOF ops per row — measured ~1 s per
    pass on 5k×64 vs ~0.1 s batched) mirrors the q69 oracle's
    ``list_reduce`` bit-for-bit and remains the cross-check. BLAS vs
    fold summation differs by last-ulp amounts; an argmin flip needs a
    near-exact distance tie between two centroids, which quantized
    centroids and real data don't produce (equality regression-tested
    corpus-wide, and the q69 gate value-checks end-to-end)."""
    if impl == "numpy":
        import numpy as np
        import pandas as pd

        c = np.asarray(centroids, dtype=np.float64)  # (k, dim)
        fields = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        )
        out_schema = f"{fields}, cid int"

        def kernel(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                # ||v - c||² = ||v||² - 2 v·c + ||c||²; ||v||² is
                # constant per row so argmin needs only the last two
                d = -2.0 * (v @ c.T) + np.einsum("ij,ij->i", c, c)[None, :]
                yield pdf.assign(cid=np.argmin(d, axis=1).astype("int32"))

        return df.mapInPandas(kernel, out_schema)
    if impl != "expr":
        raise ValueError(f"impl must be 'numpy' or 'expr', got {impl!r}")
    vec = F.col(vec_col).cast("array<double>")
    dists = F.array(*[
        F.struct(_sq_dist(vec, c).alias("d"), F.lit(i).alias("cid"))
        for i, c in enumerate(centroids)
    ])
    return df.withColumn("cid", F.array_min(dists)["cid"])


def _plan_is_cached(df: DataFrame) -> bool | None:
    """True/False when the CacheManager answers whether it holds an
    entry plan-equivalent to ``df``'s — the authoritative "will
    persist() alias someone else's cache?" test. `DataFrame.is_cached`
    is only a per-Python-object flag, so a caller that cached a
    DIFFERENT but plan-equivalent frame (a second read of the same
    path, a no-op projection) is invisible to it.

    A failed lookup answers ``None`` — UNKNOWN (ADVICE r16 + r17
    review). Falling back to ``df.is_cached`` would reintroduce the
    stale-flag hazard this function exists to remove (True after
    clearCache() → skip the persist → one source rescan PER PASS);
    treating the failure as plain False would let the caller attach
    an unpersist to a frame it may NOT own (evicting the caller's
    cache on cleanup). Callers should persist on None (persisting an
    already-default-persisted frame is a no-op) but leave the cache's
    lifecycle to LRU. Only the py4j surface errors are caught —
    anything else is a real bug."""
    try:
        return bool(
            df.sparkSession._jsparkSession.sharedState()
            .cacheManager()
            .lookupCachedData(df._jdf)
            .isDefined()
        )
    except (AttributeError, Py4JError):  # py4j surface shift → unknown
        return None


def lloyd_kmeans(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_impl: str = "numpy",
) -> tuple[DataFrame, list[list[float]]]:
    """Deterministic Lloyd's k-means; returns (df + ``cid``, centroids).

    Centroid components are rounded to 6 decimals after every update so
    the trajectory is reproducible across engines (see module doc).

    The input is persisted for the whole run: Lloyd's is inherently
    multi-pass (init collect + one stats pass per iteration + the
    final assignment), and without the cache every pass re-scanned the
    SOURCE — r15 REST probe on the q69 shape: 8 corpus file reads
    (4 passes × a 2-branch union) vs the 1-per-branch floor this cache
    restores. If the CALLER already persisted the input, that cache is
    used as-is and its lifecycle is untouched; otherwise the operator
    persists it and the returned frame's ``cleanup()`` releases it."""
    if k < 1 or n_iter < 0:
        raise ValueError(f"need k >= 1, n_iter >= 0; got k={k}, n_iter={n_iter}")
    from .cache import attach_cleanup

    # Cache ownership (ADVICE r15): Spark's CacheManager keys on the
    # SEMANTIC plan, so persisting any equivalent frame (even
    # df.select('*')) aliases the caller's cache entry — unpersisting
    # it would evict a cache the caller owns, and re-persisting an
    # already-persisted input at another level raises. So: if the
    # caller already cached the input — or any PLAN-EQUIVALENT frame —
    # ride that cache and leave its lifecycle alone (cleanup() is a
    # no-op); only a genuinely uncached input is persisted here and
    # released by the returned cleanup(). The CacheManager lookup is
    # the ONLY test: `is_cached` is an object-local flag that both
    # misses plan-equivalent caches AND goes stale (clearCache() or an
    # equivalent frame's unpersist() leave it True with no entry
    # behind it — short-circuiting on it would skip the persist and
    # re-scan the source every pass; r16 review). If the lookup itself
    # FAILS (py4j surface shift → None, r17 review) ownership is
    # unknowable: persist anyway (no-op when the caller already
    # persisted at the default level; restores the multi-pass cache
    # otherwise) but do NOT claim ownership — cleanup() stays a no-op
    # and the cache is left to LRU rather than risking eviction of a
    # frame the caller owns.
    cached = _plan_is_cached(df)
    owns_cache = cached is False
    if cached is True:
        src = df
    else:
        try:
            src = df.persist()
        except Py4JError:
            # only reachable on the UNKNOWN path: the input was in
            # fact persisted at a non-default level — ride it as-is
            src = df
            owns_cache = False
    # the init collect is the first action: it fills the cache, so the
    # iteration/assignment passes below never touch the source again
    init_rows = src.orderBy(id_col).limit(k).select(vec_col).collect()
    if len(init_rows) < k:
        if owns_cache:
            src.unpersist()
        raise ValueError(f"k={k} exceeds corpus size {len(init_rows)}")
    centroids = [[float(x) for x in r[0]] for r in init_rows]
    for _ in range(n_iter):
        assigned = assign_cells(src, centroids, id_col, vec_col, impl=assign_impl)
        stats = (
            assigned.select("cid", F.posexplode(F.col(vec_col).cast("array<double>")))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("col"), 6).alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in stats:
            by_cell.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        # empty cells keep their previous centroid
        centroids = [
            [by_cell[i][p] for p in range(len(centroids[i]))]
            if i in by_cell else centroids[i]
            for i in range(k)
        ]
    final = assign_cells(src, centroids, id_col, vec_col, impl=assign_impl)
    return (
        attach_cleanup(final, src) if owns_cache else attach_cleanup(final)
    ), centroids


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    tau: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "numpy",
    assign_impl: str = "numpy",
) -> DataFrame:
    """(id_col, cid, kept): SemDeDup verdict per row. ``kept`` is false
    when a same-cluster row with a lower id is cosine-similar ≥ tau.

    Pair stage implementations (clustering is identical in both —
    only the within-cluster cosine moves):

    - ``impl="numpy"`` (default): one ``applyInPandas`` per cluster —
      the cosine matrix is a BLAS matmul over the cluster's vectors,
      exactly how reference SemDeDup implementations compute it. ~10×
      the interpreted-fold path (each pair's cosine there walks a
      ~200-op interpreted HOF tree). BLAS summation order differs from
      the fold by last-ulp amounts; after round-to-6 the verdicts agree
      unless a pair's cosine sits within ~1e-10 of a rounding boundary
      (never observed; equality is regression-tested on the full
      corpus and the q69 gate value-checks against the SQL oracle).
    - ``impl="expr"``: cluster-key equi-join + left-to-right fold
      cosine — the oracle's literal shape, kept as the cross-check.

    Either way the candidate join's key is ``cid``, so the pair stage
    shuffles each cluster to one reducer and nothing else. Per-cluster
    memory is O(|cluster|·dim) for the vectors plus a row-blocked
    O(block·|cluster|) similarity slab — choose k ≈ √n to keep
    clusters reducer-sized."""
    from .cache import attach_cleanup

    assigned, _ = lloyd_kmeans(
        df, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col,
        assign_impl=assign_impl,
    )
    if impl == "numpy":
        import numpy as np
        import pandas as pd

        id_type = df.schema[id_col].dataType.simpleString()
        out_schema = f"{id_col} {id_type}, cid int, kept boolean"

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(id_col, ignore_index=True)
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.sqrt(np.einsum("ij,ij->i", v, v))
            norms[norms == 0.0] = 1.0  # zero vectors: cos defined as 0
            unit = v / norms[:, None]
            n = len(pdf)
            kept = np.ones(n, dtype=bool)
            # row-blocked upper-triangular sweep bounds the slab to
            # block × n doubles regardless of cluster size
            block = 1024
            for s in range(1, n, block):
                e = min(s + block, n)
                sims = np.round(unit[s:e] @ unit[:e].T, 6)
                for i in range(s, e):
                    if (sims[i - s, :i] >= tau).any():
                        kept[i] = False
            return pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cid": pdf["cid"],
                    "kept": kept,
                }
            )

        return attach_cleanup(
            assigned.groupBy("cid").applyInPandas(kernel, out_schema),
            getattr(assigned, "cleanup", lambda: None),
        )
    if impl != "expr":
        raise ValueError(f"impl must be 'numpy' or 'expr', got {impl!r}")
    # referenced three times below (join left/right + keep-flag join) —
    # persist so the assignment pass runs once; the kmeans input cache
    # composes through cleanup
    upstream_cleanup = getattr(assigned, "cleanup", lambda: None)
    assigned = assigned.persist()
    from ..functions.similarity import l2_norm

    left = assigned.select(
        F.col("cid"), F.col(id_col).alias("__xid"), F.col(vec_col).alias("__xv")
    )
    right = assigned.select(
        F.col("cid"), F.col(id_col).alias("__yid"), F.col(vec_col).alias("__yv")
    )
    dropped = (
        left.join(right, on="cid")
        .filter(F.col("__yid") < F.col("__xid"))
        # zero-norm guard: cosine's 0/0 is NaN, which Spark orders ABOVE
        # every number, so an unguarded `>= tau` would drop rows against
        # zero vectors — the numpy kernel defines cos = 0 there instead
        .filter(
            (l2_norm(F.col("__xv")) != 0)
            & (l2_norm(F.col("__yv")) != 0)
            & (cosine(F.col("__xv"), F.col("__yv")) >= tau)
        )
        .select(F.col("__xid").alias(id_col))
        .distinct()
    )
    out = (
        assigned.join(dropped.withColumn("__drop", F.lit(True)), on=id_col, how="left")
        .select(
            id_col,
            "cid",
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("kept"),
        )
    )
    return attach_cleanup(out, assigned, upstream_cleanup)
