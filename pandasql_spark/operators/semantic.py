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
- assignment: squared-euclidean argmin, computed as a left-to-right
  ``zip_with``/``aggregate`` fold (mirrored by ``list_reduce`` in the
  oracle — identical fold order ⇒ identical doubles), ties broken by
  lowest cell id via min-of-(dist, cid) structs;
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
) -> DataFrame:
    """Tag every row with the nearest centroid's index (``cid``) —
    one codegen'd projection, no shuffle. Ties go to the lowest cid
    (min over (dist, cid) structs orders lexicographically)."""
    vec = F.col(vec_col).cast("array<double>")
    dists = F.array(*[
        F.struct(_sq_dist(vec, c).alias("d"), F.lit(i).alias("cid"))
        for i, c in enumerate(centroids)
    ])
    return df.withColumn("cid", F.array_min(dists)["cid"])


def lloyd_kmeans(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Deterministic Lloyd's k-means; returns (df + ``cid``, centroids).

    Centroid components are rounded to 6 decimals after every update so
    the trajectory is reproducible across engines (see module doc)."""
    if k < 1 or n_iter < 0:
        raise ValueError(f"need k >= 1, n_iter >= 0; got k={k}, n_iter={n_iter}")
    init_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    if len(init_rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(init_rows)}")
    centroids = [[float(x) for x in r[0]] for r in init_rows]
    for _ in range(n_iter):
        assigned = assign_cells(df, centroids, id_col, vec_col)
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
    return assign_cells(df, centroids, id_col, vec_col), centroids


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    tau: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, cid, kept): SemDeDup verdict per row. ``kept`` is false
    when a same-cluster row with a lower id is cosine-similar ≥ tau.
    The candidate join's key is ``cid`` — an equi-join, so the pair
    stage shuffles each cluster to one reducer and nothing else."""
    assigned, _ = lloyd_kmeans(df, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    left = assigned.select(
        F.col("cid"), F.col(id_col).alias("__xid"), F.col(vec_col).alias("__xv")
    )
    right = assigned.select(
        F.col("cid"), F.col(id_col).alias("__yid"), F.col(vec_col).alias("__yv")
    )
    dropped = (
        left.join(right, on="cid")
        .filter(F.col("__yid") < F.col("__xid"))
        .filter(cosine(F.col("__xv"), F.col("__yv")) >= tau)
        .select(F.col("__xid").alias(id_col))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("__drop", F.lit(True)), on=id_col, how="left")
        .select(
            id_col,
            "cid",
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("kept"),
        )
    )
