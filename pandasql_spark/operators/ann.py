"""Approximate nearest-neighbor search over embedding columns.

Two tiers (the brief's "brute-force baseline + IVF/LSH scale path"):

- **Brute force** (`functions/similarity.py:cosine_topk`): broadcast the
  query, scan everything. Exact; one pass; right answer for any corpus
  that fits a scan budget.
- **IVF** (this module): partition vectors into `nlist` Voronoi cells
  around KMeans centroids (Spark ML, seeded). A query probes only the
  `nprobe` nearest cells — the scan shrinks ~nlist/nprobe-fold. The
  centroid assignment is ONE shuffle at build time; at query time the
  cell filter is a partition-prunable predicate when the index is
  written partitioned by cell id (`write_ivf_index`).

Scale notes: at 100 TB, build with nlist ≈ √n (the FAISS heuristic),
persist the indexed table `partitionBy("cell_id")` so Spark's partition
pruning turns a probe into reading nprobe directories. Recall/latency is
tuned by nprobe, exactly like FAISS IVF-Flat.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import cosine


class IVFIndex:
    """In-memory handle: (indexed DataFrame with cell_id, centroids)."""

    def __init__(self, indexed: DataFrame, centroids: np.ndarray,
                 id_col: str, vec_col: str):
        self.indexed = indexed
        self.centroids = centroids  # (nlist, dim) float64
        self.id_col = id_col
        self.vec_col = vec_col

    def cleanup(self) -> None:
        """Release the build-time cache behind ``indexed`` (idempotent).

        `build_ivf_index` persists and eagerly materializes the indexed
        table (build-once/probe-many); callers that are done probing —
        or that only wanted the on-disk partitioned index via
        `write_ivf_index` — call this so the cache doesn't hold
        storage-pool residency until session end (the repo-wide
        cache-release discipline, see operators/cache.py)."""
        self.indexed.unpersist()

    def search(self, query_vec: list[float], k: int = 10, nprobe: int = 4) -> DataFrame:
        """Top-k by cosine among vectors in the ``nprobe`` cells whose
        centroids are nearest the query. Driver computes the probe set
        (nlist-sized — tiny); executors scan only matching cells."""
        q = np.asarray(query_vec, dtype=np.float64)
        # cosine distance to centroids, driver-side (nlist × dim only)
        norms = np.linalg.norm(self.centroids, axis=1) * (np.linalg.norm(q) or 1.0)
        sims = (self.centroids @ q) / np.where(norms == 0, 1.0, norms)
        probe_cells = [int(c) for c in np.argsort(-sims)[:nprobe]]
        qcol = F.array(*[F.lit(float(x)) for x in q])
        return (
            self.indexed.filter(F.col("cell_id").isin(probe_cells))
            .select(
                F.col(self.id_col),
                cosine(F.col(self.vec_col), qcol).alias("cos_sim"),
            )
            .orderBy(F.col("cos_sim").desc(), F.col(self.id_col).asc())
            .limit(k)
        )


def build_ivf_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
    max_iter: int = 20,
) -> IVFIndex:
    """KMeans-cluster the corpus into ``nlist`` cells and tag every row
    with its cell id. Seeded → deterministic index.

    The featurized frame is persisted across the build so KMeans'
    iterative passes AND the assignment transform read one cache
    instead of re-scanning the source per pass (r15 REST probe on the
    q87 shape: 7 corpus file reads for one build+probe vs the 1 this
    restores); the returned ``indexed`` table is persisted and eagerly
    materialized (build-once/probe-many is the contract), and the
    featurized cache is released before returning."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__features"),
    ).persist()
    km = KMeans(k=nlist, seed=seed, maxIter=max_iter, featuresCol="__features",
                predictionCol="cell_id")
    model = km.fit(feat)  # first fit pass fills the cache
    indexed = model.transform(feat).select(id_col, vec_col, "cell_id").persist()
    indexed.count()  # materialize from the feat cache, then drop it
    feat.unpersist()
    centroids = np.array([np.asarray(c) for c in model.clusterCenters()])
    return IVFIndex(indexed, centroids, id_col, vec_col)


def write_ivf_index(index: IVFIndex, path: str) -> None:
    """Persist the indexed table partitioned by cell id: a probe becomes
    a partition-pruned scan of nprobe directories."""
    index.indexed.write.mode("overwrite").partitionBy("cell_id").parquet(path)


def ann_join(
    index: IVFIndex,
    queries: DataFrame,
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Batch similarity search: top-k corpus neighbors for EVERY query
    row — the similarity-search join a retrieval/dedup pipeline runs,
    vs `IVFIndex.search`'s one-query-at-a-time driver loop.

    Returns (query_id, neighbor_id, cos_sim, rank), rank 1..k per
    query, ties broken by neighbor id.

    Scale shape: probe-cell selection is a VECTORIZED Arrow kernel
    (queries × the driver-held nlist×dim centroid matrix — no shuffle,
    no per-row Python), exploded to (query, cell) pairs; one equi-join
    on cell_id against the indexed corpus (the corpus never moves
    except by its own cell partitioning — write the index with
    `write_ivf_index` and the join prunes partitions); per-query top-k
    is a rank window that Spark 4 trims below the exchange
    (WindowGroupLimit), so a hot query ships k rows per partition.
    With ``nprobe >= nlist`` every cell is probed and the result is
    EXACTLY brute force (the q87 oracle gates that path; recall for
    nprobe < nlist is property-tested instead — approximation is the
    contract, same as FAISS)."""
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    cents = index.centroids
    np_ = min(nprobe, len(cents))
    cnorm = np.linalg.norm(cents, axis=1)

    @pandas_udf("array<int>")
    def _probe_cells(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:  # Arrow may deliver empty batches
            return pd.Series([], dtype=object)
        Q = np.asarray(vs.tolist(), dtype=np.float64)  # (m, dim)
        qn = np.linalg.norm(Q, axis=1)
        denom = np.outer(np.where(qn == 0, 1.0, qn), np.where(cnorm == 0, 1.0, cnorm))
        sims = (Q @ cents.T) / denom
        # stable sort: deterministic probe sets under centroid-sim ties
        top = np.argsort(-sims, axis=1, kind="stable")[:, :np_]
        return pd.Series([row.tolist() for row in top])

    probed = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qvec"),
        F.explode(_probe_cells(F.col(query_vec_col))).alias("cell_id"),
    )
    corpus = index.indexed.select(
        F.col(index.id_col).alias("neighbor_id"),
        F.col(index.vec_col).alias("__cvec"),
        "cell_id",
    )
    scored = probed.join(corpus, "cell_id").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__qvec"), F.col("__cvec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
