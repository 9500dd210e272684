"""Connected components over near-duplicate pair lists.

Dedup pipelines emit PAIRS (operators/dedup.py); to actually drop
duplicates you need CLUSTERS — "keep the minimum doc id per connected
component" is the standard policy. This is the min-label-propagation
algorithm (the core of MapReduce connected-components methods à la
Hash-to-Min / large-star): every node repeatedly adopts the smallest
label among itself and its neighbors until fixpoint.

Scale notes:
- each iteration is one shuffled join + one groupBy-min — both plain
  Catalyst ops that AQE can size; rounds needed = graph diameter in the
  label graph, which for dedup clusters (small, dense clumps) is tiny
  (2-4). ``max_iter`` bounds pathological chains.
- per-round ``persist`` + explicit unpersist keeps lineage flat (an
  unbounded iterative lineage re-executes everything each round and
  eventually overflows the planner).
- the driver-side loop only checks a scalar convergence count per
  round — no row data ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, cluster_id) for every node in ``pairs``; cluster_id = the
    minimum node id reachable through the pair graph (undirected)."""
    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.persist()

    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    labels.count()  # materialize

    for _ in range(max_iter):
        # each node adopts min(own label, neighbors' labels)
        neighbor_labels = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(F.col("a").alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    sym.unpersist()
    out = labels.select("node", F.col("label").alias("cluster_id"))
    return out


def dedup_keep_representative(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """End-to-end near-dup removal: drop every row whose id belongs to a
    duplicate cluster but is not the cluster's minimum id. Rows never
    mentioned in ``pairs`` are kept. One components run + one semi/anti
    join pair — no fan-out."""
    comp = connected_components(pairs, id_a, id_b)
    losers = comp.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
