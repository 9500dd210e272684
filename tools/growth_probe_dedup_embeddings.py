"""Scale-growth probe for the one-call dedup_embeddings composition
(r17, the q10 `survivors` fold) — the dedup_corpus growth-probe recipe
in embedding space: plant known near-dup structure at 1x/10x/100x
rows, assert the survivor set tracks the planted structure EXACTLY at
every scale, and report wall clock. Run on an idle machine:

    PYTHONPATH=. python tools/growth_probe_dedup_embeddings.py

Planted corpus: n_groups clusters of 5 SCALED copies of one seeded
random unit vector each (copy j = base * (1 - 0.01*j): cosine is
exactly 1.0, so sign-LSH candidacy is deterministic — every copy has
the SAME sign pattern in every table, zero per-pair miss probability,
making the exact-ids assertion sound at any scale) plus random-vector
singletons. Random 64-dim unit vectors concentrate near cosine 0
(std ≈ 1/8); P(|cos| > 0.95) per cross pair is ~(1-0.95²)^31 ≈ 1e-31,
so no spurious merges even at 100x (~5e7 cross pairs). Expected
survivors = min id per cluster + every singleton.
"""
import sys
import time

import numpy as np
from pyspark.sql import SparkSession

DIM = 64


def make_corpus(spark, n_groups: int, n_singletons: int):
    rng = np.random.default_rng(1234)
    rows = []
    vid = 0
    for _ in range(n_groups):
        base = rng.standard_normal(DIM)
        base /= np.linalg.norm(base)
        for j in range(5):
            rows.append((vid, [float(x) * (1.0 - 0.01 * j) for x in base]))
            vid += 1
    for _ in range(n_singletons):
        v = rng.standard_normal(DIM)
        v /= np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(16)


def run(scale: int) -> None:
    from pandasql_spark.operators.dedup import dedup_embeddings

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName(f"growth-dedup-embeddings-{scale}x")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_groups, n_singletons = 24 * scale, 80 * scale
    df = make_corpus(spark, n_groups, n_singletons).persist()
    n = df.count()
    t0 = time.time()
    out = dedup_embeddings(
        df, vec_col="embedding", id_col="vec_id", dim=DIM, threshold=0.95
    )
    survivors = out.select("vec_id").toPandas()
    wall = time.time() - t0
    exp_ids = set(range(0, 5 * n_groups, 5)) | set(
        range(5 * n_groups, 5 * n_groups + n_singletons)
    )
    got = set(survivors["vec_id"])
    ok = got == exp_ids
    print(
        f"GROWTH scale={scale}x rows={n} survivors={len(got)} "
        f"expected={len(exp_ids)} exact_ids={'OK' if ok else 'MISMATCH'} "
        f"wall={wall:.2f}s"
    )
    spark.stop()
    if not ok:
        missing = sorted(exp_ids - got)[:5]
        extra = sorted(got - exp_ids)[:5]
        print(f"missing={missing} extra={extra}")
        sys.exit(1)


if __name__ == "__main__":
    scales = [int(s) for s in sys.argv[1:]] or [1, 10, 100]
    for scale in scales:
        run(scale)
