"""10x scale-growth probe for the one-call dedup_corpus composition
(r16, the q50 `survivors` fold) — the r15 growth-probe recipe: plant
known near-dup structure at 1x and 10x rows, assert the survivor set
tracks the planted structure EXACTLY at both scales, and report wall
clock. Run on an idle machine:

    PYTHONPATH=. python tools/growth_probe_dedup_corpus.py

Planted corpus: n_groups cliques of 10 lightly-edited copies each
(copy j of group g = base text + j trailing edit tokens) plus
singletons. Expected survivors = min id per clique + every singleton.
"""
import sys
import time

from pyspark.sql import SparkSession


def make_corpus(spark, n_groups: int, n_singletons: int):
    rows = []
    did = 0
    for g in range(n_groups):
        # group-private token namespace: cross-group Jaccard is exactly 0
        base = " ".join(f"w{g}_{k}" for k in range(30)) + f" g{g}"
        for j in range(10):
            # light edit: j extra tokens -> pairwise J >= 28/ (31+2j) >= 0.5
            rows.append((did, base + "".join(f" e{g}_{x}" for x in range(j))))
            did += 1
    for s in range(n_singletons):
        txt = " ".join(f"u{s}_{k}" for k in range(25))
        rows.append((did, txt))
        did += 1
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(16)


def expected_survivors(n_groups: int, n_singletons: int) -> int:
    return n_groups + n_singletons


def run(scale: int) -> None:
    from pandasql_spark.operators.dedup import dedup_corpus

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName(f"growth-dedup-corpus-{scale}x")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_groups, n_singletons = 40 * scale, 100 * scale
    df = make_corpus(spark, n_groups, n_singletons)
    df = df.persist()
    n = df.count()
    t0 = time.time()
    out = dedup_corpus(df, threshold=0.5, num_bands=32)
    survivors = out.select("doc_id").toPandas()
    wall = time.time() - t0
    exp = expected_survivors(n_groups, n_singletons)
    got = len(survivors)
    # every clique's min id is 10*g; singletons start at 10*n_groups
    exp_ids = set(range(0, 10 * n_groups, 10)) | set(
        range(10 * n_groups, 10 * n_groups + n_singletons)
    )
    ok = set(survivors["doc_id"]) == exp_ids
    print(
        f"GROWTH scale={scale}x rows={n} survivors={got} expected={exp} "
        f"exact_ids={'OK' if ok else 'MISMATCH'} wall={wall:.2f}s"
    )
    spark.stop()
    if not ok or got != exp:
        sys.exit(1)


if __name__ == "__main__":
    scales = [int(s) for s in sys.argv[1:]] or [1, 10, 100]
    for scale in scales:
        run(scale)
