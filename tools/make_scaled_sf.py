"""Deterministically scale the sf0.1 testdata K-fold for the r18
parallel-scaling spot bench (VERDICT r17 task 5).

    PYTHONPATH=. python tools/make_scaled_sf.py /root/sfbig/sf1 10

The driver's testdata tops out at sf0.1 (42 MB), where every query is
fixed-overhead dominated and c8-vs-c32 ratios read ~1 regardless of the
plan shape. This builds a larger INPUT dataset (never committed, never
read by the gate or the driver bench) by unioning K key-shifted copies
of each sf0.1 table:

- fact/entity keys shift by copy * (max_key + 1), consistently across
  referencing tables (o_orderkey/l_orderkey, o_custkey/c_custkey,
  l_partkey/p_partkey, l_suppkey/s_suppkey), so join fan-outs per key
  are preserved and the join/agg workload is a faithful K-fold scale.
- region/nation stay fixed (TPC-H semantics: dimension universes do
  not grow with SF).
- non-key columns are byte-identical per copy — deterministic by
  construction (no rand()); re-running the tool reproduces the same
  files. Content-dedup queries would see every document duplicated K
  times, so the spot bench sticks to join/shuffle/agg/text-stat
  queries (see tools/spot_bench.py).

This is measurement INPUT generation, not result caching: nothing the
bench or the oracle reads is precomputed here, and /root/testdata is
untouched (read-only).
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

#: table -> {column: group} ; columns in the same group shift by the
#: same per-copy offset (max over every column in the group, +1)
KEY_GROUPS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "custkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
FIXED_TABLES = ("region", "nation")
SRC = "/root/testdata/sf0.1"

#: output files per table (at K=10): a 100 TB table arrives as tens of
#: thousands of row groups, so scan parallelism is never file-bound.
#: The K-fold copy written naively lands ~K single-row-group part files
#: per table (one per unioned copy), capping every scan at K tasks and
#:  muting the c8-vs-c32 probe for reasons that have nothing to do with
#: the plans. Write enough files that task counts are data-shaped.
OUT_FILES = {
    "lineitem": 64,
    "orders": 32,
    "events": 32,
    "customer": 16,
    "documents": 16,
    "embeddings": 16,
    "part": 8,
    "supplier": 4,
}


def main() -> int:
    if len(sys.argv) != 3:
        print("usage: make_scaled_sf.py OUTDIR K", file=sys.stderr)
        return 2
    outdir, k = sys.argv[1], int(sys.argv[2])
    from pyspark.sql import functions as F

    from pandasql_spark.session import get_spark

    spark = get_spark("make-scaled-sf")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(outdir, exist_ok=True)

    # per-group offsets = max over all columns in the group, +1
    offsets: dict[str, int] = {}
    for table, cols in KEY_GROUPS.items():
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        for col, group in cols.items():
            m = df.agg(F.max(col)).first()[0]
            offsets[group] = max(offsets.get(group, 0), int(m) + 1)
    print("offsets:", offsets)

    for table in FIXED_TABLES:
        spark.read.parquet(f"{SRC}/{table}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{outdir}/{table}.parquet")
        print(f"{table}: copied fixed")

    for table, cols in KEY_GROUPS.items():
        base = spark.read.parquet(f"{SRC}/{table}.parquet")
        copies = []
        for i in range(k):
            c = base
            for col, group in cols.items():
                c = c.withColumn(
                    col, (F.col(col) + F.lit(i * offsets[group])).cast("long")
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.repartition(OUT_FILES.get(table, 8)).write.mode(
            "overwrite"
        ).parquet(f"{outdir}/{table}.parquet")
        n = spark.read.parquet(f"{outdir}/{table}.parquet").count()
        print(f"{table}: {n} rows ({k}x)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
