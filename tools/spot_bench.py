"""Parallel-scaling spot bench (VERDICT r17 task 5).

    SPARK_GRAFT_SF_DIR=/root/sfbig/sf1 SPARK_GRAFT_CPUS=8 \
        PYTHONPATH=. python tools/spot_bench.py [q01_... ...]

Times a fixed slate of shuffle/scan/agg-bound batch queries (min-of-2
after an untimed warmup run of each, noop sink — bench.py methodology)
at whatever SF dir and core count the env says, and prints one JSON
line with wall seconds plus the executor-totals deltas (task time, GC,
shuffle bytes, input bytes) per query. Run it twice — CPUS=8 and
CPUS=32 — over the tools/make_scaled_sf.py dataset and compare: at
sf0.1 every query is fixed-overhead dominated and the ratio reads ~1;
at ~sf1 the compute-bound queries should approach the core ratio.

The default slate deliberately avoids the content-dedup families
(the K-fold scaler duplicates document text verbatim, which changes
THEIR workload character) and the streaming replays (fixed micro-batch
machinery, the thing this probe is trying to see past).
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

SLATE = [
    "q01_pricing_summary",
    "q05_join_groupby",
    "q06_multijoin_region",
    "q08_composite_join",
    "q35_shipping_priority",
    "q21_events_hourly",
    "q26_sessionize",
    "q33_count_distinct",
    "q52_distribution",
    "q64_sequence_packing",
    "q65_exact_percentiles",
    "q91_quantile_normalize",
    "q98_bigram_lm",
    "q100_bpe_pair_stats",
]


def main() -> int:
    names = sys.argv[1:] or SLATE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/sfbig/sf1")
    import bench  # the repo-root harness: _exec_totals/_totals_delta

    from pandasql_spark.queries import REGISTRY
    from pandasql_spark.session import get_spark

    # Scale-proportional task sizing, the point of the probe: a real
    # deployment sizes splits/partitions to the data (guide §2.2/§6.1 —
    # partitions in the 100 MB–1 GB band at 100 TB means task counts far
    # above core counts). At toy SFs the DEFAULT 128 MB splits / 64 MB
    # AQE advisory collapse every stage to 1–10 tasks, so c8-vs-c32
    # measures nothing but fixed overhead. 4 MB / 2 MB here reproduce
    # the cluster-shaped tasks-per-stage ratio at ~150 MB of input.
    # These are PROBE-session settings, not engine or bench settings.
    # scale-proportional to the probe SF; env-overridable so one tool
    # serves sf1 (4m/2m) and sf5 (16m/8m)
    mpb = os.environ.get("SPOT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024))
    adv = os.environ.get("SPOT_ADVISORY_BYTES", str(2 * 1024 * 1024))
    spark = get_spark("spot-bench", **{
        "spark.ui.enabled": "true",
        "spark.sql.files.maxPartitionBytes": mpb,
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": adv,
    })
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    metrics: dict[str, dict] = {}
    for name in names:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"spot:{name}")
        try:
            # untimed warmup (first-touch JIT/codegen), then min-of-2
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            before = bench._exec_totals(spark)
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(min(runs), 3)
            delta = bench._totals_delta(before, bench._exec_totals(spark), 2)
            if delta is not None:
                metrics[name] = delta
        except Exception as exc:  # noqa: BLE001 — keep probing
            metrics[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        finally:
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
    out = {
        "metric": "spot_bench",
        "sf_dir": sf_dir,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "value": round(sum(timings.values()), 3),
        "queries": timings,
        "cost_metrics": metrics,
        "load_avg_start": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
