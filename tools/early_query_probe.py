"""One-off probe for the r18 early-query inflation (q01..q22 band).

Reproduces the bench harness's exact sequence (warmup, then the HEADLINE
prefix, min-of-3 each, clearCache between) in a fresh process, with the
r18 metrics machinery toggleable, so the inflation can be attributed:

    PYTHONPATH=. python tools/early_query_probe.py ui      # UI + REST polls (r18 harness)
    PYTHONPATH=. python tools/early_query_probe.py noui    # r17 harness behavior
    PYTHONPATH=. python tools/early_query_probe.py store   # UI off + statusStore metrics

Prints one JSON line per query: min/median wall of 3 runs plus (ui mode)
the per-run executor task-time / input-bytes delta.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pandasql_spark.queries import REGISTRY  # noqa: E402
from pandasql_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PREFIX = [
    "q01_pricing_summary",
    "q04_topk",
    "q05_join_groupby",
    "q06_multijoin_region",
    "q08_composite_join",
    "q12_having",
    "q16_doc_profile",
    "q23_minhash_neardup",
]


def _cpu_stat() -> tuple[float, float, float]:
    """(busy_nonsteal, steal, total) jiffies from /proc/stat line 1."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [float(x) for x in parts[1:]]
    user, nice, system, idle, iowait, irq, softirq, steal = (vals + [0] * 8)[:8]
    busy = user + nice + system + irq + softirq
    total = busy + idle + iowait + steal
    return busy, steal, total


def _store_totals(spark) -> dict | None:
    """Same executor totals as bench._exec_totals, read from the
    in-process AppStatusStore via py4j — no jetty/Jersey REST stack."""
    sc = spark.sparkContext
    try:
        sc._jsc.sc().listenerBus().waitUntilEmpty()
        execs = sc._jsc.sc().statusStore().executorList(True)
        tot = {"task_time_ms": 0, "gc_time_ms": 0, "shuffle_read_b": 0,
               "shuffle_write_b": 0, "input_b": 0}
        for i in range(execs.size()):
            e = execs.apply(i)
            tot["task_time_ms"] += e.totalDuration()
            tot["gc_time_ms"] += e.totalGCTime()
            tot["shuffle_read_b"] += e.totalShuffleRead()
            tot["shuffle_write_b"] += e.totalShuffleWrite()
            tot["input_b"] += e.totalInputBytes()
        return tot
    except Exception:  # noqa: BLE001
        return None


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "ui"
    ui = mode == "ui"
    spark = get_spark(
        "early-query-probe", **{"spark.ui.enabled": "true" if ui else "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    # warmup, bench-identical
    REGISTRY[bench.SENTINEL].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(1000).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    # sentinel timing, bench-identical
    sent = bench._min_of(REGISTRY[bench.SENTINEL].fn, spark)
    spark.catalog.clearCache()
    print(json.dumps({"mode": mode, "sentinel_s": sent,
                      "load": [round(x, 2) for x in os.getloadavg()]}),
          flush=True)

    read_totals = (
        bench._exec_totals if mode == "ui"
        else _store_totals if mode == "store"
        else None
    )
    for name in PREFIX:
        fn = REGISTRY[name].fn
        before = read_totals(spark) if read_totals else None
        runs = []
        cpu = []
        for _ in range(3):
            b0, s0, t0j = _cpu_stat()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            b1, s1, t1j = _cpu_stat()
            runs.append(round(dt, 3))
            span = max(t1j - t0j, 1e-9)
            cpu.append({"busy": round((b1 - b0) / span, 3),
                        "steal": round((s1 - s0) / span, 3)})
        rec: dict = {"q": name, "mode": mode, "runs": runs, "min": min(runs),
                     "cpu": cpu}
        if read_totals:
            delta = bench._totals_delta(before, read_totals(spark), 3)
            if delta:
                rec["task_ms"] = delta["task_time_ms"]
                rec["input_b"] = delta["input_b"]
        spark.catalog.clearCache()
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
