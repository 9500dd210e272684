"""Skew/spill probe for the biggest shuffles (VERDICT r17 task 7).

    SPARK_GRAFT_SF_DIR=/root/sfbig/sf5 PYTHONPATH=. \
        python tools/skew_probe.py q08_composite_join q06_multijoin_region

Runs each query once warm at the given SF, then reports, for every
stage of the timed run (heaviest first): task count, executor run
time, shuffle read/write bytes, spill, and the per-task max/median
quantiles of duration and shuffle-read bytes from the REST
taskSummary endpoint — the guide-§2.5 skew signal (max/median above
~5-10x is worth fixing). Also greps the final executed plan for the
AQE skew-join marker (skew=true on a SortMergeJoin/ShuffledHashJoin)
so a fired skew split is visible even after coalescing.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: skew_probe.py qNN_name [...]", file=sys.stderr)
        return 2
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/sfbig/sf5")
    from pandasql_spark.queries import REGISTRY
    from pandasql_spark.session import get_spark

    spark = get_spark("skew-probe", **{
        "spark.ui.enabled": "true",
        "spark.sql.files.maxPartitionBytes":
            os.environ.get("SPOT_MAX_PARTITION_BYTES", "16777216"),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes":
            os.environ.get("SPOT_ADVISORY_BYTES", "8388608"),
    })
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    def get(path):
        return json.loads(urllib.request.urlopen(base + path, timeout=30).read())

    out = {"sf_dir": sf, "queries": {}}
    for name in names:
        fn = REGISTRY[name].fn
        fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
        spark.catalog.clearCache()
        sc._jsc.sc().listenerBus().waitUntilEmpty()
        seen = {s["stageId"] for s in get("/stages?status=complete")}
        t0 = time.perf_counter()
        df = fn(spark, sf)
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        sc._jsc.sc().listenerBus().waitUntilEmpty()
        stages = [s for s in get("/stages?status=complete")
                  if s["stageId"] not in seen]
        stages.sort(key=lambda s: -s.get("executorRunTime", 0))
        rows = []
        for s in stages:
            if s.get("executorRunTime", 0) < 200 and not rows:
                pass  # keep at least something
            row = {
                "stage": s["stageId"],
                "tasks": s["numCompleteTasks"],
                "run_time_s": round(s["executorRunTime"] / 1000, 2),
                "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "spill_disk_mb": round(s.get("diskBytesSpilled", 0) / 1e6, 1),
            }
            if s["numCompleteTasks"] > 1:
                try:
                    ts = get(
                        f"/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
                        "?quantiles=0.0,0.5,1.0"
                    )
                    dmin, dmed, dmax = ts["executorRunTime"]
                    row["task_ms_med_max"] = [round(dmed), round(dmax)]
                    row["task_skew_ratio"] = (
                        round(dmax / dmed, 1) if dmed else None
                    )
                    srm = ts.get("shuffleReadMetrics") or {}
                    rb = srm.get("readBytes")
                    if rb:
                        row["task_shuffle_read_med_max"] = [
                            round(rb[1]), round(rb[2])
                        ]
                except Exception:  # noqa: BLE001 — summary may be evicted
                    pass
            rows.append(row)
        # final (post-AQE) plan of the timed execution, via the SQL
        # REST endpoint — the df's own queryExecution stays the initial
        # plan because the write ran under its own execution
        try:
            sqls = get("/sql?details=false&planDescription=true&length=2000")
            plan = max(sqls, key=lambda s: s["id"]).get("planDescription", "")
        except Exception:  # noqa: BLE001
            plan = ""
        out["queries"][name] = {
            "wall_s": wall,
            "aqe_skew_marker": "skew=true" in plan,
            "stages": rows[:10],
        }
        spark.catalog.clearCache()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
