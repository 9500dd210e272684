"""Median-of-N idle-bench artifact builder (VERDICT r16 task 7).

The r16 retro: three clean runs at one HEAD read 74.18 / 71.26 /
61.94 s — a ±15% spread on identical code — and committing the
best-conditions run systematically flatters cross-round deltas. The
committed idle artifact is now the MEDIAN-total clean run, with every
run's summary stamped alongside so adjudication can see the spread.

    PYTHONPATH=. python tools/idle_bench_median.py [n_runs] > BENCH_IDLE_rN.json

Runs `python bench.py` n_runs times (default 3) sequentially in fresh
processes, keeps each run's full dict, drops self-flagged contaminated
runs from selection (they stay in the stamp), and emits the median
clean run's dict as the artifact top level — same shape every prior
round's artifact had — plus:

  "selection": {"rule": "median_total_of_clean_runs", ...}
  "runs_all":  [{value, sentinel, load_avg, contaminated}, ...]

If fewer than 2 clean runs exist the artifact still emits (best
available) but `selection.degraded` says so — re-run on a colder host.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

#: bench.py's loaded-host guard flags load_avg_start > 2.0 — but a
#: back-to-back run inherits the PREVIOUS run's 1-min load average and
#: flags itself even on an otherwise idle host (first median-runner
#: attempt: 3/3 contaminated, every sentinel_end ~0.156 s). Wait out
#: the decay between runs.
COOLDOWN_TARGET = 1.2
COOLDOWN_MAX_S = 420


def cooldown() -> None:
    t0 = time.time()
    while (
        time.time() - t0 < COOLDOWN_MAX_S
        and os.getloadavg()[0] > COOLDOWN_TARGET
    ):
        time.sleep(15)


def one_run(i: int) -> dict:
    cooldown()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        check=False,
    )
    best: dict | None = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        # prefer the FULL dict (largest queries map) over the compact
        # tail summary
        if isinstance(d.get("queries"), dict) and (
            best is None or len(d["queries"]) > len(best.get("queries", {}))
        ):
            best = d
    if best is None:
        raise RuntimeError(
            f"run {i}: no JSON line in bench output; rc={proc.returncode}\n"
            + proc.stdout[-2000:]
            + proc.stderr[-2000:]
        )
    return best


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs = [one_run(i) for i in range(n)]
    runs = [r for r in runs if isinstance(r.get("value"), (int, float))]
    if not runs:
        raise RuntimeError("no bench run produced a usable 'value'")
    clean = [r for r in runs if not r.get("contaminated")]
    # ANY clean run beats every contaminated one — with a single clean
    # run it IS the artifact (falling back to the full pool could
    # select a contaminated run while a clean one exists; r17 review)
    pool = clean if clean else runs
    pool_sorted = sorted(pool, key=lambda r: r["value"])
    median = pool_sorted[len(pool_sorted) // 2]

    artifact = dict(median)
    artifact["selection"] = {
        "rule": "median_total_of_clean_runs",
        "n_runs": n,
        "n_clean": len(clean),
        "degraded": len(clean) < 2,
        "clean_totals": sorted(round(r["value"], 3) for r in clean),
    }
    artifact["runs_all"] = [
        {
            "value": r.get("value"),
            "sentinel": r.get("sentinel"),
            "load_avg": r.get("load_avg"),
            "contaminated": bool(r.get("contaminated")),
            "contamination_reasons": r.get("contamination_reasons"),
        }
        for r in runs
    ]
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    sys.exit(main())
