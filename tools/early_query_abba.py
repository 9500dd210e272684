"""ABBA driver for tools/early_query_probe.py: runs the three harness
arms (ui / store / noui) in a mirrored order with load-gated cooldowns,
collecting one JSON line per query per arm.

    PYTHONPATH=. python tools/early_query_abba.py > /tmp/early_abba.jsonl
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

ARMS = ["ui", "store", "noui", "noui", "store", "ui"]
COOLDOWN_TARGET = 1.0
COOLDOWN_MAX_S = 420


def cooldown() -> None:
    t0 = time.time()
    while (
        time.time() - t0 < COOLDOWN_MAX_S
        and os.getloadavg()[0] > COOLDOWN_TARGET
    ):
        time.sleep(10)


def main() -> None:
    for i, arm in enumerate(ARMS):
        cooldown()
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, "early_query_probe.py"), arm],
            capture_output=True, text=True, cwd=REPO,
            env={**os.environ, "PYTHONPATH": REPO}, check=False,
        )
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                d = json.loads(line)
                d["pair"] = i
                print(json.dumps(d), flush=True)
        if proc.returncode != 0:
            print(json.dumps({"arm": arm, "pair": i, "rc": proc.returncode,
                              "stderr": proc.stderr[-500:]}), flush=True)


if __name__ == "__main__":
    main()
