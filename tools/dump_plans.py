"""Dump `.explain("formatted")` for named registry queries to files.

    PYTHONPATH=. python tools/dump_plans.py OUTDIR q47_funnel q62_heavy_hitters ...

Writes OUTDIR/<name>.txt per query. Used to commit the before/after
plan evidence for optimization rounds (plans/rN/<query>_{before,after}.txt):
run once from a worktree at the pre-round commit and once at HEAD.

Some builders execute bounded driver-side jobs while constructing the
frame (eager metadata-cache fills, candidate collects, streaming
replays); the dumped plan is the plan of the RETURNED frame. For
queries whose returned frame is a driver-assembled literal (q62's
verify output), the supplementary builder frames exposed for plan
tests are dumped alongside (suffix `__<part>`)."""
from __future__ import annotations

import contextlib
import io
import os
import sys

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pandasql_spark.queries import REGISTRY  # noqa: E402
from pandasql_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    # ADVICE r17: validate argv (bare IndexError otherwise) and keep a
    # typo'd query name from aborting the remaining dumps.
    if len(sys.argv) < 3:
        print(
            "usage: PYTHONPATH=. python tools/dump_plans.py OUTDIR "
            "qNN_name [qNN_name ...]",
            file=sys.stderr,
        )
        return 2
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("pandasql-spark-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, SF_DIR)
            txt = explain_str(df)
        except Exception as exc:  # noqa: BLE001 — keep dumping
            txt = f"ERROR building {name}: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(txt)
        # Supplementary sub-plans for queries whose returned frame hides
        # the corpus work (driver-assembled literals).
        if name == "q62_heavy_hitters":
            try:
                from pyspark.sql import functions as F

                from pandasql_spark.functions.text import tokens
                from pandasql_spark.operators.freq import (
                    _candidate_counts_frame,
                )

                # the canonical tokenizer heavy_hitter_tokens uses
                # (ADVICE r17: an inline re-implementation here would go
                # silently stale if the tokenization contract changed)
                docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
                toks = docs.select(
                    F.explode(tokens("text")).alias("token")
                )
                sub = _candidate_counts_frame(toks, "token", ["the", "a"])
                with open(
                    os.path.join(outdir, f"{name}__verify_counts.txt"), "w"
                ) as f:
                    f.write(explain_str(sub))
            except Exception as exc:  # noqa: BLE001
                with open(
                    os.path.join(outdir, f"{name}__verify_counts.txt"), "w"
                ) as f:
                    f.write(f"ERROR: {type(exc).__name__}: {exc}\n")
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
