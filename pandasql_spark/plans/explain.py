"""Physical-plan introspection: the ".explain and iterate" feedback loop
as code.

The reference delegates all physical strategy to SQLite's planner and
never inspects it (SURVEY.md §4); on Spark the plan IS the scale story,
so these helpers make plan properties assertable in tests:

- filters pushed to the parquet scan (`pushed_filters`),
- column pruning (`read_schemas`),
- broadcast vs shuffle joins (`broadcast_join_count`),
- shuffle counts (`shuffle_count`),
- top-k compiling to TakeOrderedAndProject, partial aggregation, etc.
  (`operator_names`).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The text of ``df.explain(mode)`` (which only prints)."""
    spark = SparkSession.getActiveSession()
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All parquet-scan PushedFilters entries, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        inner = m.group(1).strip()
        if inner:
            out.extend(p.strip() for p in inner.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings per scan — the column-pruning evidence."""
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^>]*>)", explain_str(df))]


def operator_names(df: DataFrame) -> list[str]:
    """Physical operator names in plan order."""
    return [
        m.group(1)
        for m in re.finditer(r"^\s*\(\d+\)\s+(\w+)", explain_str(df), re.MULTILINE)
    ]


def broadcast_join_count(df: DataFrame) -> int:
    return sum(1 for n in operator_names(df) if n == "BroadcastHashJoin")


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators — the thing to minimize."""
    return sum(1 for n in operator_names(df) if n == "Exchange")
