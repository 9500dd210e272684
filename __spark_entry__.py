"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query implementations live in ``pandasql_spark.queries`` (one entry per
operator from SURVEY.md §2 plus the LLM-pipeline operators); this module
is the thin contract shim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    from pandasql_spark.queries import REGISTRY

    # registry fn, not the bare function: the registry wrapper pins the
    # engine's semantics confs on whatever session the driver supplies
    return REGISTRY["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pandasql_spark.queries import REGISTRY

    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from pandasql_spark.queries import REGISTRY

    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}
