"""SparkSession management for pandasql_spark.

One engine, one session. The reference (pandaSQL) juggles two engines —
pandas and SQLite — with a cost model deciding placement
(``/root/reference/pandasql/core.py:1546-1568``). Here Spark is the only
engine, so "session management" reduces to building a well-configured
SparkSession once and reusing it.

Scale-minded defaults (tunable via ``get_spark(**conf)``):

- AQE on: runtime re-planning, skew-join splitting, partition coalescing.
  On a 1000-executor cluster this is what turns a bad static plan into a
  good one mid-flight.
- ``spark.sql.shuffle.partitions``: default 32 for local testing; on a
  real cluster this should be ~2-3x total cores (AQE coalesces down).
- Arrow enabled for every pandas interchange point (``toPandas``,
  ``applyInPandas``, pandas UDFs) — batch columnar transfer instead of
  row pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # pandas/Python permissive numeric semantics (div-by-zero → null, not
    # error) — the reference's engine-semantics shims (sql_utils.py:9-48)
    # are about matching pandas, so we pick the permissive mode.
    "spark.sql.ansi.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    ),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Parquet scans: pushdown + pruning are free perf at 100 TB. These are
    # Spark defaults, pinned here so a misconfigured cluster can't lose them.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Broadcast threshold: 64 MB. Dimension tables (region/nation/customer
    # at typical star-schema ratios) should broadcast, not shuffle.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


#: Semantics-critical confs that MUST hold for the engine's documented
#: behavior, all runtime-settable: ANSI off (pandas-permissive arithmetic:
#: div-by-zero → null — the reference's engine-semantics shims
#: ``sql_utils.py:9-48`` match pandas, not ANSI SQL) and UTC (the
#: TIMESTAMP_NTZ→epoch casts in the window queries assume it). Applied
#: even to sessions we did not build (e.g. a host/driver-owned session),
#: because the host owns the *session* but this library owns the
#: *semantics* of its own operators.
_RUNTIME_SEMANTICS: dict[str, str] = {
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    # Parquet naive timestamps (isAdjustedToUTC=false) read as TIMESTAMP,
    # not TIMESTAMP_NTZ: with the session pinned to UTC the two are
    # value-identical, but NTZ forbids the direct epoch casts
    # (cast-to-double) the window/session/range operators rely on, and
    # matches DuckDB's epoch() treating naive timestamps as UTC.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def ensure_semantics(spark: SparkSession) -> SparkSession:
    """Pin the runtime-settable semantics confs on ``spark`` (idempotent).

    Every operator is additionally written to be ANSI-*safe* (no
    overflowing expressions — see operators/dedup.py's 31-bit universal
    hash), so this is belt-and-braces: correctness does not depend on it,
    only edge-case *semantics* (null-on-div-zero vs error) do."""
    for k, v in _RUNTIME_SEMANTICS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)
    return spark


def get_spark(app_name: str = "pandasql_spark", **conf: str) -> SparkSession:
    """Return the active SparkSession, creating one with tuned defaults.

    ``**conf`` overrides the defaults (keys use the usual dotted names with
    ``_`` accepted in place of ``.`` is NOT supported — pass real keys via
    ``get_spark(**{"spark.sql.shuffle.partitions": "64"})``).

    A pre-existing active session is returned as-is except for the
    runtime-settable semantics confs (`ensure_semantics`) — builder-time
    confs like driver memory can't be changed after the fact.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return ensure_semantics(active)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    merged = dict(_DEFAULTS)
    merged.update(conf)
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop() -> None:
    """Stop the active session (reference parity: ``pandasql.stop()``,
    ``/root/reference/pandasql/core.py:1693-1697``)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
