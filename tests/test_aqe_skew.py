"""AQE skew-join evidence: the session enables adaptive execution
(session.py), and for plain shuffled joins Spark's runtime re-planner —
not hand salting — is the first line of defense against hot keys. This
test forces the conditions (sort-merge join, tiny skew thresholds) and
asserts the executed plan actually split the skewed partition
(``skew=true`` in the final adaptive plan). operators/skew.py remains
the manual fallback for aggregations and joins AQE can't fix (its
docstrings say when); this pins down that the automatic path works.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # one hot key (0) carrying ~97% of rows, wide payload to trip
        # the byte threshold; right side small but not broadcastable
        left = spark.range(200_000).select(
            F.when(F.col("id") % 30 == 0, F.col("id") % 7).otherwise(F.lit(0)).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(7).select(F.col("id").alias("k"), F.lit(1).alias("r"))
        joined = left.join(right, "k").select(F.sum(F.length("payload")).alias("s"))
        # execute THIS DataFrame's own QueryExecution (count()/write spawn
        # a fresh one whose adaptive plan never finalizes)
        [row] = joined.collect()
        assert row["s"] > 0
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "simple"
        )
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
