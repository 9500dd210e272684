"""Z-order layout: correctness (lossless reorder) and the actual point —
multi-dimensional file pruning a single-column sort can't give."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
import pytest

from pandasql_spark.operators.zorder import write_zordered, zorder_key

SF = "/root/testdata/sf0.001"


def _matching_files(spark, path, cond):
    return (
        spark.read.parquet(path)
        .filter(cond)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )


def test_zorder_roundtrip_lossless(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    out = tempfile.mkdtemp(prefix="zorder_") + "/t"
    write_zordered(li, out, ["l_orderkey", "l_partkey"], num_files=8)
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    a = li.agg(F.sum("l_extendedprice"), F.sum("l_quantity")).first()
    b = back.agg(F.sum("l_extendedprice"), F.sum("l_quantity")).first()
    # float sums reorder across the new layout — tolerance, not equality
    assert abs(a[0] - b[0]) < 1e-6 * abs(a[0])
    assert a[1] == b[1]


def test_zorder_prunes_both_dimensions(spark):
    """A box filter on EITHER z-column matches a minority of z-ordered
    files; a layout sorted by only one key clusters only that key."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    n_files = 16
    base = tempfile.mkdtemp(prefix="zorder_")
    z_path, s_path = f"{base}/z", f"{base}/s"
    write_zordered(li, z_path, ["l_orderkey", "l_partkey"], num_files=n_files)
    # contrast layout: clustered on l_orderkey only
    (
        li.repartitionByRange(n_files, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(s_path)
    )

    ok_max = li.agg(F.max("l_orderkey")).first()[0]
    pk_max = li.agg(F.max("l_partkey")).first()[0]
    ok_box = F.col("l_orderkey") <= int(ok_max * 0.1)
    pk_box = F.col("l_partkey") <= int(pk_max * 0.1)

    # the single-sort layout answers l_orderkey boxes from few files…
    assert _matching_files(spark, s_path, ok_box) <= 3
    # …but spreads l_partkey boxes over (almost) every file
    spread = _matching_files(spark, s_path, pk_box)
    assert spread >= n_files * 0.75, spread

    # z-order keeps BOTH dimensions clustered: each 10% box touches a
    # minority of files
    z_ok = _matching_files(spark, z_path, ok_box)
    z_pk = _matching_files(spark, z_path, pk_box)
    assert z_ok <= n_files * 0.5, z_ok
    assert z_pk <= n_files * 0.5, z_pk
    # and strictly beats the single-sort layout on the second dimension
    assert z_pk < spread, (z_pk, spread)


def test_zorder_key_bit_budget(spark):
    df = spark.range(10).select(F.col("id").alias("a"), F.col("id").alias("b"))
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b"], bits=32)


def test_zorder_null_and_empty_inputs(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from pandasql_spark.operators.zorder import write_zordered, zorder_key

    # empty frame / all-NULL column → clear error, not a TypeError
    empty = spark.createDataFrame([], "x long, y long")
    with pytest.raises(ValueError, match="no non-NULL values"):
        zorder_key(empty, ["x", "y"])
    all_null = spark.range(10).withColumn("x", F.lit(None).cast("long"))
    with pytest.raises(ValueError, match="no non-NULL values"):
        zorder_key(all_null, ["x", "id"])

    # scattered NULLs quantize into slot 0 instead of poisoning the key
    df = spark.range(100).select(
        F.col("id").alias("x"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("y"),
    )
    keyed, key = zorder_key(df, ["x", "y"], bits=8)
    got = keyed.withColumn("k", key).toPandas()
    assert got["k"].notna().all()  # every row keyed, NULLs included
    p = str(tmp_path / "znull")
    write_zordered(df, p, ["x", "y"], num_files=4, bits=8)
    back = spark.read.parquet(p)
    assert back.count() == 100
    assert back.filter(F.col("y").isNull()).count() == 10
