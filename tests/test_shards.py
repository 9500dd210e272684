"""Shard export (operators/shards.py): deterministic assignment,
manifest auditability, write round-trips, and the checksum's
corruption-detection contract."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandasql_spark.operators.shards import (
    assign_shards,
    export_shards,
    shard_manifest,
)

SF = "/root/testdata/sf0.001"


def _py_shard(key, n, salt=""):
    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:13], 16) % n


def test_assignment_matches_python_oracle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = assign_shards(docs, 8, "doc_id").select("doc_id", "shard").toPandas()
    for row in got.itertuples():
        assert row.shard == _py_shard(row.doc_id, 8)


def test_assignment_is_partitioning_invariant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = (
        assign_shards(docs, 8, "doc_id")
        .select("doc_id", "shard")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        assign_shards(docs.repartition(17, "lang"), 8, "doc_id")
        .select("doc_id", "shard")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_salt_rerolls_assignment(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = assign_shards(docs, 8, "doc_id").select("shard").toPandas()["shard"]
    b = assign_shards(docs, 8, "doc_id", salt="v2").select("shard").toPandas()[
        "shard"
    ]
    assert (a != b).any()  # astronomically unlikely to collide everywhere


def test_null_key_fails(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": [1, None], "v": ["a", "b"]})
    )
    with pytest.raises(Exception, match="NULL shard key"):
        assign_shards(df, 4, "k").collect()


def test_n_shards_validation(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError, match="n_shards"):
        assign_shards(docs, 0, "doc_id")


def test_manifest_counts_and_bytes(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    man = shard_manifest(
        assign_shards(docs, 4, "doc_id"), ["text", "lang"]
    ).toPandas()
    assert man["n_rows"].sum() == docs.count()
    pdf = docs.toPandas()
    total_bytes = int(
        pdf["text"].str.encode("utf-8").str.len().fillna(0).sum()
        + pdf["lang"].str.encode("utf-8").str.len().fillna(0).sum()
    )
    assert man["n_bytes"].sum() == total_bytes


def test_manifest_bytes_col_override(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    man = shard_manifest(
        assign_shards(docs, 4, "doc_id"), ["text"], bytes_col="n_chars"
    ).toPandas()
    assert man["n_bytes"].sum() == docs.agg(F.sum("n_chars")).collect()[0][0]


def test_checksum_is_order_independent(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with_shard = assign_shards(docs, 4, "doc_id")
    a = shard_manifest(with_shard, ["text", "lang"]).toPandas()
    b = shard_manifest(
        with_shard.orderBy(F.col("n_chars").desc()).repartition(13),
        ["text", "lang"],
    ).toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_checksum_detects_single_row_corruption(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with_shard = assign_shards(docs, 4, "doc_id")
    clean = shard_manifest(with_shard, ["text", "lang"]).toPandas()
    corrupted = with_shard.withColumn(
        "text",
        F.when(F.col("doc_id") == 0, F.lit("tampered")).otherwise(
            F.col("text")
        ),
    )
    dirty = shard_manifest(corrupted, ["text", "lang"]).toPandas()
    bad_shard = _py_shard(0, 4)
    assert (
        clean.loc[clean["shard"] == bad_shard, "checksum"].iloc[0]
        != dirty.loc[dirty["shard"] == bad_shard, "checksum"].iloc[0]
    )
    # untouched shards keep their checksums
    others = clean["shard"] != bad_shard
    pd.testing.assert_frame_equal(
        clean[others].reset_index(drop=True),
        dirty[others].reset_index(drop=True),
    )


def test_export_roundtrip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "shards")
    man = export_shards(docs, path, 8, "doc_id", ["text", "lang"]).toPandas()
    back = spark.read.parquet(path)
    # shard partition column survives; manifest recomputes identically
    man2 = shard_manifest(back, ["text", "lang"]).toPandas()
    pd.testing.assert_frame_equal(
        man,
        man2.astype(man.dtypes.to_dict()),
    )
    # partition-pruned read of one shard holds exactly the manifest's rows
    one = spark.read.parquet(path).filter(F.col("shard") == 3)
    assert one.count() == int(man.loc[man["shard"] == 3, "n_rows"].iloc[0])


def test_export_within_shard_order_is_deterministic(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    export_shards(docs, p1, 4, "doc_id", ["text"])
    export_shards(docs.repartition(9, "source"), p2, 4, "doc_id", ["text"])
    for shard in range(4):
        a = (
            spark.read.parquet(p1)
            .filter(F.col("shard") == shard)
            .select("doc_id")
            .toPandas()["doc_id"]
            .tolist()
        )
        b = (
            spark.read.parquet(p2)
            .filter(F.col("shard") == shard)
            .select("doc_id")
            .toPandas()["doc_id"]
            .tolist()
        )
        assert a == b


def test_gate_query_matches_duckdb(spark):
    """The q95 differential at sf0.001 — the gate runs it at sf0.01."""
    duckdb = pytest.importorskip("duckdb")
    from pandasql_spark.queries import REGISTRY

    qd = REGISTRY["q95_export_shards"]
    got = (
        qd.fn(spark, SF)
        .toPandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(qd.oracle).fetchdf()
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
