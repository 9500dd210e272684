"""IVF ANN tests (recall vs brute force on the real embeddings table) and
salted-aggregation/join equivalence tests on skewed data."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandasql_spark.functions.similarity import cosine_topk
from pandasql_spark.operators.ann import build_ivf_index, write_ivf_index
from pandasql_spark.operators.skew import salted_groupby_agg, salted_join_hot_keys

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def ivf(emb):
    return build_ivf_index(emb, nlist=8, seed=42)


def _brute_topk(spark, emb, qid, k):
    q = emb.filter(F.col("vec_id") == qid).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    return cosine_topk(emb, q, k=k).toPandas()


def test_ivf_deterministic(emb):
    i1 = build_ivf_index(emb, nlist=8, seed=42)
    i2 = build_ivf_index(emb, nlist=8, seed=42)
    a = i1.indexed.select("vec_id", "cell_id").toPandas().sort_values("vec_id")
    b = i2.indexed.select("vec_id", "cell_id").toPandas().sort_values("vec_id")
    assert a["cell_id"].tolist() == b["cell_id"].tolist()


def test_ivf_full_probe_equals_brute_force(spark, emb, ivf):
    """nprobe = nlist → IVF must return exactly the brute-force answer."""
    qvec = emb.filter(F.col("vec_id") == 7).select("embedding").collect()[0][0]
    got = ivf.search([float(x) for x in qvec], k=11, nprobe=8).toPandas()
    got = got[got.vec_id != 7].head(10).reset_index(drop=True)
    brute = _brute_topk(spark, emb, 7, k=10)
    assert got["vec_id"].tolist() == brute["vec_id"].tolist()
    assert got["cos_sim"].tolist() == pytest.approx(brute["cos_sim"].tolist(), abs=1e-6)


def test_ivf_partial_probe_recall(spark, emb, ivf):
    """nprobe=3 of 8 cells should still recall most of the true top-10
    (recall@10 ≥ 0.5 even on near-random data, since the query's own
    cell holds its closest neighbors)."""
    qvec = emb.filter(F.col("vec_id") == 7).select("embedding").collect()[0][0]
    got = ivf.search([float(x) for x in qvec], k=11, nprobe=3).toPandas()
    got = set(got[got.vec_id != 7].head(10)["vec_id"])
    brute = set(_brute_topk(spark, emb, 7, k=10)["vec_id"])
    assert len(got & brute) >= 5, (got, brute)


def test_ivf_index_partition_pruning(spark, emb, ivf, tmp_path):
    path = str(tmp_path / "ivf")
    write_ivf_index(ivf, path)
    reread = spark.read.parquet(path)
    plan = reread.filter(F.col("cell_id").isin([1, 2]))._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell_id" in plan or "cell_id IN" in plan, plan[:500]


def test_salted_groupby_equals_plain(spark):
    # skewed: 90% of rows share key 0
    pdf = pd.DataFrame(
        {"k": [0] * 900 + list(range(1, 101)), "v": range(1000)}
    )
    sdf = spark.createDataFrame(pdf)
    got = (
        salted_groupby_agg(sdf, ["k"], {"v": "sum"}, num_salts=8)
        .toPandas()
        .sort_values("k", ignore_index=True)
    )
    plain = (
        sdf.groupBy("k").agg(F.sum("v").alias("v"))
        .toPandas()
        .sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, plain, check_dtype=False)


def test_salted_join_equals_plain(spark):
    big = pd.DataFrame({"k": [1] * 500 + [2] * 10 + [3] * 10, "x": range(520)})
    small = pd.DataFrame({"k": [1, 2, 3, 4], "y": ["a", "b", "c", "d"]})
    sb, ss = spark.createDataFrame(big), spark.createDataFrame(small)
    got = (
        salted_join_hot_keys(sb, ss, "k", hot_keys=[1], num_salts=8)
        .toPandas()
        .sort_values(["k", "x"], ignore_index=True)
    )
    plain = sb.join(ss, "k").toPandas().sort_values(["k", "x"], ignore_index=True)
    pd.testing.assert_frame_equal(got[plain.columns], plain, check_dtype=False)
