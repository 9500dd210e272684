"""IVF ANN tests (recall vs brute force on the real embeddings table) and
salted-aggregation/join equivalence tests on skewed data."""

from __future__ import annotations

import numpy as np
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


# ---------------------------------------------------------------------------
# ann_join (batch similarity-search join)


def _brute_topk_batch(embs, qids, k):
    """numpy brute force: {qid: [(neighbor_id, cos), ...rank order]}"""
    ids = np.array([r[0] for r in embs])
    M = np.array([r[1] for r in embs], dtype=np.float64)
    norms = np.linalg.norm(M, axis=1)
    out = {}
    for qid in qids:
        q = M[ids == qid][0]
        qn = np.linalg.norm(q) or 1.0
        cos = (M @ q) / (np.where(norms == 0, 1.0, norms) * qn)
        order = sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))[:k]
        out[qid] = [(int(ids[i]), cos[i]) for i in order]
    return out


def test_ann_join_full_probe_is_brute_force(spark):
    from pandasql_spark.operators.ann import ann_join, build_ivf_index

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    embs = [(r["vec_id"], r["embedding"]) for r in e.collect()]
    idx = build_ivf_index(e, nlist=8)
    qs = e.orderBy("vec_id").limit(6)
    got = ann_join(idx, qs, k=4, nprobe=8).collect()
    qids = [r["vec_id"] for r in qs.select("vec_id").collect()]
    exp = _brute_topk_batch(embs, qids, 4)
    assert len(got) == 4 * len(qids)
    for r in got:
        nid, cos = exp[r["query_id"]][r["rank"] - 1]
        assert r["neighbor_id"] == nid
        # engine folds left-to-right over float32-typed embeddings;
        # numpy sums pairwise in float64 — equal to ~1e-7, not ulp
        assert abs(r["cos_sim"] - cos) < 1e-6


def test_ann_join_partial_probe_exact_on_separated_blobs(spark):
    """Well-separated blobs: with nprobe=1 each query probes its own
    blob's cell and still recovers the exact in-blob top-k."""
    from pandasql_spark.operators.ann import ann_join, build_ivf_index

    rng = np.random.default_rng(5)
    centers = np.eye(4) * 100.0
    rows = []
    for b in range(4):
        for i in range(30):
            v = centers[b] + rng.normal(0, 0.01, 4)
            rows.append((b * 100 + i, v.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = build_ivf_index(df, id_col="vec_id", vec_col="embedding", nlist=4)
    qs = df.filter(F.col("vec_id") % 100 == 0)  # one query per blob
    got = ann_join(idx, qs, k=3, nprobe=1).collect()
    assert len(got) == 12
    for r in got:
        # every neighbor comes from the query's own blob
        assert r["neighbor_id"] // 100 == r["query_id"] // 100
        if r["rank"] == 1:
            assert r["neighbor_id"] == r["query_id"]  # self first


def test_ann_join_plan_window_group_limit(spark):
    from pandasql_spark.operators.ann import ann_join, build_ivf_index

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = build_ivf_index(e, nlist=4)
    sdf = ann_join(idx, e.limit(3), k=2, nprobe=2)
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_ann_join_validation(spark):
    from pandasql_spark.operators.ann import ann_join, build_ivf_index

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = build_ivf_index(e, nlist=4)
    with pytest.raises(ValueError, match="k must"):
        ann_join(idx, e, k=0)
    with pytest.raises(ValueError, match="nprobe"):
        ann_join(idx, e, nprobe=0)


def test_ivf_index_cleanup_releases_cache(spark):
    """ADVICE r15: build_ivf_index persists + materializes `indexed`;
    cleanup() must release that cache (idempotently) so write-only
    callers don't hold storage-pool residency until session end."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = build_ivf_index(e, nlist=4)
    assert idx.indexed.storageLevel.useMemory  # build persisted it
    idx.cleanup()
    assert not idx.indexed.storageLevel.useMemory
    idx.cleanup()  # idempotent
    assert not idx.indexed.storageLevel.useMemory
