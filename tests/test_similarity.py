"""Similarity search over the driver's embeddings table + numpy oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark.functions import (
    ann_lsh_topk,
    cosine_topk,
    embedding_near_duplicates,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def _numpy_topk(ids, mat, q, k):
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(mat, axis=1)
    cos = (mat @ qn) / np.where(norms > 0, norms, 1)
    order = np.lexsort((ids, -cos))
    return [int(ids[i]) for i in order[:k]]


def test_cosine_topk_matches_numpy(spark, emb, emb_np):
    ids, mat = emb_np
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk(emb, queries, k=5)
    got_by_q = {}
    for r in got.collect():
        got_by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cosine"]))
    for qid in (0, 1, 2):
        q = mat[list(ids).index(qid)]
        expected = _numpy_topk(ids, mat, q, 5)
        mine = [v for _, v, _ in sorted(got_by_q[qid])]
        assert mine == expected, qid
        # top hit is the query itself with cosine ~1
        top = sorted(got_by_q[qid])[0]
        assert top[1] == qid and top[2] == pytest.approx(1.0, abs=1e-9)


def test_ann_lsh_recall(spark, emb, emb_np):
    ids, mat = emb_np
    dim = mat.shape[1]
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5)
    approx = ann_lsh_topk(emb, queries, dim=dim, k=5, n_planes=4)
    # each query finds itself (same bucket trivially)
    self_hits = approx.filter(
        (F.col("query_id") == F.col("vec_id")) & (F.col("rank") == 1)
    ).count()
    assert self_hits == 10
    # recall vs exact top-5 should be meaningful (>40% with 16 buckets)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) > 0.4


def test_ann_ivf_exhaustive_equals_exact(spark, emb, emb_np):
    """nprobe == nlist probes every inverted list: IVF must return exactly
    the brute-force top-k (same ids, same order)."""
    from arkouda_njit_spark.functions import ann_ivf_topk

    ids, mat = emb_np
    dim = mat.shape[1]
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in ann_ivf_topk(
            emb, queries, dim=dim, k=5, nlist=8, nprobe=8
        ).collect()
    }
    assert ivf == exact


def test_ann_ivf_recall_and_determinism(spark, emb, emb_np):
    from arkouda_njit_spark.functions import ann_ivf_topk

    ids, mat = emb_np
    dim = mat.shape[1]
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5)
    a1 = ann_ivf_topk(emb, queries, dim=dim, k=5, nlist=8, nprobe=3)
    # each query's own list is always probed -> finds itself at rank 1
    self_hits = a1.filter(
        (F.col("query_id") == F.col("vec_id")) & (F.col("rank") == 1)
    ).count()
    assert self_hits == 10
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    s1 = {(r["query_id"], r["vec_id"]) for r in a1.collect()}
    assert len(e & s1) / len(e) > 0.4
    # deterministic quantizer: a second build returns the identical set
    a2 = ann_ivf_topk(emb, queries, dim=dim, k=5, nlist=8, nprobe=3)
    s2 = {(r["query_id"], r["vec_id"]) for r in a2.collect()}
    assert s1 == s2


def test_embedding_near_duplicates_self_consistency(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [1.0, 0.001, 0.0, 0.0]),    # near-dup of 0 and 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {
        (r["a"], r["b"]): r["cosine"]
        for r in embedding_near_duplicates(df, dim=4, threshold=0.99).collect()
    }
    assert (0, 1) in pairs and (0, 3) in pairs and (1, 3) in pairs
    assert all(v >= 0.99 for v in pairs.values())
    assert not any(2 in p for p in pairs)


def test_ivf_centroid_size_contract(spark, emb):
    """nlist*dim past MAX_CENTROID_CELLS must refuse, not collect-and-OOM."""
    import pytest as _pytest

    from arkouda_njit_spark.functions import similarity as sim

    with _pytest.raises(ValueError, match="MAX_CENTROID_CELLS"):
        sim.ivf_build(emb, dim=1_000_000, nlist=100)
