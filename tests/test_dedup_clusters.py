"""Pair→cluster transitive closure and canonical-representative selection."""

import pytest

from arkouda_njit_spark.functions import dedup_clusters, keep_canonical

# transitive chain 1~2~3, a pair 10~11, a self-pair 20~20, singleton 30
PAIRS = [(1, 2), (2, 3), (10, 11), (20, 20)]


def _pairs(spark):
    return spark.createDataFrame(PAIRS, "a long, b long")


def test_clusters_are_transitive_min_labeled(spark):
    got = {
        r["doc_id"]: r["cluster"] for r in dedup_clusters(_pairs(spark)).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_keep_canonical_default_min_id(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (1, 2, 3, 10, 11, 20, 30)],
        "doc_id long, text string",
    )
    kept = keep_canonical(docs, _pairs(spark))
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 10, 20, 30]
    assert kept.columns == docs.columns


def test_keep_canonical_prefers_quality(spark):
    docs = spark.createDataFrame(
        [(1, 0.1), (2, 0.9), (3, 0.9), (10, 0.5), (11, 0.2), (30, 0.0)],
        "doc_id long, quality double",
    )
    kept = sorted(
        r["doc_id"]
        for r in keep_canonical(docs, _pairs(spark), prefer="quality").collect()
    )
    # cluster {1,2,3}: quality tie 2 vs 3 -> min id 2; {10,11}: 10; singletons
    assert kept == [2, 10, 30]


def test_docs_absent_from_pairs_survive_untouched(spark):
    docs = spark.createDataFrame([(100, "x"), (101, "x")], "doc_id long, text string")
    kept = keep_canonical(docs, _pairs(spark))
    assert kept.count() == 2
