"""Triadic census vs networkx.triadic_census (differential oracle).

The reference's triad workload (arachne/benchmarks/triads.py) matches 13
connected triad patterns by subgraph isomorphism; our closed-form census
must agree with NetworkX on every one of the 16 classes, including the
disconnected ones the scalar algebra derives."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark import DiGraph, Graph
from arkouda_njit_spark.operators import TRIAD_NAMES, triadic_census


def _spark_census(spark, edges):
    df = spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in edges], "src long, dst long, weight double"
    )
    g = DiGraph.from_edges(spark, df, num_partitions=4)
    rows = triadic_census(g).collect()
    return {r["triad_type"]: r["count"] for r in rows}


@pytest.mark.parametrize("n,p,seed", [(25, 0.08, 1), (30, 0.15, 2), (20, 0.3, 3)])
def test_census_matches_networkx_gnp(spark, n, p, seed):
    G = nx.gnp_random_graph(n, p, directed=True, seed=seed)
    # the engine's vertex universe is edge-incident vertices; align nx
    G.remove_nodes_from(list(nx.isolates(G)))
    expected = nx.triadic_census(G)
    got = _spark_census(spark, G.edges())
    assert got == dict(expected)


def test_census_dense_with_mutual_pairs(spark):
    # layered graph with many mutual dyads: u->v for |u-v| <= 2, plus the
    # reverse when (u+v) is even => mix of mutual and asymmetric dyads
    edges = []
    for u in range(18):
        for v in range(18):
            if u != v and abs(u - v) <= 2:
                if u < v or (u + v) % 2 == 0:
                    edges.append((u, v))
    G = nx.DiGraph(edges)
    expected = nx.triadic_census(G)
    got = _spark_census(spark, edges)
    assert got == dict(expected)


def test_census_drops_self_loops_and_orders_rows(spark):
    edges = [(0, 1), (1, 2), (2, 0), (1, 1)]  # one self-loop
    G = nx.DiGraph([(u, v) for u, v in edges if u != v])
    expected = nx.triadic_census(G)
    got = _spark_census(spark, edges)
    assert got == dict(expected)
    assert got["030C"] == 1
    # row order is the canonical TRIAD_NAMES order
    df_edges = [(int(u), int(v), 1.0) for u, v in edges]
    g = DiGraph.from_edges(
        spark,
        spark.createDataFrame(df_edges, "src long, dst long, weight double"),
        num_partitions=4,
    )
    assert [r["triad_type"] for r in triadic_census(g).collect()] == list(TRIAD_NAMES)


def test_census_requires_directed(spark):
    df = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    g = Graph.from_edges(spark, df, num_partitions=2)
    with pytest.raises(ValueError):
        triadic_census(g)
