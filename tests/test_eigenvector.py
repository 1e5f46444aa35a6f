"""Eigenvector centrality: nx parity (undirected, directed, weighted),
bipartite +I-shift stability, fixed-iteration mode."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark import DiGraph, Graph
from arkouda_njit_spark.operators import eigenvector_centrality


def _graph(spark, edges, cls=Graph, weights=None):
    if weights is None:
        weights = [1.0] * len(edges)
    df = spark.createDataFrame(
        [(a, b, w) for (a, b), w in zip(edges, weights)],
        "src long, dst long, weight double",
    )
    return cls.from_edges(spark, df, weighted=True)


def _collect(df):
    return {r["vid"]: r["eigenvector"] for r in df.collect()}


def test_karate_matches_networkx(spark):
    G = nx.karate_club_graph()
    got = _collect(eigenvector_centrality(_graph(spark, list(G.edges()))))
    want = nx.eigenvector_centrality(G)
    for v, x in want.items():
        assert got[v] == pytest.approx(x, abs=1e-5)


def test_directed_matches_networkx(spark):
    e = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 2), (3, 1), (1, 3)]
    G = nx.DiGraph(e)
    got = _collect(eigenvector_centrality(_graph(spark, e, DiGraph)))
    want = nx.eigenvector_centrality(G, max_iter=500)
    for v, x in want.items():
        assert got[v] == pytest.approx(x, abs=1e-5)


def test_weighted_matches_networkx(spark):
    e = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    w = [3.0, 1.0, 2.0, 1.0, 5.0]
    G = nx.Graph()
    for (a, b), wt in zip(e, w):
        G.add_edge(a, b, weight=wt)
    got = _collect(eigenvector_centrality(_graph(spark, e, weights=w), weighted=True))
    want = nx.eigenvector_centrality(G, weight="weight")
    for v, x in want.items():
        assert got[v] == pytest.approx(x, abs=1e-5)


def test_bipartite_converges(spark):
    # pure power iteration on A oscillates on bipartite graphs; the +I
    # shift (nx semantics) must converge to the principal eigenvector
    e = [(0, 10), (0, 11), (1, 10), (2, 11), (2, 12)]
    g = _graph(spark, e)
    label_of = {r["vid"]: r["label"] for r in g.vertices.collect()}
    got = {label_of[v]: x for v, x in _collect(eigenvector_centrality(g)).items()}
    G = nx.Graph(e)
    want = nx.eigenvector_centrality(G)
    for v, x in want.items():
        assert got[v] == pytest.approx(x, abs=1e-5)


def test_fixed_iteration_mode(spark):
    e = [(i, (i + 1) % 6) for i in range(6)]  # 6-cycle: uniform centrality
    got = _collect(eigenvector_centrality(_graph(spark, e), max_iterations=5, tol=0.0))
    vals = list(got.values())
    assert all(v == pytest.approx(vals[0], abs=1e-12) for v in vals)
    assert sum(v * v for v in vals) == pytest.approx(1.0, abs=1e-9)
