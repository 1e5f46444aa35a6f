"""Closeness / Katz / reciprocity vs networkx."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark import DiGraph, Graph
from arkouda_njit_spark.operators import (
    closeness_centrality,
    katz_centrality,
    reciprocity,
    vertex_reciprocity,
)

EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (4, 0), (2, 4), (5, 6)]


def _g(spark, directed, edges=EDGES):
    cls = DiGraph if directed else Graph
    g = cls.from_edges(spark, [u for u, _ in edges], [v for _, v in edges])
    return g, {r["vid"]: r["label"] for r in g.vertices.collect()}


@pytest.mark.parametrize("directed", [False, True])
def test_closeness_exact_matches_nx(spark, directed):
    g, lbl = _g(spark, directed)
    got = {
        lbl[r["vid"]]: r["closeness"] for r in closeness_centrality(g).collect()
    }
    nxg = (nx.DiGraph if directed else nx.Graph)(EDGES)
    want = nx.closeness_centrality(nxg)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_closeness_sampled_converges_to_inverse_avg_distance(spark):
    # connected ring: Eppstein–Wang with k=n equals (n-1)/Σd = nx value
    ring = [(i, (i + 1) % 12) for i in range(12)]
    g, lbl = _g(spark, False, ring)
    exact = nx.closeness_centrality(nx.Graph(ring))
    got = {
        lbl[r["vid"]]: r["closeness"]
        for r in closeness_centrality(g, sample_size=12).collect()
    }
    for v, c in exact.items():
        assert got[v] == pytest.approx(c, abs=1e-9), v


def test_closeness_exact_guard(spark):
    g, _ = _g(spark, False)
    with pytest.raises(ValueError):
        closeness_centrality(g, max_exact_vertices=3)
    assert closeness_centrality(g, max_exact_vertices=3, exact=True).count() == 7


@pytest.mark.parametrize("directed", [False, True])
def test_katz_matches_nx(spark, directed):
    g, lbl = _g(spark, directed)
    got = {
        lbl[r["vid"]]: r["katz"]
        for r in katz_centrality(g, alpha=0.1, tol=1e-10).collect()
    }
    nxg = (nx.DiGraph if directed else nx.Graph)(EDGES)
    want = nx.katz_centrality(nxg, alpha=0.1, tol=1e-10, max_iter=5000)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-7), v


def test_reciprocity_matches_nx(spark):
    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4)]
    g, lbl = _g(spark, True, edges)
    nxg = nx.DiGraph(edges)
    assert reciprocity(g) == pytest.approx(nx.overall_reciprocity(nxg), abs=1e-12)
    got = {
        lbl[r["vid"]]: r["reciprocity"]
        for r in vertex_reciprocity(g).collect()
    }
    want = nx.reciprocity(nxg, nodes=nxg.nodes())
    for v, w in want.items():
        assert got[v] == pytest.approx(w, abs=1e-12), v


def test_reciprocity_empty_raises(spark):
    g = DiGraph.from_edges(spark, [0], [0])  # only a self-loop
    with pytest.raises(ValueError):
        reciprocity(g)
