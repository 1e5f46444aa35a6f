"""Clustering coefficients / transitivity / assortativity vs NetworkX."""

import networkx as nx
import pytest

from arkouda_njit_spark import Graph
from arkouda_njit_spark.operators import (
    clustering_coefficients,
    degree_assortativity,
    transitivity,
)

from fixtures import ALGO28_DST, ALGO28_SRC, nx_graph


def _graph_pair(spark, src, dst):
    g = Graph.from_edges(spark, src, dst)
    nxg = nx_graph(src, dst)
    nxg.remove_edges_from(nx.selfloop_edges(nxg))
    return g, nxg


def test_clustering_algo28(spark):
    g, nxg = _graph_pair(spark, ALGO28_SRC, ALGO28_DST)
    label_of = {r["vid"]: r["label"] for r in g.vertices.collect()}
    got = {
        label_of[r["vid"]]: r["clustering"]
        for r in clustering_coefficients(g).collect()
    }
    want = nx.clustering(nxg)
    assert set(got) == set(want)
    assert all(abs(got[v] - want[v]) < 1e-12 for v in want)


def test_clustering_karate(spark):
    nxg = nx.karate_club_graph()
    g = Graph.from_edges(spark, *zip(*nxg.edges()))
    label_of = {r["vid"]: r["label"] for r in g.vertices.collect()}
    got = {
        label_of[r["vid"]]: r["clustering"]
        for r in clustering_coefficients(g).collect()
    }
    want = nx.clustering(nxg)
    assert all(abs(got[v] - want[v]) < 1e-12 for v in want)
    assert abs(transitivity(g) - nx.transitivity(nxg)) < 1e-12
    assert (
        abs(degree_assortativity(g) - nx.degree_assortativity_coefficient(nxg))
        < 1e-9
    )


def test_transitivity_and_assortativity_algo28(spark):
    g, nxg = _graph_pair(spark, ALGO28_SRC, ALGO28_DST)
    assert abs(transitivity(g) - nx.transitivity(nxg)) < 1e-12
    assert (
        abs(degree_assortativity(g) - nx.degree_assortativity_coefficient(nxg))
        < 1e-9
    )


def test_degenerate_graphs(spark):
    # star: every leaf deg 1 -> clustering 0 everywhere; assortativity
    # variance is degenerate on a regular pairing -> defined 0.0 here
    g = Graph.from_edges(spark, [0, 0, 0], [1, 2, 3])
    rows = clustering_coefficients(g).collect()
    assert all(r["clustering"] == 0.0 for r in rows)
    assert transitivity(g) == 0.0
    # path of 2 vertices: both ends deg 1
    g2 = Graph.from_edges(spark, [0], [1])
    assert degree_assortativity(g2) == 0.0
