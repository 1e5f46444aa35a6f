"""PageRank vs networkx.pagerank (allclose 1e-6 — north rule)."""

import networkx as nx
import pytest

from arkouda_njit_spark import DiGraph, Graph
from arkouda_njit_spark.operators import pagerank

from fixtures import ALGO28_DST, ALGO28_SRC, ALGO28_WGT, nx_graph, python_pagerank


def _compare(graph, nxg, weight=None):
    ranks = {r["vid"]: r["rank"] for r in pagerank(graph, weight=weight).collect()}
    vid_to_label = {r["vid"]: r["label"] for r in graph.vertices.collect()}
    expected = python_pagerank(nxg, alpha=0.85, tol=1e-6, weight=weight)
    for vid, rank in ranks.items():
        assert rank == pytest.approx(expected[vid_to_label[vid]], abs=1e-6)


def test_pagerank_undirected(spark):
    graph = Graph.from_edges(spark, ALGO28_SRC, ALGO28_DST)
    _compare(graph, nx_graph(ALGO28_SRC, ALGO28_DST))


def test_pagerank_directed_with_dangling(spark):
    graph = DiGraph.from_edges(spark, ALGO28_SRC, ALGO28_DST)
    nxg = nx_graph(ALGO28_SRC, ALGO28_DST, directed=True)
    nxg.remove_edges_from(nx.selfloop_edges(nxg))
    nxg.remove_nodes_from([v for v, d in nxg.degree() if d == 0])
    _compare(graph, nxg)


def test_pagerank_weighted(spark):
    # distinct edges only (nx overwrites duplicate weights; we sum) — use a
    # clean weighted triangle+tail
    src = [0, 1, 2, 2]
    dst = [1, 2, 0, 3]
    wgt = [1.0, 2.0, 3.0, 4.0]
    graph = Graph.from_edges(spark, src, dst, wgt)
    _compare(graph, nx_graph(src, dst, wgt), weight="weight")
