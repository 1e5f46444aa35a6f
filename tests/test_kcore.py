"""k-core / core decomposition vs NetworkX core_number.

The reference runs this peel internally as the truss pre-stage
(TrussMsg.chpl:222-247); here it is a public operator, checked against
nx.core_number (pure-python, no scipy dependency).
"""

import networkx as nx
import pytest

from arkouda_njit_spark import DiGraph, Graph
from arkouda_njit_spark.operators import core_decomposition, k_core

from fixtures import ALGO28_DST, ALGO28_SRC, nx_graph


def _core_map(graph):
    vid_to_label = {r["vid"]: r["label"] for r in graph.vertices.collect()}
    return {
        vid_to_label[r["vid"]]: r["core"]
        for r in core_decomposition(graph).collect()
    }


def test_core_decomposition_algo28(spark):
    graph = Graph.from_edges(spark, ALGO28_SRC, ALGO28_DST)
    nxg = nx_graph(ALGO28_SRC, ALGO28_DST)
    nxg.remove_edges_from(nx.selfloop_edges(nxg))
    assert _core_map(graph) == nx.core_number(nxg)


def test_core_decomposition_karate(spark):
    nxg = nx.karate_club_graph()
    src = [u for u, v in nxg.edges()]
    dst = [v for u, v in nxg.edges()]
    graph = Graph.from_edges(spark, src, dst)
    assert _core_map(graph) == nx.core_number(nxg)


def test_k_core_matches_decomposition(spark):
    nxg = nx.karate_club_graph()
    src = [u for u, v in nxg.edges()]
    dst = [v for u, v in nxg.edges()]
    graph = Graph.from_edges(spark, src, dst)
    cores = nx.core_number(nxg)
    label_of = {r["vid"]: r["label"] for r in graph.vertices.collect()}
    for k in (1, 2, 3, 4):
        got = sorted(label_of[r["vid"]] for r in k_core(graph, k).collect())
        want = sorted(v for v, c in cores.items() if c >= k)
        assert got == want, k
    # beyond the degeneracy the k-core is empty
    assert k_core(graph, max(cores.values()) + 1).count() == 0


def test_k_core_zero_includes_isolated(spark):
    # vertex 9 appears only via a self-loop (kept at build, ignored by the
    # simple undirected view) -> degree 0 for peeling purposes
    graph = Graph.from_edges(spark, [0, 1, 2, 9], [1, 2, 0, 9], no_self_loops=False)
    assert k_core(graph, 0).count() == 4
    assert sorted(r["vid"] for r in k_core(graph, 2).collect()) == sorted(
        r["vid"]
        for r in graph.vertices.filter("label in (0,1,2)").select("vid").collect()
    )
    cores = _core_map(graph)
    assert cores[9] == 0 and cores[0] == cores[1] == cores[2] == 2


def test_core_decomposition_digraph_uses_undirected_view(spark):
    g = DiGraph.from_edges(spark, [0, 1, 2, 0], [1, 2, 0, 3])
    nxg = nx.Graph([(0, 1), (1, 2), (2, 0), (0, 3)])
    assert _core_map(g) == nx.core_number(nxg)


def test_core_peel_runs_to_fixpoint_on_long_path(spark):
    """A path graph's 2-core is empty but peels only ~2 edges per round
    from the ends — a silently-capped peel returns a superset of the core
    and wrong core numbers (round-4 ADVICE #1). The peel now runs to the
    fixpoint by default; an explicit cap raises instead of lying."""
    import networkx as nx

    n = 30
    g = Graph.from_edges(spark, list(range(n - 1)), list(range(1, n)))
    got = _core_map(g)
    assert got == nx.core_number(nx.path_graph(n))
    assert set(got.values()) == {1}

    from arkouda_njit_spark.operators.ktruss import _core_edges
    from arkouda_njit_spark.operators.triangles import _undirected_simple_edges

    with pytest.raises(RuntimeError, match="did not converge"):
        _core_edges(_undirected_simple_edges(g), 2, max_rounds=3)
