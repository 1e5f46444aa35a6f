"""Luby MIS and Jones–Plassmann coloring — property-complete checks
(independence + maximality, properness + bound), determinism, and
partition invariance. No reference implementation needed: the defining
properties fully characterize correct output."""

import networkx as nx
import pytest

from arkouda_njit_spark import DiGraph, Graph
from arkouda_njit_spark.operators import greedy_color, maximal_independent_set

from fixtures import ALGO28_DST, ALGO28_SRC


def _check_mis(nxg, in_mis):
    sel = {v for v, flag in in_mis.items() if flag}
    assert set(in_mis) == set(nxg.nodes)
    for u, v in nxg.edges():
        if u != v:
            assert not (u in sel and v in sel), ("independence", u, v)
    for v in nxg.nodes:
        if v not in sel:
            assert any(n in sel for n in nxg.neighbors(v) if n != v), (
                "maximality",
                v,
            )


def _check_coloring(nxg, colors):
    assert set(colors) == set(nxg.nodes)
    for u, v in nxg.edges():
        if u != v:
            assert colors[u] != colors[v], ("proper", u, v)
    for v in nxg.nodes:
        deg = len([n for n in nxg.neighbors(v) if n != v])
        assert 0 <= colors[v] <= deg, ("greedy bound", v, colors[v], deg)


def _labeled(g, df, col):
    lab = {r["vid"]: r["label"] for r in g.vertices.collect()}
    return {lab[r["vid"]]: r[col] for r in df.collect()}


@pytest.mark.parametrize(
    "builder",
    [
        nx.karate_club_graph,
        lambda: nx.path_graph(17),
        lambda: nx.complete_graph(7),
        lambda: nx.disjoint_union(nx.cycle_graph(5), nx.star_graph(9)),
    ],
)
def test_mis_and_coloring_properties(spark, builder):
    nxg = builder()
    g = Graph.from_edges(spark, *zip(*nxg.edges()))
    # isolated vertices are dropped by from_edges; restrict to the kept set
    kept = nx.Graph(nxg.edges())

    _check_mis(kept, _labeled(g, maximal_independent_set(g), "in_mis"))
    _check_coloring(kept, _labeled(g, greedy_color(g), "color"))


def test_algo28_directed_treated_as_undirected(spark):
    g = DiGraph.from_edges(spark, ALGO28_SRC, ALGO28_DST)
    nxg = nx.Graph(zip(ALGO28_SRC, ALGO28_DST))
    nxg.remove_edges_from(nx.selfloop_edges(nxg))
    # a vertex whose only edge was a self-loop is dropped by from_edges
    nxg.remove_nodes_from(list(nx.isolates(nxg)))
    _check_mis(nxg, _labeled(g, maximal_independent_set(g), "in_mis"))
    _check_coloring(nxg, _labeled(g, greedy_color(g), "color"))


def test_deterministic_and_partition_invariant(spark):
    nxg = nx.karate_club_graph()
    src, dst = zip(*nxg.edges())
    g2 = Graph.from_edges(spark, src, dst, num_partitions=2)
    g16 = Graph.from_edges(spark, src, dst, num_partitions=16)

    mis_a = _labeled(g2, maximal_independent_set(g2), "in_mis")
    mis_b = _labeled(g16, maximal_independent_set(g16), "in_mis")
    assert mis_a == mis_b

    col_a = _labeled(g2, greedy_color(g2), "color")
    col_b = _labeled(g16, greedy_color(g16), "color")
    assert col_a == col_b

    # different seed may give a different (still valid) answer
    mis_c = _labeled(g2, maximal_independent_set(g2, seed=7), "in_mis")
    _check_mis(nx.Graph(nxg.edges()), mis_c)


def test_bipartite_coloring_uses_few_colors(spark):
    # JP on a star: hub + leaves -> exactly 2 colors
    star = nx.star_graph(12)
    g = Graph.from_edges(spark, *zip(*star.edges()))
    colors = _labeled(g, greedy_color(g), "color")
    assert len(set(colors.values())) == 2
