"""Densest subgraph (Charikar peeling) — exact answers on structured
fixtures where the optimum is known, the 2(1+eps) guarantee on a planted
clique, and the engine's determinism/invariance contracts."""

import networkx as nx
import pytest

from arkouda_njit_spark import Graph
from arkouda_njit_spark.operators.densest import densest_subgraph


def _vids(g, res):
    lab = {r["vid"]: r["label"] for r in g.vertices.collect()}
    return {lab[r["vid"]] for r in res.vertices.collect()}


def test_clique_is_its_own_densest(spark):
    n = 9
    g = Graph.from_edges(spark, *zip(*nx.complete_graph(n).edges()))
    res = densest_subgraph(g, epsilon=0.0)
    assert res.density == pytest.approx((n - 1) / 2)
    assert res.n_vertices == n
    assert _vids(g, res) == set(range(n))


def test_star_best_is_whole_graph(spark):
    # K1,n: every proper subgraph has strictly lower density than n/(n+1)
    star = nx.star_graph(12)
    g = Graph.from_edges(spark, *zip(*star.edges()))
    res = densest_subgraph(g, epsilon=0.0)
    assert res.density == pytest.approx(12 / 13)
    assert res.best_round == 0
    assert _vids(g, res) == set(star.nodes)


def test_planted_clique_found(spark):
    # sparse ring of 60 + K8 planted on vertices 100..107, one bridge
    nxg = nx.cycle_graph(60)
    clique = list(range(100, 108))
    nxg.add_edges_from(nx.complete_graph(clique).edges())
    nxg.add_edge(0, 100)
    g = Graph.from_edges(spark, *zip(*nxg.edges()))

    exact = densest_subgraph(g, epsilon=0.0)
    assert _vids(g, exact) == set(clique)
    assert exact.density == pytest.approx(7 / 2)

    # with slack the guarantee is 2(1+eps); the planted optimum is 3.5
    approx = densest_subgraph(g, epsilon=0.5)
    assert approx.density >= 3.5 / (2 * 1.5)
    assert approx.rounds <= exact.rounds


def test_history_and_round_bound(spark):
    nxg = nx.gnp_random_graph(80, 0.08, seed=4)
    nxg.remove_nodes_from(list(nx.isolates(nxg)))
    g = Graph.from_edges(spark, *zip(*nxg.edges()))
    res = densest_subgraph(g, epsilon=0.3)
    # BKV bound: O(log_{1+eps} V) rounds
    import math

    assert res.rounds <= math.log(len(nxg), 1.3) + 2
    assert res.history[0][1] == len(nxg)
    assert res.density == pytest.approx(max(h[3] for h in res.history))
    # density is a real subgraph's density: verify against nx
    sub = nxg.subgraph(_vids(g, res))
    assert res.density == pytest.approx(
        sub.number_of_edges() / sub.number_of_nodes()
    )
    assert res.n_vertices == sub.number_of_nodes()
    assert res.n_edges == sub.number_of_edges()


def test_partition_invariance_and_guards(spark):
    nxg = nx.karate_club_graph()
    src, dst = zip(*nxg.edges())
    g2 = Graph.from_edges(spark, src, dst, num_partitions=2)
    g16 = Graph.from_edges(spark, src, dst, num_partitions=16)
    a = densest_subgraph(g2, epsilon=0.1)
    b = densest_subgraph(g16, epsilon=0.1)
    assert a.density == pytest.approx(b.density)
    assert _vids(g2, a) == _vids(g16, b)

    with pytest.raises(ValueError):
        densest_subgraph(g2, epsilon=-0.1)
    with pytest.raises(RuntimeError):
        densest_subgraph(g2, epsilon=0.0, max_rounds=0)
