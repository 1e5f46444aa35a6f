"""Generator parity — deterministic (class counts) + seeded determinism
and partition invariance for the random families."""

import networkx as nx

from arkouda_njit_spark import Graph
from arkouda_njit_spark.sources import (
    complete_graph,
    gnp_random_graph,
    karate_club_graph,
    path_graph,
    random_tree,
    rmat_graph,
    watts_strogatz_graph,
)


def test_complete_graph(spark):
    g = Graph.from_edges(spark, complete_graph(spark, 6))
    assert (g.n_vertices, g.n_edges) == (6, 15)
    assert all(r["degree"] == 5 for r in g.degree().collect())


def test_path_graph(spark):
    g = Graph.from_edges(spark, path_graph(spark, 7))
    assert (g.n_vertices, g.n_edges) == (7, 6)


def test_karate_club(spark):
    g = Graph.from_edges(spark, karate_club_graph(spark))
    nxg = nx.karate_club_graph()
    assert (g.n_vertices, g.n_edges) == (len(nxg), nxg.size())
    vid_to_label = {r["vid"]: r["label"] for r in g.vertices.collect()}
    got = {vid_to_label[r["vid"]]: r["degree"] for r in g.degree().collect()}
    assert got == dict(nxg.degree())


def test_random_tree_is_tree(spark):
    g = Graph.from_edges(spark, random_tree(spark, 50, seed=7))
    # n vertices, n-1 distinct edges, connected = a tree
    assert g.n_vertices == 50
    assert g.n_edges == 49
    from arkouda_njit_spark.operators import connected_components

    assert connected_components(g).select("component").distinct().count() == 1


def test_gnp_deterministic_and_partition_invariant(spark):
    e1 = sorted(map(tuple, gnp_random_graph(spark, 60, 0.1, seed=3).collect()))
    e2 = sorted(map(tuple, gnp_random_graph(spark, 60, 0.1, seed=3).repartition(7).collect()))
    assert e1 == e2 and len(e1) > 0
    e3 = sorted(map(tuple, gnp_random_graph(spark, 60, 0.1, seed=4).collect()))
    assert e1 != e3


def test_rmat_shape_and_skew(spark):
    df = rmat_graph(spark, scale=8, edge_factor=4, seed=1)
    assert df.count() == 4 * 2**8
    g = Graph.from_edges(spark, df)
    degs = sorted((r["degree"] for r in g.degree().collect()), reverse=True)
    # power-law-ish: top vertex way above median
    assert degs[0] > 5 * degs[len(degs) // 2]
    # determinism
    a = sorted(map(tuple, rmat_graph(spark, 6, 2, seed=9).collect()))
    b = sorted(map(tuple, rmat_graph(spark, 6, 2, seed=9).repartition(5).collect()))
    assert a == b


def test_watts_strogatz(spark):
    df = watts_strogatz_graph(spark, 40, 4, 0.1, seed=2)
    assert df.count() == 40 * 2
    g = Graph.from_edges(spark, df)
    assert g.n_vertices == 40
