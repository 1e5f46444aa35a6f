"""Weighted shortest paths: nx.dijkstra parity, multi-source, unreachable
absence, negative-weight contract, determinism across partitionings."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark import DiGraph, Graph
from arkouda_njit_spark.operators import shortest_paths


WEIGHTED = [
    (0, 1, 4.0), (0, 2, 1.0), (2, 1, 2.0), (1, 3, 1.0),
    (2, 3, 5.0), (3, 4, 3.0), (0, 4, 10.0), (4, 5, 1.0),
]


def _graph(spark, rows, cls=Graph):
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    return cls.from_edges(spark, df, weighted=True)


def _nx(rows, directed=False):
    G = nx.DiGraph() if directed else nx.Graph()
    for a, b, w in rows:
        G.add_edge(a, b, weight=w)
    return G


def _dists(g, df, root_label=None):
    label_of = {r["vid"]: r["label"] for r in g.vertices.collect()}
    out = {}
    for r in df.collect():
        out.setdefault(label_of[r["root"]], {})[label_of[r["vid"]]] = r["dist"]
    return out if root_label is None else out[root_label]


def test_dijkstra_parity_undirected(spark):
    g = _graph(spark, WEIGHTED)
    got = _dists(g, shortest_paths(g, 0), root_label=0)
    want = nx.single_source_dijkstra_path_length(_nx(WEIGHTED), 0, weight="weight")
    assert got == pytest.approx(want)


def test_dijkstra_parity_directed(spark):
    g = _graph(spark, WEIGHTED, DiGraph)
    got = _dists(g, shortest_paths(g, 0), root_label=0)
    want = nx.single_source_dijkstra_path_length(
        _nx(WEIGHTED, directed=True), 0, weight="weight"
    )
    assert got == pytest.approx(want)


def test_multi_source_one_loop(spark):
    g = _graph(spark, WEIGHTED)
    got = _dists(g, shortest_paths(g, [0, 4]))
    G = _nx(WEIGHTED)
    for s in (0, 4):
        want = nx.single_source_dijkstra_path_length(G, s, weight="weight")
        assert got[s] == pytest.approx(want)


def test_unreachable_absent(spark):
    rows = WEIGHTED + [(100, 101, 1.0)]  # separate component
    g = _graph(spark, rows)
    got = _dists(g, shortest_paths(g, 0), root_label=0)
    assert 100 not in got and 101 not in got
    assert set(got) == {0, 1, 2, 3, 4, 5}


def test_label_correcting_beats_greedy_order(spark):
    # the cheap long path must win over the expensive direct edge even
    # though the direct edge lands first (fewer hops)
    rows = [(0, 9, 10.0)] + [(i, i + 1, 1.0) for i in range(9)]
    g = _graph(spark, rows, DiGraph)
    got = _dists(g, shortest_paths(g, 0), root_label=0)
    assert got[9] == pytest.approx(9.0)


def test_negative_weight_raises(spark):
    g = _graph(spark, [(0, 1, 1.0), (1, 2, -0.5)], DiGraph)
    with pytest.raises(ValueError, match="non-negative"):
        shortest_paths(g, 0)


def test_deterministic_across_partitionings(spark):
    rows = [(i, (i * 7 + 3) % 40, float((i % 5) + 1)) for i in range(40)]
    rows = [(a, b, w) for a, b, w in rows if a != b]
    base = spark.createDataFrame(rows, "src long, dst long, weight double")
    a = shortest_paths(
        Graph.from_edges(spark, base.repartition(3), weighted=True, num_partitions=3), 0
    ).collect()
    b = shortest_paths(
        Graph.from_edges(spark, base.repartition(13), weighted=True, num_partitions=13), 0
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
