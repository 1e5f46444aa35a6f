"""Betweenness centrality: nx parity (exact, normalized and not, directed
and undirected), sampled-estimator sanity, guard rail, determinism."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark import DiGraph, Graph
from arkouda_njit_spark.operators import betweenness_centrality


def _graph(spark, edges, cls=Graph):
    df = spark.createDataFrame(edges, "src long, dst long").withColumn(
        "weight", F.lit(1.0)
    )
    return cls.from_edges(spark, df, weighted=True)


def _nx(edges, directed=False):
    G = nx.DiGraph() if directed else nx.Graph()
    G.add_edges_from(edges)
    return G


def _collect(df):
    return {r["vid"]: r["betweenness"] for r in df.collect()}


def test_path_graph_exact(spark):
    # 0-1-2-3-4: closed form, middle vertex carries the most pairs
    e = [(i, i + 1) for i in range(4)]
    got = _collect(betweenness_centrality(_graph(spark, e), normalized=False))
    want = nx.betweenness_centrality(_nx(e), normalized=False)
    for v, b in want.items():
        assert got[v] == pytest.approx(b, abs=1e-9)


def test_karate_exact_normalized_matches_networkx(spark):
    G = nx.karate_club_graph()
    e = list(G.edges())
    got = _collect(betweenness_centrality(_graph(spark, e)))
    want = nx.betweenness_centrality(G)
    assert len(got) == 34
    for v, b in want.items():
        assert got[v] == pytest.approx(b, abs=1e-9)


def test_directed_exact_matches_networkx(spark):
    e = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (0, 2), (2, 0)]
    got = _collect(
        betweenness_centrality(_graph(spark, e, DiGraph), normalized=False)
    )
    want = nx.betweenness_centrality(_nx(e, directed=True), normalized=False)
    for v, b in want.items():
        assert got[v] == pytest.approx(b, abs=1e-9)


def test_disconnected_components(spark):
    # labels are NOT contiguous: exercises the internal-vid -> label map
    e = [(0, 1), (1, 2), (10, 11), (11, 12), (12, 13)]
    g = _graph(spark, e)
    label_of = {r["vid"]: r["label"] for r in g.vertices.collect()}
    got = {
        label_of[v]: b
        for v, b in _collect(betweenness_centrality(g, normalized=False)).items()
    }
    want = nx.betweenness_centrality(_nx(e), normalized=False)
    for v, b in want.items():
        assert got[v] == pytest.approx(b, abs=1e-9)


def test_sampled_estimator_tracks_exact(spark):
    # sampled roots with the n/k rescale: unbiased, and on a structured
    # graph a 60% sample must preserve the clear ranking (hub >> leaves)
    G = nx.barbell_graph(6, 3)  # two cliques joined by a path — bridge
    e = list(G.edges())
    g = _graph(spark, e)
    exact = _collect(betweenness_centrality(g, normalized=False))
    est = _collect(
        betweenness_centrality(g, sample_size=9, seed=3, normalized=False)
    )
    bridge = [6, 7, 8]  # the path vertices carry all cross-clique pairs
    for b in bridge:
        assert est[b] > max(est[v] for v in range(5))  # clique interiors
    # estimator within 2x of exact on the heavy vertices (k=9 of n=15)
    for b in bridge:
        assert est[b] == pytest.approx(exact[b], rel=0.8)


def test_sampled_deterministic_across_partitionings(spark):
    e = [(i, (i * 7 + 1) % 30) for i in range(30)] + [(i, (i + 1) % 30) for i in range(30)]
    e = [(a, b) for a, b in e if a != b]
    base = spark.createDataFrame(e, "src long, dst long").withColumn(
        "weight", F.lit(1.0)
    )
    a = betweenness_centrality(
        Graph.from_edges(spark, base.repartition(3), num_partitions=3),
        sample_size=10,
    ).collect()
    b = betweenness_centrality(
        Graph.from_edges(spark, base.repartition(11), num_partitions=11),
        sample_size=10,
    ).collect()
    assert sorted((r["vid"], round(r["betweenness"], 12)) for r in a) == sorted(
        (r["vid"], round(r["betweenness"], 12)) for r in b
    )


def test_exact_guard_rail(spark):
    e = [(i, i + 1) for i in range(20)]
    g = _graph(spark, e)
    with pytest.raises(ValueError, match="exact betweenness"):
        betweenness_centrality(g, max_exact_vertices=10)
    # explicit opt-in works
    out = betweenness_centrality(g, max_exact_vertices=10, exact=True)
    assert out.count() == 21
