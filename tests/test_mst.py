"""Borůvka minimum spanning forest vs networkx."""

import random

import networkx as nx
import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark import Graph
from arkouda_njit_spark.operators import minimum_spanning_forest


def _spark_msf(spark, weighted_edges):
    df = spark.createDataFrame(weighted_edges, "src long, dst long, weight double")
    g = Graph.from_edges(spark, df)
    lbl = {r["vid"]: r["label"] for r in g.vertices.collect()}
    rows = minimum_spanning_forest(g).collect()
    return {
        (min(lbl[r["u"]], lbl[r["v"]]), max(lbl[r["u"]], lbl[r["v"]])): r["weight"]
        for r in rows
    }


def test_msf_unique_weights_exact_edge_set(spark):
    rng = random.Random(7)
    nxg = nx.gnp_random_graph(40, 0.15, seed=11)
    weights = rng.sample(range(1, 10_000), nxg.number_of_edges())
    edges = [
        (u, v, float(w)) for (u, v), w in zip(sorted(nxg.edges()), weights)
    ]
    nxw = nx.Graph()
    nxw.add_weighted_edges_from(edges)
    want = {
        (min(u, v), max(u, v)): d["weight"]
        for u, v, d in nx.minimum_spanning_edges(nxw, algorithm="boruvka", data=True)
    }
    got = _spark_msf(spark, edges)
    assert got == want


def test_msf_with_ties_total_weight_and_size(spark):
    # all weights from {1.0, 2.0}: many valid MSTs; total weight and edge
    # count must still match any reference MST, and the output must be a
    # forest spanning each component
    rng = random.Random(3)
    nxg = nx.gnp_random_graph(30, 0.2, seed=5)
    edges = [(u, v, float(rng.choice([1.0, 2.0]))) for u, v in sorted(nxg.edges())]
    nxw = nx.Graph()
    nxw.add_weighted_edges_from(edges)
    want_total = sum(
        d["weight"] for _, _, d in nx.minimum_spanning_edges(nxw, data=True)
    )
    got = _spark_msf(spark, edges)
    n_comp = nx.number_connected_components(nxw)
    assert len(got) == nxw.number_of_nodes() - n_comp
    assert sum(got.values()) == pytest.approx(want_total)
    check = nx.Graph()
    check.add_nodes_from(nxw.nodes)
    check.add_edges_from(got.keys())
    assert nx.number_connected_components(check) == n_comp
    assert check.number_of_edges() == len(got)  # acyclic given count + comps


def test_msf_disconnected_and_deterministic(spark):
    edges = [
        (0, 1, 4.0), (1, 2, 1.0), (0, 2, 3.0),
        (5, 6, 2.0), (6, 7, 2.0), (5, 7, 2.0),
        (9, 9, 1.0),  # self-loop: never in an MSF
    ]
    got1 = _spark_msf(spark, edges)
    got2 = _spark_msf(spark, edges)
    assert got1 == got2
    # tie in the {5,6,7} triangle resolves by (weight, u, v): 5's edges win
    assert got1 == {(1, 2): 1.0, (0, 2): 3.0, (5, 6): 2.0, (5, 7): 2.0}


def test_msf_duplicate_edges_keep_min_weight(spark):
    # Graph.from_edges SUMS duplicate weights during canonicalization, so
    # feed pre-aggregated edges; the operator itself min-reduces (u,v) pairs
    # fed from a directed-style table via least/greatest
    edges = [(0, 1, 5.0), (1, 2, 2.0), (0, 2, 4.0)]
    got = _spark_msf(spark, edges)
    assert got == {(1, 2): 2.0, (0, 2): 4.0}
