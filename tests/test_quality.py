"""Partition quality metrics (conductance / cut / coverage) vs networkx."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark import DiGraph, Graph
from arkouda_njit_spark.operators import conductance, coverage, edge_cut

EDGES = [
    (0, 1), (0, 2), (1, 2),          # community 0
    (3, 4), (4, 5), (3, 5), (4, 6),  # community 1
    (2, 3), (0, 6),                  # cross edges
    (7, 8),                          # community 2, isolated pair
]
ASSIGN = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1, 6: 1, 7: 2, 8: 2}


def _setup(spark, directed=False):
    cls = DiGraph if directed else Graph
    g = cls.from_edges(spark, [u for u, _ in EDGES], [v for _, v in EDGES])
    lbl = {r["vid"]: r["label"] for r in g.vertices.collect()}
    assign = g.edges.sparkSession.createDataFrame(
        [(vid, ASSIGN[label]) for vid, label in lbl.items()],
        "vid long, community long",
    )
    return g, lbl, assign


def test_conductance_matches_nx(spark):
    g, lbl, assign = _setup(spark)
    nxg = nx.Graph(EDGES)
    got = {r["community"]: r for r in conductance(g, assign).collect()}
    for comm in (0, 1, 2):
        members = {n for n, c in ASSIGN.items() if c == comm}
        want_cut = nx.cut_size(nxg, members)
        want_vol = nx.volume(nxg, members)
        assert got[comm]["cut"] == pytest.approx(want_cut), comm
        assert got[comm]["volume"] == pytest.approx(want_vol), comm
        if members != set(nxg.nodes):
            want_phi = nx.conductance(nxg, members)
            assert got[comm]["conductance"] == pytest.approx(want_phi), comm


def test_conductance_whole_graph_community_is_null(spark):
    g, lbl, _ = _setup(spark)
    assign = g.edges.sparkSession.createDataFrame(
        [(vid, 0) for vid in lbl], "vid long, community long"
    )
    rows = conductance(g, assign).collect()
    assert len(rows) == 1
    assert rows[0]["cut"] == 0.0
    assert rows[0]["conductance"] is None


def test_edge_cut_and_coverage_match_nx(spark):
    g, lbl, assign = _setup(spark)
    nxg = nx.Graph(EDGES)
    parts = [
        {n for n, c in ASSIGN.items() if c == k} for k in sorted(set(ASSIGN.values()))
    ]
    want_cov, _ = nx.algorithms.community.partition_quality(nxg, parts)
    assert coverage(g, assign) == pytest.approx(want_cov)
    want_cut = sum(
        1 for u, v in nxg.edges if ASSIGN[u] != ASSIGN[v]
    )
    assert edge_cut(g, assign) == pytest.approx(want_cut)


def test_directed_cut_counts_both_directions(spark):
    g, lbl, assign = _setup(spark, directed=True)
    nxg = nx.DiGraph(EDGES)
    got = {r["community"]: r for r in conductance(g, assign).collect()}
    s0 = {n for n, c in ASSIGN.items() if c == 0}
    # nx directed cut_size already counts both directions (S->T and T->S)
    want = nx.cut_size(nxg, s0, set(nxg.nodes) - s0)
    assert got[0]["cut"] == pytest.approx(want)
