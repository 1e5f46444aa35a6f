"""Link-prediction scores vs networkx; co-citation/coupling vs brute force."""

import itertools

import networkx as nx
import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark import DiGraph, Graph
from arkouda_njit_spark.operators import (
    bibliographic_coupling,
    cocitation,
    link_prediction,
)

EDGES = [
    (0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 0),
    (2, 5), (6, 0), (6, 1), (6, 2), (7, 8),
]


def _g(spark, edges=EDGES, directed=False):
    cls = DiGraph if directed else Graph
    g = cls.from_edges(spark, [u for u, _ in edges], [v for _, v in edges])
    lbl = {r["vid"]: r["label"] for r in g.vertices.collect()}
    return g, lbl


def _nx_expected(nxg):
    out = {}
    for u, v in itertools.combinations(sorted(nxg.nodes), 2):
        cn = len(list(nx.common_neighbors(nxg, u, v)))
        if cn == 0:
            continue
        out[(u, v)] = {
            "common_neighbors": cn,
            "jaccard": next(iter(nx.jaccard_coefficient(nxg, [(u, v)])))[2],
            "adamic_adar": next(iter(nx.adamic_adar_index(nxg, [(u, v)])))[2],
            "resource_allocation": next(
                iter(nx.resource_allocation_index(nxg, [(u, v)]))
            )[2],
            "preferential_attachment": next(
                iter(nx.preferential_attachment(nxg, [(u, v)]))
            )[2],
        }
    return out


def test_link_prediction_matches_nx(spark):
    g, lbl = _g(spark)
    nxg = nx.Graph(EDGES)
    want = _nx_expected(nxg)
    rows = link_prediction(g).collect()
    got = {
        tuple(sorted((lbl[r["u"]], lbl[r["v"]]))): r for r in rows
    }
    assert set(got) == set(want)
    for pair, exp in want.items():
        r = got[pair]
        assert r["common_neighbors"] == exp["common_neighbors"], pair
        assert r["preferential_attachment"] == exp["preferential_attachment"], pair
        for col in ("jaccard", "adamic_adar", "resource_allocation"):
            assert r[col] == pytest.approx(exp[col], abs=1e-9), (pair, col)


def test_link_prediction_candidates_path_matches_full(spark):
    g, lbl = _g(spark)
    inv = {v: k for k, v in lbl.items()}
    cand = g.edges.sparkSession.createDataFrame(
        [(inv[0], inv[3]), (inv[1], inv[5]), (inv[7], inv[8])], ["u", "v"]
    )
    rows = link_prediction(g, candidates=cand).collect()
    got = {tuple(sorted((lbl[r["u"]], lbl[r["v"]]))): r for r in rows}
    # (7,8) has no common neighbor -> absent; the two others match nx
    assert set(got) == {(0, 3), (1, 5)}
    nxg = nx.Graph(EDGES)
    want = _nx_expected(nxg)
    for pair in got:
        assert got[pair]["adamic_adar"] == pytest.approx(
            want[pair]["adamic_adar"], abs=1e-9
        )


def test_link_prediction_salted_hub_path_identical(spark):
    # star hub of degree 12 with hub_threshold=4 forces the salted leg;
    # scores must be identical to the unsalted plan
    edges = EDGES + [(9, i) for i in range(9)] + [(9, 10), (9, 11), (9, 12)]
    g, lbl = _g(spark, edges)
    base = {
        tuple(sorted((lbl[r["u"]], lbl[r["v"]]))): r["adamic_adar"]
        for r in link_prediction(g).collect()
    }
    salted = {
        tuple(sorted((lbl[r["u"]], lbl[r["v"]]))): r["adamic_adar"]
        for r in link_prediction(g, hub_threshold=4, salt_buckets=4).collect()
    }
    assert base.keys() == salted.keys()
    for pair in base:
        assert salted[pair] == pytest.approx(base[pair], abs=1e-12), pair


DIRECTED = [(0, 2), (0, 3), (1, 2), (1, 3), (2, 4), (3, 4), (0, 1), (4, 0)]


def test_cocitation_matches_bruteforce(spark):
    g, lbl = _g(spark, DIRECTED, directed=True)
    nxg = nx.DiGraph(DIRECTED)
    want = {}
    for u, v in itertools.combinations(sorted(nxg.nodes), 2):
        n = len(set(nxg.predecessors(u)) & set(nxg.predecessors(v)))
        if n:
            want[(u, v)] = n
    got = {
        tuple(sorted((lbl[r["u"]], lbl[r["v"]]))): r["cocitations"]
        for r in cocitation(g).collect()
    }
    assert got == want


def test_coupling_matches_bruteforce(spark):
    g, lbl = _g(spark, DIRECTED, directed=True)
    nxg = nx.DiGraph(DIRECTED)
    want = {}
    for u, v in itertools.combinations(sorted(nxg.nodes), 2):
        n = len(set(nxg.successors(u)) & set(nxg.successors(v)))
        if n:
            want[(u, v)] = n
    got = {
        tuple(sorted((lbl[r["u"]], lbl[r["v"]]))): r["couplings"]
        for r in bibliographic_coupling(g).collect()
    }
    assert got == want


def test_cocitation_requires_directed(spark):
    g, _ = _g(spark)
    with pytest.raises(ValueError):
        cocitation(g)
