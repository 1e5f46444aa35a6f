"""Subgraph isomorphism/monomorphism vs NetworkX matchers — the
reference's own oracle convention (algorithm_test.py:154-270)."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark import DiGraph
from arkouda_njit_spark.operators.subgraph_search import (
    subgraph_isomorphism,
    subgraph_monomorphism,
    subgraph_search,
)
from arkouda_njit_spark.propgraph import PropGraph

# propgraph18 — the reference's subgraph-isomorphism test graph
SRC = [1, 1, 2, 2, 3, 0, 3, 3, 4, 4, 4, 5, 5, 7, 7, 8, 8, 9]
DST = [3, 0, 1, 4, 0, 3, 4, 7, 1, 5, 8, 2, 9, 4, 6, 5, 7, 8]
# pattern: the reference's 4-vertex H
PSRC = [0, 1, 2, 1]
PDST = [1, 2, 0, 3]


def _nx_iso_count(gsrc, gdst, psrc, pdst, mono=False):
    G = nx.DiGraph(list(zip(gsrc, gdst)))
    H = nx.DiGraph(list(zip(psrc, pdst)))
    GM = nx.algorithms.isomorphism.DiGraphMatcher(G, H)
    it = GM.subgraph_monomorphisms_iter() if mono else GM.subgraph_isomorphisms_iter()
    return len(list(it))


@pytest.fixture(scope="module")
def g18(spark):
    return DiGraph.from_edges(spark, SRC, DST)


def test_isomorphism_count_reference_pattern(spark, g18):
    h = DiGraph.from_edges(spark, PSRC, PDST)
    got = subgraph_isomorphism(g18, h, return_count=True)
    assert got == _nx_iso_count(SRC, DST, PSRC, PDST)


def test_monomorphism_count(spark, g18):
    h = DiGraph.from_edges(spark, PSRC, PDST)
    got = subgraph_monomorphism(g18, h, return_count=True)
    assert got == _nx_iso_count(SRC, DST, PSRC, PDST, mono=True)


def test_embeddings_are_valid(spark, g18):
    h = DiGraph.from_edges(spark, PSRC, PDST)
    embs = subgraph_isomorphism(g18, h).collect()
    G = nx.DiGraph(list(zip(SRC, DST)))
    H = nx.DiGraph(list(zip(PSRC, PDST)))
    hverts = sorted(H.nodes())
    for r in embs:
        mapping = {hverts[i]: r[f"g{i}"] for i in range(len(hverts))}
        assert len(set(mapping.values())) == len(mapping)
        for a, b in H.edges():
            assert G.has_edge(mapping[a], mapping[b]), (mapping, a, b)
        # induced: non-edges absent
        for a in hverts:
            for b in hverts:
                if a != b and not H.has_edge(a, b):
                    assert not G.has_edge(mapping[a], mapping[b])


def test_triangle_pattern_multiple_graphs(spark):
    # directed 3-cycle pattern in a graph with several cycles
    gsrc = [0, 1, 2, 2, 3, 4, 5, 6, 4]
    gdst = [1, 2, 0, 3, 4, 2, 6, 5, 5]
    g = DiGraph.from_edges(spark, gsrc, gdst)
    h = DiGraph.from_edges(spark, [0, 1, 2], [1, 2, 0])
    got = subgraph_isomorphism(g, h, return_count=True)
    assert got == _nx_iso_count(gsrc, gdst, [0, 1, 2], [1, 2, 0])


def test_no_match_empty_mid_search(spark):
    # Regression: state empties before the last pattern vertex is bound —
    # must return an empty DataFrame with the full g0..g{k-1} schema, not
    # crash with UNRESOLVED_COLUMN (ADVICE r1, high).
    g = DiGraph.from_edges(spark, [0], [1])  # single edge 0->1
    out = subgraph_search(g, [(0, 1), (1, 2)])  # path 0->1->2: no match
    assert out.columns == ["g0", "g1", "g2"]
    assert out.count() == 0
    h = DiGraph.from_edges(spark, [0, 1], [1, 2])
    assert subgraph_isomorphism(g, h, return_count=True) == 0
    assert subgraph_monomorphism(g, h, return_count=True) == 0


def test_size_limit_truncates(spark, g18):
    """size_limit returns min(size_limit, total) embeddings
    (methods.py:446-453: reference guarantees >= size_limit when more
    exist; the join engine returns exactly the cap)."""
    h = DiGraph.from_edges(spark, PSRC, PDST)
    total = _nx_iso_count(SRC, DST, PSRC, PDST, mono=True)
    assert total > 2
    got = subgraph_monomorphism(g18, h, size_limit=2)
    assert got.count() == 2
    # cap above total: everything comes back
    got_all = subgraph_monomorphism(g18, h, size_limit=total + 50)
    assert got_all.count() == total


def test_time_limit_zero_aborts(spark, g18):
    """time_limit=0 aborts before any level completes; result is empty
    with the full schema (methods.py:454-455)."""
    h = DiGraph.from_edges(spark, PSRC, PDST)
    got = subgraph_isomorphism(g18, h, time_limit=0.0)
    assert got.columns == ["g0", "g1", "g2", "g3"]
    assert got.count() == 0


def test_probability_reorder_same_results(spark, g18):
    """Probability (rarest-candidate-first) reorder changes the join order
    only — the embedding SET is identical (SubgraphSearch.chpl:229-332)."""
    h = DiGraph.from_edges(spark, PSRC, PDST)
    a = {tuple(r) for r in subgraph_isomorphism(g18, h).collect()}
    b = {
        tuple(r)
        for r in subgraph_isomorphism(g18, h, reorder_type="probability").collect()
    }
    assert a == b and len(a) == _nx_iso_count(SRC, DST, PSRC, PDST)


def test_algorithm_type_parity(spark, g18):
    h = DiGraph.from_edges(spark, PSRC, PDST)
    n = _nx_iso_count(SRC, DST, PSRC, PDST)
    assert subgraph_isomorphism(g18, h, return_count=True, algorithm_type="ps") == n
    with pytest.raises(ValueError, match="algorithm_type"):
        subgraph_isomorphism(g18, h, algorithm_type="bogus")


def test_return_isos_as_modes(spark, g18):
    """edges / complete / count views (methods.py:460-467)."""
    h = DiGraph.from_edges(spark, PSRC, PDST)
    n = _nx_iso_count(SRC, DST, PSRC, PDST)
    m = len(PSRC)
    assert subgraph_isomorphism(g18, h, return_isos_as="count") == n
    edges = subgraph_isomorphism(g18, h, return_isos_as="edges")
    assert edges.columns == ["psrc", "pdst", "src", "dst"]
    assert edges.count() == n * m
    # every returned edge must exist in the host graph
    G = nx.DiGraph(list(zip(SRC, DST)))
    for r in edges.collect():
        assert G.has_edge(r["src"], r["dst"])
    comp = subgraph_isomorphism(g18, h, return_isos_as="complete")
    assert comp.count() == n * m
    assert {"psrc", "pdst", "src", "dst"}.issubset(set(comp.columns))
    assert {f"g{i}" for i in range(4)}.issubset(set(comp.columns))


def test_attribute_matching(spark):
    # two labeled triangles; pattern requires label 'x' on all vertices —
    # only the x-triangle matches
    edges = spark.createDataFrame(
        [(0, 1, "r"), (1, 2, "r"), (2, 0, "r"), (10, 11, "r"), (11, 12, "r"), (12, 10, "r")],
        "src long, dst long, rel string",
    )
    g = PropGraph.from_edge_attributes(edges, "src", "dst", ["rel"])
    g.load_node_attributes(
        spark.createDataFrame(
            [(i, "x" if i < 10 else "y") for i in [0, 1, 2, 10, 11, 12]],
            "nodes long, lbl string",
        ),
        "nodes",
        ["lbl"],
    )
    pe = spark.createDataFrame(
        [(0, 1, "r"), (1, 2, "r"), (2, 0, "r")], "src long, dst long, rel string"
    )
    h = PropGraph.from_edge_attributes(pe, "src", "dst", ["rel"])
    h.load_node_attributes(
        spark.createDataFrame([(i, "x") for i in range(3)], "nodes long, lbl string"),
        "nodes",
        ["lbl"],
    )
    assert subgraph_isomorphism(g, h, return_count=True) == 3  # 3 rotations
    embs = {tuple(r) for r in subgraph_isomorphism(g, h).collect()}
    assert all(set(e) == {0, 1, 2} for e in embs)


def test_min_degree_split_on_hub_skewed_graph(spark):
    """The per-row min-degree extension split (round 4) must be exact on a
    hub-skewed digraph — the shape it exists for. Deterministic hub graph:
    one hub with edges to/from many spokes plus a sparse ring, checked
    against networkx for a directed 3-cycle (2 constraints at the closing
    level: split active) and the reference 4-vertex H (mixed fwd/bwd
    constraints)."""
    import random

    rng = random.Random(7)
    src, dst = [], []
    for s in range(1, 40):  # hub 0 <-> spokes
        src += [0, s]
        dst += [s, 0]
    for _ in range(60):  # sparse random edges among spokes
        a, b = rng.randrange(1, 40), rng.randrange(1, 40)
        if a != b:
            src.append(a)
            dst.append(b)
    g = DiGraph.from_edges(spark, src, dst)
    for psrc, pdst, mono in [
        ([0, 1, 2], [1, 2, 0], True),
        ([0, 1, 2], [1, 2, 0], False),
        (PSRC, PDST, False),
    ]:
        h = DiGraph.from_edges(spark, psrc, pdst)
        fn = subgraph_monomorphism if mono else subgraph_isomorphism
        got = fn(g, h, return_count=True)
        want = _nx_iso_count(src, dst, psrc, pdst, mono=mono)
        assert got == want, (psrc, pdst, mono, got, want)
