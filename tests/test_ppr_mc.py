"""Monte-Carlo personalized PageRank vs the exact power-iteration kernel.

The estimator's endpoint distribution must converge to the SAME fixpoint
personalized_pagerank computes (teleport to the source, dangling mass
restarts at the source), so the differential is L1 distance between the
MC vector and the exact vector at a sample size where sampling error is
well below the gap any semantic bug would open (dropping the dangling
restart alone shifts ~10% of the mass on the fixture below).
"""

import pytest

from arkouda_njit_spark import DiGraph, Graph
from arkouda_njit_spark.operators import personalized_pagerank
from arkouda_njit_spark.operators.pagerank import ppr_montecarlo

# directed fixture with a dangling vertex (3 has no out-edge) and a cycle
SRC = [0, 0, 1, 1, 2, 2, 4, 4, 5]
DST = [1, 2, 2, 3, 0, 3, 0, 5, 4]


def _label_of(graph):
    return {r["vid"]: r["label"] for r in graph.vertices.collect()}


def _exact_by_label(graph, source_label):
    exact = personalized_pagerank(
        graph, {source_label: 1.0}, alpha=0.85, tol=1e-10, max_iterations=300
    )
    lbl = _label_of(graph)
    return {lbl[r["vid"]]: r["rank"] for r in exact.collect()}


def _mc_by_label(graph, rows, source_label):
    lbl = _label_of(graph)
    out = {}
    for r in rows:
        if lbl[r["source"]] == source_label:
            out[lbl[r["vid"]]] = r["ppr"]
    return out


class TestPPRMonteCarlo:
    def test_matches_exact_with_dangling(self, spark):
        graph = DiGraph.from_edges(spark, SRC, DST)
        mc = ppr_montecarlo(
            graph, [0], walks_per_source=3000, alpha=0.85, max_steps=45, seed=7
        ).collect()
        est = _mc_by_label(graph, mc, 0)
        exact = _exact_by_label(graph, 0)
        # every walk ends somewhere: the estimate is an exact distribution
        assert sum(est.values()) == pytest.approx(1.0, abs=1e-12)
        l1 = sum(abs(est.get(v, 0.0) - exact[v]) for v in exact)
        assert l1 < 0.08, f"L1 {l1} vs exact {exact} est {est}"
        # the argmax must agree (the gap between top entries >> MC noise)
        top_exact = max(exact, key=exact.get)
        assert max(est, key=est.get) == top_exact

    def test_undirected_and_multi_source(self, spark):
        graph = Graph.from_edges(spark, SRC, DST)
        mc = ppr_montecarlo(
            graph, [0, 5], walks_per_source=2500, alpha=0.85, max_steps=45, seed=11
        ).collect()
        for s in (0, 5):
            est = _mc_by_label(graph, mc, s)
            exact = _exact_by_label(graph, s)
            assert sum(est.values()) == pytest.approx(1.0, abs=1e-12)
            l1 = sum(abs(est.get(v, 0.0) - exact[v]) for v in exact)
            assert l1 < 0.08, f"source {s}: L1 {l1}"

    def test_deterministic(self, spark):
        graph = DiGraph.from_edges(spark, SRC, DST)
        a = ppr_montecarlo(graph, [2], walks_per_source=200, max_steps=20, seed=3)
        b = ppr_montecarlo(graph, [2], walks_per_source=200, max_steps=20, seed=3)
        rows_a = sorted(map(tuple, a.collect()))
        rows_b = sorted(map(tuple, b.collect()))
        assert rows_a == rows_b
        # a different seed must actually change the draw
        c = ppr_montecarlo(graph, [2], walks_per_source=200, max_steps=20, seed=4)
        assert rows_a != sorted(map(tuple, c.collect()))

    def test_guards(self, spark):
        graph = DiGraph.from_edges(spark, SRC, DST)
        with pytest.raises(ValueError):
            ppr_montecarlo(graph, [])
        with pytest.raises(ValueError):
            ppr_montecarlo(graph, [0], alpha=1.0)
        with pytest.raises(ValueError):
            ppr_montecarlo(graph, [999])  # unknown label
        with pytest.raises(ValueError):
            ppr_montecarlo(graph, [0], walks_per_source=0)
