"""HyperBall: HLL ball counters vs exact BFS-computed neighborhood
functions. Estimates are deterministic (xxhash64 only), so the tolerance
assertions are stable across runs and partition counts; accuracy bounds
use the standard HLL rse 1.04/sqrt(m) with generous slack."""

import collections

import networkx as nx
import pytest

from arkouda_njit_spark import DiGraph, Graph
from arkouda_njit_spark.operators import (
    effective_diameter,
    hyperball,
    neighbourhood_function,
)


def _exact_nf(nxg, max_t):
    """Exact NF(t) = #{(v,u) : d(v,u) <= t} including v itself."""
    nf = collections.Counter()
    for v in nxg:
        for _, dist in nx.single_source_shortest_path_length(nxg, v).items():
            for t in range(dist, max_t + 1):
                nf[t] += 1
    return [nf[t] for t in range(max_t + 1)]


def test_karate_nf_and_harmonic(spark):
    nxg = nx.karate_club_graph()
    g = Graph.from_edges(spark, *zip(*nxg.edges()))
    res = hyperball(g, log2m=6)

    # converged in diameter rounds (karate diameter = 5; +1 flat round)
    assert res.rounds <= nx.diameter(nxg) + 1

    exact = _exact_nf(nxg, res.rounds)
    for t, est in res.nf:
        assert est == pytest.approx(exact[min(t, len(exact) - 1)], rel=0.30), (
            t,
            est,
            exact[min(t, len(exact) - 1)],
        )

    # per-vertex harmonic estimate tracks nx.harmonic_centrality
    lab = {r["vid"]: r["label"] for r in g.vertices.collect()}
    got = {lab[r["vid"]]: r["harmonic"] for r in res.balls.collect()}
    want = nx.harmonic_centrality(nxg)
    errs = [abs(got[v] - want[v]) / want[v] for v in want]
    assert sum(errs) / len(errs) < 0.20, sorted(errs)[-3:]


def test_ball_converges_to_component_size(spark):
    # two components of known size: every ball estimate ~ its component
    edges = [(i, i + 1) for i in range(9)]  # path of 10
    edges += [(100 + i, 100 + (i + 1) % 20) for i in range(20)]  # cycle of 20
    g = Graph.from_edges(spark, [u for u, v in edges], [v for u, v in edges])
    res = hyperball(g, log2m=5)  # balls <= 20: linear-counting regime
    lab = {r["vid"]: r["label"] for r in g.vertices.collect()}
    for r in res.balls.collect():
        want = 10 if lab[r["vid"]] < 100 else 20
        assert r["ball"] == pytest.approx(want, rel=0.25), (lab[r["vid"]], r["ball"])


def test_directed_chain_directions(spark):
    # chain 0 -> 1 -> ... -> 9: out-ball of the head is everything,
    # out-ball of the tail is itself; "in" reverses the roles
    n = 8
    g = DiGraph.from_edges(spark, list(range(n - 1)), list(range(1, n)))
    lab = {r["vid"]: r["label"] for r in g.vertices.collect()}

    out = {lab[r["vid"]]: r["ball"] for r in hyperball(g, log2m=5).balls.collect()}
    assert out[0] == pytest.approx(n, rel=0.25)
    assert out[n - 1] == pytest.approx(1, rel=0.25)

    inn = {
        lab[r["vid"]]: r["ball"]
        for r in hyperball(g, log2m=5, direction="in").balls.collect()
    }
    assert inn[0] == pytest.approx(1, rel=0.25)
    assert inn[n - 1] == pytest.approx(n, rel=0.25)


def test_effective_diameter_clique_vs_path(spark):
    # clique: everyone reachable at t=1 -> effective diameter <= 1
    k = nx.complete_graph(8)
    gk = Graph.from_edges(spark, *zip(*k.edges()))
    assert effective_diameter(gk, q=0.9) <= 1.0

    # path of 12: exact interpolated 0.9-effective diameter from the
    # exact NF curve; the estimate must land within ~2 hops
    p = nx.path_graph(12)
    gp = Graph.from_edges(spark, *zip(*p.edges()))
    exact = _exact_nf(p, 11)
    target = 0.9 * exact[-1]
    t_exact = next(
        t - 1 + (target - exact[t - 1]) / (exact[t] - exact[t - 1])
        for t in range(1, 12)
        if exact[t] >= target
    )
    got = effective_diameter(gp, q=0.9)
    assert abs(got - t_exact) < 2.0, (got, t_exact)


def test_partition_invariance(spark):
    nxg = nx.karate_club_graph()
    src, dst = zip(*nxg.edges())
    a = hyperball(Graph.from_edges(spark, src, dst, num_partitions=2), log2m=5)
    b = hyperball(Graph.from_edges(spark, src, dst, num_partitions=16), log2m=5)
    rows_a = {r["vid"]: (r["ball"], r["harmonic"]) for r in a.balls.collect()}
    rows_b = {r["vid"]: (r["ball"], r["harmonic"]) for r in b.balls.collect()}
    assert rows_a == rows_b
    # NF(t) sums doubles across partitions — order-dependent in the last
    # ulps, so invariant only up to float-summation reassociation
    assert [t for t, _ in a.nf] == [t for t, _ in b.nf]
    for (_, va), (_, vb) in zip(a.nf, b.nf):
        assert va == pytest.approx(vb, rel=1e-12)


def test_nf_monotone_and_max_t_truncation(spark):
    p = nx.path_graph(12)
    g = Graph.from_edges(spark, *zip(*p.edges()))
    nf = neighbourhood_function(g, log2m=6)
    vals = [v for _, v in nf]
    for lo, hi in zip(vals, vals[1:]):
        assert hi >= lo * 0.98  # estimator may dip a hair at LC boundary

    truncated = hyperball(g, log2m=6, max_t=3)
    assert truncated.rounds == 3
    assert truncated.nf[-1][0] == 3


def test_guards(spark):
    g = Graph.from_edges(spark, [0], [1])
    with pytest.raises(ValueError):
        hyperball(g, direction="sideways")
    with pytest.raises(ValueError):
        hyperball(g, log2m=3)
