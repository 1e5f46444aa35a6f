"""SALSA vs a pure-python replay of the degree-normalized alternating
update, plus the theory check that distinguishes it from HITS: within a
single connected co-citation component the stationary authority weight
is proportional to indegree."""

import random

import pytest

from arkouda_njit_spark import DiGraph
from arkouda_njit_spark.operators import salsa


def _python_salsa(edges, nodes, iters):
    edges = sorted(set(edges))
    od, id_ = {}, {}
    for u, v in edges:
        od[u] = od.get(u, 0) + 1
        id_[v] = id_.get(v, 0) + 1
    hub = {v: 1.0 / len(nodes) for v in nodes}
    auth = dict(hub)
    for _ in range(iters):
        a = {v: 0.0 for v in nodes}
        for u, v in edges:
            a[v] += hub[u] / od[u]
        s = sum(a.values())
        auth = {v: (x / s if s > 0 else 0.0) for v, x in a.items()}
        h = {v: 0.0 for v in nodes}
        for u, v in edges:
            h[u] += auth[v] / id_[v]
        s = sum(h.values())
        hub = {v: (x / s if s > 0 else 0.0) for v, x in h.items()}
    return hub, auth


def _compare(spark, edges, iters=15):
    g = DiGraph.from_edges(spark, [u for u, v in edges], [v for u, v in edges])
    label_of = {r["vid"]: r["label"] for r in g.vertices.collect()}
    rows = salsa(g, max_iterations=iters).collect()
    nodes = sorted(label_of.values())
    want_h, want_a = _python_salsa(edges, nodes, iters)
    for r in rows:
        lbl = label_of[r["vid"]]
        assert abs(r["hub"] - want_h[lbl]) < 1e-9, ("hub", lbl)
        assert abs(r["auth"] - want_a[lbl]) < 1e-9, ("auth", lbl)


def test_salsa_small_web(spark):
    _compare(spark, [(0, 2), (0, 3), (1, 2), (1, 3), (1, 4), (4, 2)])


def test_salsa_random(spark):
    rng = random.Random(11)
    edges = list(
        {(rng.randrange(30), rng.randrange(30)) for _ in range(150)}
    )
    edges = [(u, v) for u, v in edges if u != v]
    _compare(spark, edges, iters=12)


def test_salsa_auth_proportional_to_indegree_one_component(spark):
    # one connected co-citation component: 3 hubs covering 4 authorities
    # with overlapping link sets; stationary auth(j) ∝ indeg(j)
    edges = [
        (0, 10), (0, 11), (0, 12),
        (1, 11), (1, 12), (1, 13),
        (2, 12), (2, 13), (2, 10),
    ]
    g = DiGraph.from_edges(spark, [u for u, v in edges], [v for u, v in edges])
    label_of = {r["vid"]: r["label"] for r in g.vertices.collect()}
    rows = salsa(g, max_iterations=60).collect()
    auth = {label_of[r["vid"]]: r["auth"] for r in rows}
    indeg = {}
    for _, v in edges:
        indeg[v] = indeg.get(v, 0) + 1
    total = sum(indeg.values())
    for j, d in indeg.items():
        assert auth[j] == pytest.approx(d / total, abs=1e-6)
    # hubs have no in-links: zero authority
    assert auth[0] == auth[1] == auth[2] == 0.0


def test_salsa_vs_hits_tkc_robustness(spark):
    """The tightly-knit-community effect: a 3x3 complete bipartite clique
    plus one independent popular page. HITS gives the clique essentially
    ALL authority mass; SALSA keeps the popular page's authority at its
    indegree share."""
    from arkouda_njit_spark.operators import hits

    clique = [(u, v) for u in (0, 1, 2) for v in (10, 11, 12)]
    # page 20 has 3 independent in-links from pages that link nothing else
    indep = [(30, 20), (31, 20), (32, 20)]
    edges = clique + indep
    g = DiGraph.from_edges(spark, [u for u, v in edges], [v for u, v in edges])
    label_of = {r["vid"]: r["label"] for r in g.vertices.collect()}

    s_auth = {label_of[r["vid"]]: r["auth"] for r in salsa(g, 60).collect()}
    h_auth = {label_of[r["vid"]]: r["auth"] for r in hits(g, 60).collect()}

    # HITS: the clique's 9x-per-iteration reinforcement starves page 20
    # (its loop gains only 3x) -> authority 0 in the limit. SALSA: page
    # 20's component keeps the walk mass the uniform start put there
    # (its 3 in-hubs have out-degree 1 vs the clique hubs' 3), so the
    # stationary point is auth(20)=1/2, each clique authority 1/6.
    assert h_auth[20] < 1e-6
    assert s_auth[20] == pytest.approx(1 / 2, abs=1e-6)
    for j in (10, 11, 12):
        assert s_auth[j] == pytest.approx(1 / 6, abs=1e-6)


def test_salsa_partition_invariance(spark):
    edges = [(u, (u * 3 + 1) % 17) for u in range(17)] + [(3, 5), (8, 2)]
    src = [u for u, v in edges]
    dst = [v for u, v in edges]
    g2 = DiGraph.from_edges(spark, src, dst, num_partitions=2)
    g16 = DiGraph.from_edges(spark, src, dst, num_partitions=16)
    a = {r["vid"]: (r["hub"], r["auth"]) for r in salsa(g2, 10).collect()}
    b = {r["vid"]: (r["hub"], r["auth"]) for r in salsa(g16, 10).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k][0] == pytest.approx(b[k][0], abs=1e-12)
        assert a[k][1] == pytest.approx(b[k][1], abs=1e-12)

