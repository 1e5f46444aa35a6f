"""HITS vs a pure-python replay of the same alternating update."""

import pytest

from arkouda_njit_spark import DiGraph
from arkouda_njit_spark.operators import hits


def _python_hits(edges, nodes, iters):
    hub = {v: 1.0 / len(nodes) for v in nodes}
    auth = dict(hub)
    for _ in range(iters):
        a = {v: 0.0 for v in nodes}
        for u, v in edges:
            a[v] += hub[u]
        s = sum(a.values())
        auth = {v: (x / s if s > 0 else 0.0) for v, x in a.items()}
        h = {v: 0.0 for v in nodes}
        for u, v in edges:
            h[u] += auth[v]
        s = sum(h.values())
        hub = {v: (x / s if s > 0 else 0.0) for v, x in h.items()}
    return hub, auth


def _compare(spark, edges, iters=15):
    g = DiGraph.from_edges(spark, [u for u, v in edges], [v for u, v in edges])
    label_of = {r["vid"]: r["label"] for r in g.vertices.collect()}
    rows = hits(g, max_iterations=iters).collect()
    nodes = sorted(label_of.values())
    want_h, want_a = _python_hits(sorted(set(edges)), nodes, iters)
    for r in rows:
        lbl = label_of[r["vid"]]
        assert abs(r["hub"] - want_h[lbl]) < 1e-9, ("hub", lbl)
        assert abs(r["auth"] - want_a[lbl]) < 1e-9, ("auth", lbl)


def test_hits_small_web(spark):
    # two hubs pointing at shared authorities
    _compare(spark, [(0, 2), (0, 3), (1, 2), (1, 3), (1, 4), (4, 2)])


def test_hits_cycle_uniform(spark):
    g = DiGraph.from_edges(spark, [0, 1, 2], [1, 2, 0])
    rows = hits(g, max_iterations=10).collect()
    assert all(abs(r["hub"] - 1 / 3) < 1e-12 for r in rows)
    assert all(abs(r["auth"] - 1 / 3) < 1e-12 for r in rows)


def test_hits_random(spark):
    import random

    rng = random.Random(11)
    edges = list({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    edges = [(u, v) for u, v in edges if u != v]
    _compare(spark, edges)


def test_hits_star_separates_roles(spark):
    # 0 points at everything: pure hub; leaves: pure authorities
    g = DiGraph.from_edges(spark, [0, 0, 0], [1, 2, 3])
    got = {r["vid"]: r for r in hits(g, max_iterations=5).collect()}
    label_of = {r["vid"]: r["label"] for r in g.vertices.collect()}
    hub0 = [r["hub"] for r in got.values() if label_of[r["vid"]] == 0][0]
    assert abs(hub0 - 1.0) < 1e-12
    auths = [r["auth"] for r in got.values() if label_of[r["vid"]] != 0]
    assert all(abs(a - 1 / 3) < 1e-12 for a in auths)
