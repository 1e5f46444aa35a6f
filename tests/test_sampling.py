"""Neighbor/k-hop sampling: exact xxh64 replay, fan-out bounds, determinism."""

import pytest

from arkouda_njit_spark import DiGraph
from arkouda_njit_spark.functions.xxh64 import spark_xxhash64
from arkouda_njit_spark.operators import khop_sample, sample_neighbors
from arkouda_njit_spark.operators.sampling import spark_layer_seed

# star hub 0 -> 1..19, a chain, and a medium vertex
EDGES = (
    [(0, i) for i in range(1, 20)]
    + [(100, 101), (101, 102), (102, 103)]
    + [(50, i) for i in (51, 52, 53)]
)


def _graph(spark):
    return DiGraph.from_edges(
        spark, [u for u, _ in EDGES], [v for _, v in EDGES]
    )


def _label_maps(g):
    rows = g.vertices.collect()
    return {r["vid"]: r["label"] for r in rows}, {r["label"]: r["vid"] for r in rows}


def _python_sample(adj, fanout, seed):
    out = {}
    for s, nbrs in adj.items():
        ranked = sorted(nbrs, key=lambda d: (spark_xxhash64(("long", s), ("long", d), ("int", seed)), d))
        out[s] = set(ranked[:fanout])
    return out


def test_sample_matches_xxh64_replay_and_bounds(spark):
    g = _graph(spark)
    to_label, _ = _label_maps(g)
    adj = {}
    for r in g.edges.select("src", "dst").distinct().collect():
        adj.setdefault(r["src"], set()).add(r["dst"])
    for seed in (0, 7):
        got = {}
        for r in sample_neighbors(g, 4, seed=seed).collect():
            got.setdefault(r["src"], set()).add(r["dst"])
        want = _python_sample(adj, 4, seed)
        assert got == {s: w for s, w in want.items() if w}
        hub = next(v for v, lbl in to_label.items() if lbl == 0)
        assert len(got[hub]) == 4
        small = next(v for v, lbl in to_label.items() if lbl == 50)
        assert len(got[small]) == 3  # degree below fanout: kept whole


def test_sample_is_partition_invariant(spark):
    g = _graph(spark)
    a = sorted(map(tuple, sample_neighbors(g, 2, seed=3).collect()))
    g2 = DiGraph.from_edges(
        spark, [u for u, _ in EDGES], [v for _, v in EDGES], num_partitions=7
    )
    b = sorted((r["src"], r["dst"]) for r in sample_neighbors(g2, 2, seed=3).collect())
    # compare on labels: different partitioning, identical draw
    la = {r["vid"]: r["label"] for r in g.vertices.collect()}
    lb = {r["vid"]: r["label"] for r in g2.vertices.collect()}
    assert sorted((la[s], la[d]) for s, d in a) == sorted((lb[s], lb[d]) for s, d in b)


def test_khop_layers_connect_and_bound(spark):
    g = _graph(spark)
    to_label, to_vid = _label_maps(g)
    roots = g.vertices.filter(
        g.vertices.label.isin([0, 100])
    ).select("vid")
    out = khop_sample(g, roots, fanouts=[3, 2], seed=1).collect()
    by_layer = {}
    for r in out:
        by_layer.setdefault(r["layer"], []).append((r["src"], r["dst"]))
    # layer 1: at most 3 per root; srcs are exactly (out-degreed) roots
    assert {to_label[s] for s, _ in by_layer[1]} == {0, 100}
    assert len([1 for s, _ in by_layer[1] if to_label[s] == 0]) == 3
    # layer 2 srcs are a subset of layer 1 dsts
    l1_dst = {d for _, d in by_layer[1]}
    assert {s for s, _ in by_layer[2]} <= l1_dst
    for s in {s for s, _ in by_layer[2]}:
        assert len([1 for x, _ in by_layer[2] if x == s]) <= 2


def test_layer_seeds_decorrelate(spark):
    g = _graph(spark)
    s1 = {(r["src"], r["dst"]) for r in sample_neighbors(g, 4, seed=spark_layer_seed(0, 1)).collect()}
    s2 = {(r["src"], r["dst"]) for r in sample_neighbors(g, 4, seed=spark_layer_seed(0, 2)).collect()}
    assert s1 != s2  # hub with 19 choose 4 — different draws with prob ~1


def test_guards(spark):
    g = _graph(spark)
    with pytest.raises(ValueError):
        sample_neighbors(g, 0)
    with pytest.raises(ValueError):
        khop_sample(g, g.vertices.select("vid"), fanouts=[])
