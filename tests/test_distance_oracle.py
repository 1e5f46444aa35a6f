"""Das Sarma sketch oracle: upper-bound property, exactness cases, NULLs."""

import itertools

import networkx as nx
import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark import Graph
from arkouda_njit_spark.operators import approx_distances, distance_sketch


def _setup(spark, edges, num_sets=6, seed=0):
    g = Graph.from_edges(
        spark, [u for u, _ in edges], [v for _, v in edges]
    )
    label_of = {r["vid"]: r["label"] for r in g.vertices.collect()}
    sketch = distance_sketch(g, num_sets=num_sets, seed=seed).persist()
    return g, label_of, sketch


def _true_dists(edges):
    nxg = nx.Graph(edges)
    return dict(nx.all_pairs_shortest_path_length(nxg))


def _query_all(spark, g, sketch, label_of):
    vids = list(label_of)
    pairs = spark.createDataFrame(
        [(a, b) for a, b in itertools.combinations(vids, 2)], "u long, v long"
    )
    return {
        (label_of[r["u"]], label_of[r["v"]]): r["approx_dist"]
        for r in approx_distances(sketch, pairs).collect()
    }


def test_estimates_are_upper_bounds_with_good_coverage(spark):
    # two cliques joined by a path — varied distances
    edges = (
        [(a, b) for a, b in itertools.combinations(range(5), 2)]
        + [(4, 10), (10, 11), (11, 12)]
        + [(a, b) for a, b in itertools.combinations(range(12, 17), 2)]
    )
    g, label_of, sketch = _setup(spark, edges)
    true = _true_dists(edges)
    got = _query_all(spark, g, sketch, label_of)
    n_est = 0
    for (a, b), est in got.items():
        if est is not None:
            n_est += 1
            assert est >= true[a][b], (a, b)
    # with 6 sets on 17 vertices nearly every pair shares a seed
    assert n_est >= len(got) * 0.9
    sketch.unpersist()


def test_exact_when_a_seed_lies_on_the_path(spark):
    # a path graph: the largest seed set is dense, so most estimates
    # should be close; spot-check exactness for adjacent pairs through
    # the seed itself
    edges = [(i, i + 1) for i in range(10)]
    g, label_of, sketch = _setup(spark, edges, num_sets=6)
    rows = sketch.collect()
    # every vertex has a closest seed with a real distance
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["vid"], []).append(r)
    assert set(by_vid) == set(label_of)
    true = _true_dists(edges)
    to_vid = {lbl: vid for vid, lbl in label_of.items()}
    # the sketch distance to the closest seed is itself a true distance
    for vid, entries in by_vid.items():
        for e in entries:
            a, b = label_of[vid], label_of[e["seed_vid"]]
            assert e["dist"] == true[a][b]
    sketch.unpersist()


def test_disconnected_pairs_are_null(spark):
    edges = [(0, 1), (1, 2), (10, 11)]
    g, label_of, sketch = _setup(spark, edges)
    got = _query_all(spark, g, sketch, label_of)
    true = _true_dists(edges)
    for (a, b), est in got.items():
        if b not in true[a]:
            assert est is None, (a, b)
    sketch.unpersist()


def test_sketch_is_deterministic_per_seed(spark):
    edges = [(i, (i * 3 + 1) % 20) for i in range(20)]
    g1, _, s1 = _setup(spark, edges, seed=5)
    g2, _, s2 = _setup(spark, edges, seed=5)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
    s1.unpersist()
    s2.unpersist()
