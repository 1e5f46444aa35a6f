"""Golden asserts from the reference suite: squares, triangle centrality,
k-truss, diameter, BFS layers — algorithm_test.py parity."""

import math

import networkx as nx
import pytest

from arkouda_njit_spark import Graph, DiGraph
from arkouda_njit_spark.operators import (
    bfs_layers,
    diameter,
    jaccard_coefficients,
    k_truss,
    max_truss,
    squares,
    triangle_centrality,
    truss_decomposition,
)

from fixtures import (
    ALGO28_DST,
    ALGO28_SRC,
    CC17_DST,
    CC17_SRC,
    TC10_DST,
    TC10_SRC,
    TRUSS10_DST,
    TRUSS10_SRC,
    nx_graph,
)


def test_squares_golden(spark):
    graph = Graph.from_edges(spark, ALGO28_SRC, ALGO28_DST)
    assert squares(graph) == 2  # algorithm_test.py:108-116


def test_triangle_centrality_golden(spark):
    graph = Graph.from_edges(spark, TC10_SRC, TC10_DST)
    # tc10 labels are already 0..9 = vids
    got = {r["vid"]: r["centrality"] for r in triangle_centrality(graph).collect()}
    results = [math.floor(got[v] * 10) for v in range(10)]
    assert results == [6, 4, 4, 4, 4, 3, 3, 3, 0, 0]  # algorithm_test.py:136-152


def _canonical_edge_values(df, value_col):
    return [
        r[value_col]
        for r in df.orderBy("u", "v").collect()
    ]


def test_k_truss_golden(spark):
    graph = Graph.from_edges(spark, TRUSS10_SRC, TRUSS10_DST)
    got = _canonical_edge_values(k_truss(graph, 5), "value")
    assert got == [4] * 20  # algorithm_test.py:297-307
    decomp = _canonical_edge_values(truss_decomposition(graph), "truss")
    assert decomp == [3, 3, 2, 2, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4]
    assert max_truss(graph) == 4


def test_k_truss_4_survivors(spark):
    """k=4 leaves the dense 16-edge core as -1; nx-independent sanity."""
    graph = Graph.from_edges(spark, TRUSS10_SRC, TRUSS10_DST)
    vals = _canonical_edge_values(k_truss(graph, 4), "value")
    assert vals.count(-1) == 16
    assert set(vals) == {-1, 3}


def test_k_truss_checkpointed_resume(spark, tmp_path):
    """k-truss peeling on FixpointLoop: durable epochs + metrics are
    written, and a fresh call resumes from the last epoch with identical
    output (north-rule mid-algorithm resume, same machinery as PR/CC)."""
    import os

    ckpt = str(tmp_path / "truss_ck")
    graph = Graph.from_edges(spark, TRUSS10_SRC, TRUSS10_DST)
    a = _canonical_edge_values(k_truss(graph, 5, checkpoint_dir=ckpt), "value")
    assert a == [4] * 20
    epochs = [e for e in os.listdir(ckpt) if e.startswith("epoch=")]
    assert epochs and os.path.exists(os.path.join(ckpt, "metrics.json"))
    # resume path: rerun with the same dir — restarts from the final epoch
    b = _canonical_edge_values(k_truss(graph, 5, checkpoint_dir=ckpt), "value")
    assert b == a


def test_diameter_golden(spark):
    graph = Graph.from_edges(spark, CC17_SRC, CC17_DST)
    assert diameter(graph) == 5  # reference convention, algorithm_test.py:287-295
    assert diameter(graph, exact=True) == 6  # the 7-vertex path's true diameter


def test_diameter_big_components_one_loop(spark):
    """Four over-threshold path components are double-swept in ONE
    multi-source loop: job count scales with the max diameter, not the sum
    over components (the sequential per-component loop would run ~4x the
    jobs here)."""
    src, dst = [], []
    sizes = [30, 30, 28, 26]
    base = 0
    for n in sizes:
        for i in range(n - 1):
            src.append(base + i)
            dst.append(base + i + 1)
        base += 100
    graph = Graph.from_edges(spark, src, dst)
    sc = spark.sparkContext
    sc.setJobGroup("diam-multi", "diameter big-component sweep")
    try:
        # BFS-branch convention: big components contribute the double-sweep
        # depth itself (no -1 — that's the matrix branch's convention)
        assert diameter(graph, bfs_threshold=5) == 29
    finally:
        sc.setJobGroup("", "")
    jobs = len(sc.statusTracker().getJobIdsForGroup("diam-multi"))
    # The count includes connected_components' own hash-min loop (~30
    # iterations on a 30-path) — measured ~554 total with the ONE
    # multi-source double sweep (~60 levels x ~3 jobs; +1 AQE
    # materialization job/level since checkpoints stopped inheriting
    # stats estimates, plans/checkpoints.py). A sequential per-component
    # double sweep is ~sum(2*diam_i) = 220 levels -> ~660 sweep jobs
    # alone, >950 total. 700 still cleanly separates the two shapes.
    assert jobs < 700, f"diameter ran {jobs} jobs — big-component loop serialized?"


def test_bfs_layers_undirected(spark):
    graph = Graph.from_edges(spark, ALGO28_SRC, ALGO28_DST)
    nxg = nx_graph(ALGO28_SRC, ALGO28_DST)
    vid_to_label = {r["vid"]: r["label"] for r in graph.vertices.collect()}
    for root in sorted(nxg.nodes()):
        got = {
            vid_to_label[r["vid"]]: r["depth"]
            for r in bfs_layers(graph, root).collect()
        }
        expected = {v: -1 for v in nxg.nodes()}
        for layer, nodes in enumerate(nx.bfs_layers(nxg, root)):
            for v in nodes:
                expected[v] = layer
        assert got == expected, f"root={root}"


def test_bfs_layers_directed(spark):
    graph = DiGraph.from_edges(spark, ALGO28_SRC, ALGO28_DST)
    nxg = nx_graph(ALGO28_SRC, ALGO28_DST, directed=True)
    nxg.remove_edges_from(nx.selfloop_edges(nxg))
    nxg.remove_nodes_from([v for v, d in nxg.degree() if d == 0])
    vid_to_label = {r["vid"]: r["label"] for r in graph.vertices.collect()}
    for root in [2, 5, 10, 25]:
        got = {
            vid_to_label[r["vid"]]: r["depth"]
            for r in bfs_layers(graph, root).collect()
        }
        expected = {v: -1 for v in nxg.nodes()}
        for layer, nodes in enumerate(nx.bfs_layers(nxg, root)):
            for v in nodes:
                expected[v] = layer
        assert got == expected, f"root={root}"


def test_jaccard_vs_networkx(spark):
    # tc10 has no self-loops; labels == vids
    graph = Graph.from_edges(spark, TC10_SRC, TC10_DST)
    nxg = nx_graph(TC10_SRC, TC10_DST)
    nxg.remove_edges_from(nx.selfloop_edges(nxg))
    got = {(r["u"], r["v"]): r["jaccard"] for r in jaccard_coefficients(graph).collect()}
    pairs = list(got.keys())
    expected = {(u, v): j for u, v, j in nx.jaccard_coefficient(nxg, pairs)}
    for p in pairs:
        assert got[p] == pytest.approx(expected[p]), p


def test_multi_source_bfs_per_root_depths(spark):
    from arkouda_njit_spark.operators.bfs import multi_source_bfs

    # two components, roots at one end of each; depths are per-root
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1), (10, 11), (11, 10)], "src long, dst long"
    )
    s = spark.createDataFrame([(0, 0), (10, 10)], "root long, vid long")
    got = sorted(tuple(r) for r in multi_source_bfs(e, s).collect())
    assert got == [(0, 0, 0), (0, 1, 1), (0, 2, 2), (10, 10, 0), (10, 11, 1)]

    # two roots in the SAME component explore independently
    s2 = spark.createDataFrame([(0, 0), (2, 2)], "root long, vid long")
    got2 = sorted(tuple(r) for r in multi_source_bfs(e, s2).collect())
    assert (0, 2, 2) in got2 and (2, 0, 2) in got2 and len(got2) == 6


def test_bfs_one_job_per_level(spark):
    """The frontier loop runs at most one Spark job per BFS level: the
    persisted-frontier count, which also materializes the lazy visited
    checkpoint (round-3 verdict task 4 — the old loop paid an eager
    checkpoint job AND an isEmpty probe per level)."""
    from arkouda_njit_spark.operators.bfs import multi_source_bfs

    n = 12  # path 0-1-...-12 → depth 12, 13 loop levels incl. empty frontier
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(n)] + [(i + 1, i) for i in range(n)],
        "src long, dst long",
    ).localCheckpoint(eager=True)  # keep scan jobs out of the measured group
    s = spark.createDataFrame([(0, 0)], "root long, vid long")
    sc = spark.sparkContext
    # AQE materializes each exchange as its own job, turning one action into
    # several jobs — pin it off so jobs == actions for the probe
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("bfs-jobs", "bfs job-count probe")
    try:
        visited = multi_source_bfs(e, s)
        assert visited.count() == n + 1
    finally:
        sc.setJobGroup("", "")
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    jobs = len(sc.statusTracker().getJobIdsForGroup("bfs-jobs"))
    # levels = n expanding + 1 empty = n+1 count jobs, + 1 eager sources
    # checkpoint + 1 final count in this test
    assert jobs <= n + 4, f"BFS ran {jobs} jobs for {n + 1} levels"
    visited.unpersist()
    e.unpersist()
