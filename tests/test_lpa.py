"""Label propagation — deterministic synchronous min-tie semantics,
verified against a pure-python reimplementation and for partition
invariance (same answer at different parallelism)."""

from collections import Counter

from arkouda_njit_spark import Graph
from arkouda_njit_spark.operators import label_propagation

from fixtures import ALGO28_DST, ALGO28_SRC, nx_graph


def python_lpa(adj: dict[int, set[int]], max_iterations: int = 20) -> dict[int, int]:
    labels = {v: v for v in adj}
    for _ in range(max_iterations):
        new = {}
        for v in adj:
            if not adj[v]:
                new[v] = labels[v]
                continue
            freq = Counter(labels[u] for u in adj[v])
            best = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == labels:
            return new
        labels = new
    return labels


def test_lpa_matches_python_oracle(spark):
    graph = Graph.from_edges(spark, ALGO28_SRC, ALGO28_DST)
    vid_to_label = {r["vid"]: r["label"] for r in graph.vertices.collect()}
    label_to_vid = {v: k for k, v in vid_to_label.items()}

    nxg = nx_graph(ALGO28_SRC, ALGO28_DST)
    adj = {label_to_vid[v]: {label_to_vid[u] for u in nxg.neighbors(v)} for v in nxg}
    expected = python_lpa(adj)

    got = {r["vid"]: r["label"] for r in label_propagation(graph).collect()}
    assert got == expected


def test_lpa_partition_invariance(spark):
    g4 = Graph.from_edges(spark, ALGO28_SRC, ALGO28_DST, num_partitions=4)
    g2 = Graph.from_edges(spark, ALGO28_SRC, ALGO28_DST, num_partitions=2)
    r4 = {r["vid"]: r["label"] for r in label_propagation(g4).collect()}
    r2 = {r["vid"]: r["label"] for r in label_propagation(g2).collect()}
    assert r4 == r2
