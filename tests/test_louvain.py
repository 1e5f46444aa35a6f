"""Louvain communities: planted-structure exactness, nx-modularity parity,
partition-invariance determinism, quality vs networkx's own Louvain."""

import itertools

import networkx as nx
import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark import Graph
from arkouda_njit_spark.operators import (
    label_propagation,
    louvain_communities,
    modularity,
)


def _graph(spark, edges, weights=None):
    if weights is None:
        weights = [1.0] * len(edges)
    df = spark.createDataFrame(
        [(a, b, w) for (a, b), w in zip(edges, weights)],
        "src long, dst long, weight double",
    )
    return Graph.from_edges(spark, df, weighted=True)


def _communities(rows):
    comms = {}
    for r in rows:
        comms.setdefault(r["community"], set()).add(r["vid"])
    return sorted(comms.values(), key=min)


def test_two_cliques_exact(spark):
    e = list(itertools.combinations(range(5), 2))
    e += [(a + 5, b + 5) for a, b in itertools.combinations(range(5), 2)]
    e += [(0, 5)]  # bridge
    g = _graph(spark, e)
    out = louvain_communities(g).collect()
    assert _communities(out) == [set(range(5)), set(range(5, 10))]
    # canonical labels are the min member vid
    assert sorted({r["community"] for r in out}) == [0, 5]


def test_ring_of_cliques_exact(spark):
    # 4 cliques of 5, ring-bridged: each clique is its own community
    e = []
    for c in range(4):
        base = 5 * c
        e += [(base + a, base + b) for a, b in itertools.combinations(range(5), 2)]
        e.append((base, 5 * ((c + 1) % 4) + 1))
    g = _graph(spark, e)
    out = louvain_communities(g).collect()
    assert _communities(out) == [set(range(5 * c, 5 * c + 5)) for c in range(4)]


def test_modularity_matches_networkx_exactly(spark):
    # the metric itself (not the optimizer) must replay nx.community.modularity
    # bit-for-bit on an arbitrary assignment, weighted edges included
    rng_edges = [(i, (i * 7 + 3) % 23) for i in range(23)] + [
        (i, (i + 1) % 23) for i in range(23)
    ]
    weights = [1.0 + (i % 5) for i in range(len(rng_edges))]
    edges = [(a, b) for a, b in rng_edges if a != b]
    weights = [w for (a, b), w in zip(rng_edges, weights) if a != b]
    g = _graph(spark, edges, weights)
    assignment = g.vertices.select("vid", (F.col("vid") % 4).alias("community"))
    q = modularity(g, assignment)
    G = nx.Graph()
    for (a, b), w in zip(edges, weights):
        G.add_edge(a, b, weight=G.get_edge_data(a, b, {"weight": 0})["weight"] + w)
    comms = {}
    for v in G.nodes:
        comms.setdefault(v % 4, set()).add(v)
    assert q == pytest.approx(
        nx.community.modularity(G, list(comms.values()), weight="weight"), abs=1e-12
    )


def test_karate_quality_vs_networkx_louvain(spark):
    from arkouda_njit_spark.sources.generators import karate_club_graph

    g = Graph.from_edges(
        spark, karate_club_graph(spark).withColumn("weight", F.lit(1.0))
    )
    out = louvain_communities(g)
    rows = out.collect()
    assert len(rows) == 34 and len({r["vid"] for r in rows}) == 34
    q = modularity(g, out)
    G = nx.karate_club_graph()
    nx_comms = nx.community.louvain_communities(G, seed=7)
    nx_q = nx.community.modularity(G, nx_comms)
    # same ballpark as nx's randomized Louvain (its karate Q is ~0.42);
    # the deterministic synchronous variant must land within 0.05 of it
    assert q >= nx_q - 0.05
    assert q >= 0.35


def test_deterministic_across_partitionings(spark):
    e = [(i, (i * 11 + 2) % 40) for i in range(40)] + [(i, (i + 1) % 40) for i in range(40)]
    e = [(a, b) for a, b in e if a != b]
    base = spark.createDataFrame(e, "src long, dst long").withColumn(
        "weight", F.lit(1.0)
    )
    a = louvain_communities(
        Graph.from_edges(spark, base.repartition(3), num_partitions=3)
    ).collect()
    b = louvain_communities(
        Graph.from_edges(spark, base.repartition(13), num_partitions=13)
    ).collect()
    assert sorted((r["vid"], r["community"]) for r in a) == sorted(
        (r["vid"], r["community"]) for r in b
    )


def test_no_edges_singletons(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long").withColumn(
        "weight", F.lit(1.0)
    )
    g = Graph.from_edges(spark, df)
    out = louvain_communities(g).collect()
    # a single edge: the pair merges into one community
    assert _communities(out) == [{0, 1}]


def test_beats_or_matches_lpa_on_planted_partition(spark):
    # Louvain's whole point vs LPA: higher modularity on a noisy planted
    # partition (3 dense blocks of 8 + sparse cross edges)
    e = []
    for c in range(3):
        base = 8 * c
        e += [
            (base + a, base + b)
            for a, b in itertools.combinations(range(8), 2)
            if (a * 31 + b * 7 + c) % 3 != 0  # ~2/3 of intra edges
        ]
    e += [(i % 24, (i * 5 + 13) % 24) for i in range(12)]  # noise
    e = [(a, b) for a, b in e if a != b]
    g = _graph(spark, e)
    lv = louvain_communities(g)
    lpa = label_propagation(g).select("vid", F.col("label").alias("community"))
    assert modularity(g, lv) >= modularity(g, lpa) - 1e-9
    assert modularity(g, lv) > 0.3
