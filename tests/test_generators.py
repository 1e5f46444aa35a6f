"""Generator parity — deterministic (class counts) + seeded determinism
and partition invariance for the random families."""

import networkx as nx
from pyspark.sql import functions as F

from arkouda_njit_spark import Graph
from arkouda_njit_spark.sources import (
    complete_graph,
    gnp_random_graph,
    karate_club_graph,
    path_graph,
    random_tree,
    rmat_graph,
    watts_strogatz_graph,
)


def test_complete_graph(spark):
    g = Graph.from_edges(spark, complete_graph(spark, 6))
    assert (g.n_vertices, g.n_edges) == (6, 15)
    assert all(r["degree"] == 5 for r in g.degree().collect())


def test_path_graph(spark):
    g = Graph.from_edges(spark, path_graph(spark, 7))
    assert (g.n_vertices, g.n_edges) == (7, 6)


def test_karate_club(spark):
    g = Graph.from_edges(spark, karate_club_graph(spark))
    nxg = nx.karate_club_graph()
    assert (g.n_vertices, g.n_edges) == (len(nxg), nxg.size())
    vid_to_label = {r["vid"]: r["label"] for r in g.vertices.collect()}
    got = {vid_to_label[r["vid"]]: r["degree"] for r in g.degree().collect()}
    assert got == dict(nxg.degree())


def test_random_tree_is_tree(spark):
    g = Graph.from_edges(spark, random_tree(spark, 50, seed=7))
    # n vertices, n-1 distinct edges, connected = a tree
    assert g.n_vertices == 50
    assert g.n_edges == 49
    from arkouda_njit_spark.operators import connected_components

    assert connected_components(g).select("component").distinct().count() == 1


def test_gnp_deterministic_and_partition_invariant(spark):
    e1 = sorted(map(tuple, gnp_random_graph(spark, 60, 0.1, seed=3).collect()))
    e2 = sorted(map(tuple, gnp_random_graph(spark, 60, 0.1, seed=3).repartition(7).collect()))
    assert e1 == e2 and len(e1) > 0
    e3 = sorted(map(tuple, gnp_random_graph(spark, 60, 0.1, seed=4).collect()))
    assert e1 != e3


def test_rmat_shape_and_skew(spark):
    df = rmat_graph(spark, scale=8, edge_factor=4, seed=1)
    assert df.count() == 4 * 2**8
    g = Graph.from_edges(spark, df)
    degs = sorted((r["degree"] for r in g.degree().collect()), reverse=True)
    # power-law-ish: top vertex way above median
    assert degs[0] > 5 * degs[len(degs) // 2]
    # determinism
    a = sorted(map(tuple, rmat_graph(spark, 6, 2, seed=9).collect()))
    b = sorted(map(tuple, rmat_graph(spark, 6, 2, seed=9).repartition(5).collect()))
    assert a == b


def test_gnp_ordered_pair_density(spark):
    """Reference draws Bernoulli(p) over ALL ordered non-loop pairs
    (generators.py:274-286): expected raw rows ~ p * n * (n-1), twice the
    upper-triangle count."""
    n, p = 80, 0.1
    rows = gnp_random_graph(spark, n, p, seed=3).count()
    expected = p * n * (n - 1)
    assert abs(rows - expected) < 4 * (expected ** 0.5) + 10  # ~4 sigma
    # both orientations can appear independently
    df = gnp_random_graph(spark, n, p, seed=3)
    both = df.alias("a").join(
        df.alias("b"),
        (F.col("a.src") == F.col("b.dst")) & (F.col("a.dst") == F.col("b.src")),
    ).count()
    assert both > 0


def test_rmat_permute_is_bijection(spark):
    """permute=True relabels through a Feistel permutation: vertex ids
    stay unique (a hash-mod would merge ~1/e of them) and the multiset of
    degrees is preserved."""
    from arkouda_njit_spark.sources.generators import _feistel_permute

    scale = 10
    ids = spark.range(2 ** scale).select(
        _feistel_permute(F.col("id"), scale, seed=43).alias("p")
    )
    assert ids.distinct().count() == 2 ** scale  # bijection
    assert ids.agg(F.max("p")).collect()[0][0] < 2 ** scale
    assert ids.agg(F.min("p")).collect()[0][0] >= 0
    plain = rmat_graph(spark, scale=7, edge_factor=4, seed=5)
    perm = rmat_graph(spark, scale=7, edge_factor=4, seed=5, permute=True)
    def degs(df):
        sym = df.unionAll(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        return sorted(r["count"] for r in sym.groupBy("src").count().collect())
    assert degs(plain) == degs(perm)


def test_barabasi_reference_shape(spark):
    """Reference kernel (BuildGraphMsg.chpl:451-486): star 0->(1..m) then
    m with-replacement draws per source m..n-1 — duplicates stay in the
    raw list; every source m..n-1 appears exactly m times."""
    from arkouda_njit_spark.sources.generators import barabasi_albert_graph

    n, m = 30, 3
    df = barabasi_albert_graph(spark, n, m, seed=11)
    assert df.count() == m + m * (n - m)
    star = {tuple(r) for r in df.filter(F.col("src") == 0).collect()}
    assert star == {(0, t) for t in range(1, m + 1)}
    per_src = {r["src"]: r["count"] for r in df.groupBy("src").count().collect()}
    assert all(per_src[s] == m for s in range(m, n))


def test_watts_strogatz(spark):
    df = watts_strogatz_graph(spark, 40, 4, 0.1, seed=2)
    assert df.count() == 40 * 2
    g = Graph.from_edges(spark, df)
    assert g.n_vertices == 40
