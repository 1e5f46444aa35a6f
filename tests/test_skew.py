"""Skew stress (north rule): power-law RMAT graphs — exact kernel results
under hub skew, and the degree-orientation bound that contains it."""

import networkx as nx
from pyspark.sql import functions as F

from arkouda_njit_spark import Graph
from arkouda_njit_spark.operators import connected_components, triangle_count
from arkouda_njit_spark.operators.triangles import oriented_edges
from arkouda_njit_spark.sources import rmat_graph


def test_rmat_triangles_exact_under_skew(spark):
    raw = rmat_graph(spark, scale=9, edge_factor=8, seed=5)
    g = Graph.from_edges(spark, raw)
    nxg = nx.Graph([(r["src"], r["dst"]) for r in raw.collect()])
    assert triangle_count(g) == sum(nx.triangles(nxg).values()) // 3


def test_orientation_bounds_hub_fanout(spark):
    """Degree orientation caps oriented out-degree ~O(sqrt(m)) even when the
    raw max degree is a large fraction of the graph."""
    raw = rmat_graph(spark, scale=10, edge_factor=16, seed=7)
    g = Graph.from_edges(spark, raw)
    m = g.edges.filter(F.col("src") < F.col("dst")).count()
    raw_max_deg = g.degree().agg(F.max("degree")).collect()[0][0]
    o = oriented_edges(g)
    max_out = (
        o.groupBy("lo").count().agg(F.max("count")).collect()[0][0]
    )
    assert raw_max_deg > 4 * max_out  # orientation crushed the hub
    assert max_out <= int(2.5 * (m ** 0.5))


def _nx_square_count(nxg):
    import itertools

    total = 0
    nodes = list(nxg.nodes())
    for a, b in itertools.combinations(nodes, 2):
        c = len(set(nxg[a]) & set(nxg[b]))
        total += c * (c - 1) // 2
    return total // 2  # each square has two diagonals


def test_rmat_squares_exact_under_skew(spark):
    """Hub-safe CN square counting: exact on a power-law graph."""
    from arkouda_njit_spark.operators import squares

    raw = rmat_graph(spark, scale=8, edge_factor=6, seed=3)
    g = Graph.from_edges(spark, raw)
    nxg = nx.Graph([(r["src"], r["dst"]) for r in raw.collect()])
    nxg.remove_edges_from(nx.selfloop_edges(nxg))
    assert squares(g) == _nx_square_count(nxg)


def test_squares_restricted_leg_is_bounded(spark):
    """The CN wedge join's restricted side (endpoint processed before the
    middle) has per-middle fan-out ~O(sqrt m) even at a power-law hub —
    the property that kills the deg(hub)^2 blowup at 100x."""
    raw = rmat_graph(spark, scale=10, edge_factor=16, seed=7)
    g = Graph.from_edges(spark, raw)
    from arkouda_njit_spark.operators.triangles import _undirected_simple_edges

    und = _undirected_simple_edges(g)
    m = und.count()
    sym = und.select(F.col("u").alias("mid"), F.col("v").alias("end")).unionAll(
        und.select(F.col("v").alias("mid"), F.col("u").alias("end"))
    )
    deg = sym.groupBy("mid").agg(F.count("*").alias("d"))
    adj = (
        sym.join(deg.select(F.col("mid"), F.col("d").alias("dm")), "mid")
        .join(
            deg.select(F.col("mid").alias("end"), F.col("d").alias("de")), "end"
        )
    )
    restricted = adj.filter(
        (F.col("de") > F.col("dm"))
        | ((F.col("de") == F.col("dm")) & (F.col("end") < F.col("mid")))
    )
    max_restricted = (
        restricted.groupBy("mid").count().agg(F.max("count")).collect()[0][0]
    )
    raw_max_deg = deg.agg(F.max("d")).collect()[0][0]
    assert raw_max_deg > 4 * max_restricted
    assert max_restricted <= int(2.5 * (m ** 0.5))


def test_rmat_jaccard_exact_under_skew(spark):
    """Hot-middle-salted Jaccard: exact on a power-law graph (force the
    salted path by setting hub_threshold below the max degree)."""
    from arkouda_njit_spark.operators import jaccard_coefficients

    raw = rmat_graph(spark, scale=8, edge_factor=4, seed=13)
    g = Graph.from_edges(spark, raw)
    nxg = nx.Graph([(r["src"], r["dst"]) for r in raw.collect()])
    nxg.remove_edges_from(nx.selfloop_edges(nxg))
    vid2lab = {r["vid"]: r["label"] for r in g.vertices.collect()}
    got = {
        (min(vid2lab[r["u"]], vid2lab[r["v"]]), max(vid2lab[r["u"]], vid2lab[r["v"]])): r["jaccard"]
        for r in jaccard_coefficients(g, hub_threshold=5, salt_buckets=4).collect()
    }
    import itertools

    want = {}
    for a, b in itertools.combinations(sorted(nxg.nodes()), 2):
        c = len(set(nxg[a]) & set(nxg[b]))
        if c > 0:
            want[(a, b)] = c / (nxg.degree(a) + nxg.degree(b) - c)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k


def test_jaccard_candidates_path_matches_full(spark):
    """candidates= restriction (the 100 TB path) returns exactly the full
    result filtered to the requested pairs."""
    from arkouda_njit_spark.operators import jaccard_coefficients

    raw = rmat_graph(spark, scale=7, edge_factor=4, seed=29)
    g = Graph.from_edges(spark, raw)
    full = {(r["u"], r["v"]): r["jaccard"] for r in jaccard_coefficients(g).collect()}
    pairs = sorted(full)[::3]  # every 3rd pair, plus one zero-common pair
    cand = spark.createDataFrame(
        [(b, a) for a, b in pairs], "u long, v long"  # reversed: must canonicalize
    )
    got = {
        (r["u"], r["v"]): r["jaccard"]
        for r in jaccard_coefficients(g, candidates=cand).collect()
    }
    assert got == {p: full[p] for p in pairs}


def test_rmat_cc_exact_under_skew(spark):
    raw = rmat_graph(spark, scale=9, edge_factor=2, seed=11)  # sparse -> many comps
    g = Graph.from_edges(spark, raw)
    nxg = nx.Graph([(r["src"], r["dst"]) for r in raw.collect()])
    got = connected_components(g)
    n_comps = got.select("component").distinct().count()
    assert n_comps == nx.number_connected_components(nxg)


def test_rmat_triad_census_exact_under_skew(spark):
    """Full census on a hub-heavy directed RMAT matches networkx, and the
    16 classes partition C(n,3) exactly (the open classes are combinatorial
    — a hub contributes arithmetic, not wedge rows)."""
    from arkouda_njit_spark import DiGraph
    from arkouda_njit_spark.operators import triadic_census

    raw = rmat_graph(spark, scale=9, edge_factor=8, seed=17)
    dg = DiGraph.from_edges(spark, raw.withColumn("weight", F.lit(1.0)))
    got = {r["triad_type"]: r["count"] for r in triadic_census(dg).collect()}

    nxg = nx.DiGraph()
    for r in raw.select("src", "dst").filter(F.col("src") != F.col("dst")).collect():
        nxg.add_edge(r["src"], r["dst"])
    assert got == dict(nx.triadic_census(nxg))

    n = dg.n_vertices
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6
