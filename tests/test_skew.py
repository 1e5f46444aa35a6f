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


def test_rmat_cc_exact_under_skew(spark):
    raw = rmat_graph(spark, scale=9, edge_factor=2, seed=11)  # sparse -> many comps
    g = Graph.from_edges(spark, raw)
    nxg = nx.Graph([(r["src"], r["dst"]) for r in raw.collect()])
    got = connected_components(g)
    n_comps = got.select("component").distinct().count()
    assert n_comps == nx.number_connected_components(nxg)
