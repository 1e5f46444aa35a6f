"""Triangle count vs NetworkX — algorithm_test.py:118-134 parity."""

import networkx as nx

from arkouda_njit_spark import Graph
from arkouda_njit_spark.operators import (
    triangle_count,
    triangle_total_reference,
    triangles_per_vertex,
)

from fixtures import ALGO28_DST, ALGO28_SRC, nx_graph


def test_triangles_total(spark):
    graph = Graph.from_edges(spark, ALGO28_SRC, ALGO28_DST)
    nxg = nx_graph(ALGO28_SRC, ALGO28_DST)
    nx_total = sum(nx.triangles(nxg).values())  # 3 x distinct
    assert triangle_total_reference(graph) == nx_total
    assert triangle_count(graph) == nx_total // 3


def test_triangles_per_vertex(spark):
    graph = Graph.from_edges(spark, ALGO28_SRC, ALGO28_DST)
    nxg = nx_graph(ALGO28_SRC, ALGO28_DST)
    vid_to_label = {r["vid"]: r["label"] for r in graph.vertices.collect()}
    got = {
        vid_to_label[r["vid"]]: r["triangles"]
        for r in triangles_per_vertex(graph).collect()
    }
    assert got == nx.triangles(nxg)


def test_triangles_subset(spark):
    graph = Graph.from_edges(spark, ALGO28_SRC, ALGO28_DST)
    nxg = nx_graph(ALGO28_SRC, ALGO28_DST)
    label_to_vid = {r["label"]: r["vid"] for r in graph.vertices.collect()}
    nodes = [0, 2, 3, 4]
    vids = [label_to_vid[n] for n in nodes]
    got = {
        r["vid"]: r["triangles"]
        for r in triangles_per_vertex(graph, vertices=vids).collect()
    }
    expected = nx.triangles(nxg, nodes)
    assert got == {label_to_vid[n]: c for n, c in expected.items()}


def test_triangles_label_order_parity(spark):
    """ar.triangles(graph, vertices) parity (methods.py:174-222 /
    algorithm_test.py:118-134): labels in, counts out in INPUT order;
    unknown labels dropped like the reference's ak.find -1 mask."""
    from arkouda_njit_spark.operators.triangles import triangles

    graph = Graph.from_edges(spark, ALGO28_SRC, ALGO28_DST)
    nxg = nx_graph(ALGO28_SRC, ALGO28_DST)
    nodes = [4, 0, 3, 2]  # deliberately not sorted
    rows = sorted(triangles(graph, nodes).collect(), key=lambda r: r["pos"])
    assert [r["node"] for r in rows] == nodes
    want = nx.triangles(nxg, nodes)
    assert [r["triangles"] for r in rows] == [want[n] for n in nodes]
    # unknown label dropped, positions re-numbered over survivors
    rows2 = sorted(
        triangles(graph, [4, 999999, 0]).collect(), key=lambda r: r["pos"]
    )
    assert [r["node"] for r in rows2] == [4, 0]
    assert [r["pos"] for r in rows2] == [0, 1]
    # no vertices: the reference scalar (3 x distinct)
    assert triangles(graph) == 3 * sum(nx.triangles(nxg).values()) // 3


def test_triangles_subset_localized_matches_full_on_skewed_graph(spark):
    """The localized neighborhood kernel (round 3) must agree with the full
    enumeration on an RMAT graph with hubs — including a hub vid in the
    query set."""
    from pyspark.sql import functions as F

    from arkouda_njit_spark.sources.generators import rmat_graph

    raw = rmat_graph(spark, scale=11, edge_factor=6, seed=3)
    graph = Graph.from_edges(spark, raw.withColumn("weight", F.lit(1.0)))
    full = {
        r["vid"]: r["triangles"] for r in triangles_per_vertex(graph).collect()
    }
    hub = max(full, key=lambda v: full[v])
    lonely = min(full, key=lambda v: full[v])
    q = [hub, lonely, 0, 1, 17]
    got = {
        r["vid"]: r["triangles"]
        for r in triangles_per_vertex(graph, vertices=q).collect()
    }
    assert got == {v: full[v] for v in q}


def test_triangles_duplicate_labels(spark):
    """Duplicate labels in triangles(vertices=...) must return one row per
    input position with the correct count — no fan-out through the incid
    join (round-3 advice: 2 duplicate inputs produced 4 rows)."""
    from arkouda_njit_spark.operators.triangles import triangles

    graph = Graph.from_edges(spark, ALGO28_SRC, ALGO28_DST)
    nxg = nx_graph(ALGO28_SRC, ALGO28_DST)
    rows = sorted(triangles(graph, [4, 4, 0]).collect(), key=lambda r: r["pos"])
    assert [r["node"] for r in rows] == [4, 4, 0]
    want = nx.triangles(nxg, [4, 0])
    assert [r["triangles"] for r in rows] == [want[4], want[4], want[0]]


def test_triangles_subset_localized_directed(spark):
    """The localized pivot set must include IN-neighbors: on a DiGraph
    whose query vertex has only incoming edges, the src-side-only pivot
    semi-join would miss its triangles entirely (round-3 advice)."""
    from arkouda_njit_spark.graph import DiGraph
    from arkouda_njit_spark.operators.triangles import triangles_per_vertex

    # directed 3-cycle 0->1->2->0 plus an extra sink edge 3->0:
    # vertex 0 participates in the (undirected) triangle {0,1,2}
    g = DiGraph.from_edges(spark, [0, 1, 2, 3], [1, 2, 0, 0])
    per = {r["vid"]: r["triangles"] for r in triangles_per_vertex(g).collect()}
    got = {
        r["vid"]: r["triangles"]
        for r in triangles_per_vertex(g, vertices=[2]).collect()
    }
    assert got[2] == per[2] == 1


class TestApproxTriangleCount:
    def test_p_one_is_exact(self, spark):
        from arkouda_njit_spark.operators import approx_triangle_count, triangle_count

        g = Graph.from_edges(spark, *zip(*[(i, (i + 1) % 20) for i in range(20)] +
                                         [(i, (i + 2) % 20) for i in range(20)]))
        exact = triangle_count(g)
        out = approx_triangle_count(g, p=1.0)
        assert out["estimate"] == exact
        assert out["sampled_triangles"] == exact

    def test_sampled_estimate_close_on_dense_graph(self, spark):
        import networkx as nx

        from arkouda_njit_spark.operators import approx_triangle_count

        # K24: C(24,3) = 2024 triangles; p=0.6 keeps variance small
        edges = list(nx.complete_graph(24).edges())
        g = Graph.from_edges(spark, [u for u, _ in edges], [v for _, v in edges])
        out = approx_triangle_count(g, p=0.6, seed=42)
        assert out["sampled_edges"] < len(edges)
        assert abs(out["estimate"] - 2024) / 2024 < 0.25
        # deterministic: same seed, same estimate
        again = approx_triangle_count(g, p=0.6, seed=42)
        assert again["estimate"] == out["estimate"]

    def test_p_out_of_range_raises(self, spark):
        import pytest as _pytest

        from arkouda_njit_spark.operators import approx_triangle_count

        g = Graph.from_edges(spark, [0, 1], [1, 2])
        with _pytest.raises(ValueError):
            approx_triangle_count(g, p=0.0)
