"""Clustering coefficients and degree assortativity.

Beyond-reference structural analytics composed from kernels already in
the engine (triangle enumeration + degree aggregation) — the summary
statistics a link-graph health dashboard computes alongside PageRank/CC.

Scale shape: everything reuses the degree-oriented triangle kernel
(hub fan-out capped at O(sqrt m)); the coefficients themselves are one
join + column arithmetic, assortativity one aggregation over edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from .triangles import _undirected_simple_edges, triangles_per_vertex


def _simple_degrees(und: DataFrame) -> DataFrame:
    """(vid, deg) over the simple undirected view (loops/dups removed)."""
    return (
        und.select(F.col("u").alias("vid"))
        .unionAll(und.select(F.col("v").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("deg"))
    )


def clustering_coefficients(graph: Graph) -> DataFrame:
    """(vid, triangles, deg, clustering) per vertex: triangles / C(deg, 2),
    0.0 for deg < 2 — nx.clustering semantics over the simple undirected
    view."""
    und = _undirected_simple_edges(graph).persist()
    tri = triangles_per_vertex(graph)
    deg = _simple_degrees(und)
    out = (
        graph.vertices.select("vid")
        .join(tri, "vid", "left")
        .join(deg, "vid", "left")
        .select(
            "vid",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.coalesce("deg", F.lit(0)).alias("deg"),
        )
        .withColumn(
            "clustering",
            F.when(
                F.col("deg") >= 2,
                2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)),
            ).otherwise(F.lit(0.0)),
        )
    )
    und.unpersist()
    return out


def transitivity(graph: Graph) -> float:
    """Global clustering coefficient: 3 * triangles / wedges (paths of
    length 2) — nx.transitivity."""
    und = _undirected_simple_edges(graph).persist()
    deg = _simple_degrees(und)
    wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("w")
    ).collect()[0]["w"]
    und.unpersist()
    if not wedges:
        return 0.0
    from .triangles import triangle_count

    return 3.0 * triangle_count(graph) / float(wedges)


def degree_assortativity(graph: Graph) -> float:
    """Pearson correlation of (deg(u), deg(v)) over both orientations of
    every simple undirected edge — nx.degree_assortativity_coefficient.
    One aggregation; NaN-free: returns 0.0 for degenerate variance."""
    und = _undirected_simple_edges(graph)
    deg = _simple_degrees(und.persist()).persist()
    du = deg.select(F.col("vid").alias("u"), F.col("deg").alias("x"))
    dv = deg.select(F.col("vid").alias("v"), F.col("deg").alias("y"))
    both = und.join(du, "u").join(dv, "v").select("x", "y")
    sym = both.unionAll(both.select(F.col("y").alias("x"), F.col("x").alias("y")))
    row = sym.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).collect()[0]
    und.unpersist()
    deg.unpersist()
    n = row["n"]
    if not n:
        return 0.0
    cov = row["sxy"] / n - (row["sx"] / n) * (row["sy"] / n)
    vx = row["sxx"] / n - (row["sx"] / n) ** 2
    vy = row["syy"] / n - (row["sy"] / n) ** 2
    if vx <= 0 or vy <= 0:
        return 0.0
    return float(cov / (vx**0.5 * vy**0.5))


def reciprocity(graph) -> float:
    """Overall reciprocity of a directed graph: the fraction of
    (non-loop, deduplicated) directed edges whose reverse edge also
    exists — ``nx.overall_reciprocity``. One self-semi-join on the
    reversed key + two scalar counts."""
    e = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    total = e.count()
    if total == 0:
        e.unpersist()
        raise ValueError("reciprocity is undefined on an empty edge set")
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = e.join(rev, ["src", "dst"], "left_semi").count()
    e.unpersist()
    return mutual / total


def vertex_reciprocity(graph) -> "DataFrame":
    """(vid, reciprocity) per vertex: the fraction of the vertex's
    incident directed (non-loop) edges that are reciprocated —
    ``nx.reciprocity(G, nodes)`` semantics; vertices with no incident
    edges get NULL. Map-side-combined counts keyed by vertex."""
    e = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    marked = e.join(
        rev.withColumn("_m", F.lit(1)), ["src", "dst"], "left"
    ).select("src", "dst", F.coalesce("_m", F.lit(0)).alias("_m"))
    incident = marked.select(F.col("src").alias("vid"), "_m").unionAll(
        marked.select(F.col("dst").alias("vid"), "_m")
    )
    per = incident.groupBy("vid").agg(
        F.count("*").alias("t"), F.sum("_m").alias("m")
    )
    out = graph.vertices.select("vid").join(per, "vid", "left").select(
        "vid",
        F.when(F.col("t") > 0, F.col("m") / F.col("t")).alias("reciprocity"),
    )
    e.unpersist()
    return out
