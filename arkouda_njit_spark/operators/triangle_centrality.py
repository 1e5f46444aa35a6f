"""Triangle centrality (Burkardt, arXiv:2105.00110).

Reference kernel: /root/reference/arachne/server/TriangleCentrality.chpl:22-101.
In clean notation, with T(v) = #triangles containing v, T = total triangles,
N(v) = neighbors of v, and N_T(v) = neighbors sharing a triangle edge with v:

    TC(v) = [ T(v) + Σ_{w∈N(v)} T(w)
                    − (2/3)·( Σ_{w∈N_T(v)} T(w) + T(v) ) ] / T

(the reference's ``NeiTriNum[u] + TriNum[u]/6`` term is exactly
Σ_{w∈N_T(u)∪{u}} T(w); TriangleCentrality.chpl:92-100).

Spark formulation: triangle rows once (degree-oriented enumeration from
operators.triangles), then three aggregations — per-vertex T, the
triangle-edge set, and two neighbor-sum joins. No per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from .triangles import _triangle_rows_cached


def triangle_centrality(graph: Graph) -> DataFrame:
    """(vid, centrality) for every vertex."""
    closed, handles = _triangle_rows_cached(graph)
    und = handles[0]  # the persisted canonical pair set — reused below
    # cache the triangle rows (they feed four consumers); released
    # deterministically after the V-sized result is materialized below —
    # a localCheckpoint here would linger until driver GC
    tri = closed.persist()
    t_total = tri.count()

    # T(v): triangles per vertex.
    t_v = (
        tri.select(F.col("a").alias("vid"))
        .unionAll(tri.select(F.col("b").alias("vid")))
        .unionAll(tri.select(F.col("c").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("t"))
    )
    t_all = graph.vertices.join(t_v, "vid", "left").select(
        "vid", F.coalesce("t", F.lit(0)).alias("t")
    )

    # Triangle-edge set: edges on >=1 triangle. Canonicalize to x<y BEFORE
    # distinct — triangle rows are (pivot, b, c) with pivot in degree order,
    # so (a,b) and (b,a) can both appear across triangles; without
    # least/greatest the dedup keeps both and the N_T neighbor sum
    # double-counts those neighbors.
    tri_edges = (
        tri.select(F.least("a", "b").alias("x"), F.greatest("a", "b").alias("y"))
        .unionAll(tri.select(F.least("a", "c").alias("x"), F.greatest("a", "c").alias("y")))
        .unionAll(tri.select(F.least("b", "c").alias("x"), F.greatest("b", "c").alias("y")))
        .distinct()
    )
    tri_edges_sym = tri_edges.unionAll(
        tri_edges.select(F.col("y").alias("x"), F.col("x").alias("y"))
    )

    # Σ_{w ∈ N_T(v)} T(w)
    nei_tri = (
        tri_edges_sym.join(t_all.withColumnRenamed("vid", "y"), "y")
        .groupBy("x")
        .agg(F.sum("t").alias("nt"))
        .withColumnRenamed("x", "vid")
    )

    # Σ_{w ∈ N(v)} T(w) over all neighbors (simple edges, no self-loops).
    sym = und.select(F.col("u").alias("vid"), F.col("v").alias("w")).unionAll(
        und.select(F.col("v").alias("vid"), F.col("u").alias("w"))
    )
    nbr_sum = (
        sym.join(t_all.select(F.col("vid").alias("w"), "t"), "w")
        .groupBy("vid")
        .agg(F.sum("t").alias("ns"))
    )

    out = (
        t_all.join(nei_tri, "vid", "left")
        .join(nbr_sum, "vid", "left")
        .select(
            "vid",
            (
                (
                    F.col("t")
                    + F.coalesce("ns", F.lit(0))
                    - (F.coalesce("nt", F.lit(0)) + F.col("t")) * 2.0 / 3.0
                )
                / F.lit(float(t_total))
            ).alias("centrality"),
        )
        # V-sized result materialized once so the enumeration caches can
        # be released before returning
        .localCheckpoint(eager=True)
    )
    tri.unpersist()
    for h in handles:
        h.unpersist()
    return out
