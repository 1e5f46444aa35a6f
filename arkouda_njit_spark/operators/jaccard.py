"""Vertex-pair Jaccard similarity (dev-tree operator).

Reference: /root/reference/arachne_development/server/JaccardMsg.chpl:101-278
computes, for vertex pairs, |N(u)∩N(v)| / (deg(u) + deg(v) − |N(u)∩N(v)|)
via wedge counting into a dense JaccGamma array.

Spark formulation: common-neighbor counts from a wedge self-join on the
middle vertex (only pairs with ≥1 common neighbor have a non-zero Jaccard,
so the output is the sparse set the dense array wastes space on), degrees
from one aggregation, everything map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from .triangles import _undirected_simple_edges


def jaccard_coefficients(graph: Graph, min_jaccard: float = 0.0) -> DataFrame:
    """(u, v, jaccard) for all u<v pairs with at least one common neighbor."""
    und = _undirected_simple_edges(graph)
    sym = und.select(F.col("u").alias("mid"), F.col("v").alias("end")).unionAll(
        und.select(F.col("v").alias("mid"), F.col("u").alias("end"))
    )
    deg = sym.groupBy("end").agg(F.count("*").alias("deg")).withColumnRenamed("end", "vid")

    w1 = sym.select("mid", F.col("end").alias("a"))
    w2 = sym.select("mid", F.col("end").alias("b"))
    common = (
        w1.join(w2, "mid")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    da = deg.select(F.col("vid").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("vid").alias("b"), F.col("deg").alias("db"))
    out = (
        common.join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").alias("u"),
            F.col("b").alias("v"),
            (
                F.col("common")
                / (F.col("da") + F.col("db") - F.col("common"))
            ).alias("jaccard"),
        )
    )
    if min_jaccard > 0.0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out
