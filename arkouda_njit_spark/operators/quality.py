"""Community / partition quality metrics: conductance, edge cut, coverage.

Companion to :func:`..operators.louvain.modularity` — where modularity
scores a whole assignment, these score each community: how leaky is its
boundary (conductance), how many edges cross it (cut), and what fraction of
the graph's edges the assignment keeps internal (coverage). The reference's
well-connected-components work (arachne/server/WellConnectedComponents.chpl)
applies exactly this family of cut criteria when deciding whether to split
a cluster; here they are standalone metrics a user can run against ANY
assignment (Louvain, LPA, WCC, an external labeling).

All three are single-pass joins + aggregations over the symmetric weighted
edge table — label both endpoints, classify each edge as internal or
boundary, aggregate per community. No iteration, map-side combined, and the
V-sized label table joins via the engine's broadcast/shuffle-hash dispatch
(:func:`..plans.joins.state_join_side`) so a 10¹²-edge scoring pass is one
shuffle of (community, weight) pairs.

Conductance of community S:  φ(S) = cut(S) / min(vol(S), vol(V∖S)),
with vol = sum of degrees (weighted). Matches
``networkx.algorithms.cuts.conductance(G, S)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.joins import state_join_side


def _labeled_directed_edges(
    graph: Graph, assignment: DataFrame, col: str
) -> tuple[DataFrame, float]:
    """Symmetric (both-orientation) edges with both endpoint communities,
    plus the graph's total volume (= 2m for undirected)."""
    edges = graph.edges.select("src", "dst", "weight")
    if graph.directed:
        edges = edges.unionAll(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
    assign = assignment.select("vid", F.col(col).alias("comm"))
    a = assign.select(F.col("vid").alias("src"), F.col("comm").alias("_ca"))
    b = assign.select(F.col("vid").alias("dst"), F.col("comm").alias("_cb"))
    labeled = edges.join(state_join_side(a, graph.n_vertices), "src").join(
        state_join_side(b, graph.n_vertices), "dst"
    )
    return labeled, None  # volume derived from the same labeled frame


def conductance(
    graph: Graph, assignment: DataFrame, col: str = "community"
) -> DataFrame:
    """Per-community (community, cut, volume, conductance).

    ``cut``: total weight of edges with exactly one endpoint in the
    community; ``volume``: sum of weighted degrees of its members;
    ``conductance``: cut / min(volume, total_volume − volume). Singleton
    whole-graph communities (complement volume 0) get conductance NULL,
    matching the undefined 0/0 case.
    """
    labeled, _ = _labeled_directed_edges(graph, assignment, col)
    # per-community, over each member's outgoing orientation: volume is the
    # sum of all incident weight, cut the part whose far end is outside
    per = labeled.groupBy(F.col("_ca").alias("community")).agg(
        F.sum("weight").alias("volume"),
        F.sum(F.when(F.col("_ca") != F.col("_cb"), F.col("weight")).otherwise(0.0))
        .alias("cut"),
    )
    total = per.agg(F.sum("volume")).collect()[0][0] or 0.0
    denom = F.least(F.col("volume"), F.lit(float(total)) - F.col("volume"))
    return per.select(
        "community",
        "cut",
        "volume",
        F.when(denom > 0, F.col("cut") / denom).alias("conductance"),
    )


def edge_cut(graph: Graph, assignment: DataFrame, col: str = "community") -> float:
    """Total weight of edges whose endpoints land in different communities
    (each undirected edge counted once) — the partitioner's objective."""
    labeled, _ = _labeled_directed_edges(graph, assignment, col)
    cut2 = (
        labeled.filter(F.col("_ca") != F.col("_cb"))
        .agg(F.sum("weight"))
        .collect()[0][0]
        or 0.0
    )
    return float(cut2) / 2.0


def coverage(graph: Graph, assignment: DataFrame, col: str = "community") -> float:
    """Fraction of total edge weight that is intra-community — the coverage
    term of ``networkx.algorithms.community.partition_quality``."""
    labeled, _ = _labeled_directed_edges(graph, assignment, col)
    agg = labeled.agg(
        F.sum("weight").alias("tot"),
        F.sum(
            F.when(F.col("_ca") == F.col("_cb"), F.col("weight")).otherwise(0.0)
        ).alias("internal"),
    ).collect()[0]
    if not agg["tot"]:
        return 0.0
    return float(agg["internal"] / agg["tot"])
