"""Well-connected components: recursive cluster splitting by min-cut.

Reference: /root/reference/arachne/server/WellConnectedComponents.chpl
(criteria 63-66: log10/log2/sqrt(n)/5/mult; recursive checker 318-389 —
per cluster: connected components, then min-cut (extern VieCut C++); if
``cut > criterion(n)`` the cluster is well-connected and emitted, else it
is split along the min-cut partition and both sides recurse when larger
than ``post_filter_min_size``); driver 392-470 (pre-split every input
cluster into connected components, keep sizes > ``pre_filter_min_size``).
Client defaults: methods.py:614-722 (log10, pre/post = 10).

Spark-first design: the per-cluster work (CC + min-cut + recursion) is a
**grouped-map** — ``groupBy(cluster).applyInPandas`` ships each cluster's
edge list to one task where the recursion runs on the materialized
subgraph (Stoer–Wagner global min-cut via networkx, the published
algorithm VieCut approximates). That mirrors the reference exactly: its
VieCut call is likewise a single-node computation per cluster; the
distributed layer is the partitioning of clusters over workers. Output
cluster ids are ``dense ids assigned by (min original vertex)`` to keep
results deterministic regardless of task scheduling.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CRITERIA = {
    "log10": lambda n, mult: __import__("math").floor(__import__("math").log10(n)) if n > 0 else 0,
    "log2": lambda n, mult: __import__("math").floor(__import__("math").log2(n)) if n > 0 else 0,
    "sqrt": lambda n, mult: __import__("math").floor(n ** 0.5 / 5),
    "mult": lambda n, mult: __import__("math").floor(mult * n),
}


def _process_cluster(edges: list[tuple[int, int]], criterion, mult, post_min) -> list[set]:
    """Driver/worker-side recursion on one cluster's edge list. Returns the
    vertex sets of well-connected sub-clusters."""
    import networkx as nx

    g = nx.Graph()
    g.add_edges_from(edges)
    out: list[set] = []

    def recurse(sub: "nx.Graph"):
        if sub.number_of_edges() < 1:
            return
        for comp in [sub.subgraph(c).copy() for c in nx.connected_components(sub)]:
            n = comp.number_of_nodes()
            if n <= 1:
                continue
            # degree-one shortcut (checkForDegreeOne: any pendant vertex
            # means the global min cut is 1 — WellConnectedComponents.chpl:302-315)
            degs = dict(comp.degree())
            if min(degs.values()) == 1:
                cut = 1
                pend = min(v for v, d in degs.items() if d == 1)
                part_a = {pend}
            else:
                cut, (pa, _) = nx.stoer_wagner(comp)
                part_a = set(pa)
            if cut > criterion(n, mult):
                out.append(set(comp.nodes()))
                continue
            part_b = set(comp.nodes()) - part_a
            for part in (part_a, part_b):
                if len(part) > post_min:
                    recurse(comp.subgraph(part).copy())

    recurse(g)
    return out


def well_connected_components(
    edges: DataFrame,
    clustering: DataFrame,
    connectedness_criterion: str = "log10",
    mult_value: float | None = None,
    pre_filter_min_size: int = 10,
    post_filter_min_size: int = 10,
) -> DataFrame:
    """(vertex, cluster) rows for every vertex of a well-connected cluster.

    ``edges``: (src long, dst long); ``clustering``: (node long, cluster
    long) — the WCC cluster-file shape (FIXTURES.md §3g). Cluster ids in
    the output are dense ranks of each emitted cluster's minimum vertex.
    """
    criterion = CRITERIA[connectedness_criterion]
    if connectedness_criterion == "mult" and mult_value is None:
        # floor(0*n)=0 would silently declare every cluster well-connected
        raise ValueError(
            "connectedness_criterion='mult' requires mult_value "
            "(reference WellConnectedComponents.chpl:63-66)"
        )
    mult = mult_value if mult_value is not None else 0.0
    post_min = post_filter_min_size
    pre_min = pre_filter_min_size

    # keep only intra-cluster edges: both endpoints in the same cluster
    cs = clustering.select(F.col("node").alias("src"), F.col("cluster").alias("c1"))
    cd = clustering.select(F.col("node").alias("dst"), F.col("cluster").alias("c2"))
    intra = (
        edges.join(cs, "src")
        .join(cd, "dst")
        .filter(F.col("c1") == F.col("c2"))
        .select(F.col("c1").alias("cluster"), "src", "dst")
    )
    # pre-filter: drop clusters whose vertex count is not > pre_filter_min_size
    sizes = clustering.groupBy("cluster").agg(F.countDistinct("node").alias("n"))
    keep = sizes.filter(F.col("n") > pre_min).select("cluster")
    intra = intra.join(keep, "cluster", "left_semi")

    out_schema = "vertex long, cluster_min long"

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        parts = _process_cluster(
            list(zip(pdf["src"], pdf["dst"])), criterion, mult, post_min
        )
        rows = {"vertex": [], "cluster_min": []}
        for vs in parts:
            m = min(vs)
            for v in sorted(vs):
                rows["vertex"].append(int(v))
                rows["cluster_min"].append(int(m))
        return pd.DataFrame(rows)

    raw = intra.groupBy("cluster").applyInPandas(run, schema=out_schema)
    # dense final ids by ascending cluster-min — two-pass dense rank, NOT a
    # global window (a no-partitionBy Window serializes through one task)
    from ..plans.partitioning import dense_rank_ids

    P = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ids = dense_rank_ids(
        raw.select("cluster_min").distinct(), "cluster_min", P, out_col="cluster"
    )
    return raw.join(ids, "cluster_min").select(
        F.col("vertex"), F.col("cluster").cast("long")
    )
