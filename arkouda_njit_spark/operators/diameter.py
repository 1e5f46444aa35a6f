"""Graph diameter, replicating the reference's committed convention.

Reference kernel: /root/reference/arachne/server/Diameter.chpl:51-241 —
connected components first, then per component (size > max(2, best-so-far)):

  * size > 2500: iterated BFS from extremal vertices (double sweep);
  * else: dense matrix powering of (I+A) — finds the smallest 2^k with
    (I+A)^(2^k) all-nonzero, then binary-refines downward counting the
    **largest d such that (I+A)^d still has a zero entry** (lines 195-235).
    That value is ``true_diameter - 1``, and the committed golden test
    (algorithm_test.py:287-295: 7-vertex path → 5) locks that convention
    in; components that are complete graphs (true diameter 1) hit the
    ``k<=1 → continue`` branch and contribute nothing.

We replicate: per component with >= 3 vertices, contribute
``true_diameter - 1`` when true_diameter >= 2 (complete components are
skipped). Small components are collected to the driver and measured with
pure-python BFS — the reference's dense matPow is likewise a single-node
computation; large components (> ``bfs_threshold``) use a distributed
double sweep (lower bound, like the reference's BFS branch).

``diameter(graph, exact=True)`` is also offered: the mathematically correct
max eccentricity, for users who want the real thing.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import functions as F

from ..graph import Graph
from .bfs import bfs_layers
from .connected_components import connected_components


def _component_diameter_exact(adj: dict[int, set[int]]) -> int:
    """All-sources BFS diameter of a small component (driver-side)."""
    best = 0
    for s in adj:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        best = max(best, max(dist.values()))
    return best


def diameter(graph: Graph, exact: bool = False, bfs_threshold: int = 2500) -> int:
    """Graph diameter across components.

    exact=False (default) reproduces the reference's convention
    (true diameter − 1 per non-complete component, small-component branch).
    """
    comps = connected_components(graph).persist()
    sizes = comps.groupBy("component").agg(F.count("*").alias("size")).collect()
    edges = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))

    best = 0
    for row in sorted(sizes, key=lambda r: -r["size"]):
        comp, size = row["component"], row["size"]
        if size <= max(2, best):
            continue  # Diameter.chpl:143-146
        if size <= bfs_threshold:
            members = {
                r["vid"] for r in comps.filter(F.col("component") == comp).collect()
            }
            local_edges = edges.filter(F.col("src").isin(list(members))).collect()
            adj: dict[int, set[int]] = {v: set() for v in members}
            for r in local_edges:
                adj[r["src"]].add(r["dst"])
                adj[r["dst"]].add(r["src"])
            d = _component_diameter_exact(adj)
            if exact:
                best = max(best, d)
            elif d >= 2:
                best = max(best, d - 1)  # matrix-power branch convention
        else:
            # double sweep: BFS from the component label vertex, then from
            # the farthest vertex found (componentIter, Diameter.chpl:13-31)
            d1 = bfs_layers(graph, comp, source_is_label=False)
            far = d1.orderBy(F.desc("depth"), "vid").limit(1).collect()[0]
            d2 = bfs_layers(graph, far["vid"], source_is_label=False)
            d = d2.agg(F.max("depth")).collect()[0][0]
            best = max(best, d)
    comps.unpersist()
    return best
