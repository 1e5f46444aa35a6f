"""Graph diameter, replicating the reference's committed convention.

Reference kernel: /root/reference/arachne/server/Diameter.chpl:51-241 —
connected components first, then per component (size > max(2, best-so-far)):

  * size > 2500: iterated BFS from extremal vertices (double sweep);
  * else: dense matrix powering of (I+A) — finds the smallest 2^k with
    (I+A)^(2^k) all-nonzero, then binary-refines downward counting the
    **largest d such that (I+A)^d still has a zero entry** (lines 195-235).
    That value is ``true_diameter - 1``, and the committed golden test
    (algorithm_test.py:287-295: 7-vertex path → 5) locks that convention
    in; components with true diameter <= 2 hit the ``k<=1 → continue``
    branch ((I+A)^2 already has no zero entry) and contribute nothing.

We replicate: per component, contribute ``true_diameter - 1`` when
true_diameter >= 3 (diameter-<=2 components are skipped). Small components
are measured in ONE grouped-map pass (``applyInPandas`` all-sources BFS,
parallel across components — the reference's dense matPow is likewise a
per-component single-node kernel); large components (> ``bfs_threshold``)
get ONE multi-source distributed double sweep covering all of them at once
(lower bound, like the reference's BFS branch, but not serialized per
component — round 3).

``diameter(graph, exact=True)`` is also offered: the mathematically correct
max eccentricity, for users who want the real thing.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import functions as F

from ..graph import Graph
from .bfs import multi_source_bfs
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

    Scale shape: ALL components ≤ ``bfs_threshold`` are measured in ONE
    grouped-map pass (``groupBy(component).applyInPandas`` — each
    component's edge list lands in one task, the all-sources BFS runs
    there), mirroring the reference's per-component dense kernel but
    parallel across components instead of a sequential driver loop.
    Components larger than the threshold get the distributed double sweep
    (componentIter, Diameter.chpl:13-31).
    """
    import pandas as pd

    comps = connected_components(graph).persist()
    sizes = comps.groupBy("component").agg(F.count("*").alias("size"))
    edges = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))

    # tag every edge with its component (vertices of one edge share it)
    tagged = edges.join(
        comps.withColumnRenamed("vid", "src"), "src"
    ).join(
        sizes.filter(F.col("size") <= bfs_threshold), "component", "left_semi"
    )

    def comp_diameter(key, pdf: pd.DataFrame) -> pd.DataFrame:
        adj: dict[int, set[int]] = {}
        for s, d in zip(pdf["src"], pdf["dst"]):
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
        return pd.DataFrame({"component": [key[0]], "d": [_component_diameter_exact(adj)]})

    small = tagged.groupBy("component").applyInPandas(
        comp_diameter, schema="component long, d long"
    )
    if exact:
        small_best = small.agg(F.max("d")).collect()[0][0]
    else:
        # matrix-power branch convention: components with true diameter
        # <= 2 hit the reference's k<=1 `continue` (Diameter.chpl:211-214
        # — (I+A)^2 already all-nonzero) and contribute NOTHING; d >= 3
        # components contribute true−1
        small_best = (
            small.filter(F.col("d") >= 3)
            .agg(F.max(F.col("d") - 1))
            .collect()[0][0]
        )
    best = int(small_best) if small_best is not None else 0

    # big components: ONE multi-source double sweep covering all of them at
    # once (frontier keyed by (component, vid)) — the reference loops over
    # components sequentially (Diameter.chpl:143-186); a component whose size
    # <= best cannot beat best (diameter < size), so the reference's
    # skip-small pruning (lines 143-146) is subsumed by the size filter
    big_ids = sizes.filter(
        (F.col("size") > bfs_threshold) & (F.col("size") > max(2, best))
    )
    if not big_ids.isEmpty():
        if exact:
            import warnings

            warnings.warn(
                "diameter(exact=True): components larger than bfs_threshold "
                "use the double-sweep LOWER BOUND, not exact eccentricity — "
                "raise bfs_threshold to force the exact per-component pass"
            )
        big_vids = comps.join(big_ids, "component", "left_semi")
        big_edges = (
            graph.edges.select("src", "dst")
            .join(big_vids.withColumnRenamed("vid", "src").select("src"), "src", "left_semi")
            .localCheckpoint(eager=True)
        )
        # sweep 1: from each component's label vertex (the label IS a member
        # vid under hash-min); farthest vertex per component, smallest-vid
        # tie-break matches the old orderBy(desc(depth), vid).limit(1)
        roots1 = big_ids.select(
            F.col("component").alias("root"), F.col("component").alias("vid")
        )
        d1 = multi_source_bfs(big_edges, roots1)
        far = d1.groupBy("root").agg(
            F.expr("max_by(vid, struct(depth, -vid))").alias("vid")
        )
        # sweep 2: from each farthest vertex; component diameter lower bound
        d2 = multi_source_bfs(big_edges, far)
        big_best = d2.agg(F.max("depth")).collect()[0][0]
        # d1/d2's per-level checkpoint blocks are GC-cleaned once these
        # references drop (multi_source_bfs contract)
        del d1, d2
        big_edges.unpersist()
        best = max(best, int(big_best) if big_best is not None else 0)
    comps.unpersist()
    return best
