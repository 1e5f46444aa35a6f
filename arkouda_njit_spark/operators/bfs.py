"""Breadth-first search layers (level-synchronous frontier expansion).

Reference kernel: /root/reference/arachne/server/BreadthFirstSearch.chpl:27-138
(shared-memory frontier lists + aggregated distributed version); client API
``bfs_layers(graph, source) -> depth array`` (methods.py:146-171), depth -1
for unreachable vertices.

Spark formulation: the frontier is its own small DataFrame; one iteration is
``frontier ⋈ edges → distinct dst − visited``. The frontier is usually tiny
relative to the edge table, so Spark broadcasts it under AQE (the reference's
aggregation buffers correspond to the shuffle write path when it isn't).
Visited state accumulates as (vid, depth); lineage is truncated per level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph


def bfs_layers(graph: Graph, source: int, source_is_label: bool = True) -> DataFrame:
    """(vid, depth) for every vertex; depth -1 if unreachable.

    ``source`` is an original vertex label by default (reference API takes
    labels); pass ``source_is_label=False`` for an internal vid.
    """
    spark = graph.spark
    if source_is_label:
        row = graph.vertices.filter(F.col("label") == int(source)).collect()
        if not row:
            raise ValueError(f"source vertex {source} not in graph")
        src_vid = row[0]["vid"]
    else:
        src_vid = int(source)

    edges = graph.edges.select("src", "dst")
    visited = spark.createDataFrame([(src_vid, 0)], "vid long, depth int").localCheckpoint(
        eager=True
    )
    frontier = visited.select("vid")
    depth = 0
    prev_frontier_src = None  # superseded checkpoints, released as we go
    while True:
        depth += 1
        nxt = (
            edges.join(frontier.withColumnRenamed("vid", "src"), "src")
            .select(F.col("dst").alias("vid"))
            .distinct()
            .join(visited, "vid", "left_anti")
            .withColumn("depth", F.lit(depth))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        new_visited = visited.unionAll(nxt).localCheckpoint(eager=True)
        # release superseded checkpoint blocks — without this a deep BFS
        # (diameter's double sweep on a path-like component) pins
        # O(depth × V) storage (FixpointLoop unpersists likewise)
        visited.unpersist()
        if prev_frontier_src is not None:
            prev_frontier_src.unpersist()
        prev_frontier_src = nxt
        visited = new_visited
        frontier = nxt.select("vid")

    return graph.vertices.join(visited, "vid", "left").select(
        "vid", F.coalesce("depth", F.lit(-1)).alias("depth")
    )


def multi_source_bfs(edges: DataFrame, sources: DataFrame) -> DataFrame:
    """Level-synchronous BFS from many roots AT ONCE: one loop, all roots.

    ``sources`` is (root long, vid long); returns (root, vid, depth) for every
    vertex reached from its root. The frontier is keyed by (root, vid), so a
    single per-level join covers every root's frontier simultaneously — the
    loop runs max-eccentricity levels total instead of once per root
    (reference runs one BFS per component sequentially,
    Diameter.chpl:143-186; this is the scale shape that replaces it).
    Reachability is per-root: roots in different components never mix because
    expansion follows edges only.
    """
    visited = sources.select("root", "vid", F.lit(0).alias("depth")).localCheckpoint(
        eager=True
    )
    frontier = visited.select("root", "vid")
    depth = 0
    prev = None
    while True:
        depth += 1
        nxt = (
            edges.join(frontier.withColumnRenamed("vid", "src"), "src")
            .select("root", F.col("dst").alias("vid"))
            .distinct()
            .join(visited, ["root", "vid"], "left_anti")
            .withColumn("depth", F.lit(depth))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        new_visited = visited.unionAll(nxt).localCheckpoint(eager=True)
        visited.unpersist()
        if prev is not None:
            prev.unpersist()
        prev = nxt
        visited = new_visited
        frontier = nxt.select("root", "vid")
    return visited
