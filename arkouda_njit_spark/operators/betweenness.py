"""Betweenness centrality — Brandes' algorithm, exact or root-sampled.

betweenness(v) = Σ_{s≠v≠t} σ_st(v) / σ_st over unweighted shortest
paths (nx.betweenness_centrality semantics, including its normalization
and the k-sample n/k rescale of Brandes–Pich).

Absent from the reference (its centrality stack is triangle centrality
+ the round-4 harmonic kernel; SURVEY.md §2.7 mandates the standard
centralities beyond it). Spark-first Brandes:

* **Forward sweep** — ONE multi-root level-synchronous traversal carrying
  every sampled root simultaneously, exactly the
  :func:`.bfs.multi_source_bfs` loop shape (one lazily-checkpointed
  level + one count per round) with one extra aggregated column: σ, the
  number of shortest paths, accumulated by a ``groupBy(root, vid)`` sum
  as the frontier expands. The per-level frontiers partition the reached
  set, so keeping them IS the shortest-path DAG — no predecessor lists.
* **Backward sweep** — dependency accumulation
  ``δ(v) = Σ_{w: succ} σ_v/σ_w · (1 + δ(w))`` runs levels deepest-first;
  each step is (level_d ⋈ edges ⋈ level_{d-1}) + a sum — the DAG-edge
  constraint (depth_w = depth_v + 1) is enforced by construction because
  the join sides are the level tables themselves.

Root sampling (deterministic xxhash64 order, like harmonic centrality)
is the scale path: k roots cost k/V of the exact sweep and give the
unbiased n/k-scaled estimator. Exact mode on a big graph is guarded the
same way as ``harmonic_centrality`` (raise above ``max_exact_vertices``
unless ``exact=True``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from .centrality import MAX_EXACT_VERTICES


def betweenness_centrality(
    graph: Graph,
    sample_size: int | None = None,
    seed: int = 42,
    normalized: bool = True,
    exact: bool = False,
    max_exact_vertices: int = MAX_EXACT_VERTICES,
) -> DataFrame:
    """(vid, betweenness) for every vertex.

    ``sample_size=None`` is exact (every vertex a root); otherwise a
    deterministic sample of roots with the nx-compatible ``n/k`` rescale.
    ``normalized`` applies nx's 1/((n-1)(n-2)) (directed) or
    2/((n-1)(n-2)) (undirected) factor; unnormalized undirected results
    are halved like nx (each unordered pair counted from both endpoints).
    """
    n = graph.n_vertices
    verts = graph.vertices.select("vid")
    if sample_size is not None and sample_size <= 0:
        raise ValueError("sample_size must be positive")
    if sample_size is None and not exact and n > max_exact_vertices:
        raise ValueError(
            f"exact betweenness on {n} vertices (> {max_exact_vertices}) "
            "is an all-pairs sweep; pass sample_size for the scale path "
            "or exact=True to force the exact plan"
        )
    if sample_size is None or sample_size >= n:
        roots = verts
        k = n
    else:
        roots = (
            verts.withColumn("_h", F.xxhash64("vid", F.lit(seed)))
            .orderBy("_h")
            .limit(sample_size)
            .select("vid")
        )
        k = sample_size

    edges = graph.edges.select("src", "dst")
    levels = _forward_sigma(edges, roots)
    acc = _backward_dependencies(edges, levels)

    out = verts.join(acc, "vid", "left").select(
        "vid", F.coalesce("b", F.lit(0.0)).alias("betweenness")
    )
    # nx _rescale: normalized -> 1/((n-1)(n-2)); else 1/2 if undirected;
    # sampling multiplies by n/k on top
    if normalized:
        scale = 1.0 / ((n - 1) * (n - 2)) if n > 2 else None
    else:
        scale = None if graph.directed else 0.5
    if scale is None:
        scale = 1.0
    if k < n:
        scale *= n / k
    return out.select(
        "vid", (F.col("betweenness") * F.lit(float(scale))).alias("betweenness")
    )


def _forward_sigma(edges: DataFrame, roots: DataFrame) -> list[DataFrame]:
    """Level-synchronous multi-root sweep; returns one (root, vid, sigma)
    DataFrame per depth (each eagerly checkpointed). Same one-job-per-level
    loop as multi_source_bfs, plus the σ path-count sum."""
    level0 = roots.select(
        F.col("vid").alias("root"), "vid", F.lit(1.0).alias("sigma")
    ).localCheckpoint(eager=True)
    levels = [level0]
    visited_keys = level0.select("root", "vid")
    frontier = level0
    depth = 0
    while True:
        depth += 1
        nxt = (
            edges.join(
                frontier.select("root", F.col("vid").alias("src"), "sigma"), "src"
            )
            .groupBy("root", F.col("dst").alias("vid"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited_keys, ["root", "vid"], "left_anti")
            .localCheckpoint(eager=False)
        )
        if nxt.count() == 0:
            break
        levels.append(nxt)
        frontier = nxt
        visited_keys = visited_keys.unionAll(nxt.select("root", "vid"))
        if depth % 8 == 0:
            visited_keys = visited_keys.localCheckpoint(eager=False)
    return levels


def _backward_dependencies(edges: DataFrame, levels: list[DataFrame]) -> DataFrame:
    """Deepest-first dependency accumulation over the stored levels.
    Returns (vid, b): Σ over roots of δ(v), already excluding v == root
    (level-0 rows are roots; their δ is accumulated but never emitted)."""
    if len(levels) < 2:
        return levels[0].select("vid", F.lit(0.0).alias("b")).limit(0)
    contribs: list[DataFrame] = []
    # δ at the deepest level is 0 everywhere; δ at level 0 (the roots
    # themselves) never counts, so the loop stops at d == 2
    delta = levels[-1].select("root", "vid", F.lit(0.0).alias("delta"))
    for d in range(len(levels) - 1, 1, -1):
        w_side = (
            levels[d]
            .join(delta, ["root", "vid"], "left")
            .select(
                "root",
                F.col("vid").alias("dst"),
                ((F.lit(1.0) + F.coalesce("delta", F.lit(0.0))) / F.col("sigma")).alias(
                    "_wterm"
                ),
            )
        )
        delta = (
            edges.join(w_side, "dst")
            .select("root", F.col("src").alias("vid"), "_wterm")
            .join(levels[d - 1], ["root", "vid"])
            .groupBy("root", "vid")
            .agg(F.sum(F.col("_wterm") * F.col("sigma")).alias("delta"))
            .localCheckpoint(eager=False)
        )
        contribs.append(delta.select("vid", "delta"))
    if not contribs:
        return levels[0].select("vid", F.lit(0.0).alias("b")).limit(0)
    from functools import reduce

    allc = reduce(DataFrame.unionAll, contribs)
    return allc.groupBy("vid").agg(F.sum("delta").alias("b"))
