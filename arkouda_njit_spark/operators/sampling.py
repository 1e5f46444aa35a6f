"""Deterministic neighbor sampling — GraphSAGE-style minibatch extraction.

Training a GNN (or building node2vec-adjacent context sets) over a
10^12-edge web graph never touches full neighborhoods: each layer keeps
at most ``fanout`` neighbors per vertex (Hamilton, Ying & Leskovec,
"Inductive Representation Learning on Large Graphs", NeurIPS 2017).
The selection here is the engine's deterministic-randomness discipline
(operators/walks.py): neighbor d of vertex s survives iff its key
``xxhash64(s, d, seed)`` ranks in the smallest ``fanout`` for s —
partition-invariant, replayable, and a different (but equally uniform)
draw for every seed.

Scale shape: the per-vertex top-k is a window ordered by the hash, and
Spark 4 plans the ``rank <= k`` filter as WindowGroupLimit — each map
task keeps at most k rows per vertex BEFORE the exchange (the same
hub-collapse the anchor-text index relies on, plan-asserted in
tests/test_plan_hygiene.py), so a 10^7-degree hub ships k rows per
partition, never its fan-out. ``khop_sample`` then alternates
frontier-restricted sampling with a distinct() on the next frontier —
per layer: one semi-join on src + the sampled window + one distinct,
all keyed on vertex ids. The result is the layered edge list (block
adjacency) a trainer consumes, at most ``n_roots · Π fanouts`` rows by
construction.

Reference parity: the reference has no sampling; this extends its walk
family (SURVEY §2.7 beyond-reference block) with the bounded-fan-out
neighborhood extraction a graph-ML pipeline needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..graph import Graph


def sample_neighbors(
    graph: Graph,
    fanout: int,
    seed: int = 0,
    edges: DataFrame | None = None,
) -> DataFrame:
    """(src, dst) with at most ``fanout`` out-neighbors per src, drawn
    uniformly (hash-ranked) without replacement; vertices with degree
    <= fanout keep their whole neighborhood. Pass ``edges`` to sample a
    restricted edge set (khop_sample does)."""
    if fanout < 1:
        raise ValueError("fanout must be >= 1")
    e = (edges if edges is not None else graph.edges).select("src", "dst").distinct()
    win = Window.partitionBy("src").orderBy(
        F.xxhash64("src", "dst", F.lit(seed)), F.col("dst")
    )
    return (
        e.withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") <= fanout)
        .drop("_rk")
    )


def khop_sample(
    graph: Graph,
    roots: DataFrame,
    fanouts: Sequence[int],
    seed: int = 0,
) -> DataFrame:
    """(layer, src, dst) — the layered sampled computation graph rooted
    at ``roots`` (a (vid) DataFrame): layer i (1-based) holds at most
    ``fanouts[i-1]`` sampled out-edges per frontier vertex, and layer
    i+1's frontier is layer i's distinct destinations. Layers use
    decorrelated seeds (seed, layer) so a vertex reached at two depths
    draws different neighbor sets."""
    if not fanouts:
        raise ValueError("fanouts must be non-empty")
    frontier = roots.select(F.col(roots.columns[0]).alias("src")).distinct()
    out: list[DataFrame] = []
    edges = graph.edges.select("src", "dst").distinct()
    for layer, fanout in enumerate(fanouts, start=1):
        live = edges.join(frontier, "src", "left_semi")
        sampled = sample_neighbors(
            graph,
            fanout,
            seed=spark_layer_seed(seed, layer),
            edges=live,
        )
        out.append(sampled.select(F.lit(layer).alias("layer"), "src", "dst"))
        frontier = sampled.select(F.col("dst").alias("src")).distinct()
    result = out[0]
    for df in out[1:]:
        result = result.unionByName(df)
    return result


def spark_layer_seed(seed: int, layer: int) -> int:
    """Deterministic per-layer seed decorrelation (kept Python-side so
    the pure-python test replay can reproduce it exactly)."""
    return (seed * 1_000_003 + layer) & 0x7FFFFFFF
