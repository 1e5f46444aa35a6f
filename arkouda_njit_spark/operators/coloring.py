"""Maximal independent set (Luby) and greedy graph coloring
(Jones–Plassmann) — the classic symmetry-breaking kernels.

The reference has no MIS/coloring; they are the standard building blocks
for scheduling independent work over a graph (conflict-free update
batches, register-allocation-style partitioning of crawl/refresh jobs),
so the engine ships them as beyond-reference operators.

Both use deterministic hash priorities — ``xxhash64(vid, seed, round)``
for Luby (fresh randomness per round, partition-invariant, never
``rand()``) and ``xxhash64(vid, seed)`` for Jones–Plassmann (one fixed
priority order). Per round each is exactly one map-side-combined
aggregation over the remaining edges plus anti-joins:

* **Luby**: v enters the MIS iff its (hash, vid) pair is smaller than
  every remaining neighbor's — a ``groupBy(dst).agg(min(struct))`` whose
  partial aggregation collapses hub fan-in map-side; winners and their
  neighbors leave the graph. O(log V) rounds with high probability.
* **Jones–Plassmann**: a vertex colors itself once all higher-priority
  neighbors are colored, choosing the smallest color absent among them
  (mex). The mex is computed distributively: candidate colors
  0..#used(v) are exploded (O(deg v) rows, total O(E) across the whole
  run since each vertex activates once) and anti-joined against the
  used set. Rounds = longest decreasing-priority path = O(log V) whp.

Both loops follow the engine's one-action-per-round discipline: the
remaining-vertex count doubles as the materializing action for the
round's (stats-safe) checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph

_MAX_ROUNDS = 500  # whp bound is O(log V); exceeding this is a bug


def _sym_edges(graph: Graph) -> DataFrame:
    """Symmetric neighbor table (u, v), self-loops dropped: independence
    and coloring constraints are undirected adjacency facts."""
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .withColumnRenamed("src", "u")
        .withColumnRenamed("dst", "v")
    )


def maximal_independent_set(graph: Graph, seed: int = 42) -> DataFrame:
    """(vid, in_mis) for every vertex — a maximal independent set of the
    underlying undirected graph: no two selected vertices are adjacent,
    and every unselected vertex has a selected neighbor. Deterministic
    and partition-invariant for a given seed."""
    edges = _sym_edges(graph).localCheckpoint(eager=True)
    verts = graph.vertices.select("vid").localCheckpoint(eager=True)
    selected = None

    for rnd in range(_MAX_ROUNDS):
        prio = verts.select(
            "vid",
            F.struct(
                F.xxhash64("vid", F.lit(seed), F.lit(rnd)).alias("h"),
                F.col("vid").alias("t"),
            ).alias("p"),
        )
        # min neighbor priority, hub fan-in combined map-side
        nbr_min = (
            edges.join(prio.withColumnRenamed("vid", "u"), "u")
            .groupBy(F.col("v").alias("vid"))
            .agg(F.min("p").alias("np"))
        )
        winners = (
            prio.join(nbr_min, "vid", "left")
            .filter(F.col("np").isNull() | (F.col("p") < F.col("np")))
            .select("vid")
            .localCheckpoint(eager=True)
        )
        sel = winners.select("vid")
        selected = sel if selected is None else selected.unionAll(sel)
        # winners and their neighborhoods leave the residual graph
        gone = winners.unionAll(
            edges.join(winners.withColumnRenamed("vid", "u"), "u").select(
                F.col("v").alias("vid")
            )
        ).distinct()
        verts = verts.join(gone, "vid", "left_anti").localCheckpoint(eager=False)
        remaining = verts.count()  # one action: materializes the round
        if remaining == 0:
            break
        edges = (
            edges.join(verts.withColumnRenamed("vid", "u"), "u", "left_semi")
            .join(verts.withColumnRenamed("vid", "v"), "v", "left_semi")
            .localCheckpoint(eager=False)
        )
    else:
        raise RuntimeError(f"luby MIS did not finish in {_MAX_ROUNDS} rounds")

    return (
        graph.vertices.select("vid")
        .join(selected.withColumn("in_mis", F.lit(True)), "vid", "left")
        .select("vid", F.coalesce("in_mis", F.lit(False)).alias("in_mis"))
    )


def greedy_color(graph: Graph, seed: int = 42) -> DataFrame:
    """(vid, color) — a proper coloring (no edge joins two equal colors)
    with color(v) <= degree(v), via Jones–Plassmann over a deterministic
    hash priority order. Deterministic and partition-invariant."""
    edges = _sym_edges(graph).localCheckpoint(eager=True)
    prio_of = lambda c: F.struct(  # noqa: E731 — tiny local expr builder
        F.xxhash64(c, F.lit(seed)).alias("h"), F.col(c).cast("long").alias("t")
    )
    uncolored = (
        graph.vertices.select("vid")
        .select("vid", prio_of("vid").alias("p"))
        .localCheckpoint(eager=True)
    )
    colored = None  # (vid, color)

    for _ in range(_MAX_ROUNDS):
        # higher-priority = smaller (hash, vid) struct; v is ready when no
        # *uncolored* neighbor has higher priority
        uc_u = uncolored.select(F.col("vid").alias("u"), F.col("p").alias("pu"))
        uc_v = uncolored.select(F.col("vid").alias("v"), F.col("p").alias("pv"))
        blocked = (
            edges.join(uc_u, "u")
            .join(uc_v, "v")
            .filter(F.col("pu") < F.col("pv"))
            .select(F.col("v").alias("vid"))
            .distinct()
        )
        ready = uncolored.join(blocked, "vid", "left_anti").select("vid")

        if colored is not None:
            used = (
                edges.join(ready.withColumnRenamed("vid", "v"), "v", "left_semi")
                .join(
                    colored.withColumnRenamed("vid", "u"), "u"
                )
                .select(F.col("v").alias("vid"), "color")
                .distinct()
            )
        else:
            used = ready.select("vid", F.lit(0).alias("color")).limit(0)
        # mex: candidates 0..#used per ready vertex, minus the used set
        counts = ready.join(
            used.groupBy("vid").agg(F.count("*").alias("k")), "vid", "left"
        ).select("vid", F.coalesce("k", F.lit(0)).alias("k"))
        cands = counts.select(
            "vid", F.explode(F.sequence(F.lit(0), F.col("k"))).alias("color")
        )
        newly = (
            cands.join(used, ["vid", "color"], "left_anti")
            .groupBy("vid")
            .agg(F.min("color").alias("color"))
            .localCheckpoint(eager=True)
        )
        colored = newly if colored is None else colored.unionAll(newly).localCheckpoint(eager=False)
        uncolored = uncolored.join(newly, "vid", "left_anti").localCheckpoint(
            eager=False
        )
        if uncolored.count() == 0:  # one action: materializes both states
            break
    else:
        raise RuntimeError(f"jones-plassmann did not finish in {_MAX_ROUNDS} rounds")

    return colored.select("vid", F.col("color").cast("int").alias("color"))
