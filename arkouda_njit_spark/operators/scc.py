"""Strongly connected components of a DiGraph (coloring / FW-BW method).

The web graph's bow-tie structure (one giant SCC, IN/OUT fringes, tendrils)
is THE classical link-graph decomposition; the reference ships only the
undirected CC family, so this is a beyond-reference operator built from
the engine's existing multi-root machinery.

Algorithm (the standard distributed "coloring" scheme, multi-pivot):

  1. **trim pass** — vertices with no in-edges or no out-edges inside the
     remaining subgraph are singleton SCCs; peel a few cheap rounds.
  2. **forward max-propagation** — color(v) = max vid that reaches v
     (hash-max to fixpoint along edge direction; same loop shape as the
     undirected CC's hash-min exchange).
  3. **backward sweep, all pivots at once** — every v with
     color(v) == v is a pivot; the SCC of pivot c is {v : color(v) == c
     and v reaches c}. One :func:`multi_source_bfs` over the REVERSED
     color-preserving edge set finds all of them simultaneously.
  4. remove found SCCs, repeat on the remainder.

Scale notes: every stage is the engine's standard iterative join shape
(per-round localCheckpoint, uniform hash keys). Web graphs converge in a
handful of outer rounds (giant SCC + fringe); long directed chains
degrade to many cheap rounds — inherent to every label-propagation SCC
scheme, and the trim pass absorbs the common DAG-tail case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DiGraph
from .bfs import multi_source_bfs


def _trim(edges: DataFrame, verts: DataFrame, rounds: int | None = None):
    """Peel vertices with in-degree or out-degree 0 inside the subgraph:
    each is a singleton SCC. Returns (edges, verts, trimmed) — trimmed as
    (vid, scc) rows with scc = vid.

    Runs to the FIXPOINT by default (round-5: the old 3-round cap spread
    a chain's peel over many expensive outer rounds — each with a full
    color fixpoint + backward BFS — where peeling it upfront costs the
    same cheap degree-filter rounds once)."""
    trimmed = None
    i = 0
    while rounds is None or i < rounds:
        i += 1
        srcs = edges.select(F.col("src").alias("vid")).distinct()
        dsts = edges.select(F.col("dst").alias("vid")).distinct()
        core = srcs.join(dsts, "vid")  # has both an in- and an out-edge
        gone = verts.join(core, "vid", "left_anti").localCheckpoint(eager=True)
        if gone.isEmpty():
            break
        gone_scc = gone.select("vid", F.col("vid").alias("scc"))
        trimmed = gone_scc if trimmed is None else trimmed.unionAll(gone_scc)
        verts = verts.join(gone, "vid", "left_anti").localCheckpoint(eager=True)
        edges = (
            edges.join(verts.withColumnRenamed("vid", "src"), "src", "left_semi")
            .join(verts.withColumnRenamed("vid", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    return edges, verts, trimmed


def _forward_colors(
    edges: DataFrame,
    verts: DataFrame,
    max_rounds: int = 200,
    jump_after: int = 8,
) -> DataFrame:
    """(vid, color) with color = max vid of any forward-ancestor (incl. v).

    ONE action per round: colors only ever increase, so Σ color is
    strictly monotone until the fixpoint — an unchanged sum IS
    convergence, and the sum job doubles as the materializing action for
    the round's checkpoint (no separate changed-rows join).

    After ``jump_after`` rounds a pointer-jumping shortcut joins in
    color(color(v)) alongside the one-hop edge push — on a chain whose
    colors increase along it, the dominant color then doubles its reach
    per round instead of advancing one hop, so long-chain inputs converge
    in O(jump_after + log chain) rounds instead of O(chain). It is GATED
    rather than always-on because the jump is a V×V self-join per round
    and web-graph colorings converge in a handful of rounds anyway:
    measured on the 1.2M-page bow-tie workload, jump-always cost +30%
    wall at N=2 for zero round savings (BASELINE.md round-5 SCC note) —
    the bill only pays for itself once the push rounds have stalled,
    which is exactly the long-chain regime."""
    color = verts.select("vid", F.col("vid").alias("color")).localCheckpoint(eager=True)
    prev_sum = None
    for rnd in range(max_rounds):
        pushed = (
            edges.join(color.withColumnRenamed("vid", "src"), "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.max("color").alias("in_color"))
        )
        if rnd >= jump_after:
            state = color.join(
                color.select(
                    F.col("vid").alias("color"), F.col("color").alias("jc")
                ),
                "color",
                "left",
            ).select("vid", "color", "jc")
        else:
            state = color.select("vid", "color", F.lit(None).cast("long").alias("jc"))
        nxt = (
            state.join(pushed, "vid", "left")
            .select(
                "vid",
                F.greatest(
                    "color",
                    F.coalesce("jc", F.lit(-1)),
                    F.coalesce("in_color", F.lit(-1)),
                ).alias("color"),
            )
            .localCheckpoint(eager=False)
        )
        cur_sum = nxt.agg(F.sum("color")).collect()[0][0]
        color = nxt
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return color


def strongly_connected_components(graph: DiGraph, max_rounds: int = 100) -> DataFrame:
    """(vid, scc) for every vertex; ``scc`` is the SMALLEST vid in the
    component (deterministic, partition-invariant labels)."""
    edges = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = graph.vertices.select("vid").localCheckpoint(eager=True)
    assigned: DataFrame | None = None  # (vid, scc_pivot)

    for _ in range(max_rounds):
        if verts.isEmpty():
            break
        edges, verts, trimmed = _trim(edges, verts)
        if trimmed is not None:
            assigned = trimmed if assigned is None else assigned.unionAll(trimmed)
        if verts.isEmpty():
            break
        color = _forward_colors(edges, verts)
        # reversed, color-preserving edges: walking them stays inside one
        # color class, so each pivot's BFS is confined to its candidate set
        cs = color.select(F.col("vid").alias("src"), F.col("color").alias("c_src"))
        cd = color.select(F.col("vid").alias("dst"), F.col("color").alias("c_dst"))
        rev = (
            edges.join(cs, "src")
            .join(cd, "dst")
            .filter(F.col("c_src") == F.col("c_dst"))
            .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        pivots = color.filter(F.col("vid") == F.col("color")).select(
            F.col("vid").alias("root"), "vid"
        )
        reached = multi_source_bfs(rev, pivots)
        found = reached.select("vid", F.col("root").alias("scc")).localCheckpoint(
            eager=True
        )
        assigned = found if assigned is None else assigned.unionAll(found)
        verts = verts.join(found, "vid", "left_anti").localCheckpoint(eager=True)
        edges = (
            edges.join(verts.withColumnRenamed("vid", "src"), "src", "left_semi")
            .join(verts.withColumnRenamed("vid", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    else:
        # never silently drop vertices: the contract is one (vid, scc) row
        # per vertex, and downstream scc_sizes/bowtie corrupt quietly
        # otherwise (round-4 ADVICE #2)
        if not verts.isEmpty():
            raise RuntimeError(
                f"SCC did not assign every vertex within {max_rounds} outer "
                "rounds; raise max_rounds"
            )

    if assigned is None:
        return graph.vertices.select("vid", F.col("vid").alias("scc"))
    # relabel each component by its smallest member vid
    relabel = assigned.groupBy("scc").agg(F.min("vid").alias("scc_min"))
    return (
        assigned.join(relabel, "scc")
        .select("vid", F.col("scc_min").alias("scc"))
    )


def scc_sizes(graph: DiGraph) -> DataFrame:
    """One row per SCC: (scc, size), descending by size — the bow-tie
    histogram input."""
    return (
        strongly_connected_components(graph)
        .groupBy("scc")
        .agg(F.count("*").alias("size"))
        .orderBy(F.desc("size"), "scc")
    )


BOWTIE_REGIONS = ("SCC", "IN", "OUT", "TENDRIL_IN", "TENDRIL_OUT", "TUBE", "DISC")


def bowtie_decomposition(graph: DiGraph, scc: DataFrame | None = None) -> DataFrame:
    """Broder-style bow-tie map of a directed web graph: (vid, region) with

      * ``SCC``          — the largest strongly connected component
      * ``IN``           — reaches the SCC, not reachable from it
      * ``OUT``          — reachable from the SCC, does not reach it
      * ``TUBE``         — on an IN→OUT path that bypasses the SCC
        (reachable from IN and reaching OUT, in neither IN nor OUT)
      * ``TENDRIL_IN``   — reachable from IN only
      * ``TENDRIL_OUT``  — reaching OUT only
      * ``DISC``         — everything else (disconnected from the core)

    Three multi-source BFS sweeps total (forward/backward from the SCC,
    then forward-from-IN / backward-from-OUT for the fringe), each the
    engine's one-action-per-level loop.

    ``scc``: optionally a precomputed (vid, scc) table from
    :func:`strongly_connected_components` on the same graph — callers
    that need both the labels and the regions pass it to avoid running
    the SCC fixpoint twice."""
    if scc is None:
        scc = strongly_connected_components(graph)
    scc = scc.persist()
    giant = (
        scc.groupBy("scc").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "scc")
        .limit(1)
    )
    core = scc.join(giant.select("scc"), "scc").select("vid").persist()
    edges = graph.edges.select("src", "dst")

    def reach(edge_tbl: DataFrame, from_set: DataFrame) -> DataFrame:
        srcs = from_set.select(F.lit(0).alias("root"), "vid")
        return multi_source_bfs(edge_tbl, srcs).select("vid").distinct()

    fwd = reach(edges, core).persist()  # core + OUT + ...
    rev = reach(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")), core).persist()
    out_set = fwd.join(core, "vid", "left_anti").persist()
    in_set = rev.join(core, "vid", "left_anti").persist()
    rest = (
        graph.vertices.select("vid")
        .join(fwd, "vid", "left_anti")
        .join(rev, "vid", "left_anti")
        .persist()
    )
    # fringe sweeps restricted to `rest`: tendrils and tubes never cross the core
    rest_edges = (
        edges.join(rest.withColumnRenamed("vid", "dst"), "dst", "left_semi")
    )  # edges INTO rest; sources can be IN or rest
    from_in = reach(
        rest_edges.join(
            rest.unionAll(in_set).withColumnRenamed("vid", "src"), "src", "left_semi"
        ),
        in_set,
    ).join(rest, "vid", "left_semi").persist()
    rest_edges_rev = (
        edges.join(rest.withColumnRenamed("vid", "src"), "src", "left_semi")
    )
    to_out = reach(
        rest_edges_rev.join(
            rest.unionAll(out_set).withColumnRenamed("vid", "dst"), "dst", "left_semi"
        ).select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        out_set,
    ).join(rest, "vid", "left_semi").persist()

    region = (
        graph.vertices.select("vid")
        .join(core.withColumn("_core", F.lit(True)), "vid", "left")
        .join(in_set.withColumn("_in", F.lit(True)), "vid", "left")
        .join(out_set.withColumn("_out", F.lit(True)), "vid", "left")
        .join(from_in.withColumn("_fin", F.lit(True)), "vid", "left")
        .join(to_out.withColumn("_tout", F.lit(True)), "vid", "left")
        .select(
            "vid",
            F.when(F.col("_core"), F.lit("SCC"))
            .when(F.col("_in"), F.lit("IN"))
            .when(F.col("_out"), F.lit("OUT"))
            .when(F.col("_fin") & F.col("_tout"), F.lit("TUBE"))
            .when(F.col("_fin"), F.lit("TENDRIL_IN"))
            .when(F.col("_tout"), F.lit("TENDRIL_OUT"))
            .otherwise(F.lit("DISC"))
            .alias("region"),
        )
    )
    out = region.localCheckpoint(eager=True)
    for h in (scc, core, fwd, rev, out_set, in_set, rest, from_in, to_out):
        h.unpersist()
    return out
